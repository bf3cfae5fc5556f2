package graft

import graft.functions.Impl
import org.scalatest.funsuite.AnyFunSuite

/** Property-style kernel invariants over seeded random samples — the
  * randomized layer the reference covers with seeded roundtrips
  * (test/tree_chkpt.cpp). Plain seeded sampling (the scalatest+scalacheck
  * bridge module is not in the offline cache).
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260816L)
  private def doc(): String =
    Seq.fill(rnd.nextInt(200))("w" + rnd.nextInt(400)).mkString(" ")

  test("jaccard is symmetric, bounded, 1 on self") {
    for (_ <- 0 until 200) {
      val sa = graft.dedup.SerialOracle.shingleSet(doc(), 3)
      val sb = graft.dedup.SerialOracle.shingleSet(doc(), 3)
      val j = Impl.jaccardArr(sa, sb)
      assert(j >= 0.0 && j <= 1.0)
      assert(Impl.jaccardArr(sb, sa) == j)
      assert(Impl.jaccardArr(sa, sa) == 1.0)
    }
  }

  test("minhash equality fraction tracks jaccard within 4 sigma") {
    for (_ <- 0 until 100) {
      val a = doc(); val b0 = doc()
      // mix in related pairs: half the time b is a perturbation of a
      val b = if (rnd.nextBoolean()) a.split(" ").map(w =>
        if (rnd.nextDouble() < 0.1) "z" + rnd.nextInt(100) else w).mkString(" ") else b0
      val sa = graft.dedup.SerialOracle.shingleSet(a, 3)
      val sb = graft.dedup.SerialOracle.shingleSet(b, 3)
      if (sa.nonEmpty && sb.nonEmpty) {
        val j = Impl.jaccardArr(sa, sb)
        val ma = Impl.minhashArr(sa, 128, 42L)
        val mb = Impl.minhashArr(sb, 128, 42L)
        val est = ma.zip(mb).count { case (x, y) => x == y } / 128.0
        val sigma = math.sqrt(j * (1 - j) / 128.0) + 1e-9
        assert(math.abs(est - j) <= 4 * sigma + 0.02, s"j=$j est=$est")
      }
    }
  }

  test("simhashKeys: fingerprints within hamming d=3 always share a key") {
    for (_ <- 0 until 2000) {
      val h = rnd.nextLong()
      val nf = rnd.nextInt(4) // 0..3 bit flips
      val h2 = (0 until nf).foldLeft(h)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
      if (Impl.hamming(h, h2) <= 3) {
        val k1 = Impl.simhashKeys(h, 6, 3).toLongArray().toSet
        val k2 = Impl.simhashKeys(h2, 6, 3).toLongArray().toSet
        assert(k1.intersect(k2).nonEmpty, f"no shared key for $h%x vs $h2%x")
      }
    }
  }

  test("contentKey64 is whitespace/case-insensitive and content-sensitive") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    for (_ <- 0 until 200) {
      val a = doc()
      val k = Impl.contentKey64(u(a))
      assert(Impl.contentKey64(u("  " + a.toUpperCase.replace(" ", "\t \n") + " ")) == k)
      if (a.nonEmpty) assert(Impl.contentKey64(u(a + " extraword")) != k)
    }
  }

  test("winnow positions are valid and deduplicated") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    for (_ <- 0 until 100) {
      val a = doc()
      if (a.length >= 12) {
        val arr = Impl.winnow(u(a), 12, 8)
        val posns = (0 until arr.numElements()).map(i => arr.getStruct(i, 2).getInt(0))
        assert(posns.forall(p => p >= 0 && p + 12 <= a.length))
        assert(posns == posns.distinct)
      }
    }
  }
}
