package graft

import graft.dedup.MinHashLSH
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded bucket-pair kernel is the skew guard every candidate source
  * shares — prove the hot-key path: a 10⁵-member key must complete with
  * star edges only (streaming pass), while small keys still get all pairs.
  */
class BoundedBucketSpec extends AnyFunSuite with SparkTestBase {

  test("100k-member hot key emits star edges; small buckets emit all pairs") {
    import spark.implicits._
    val n = 100000L
    val hot = spark.range(n).select(lit(7L).as("key"), col("id").as("e"))
    val small = Seq((8L, 1000001L), (8L, 1000002L), (8L, 1000003L),
      (9L, 2000001L)).toDF("key", "e") // key 9 is a singleton: no pairs
    val pairs = MinHashLSH.boundedBucketPairs(hot.union(small), Seq("key"),
      maxBucket = 64).collect()

    val hotPairs = pairs.filter(_.getLong(1) < 1000000L)
    // star: every hot member pairs with the min element (0), exactly once
    assert(hotPairs.length == n - 1)
    assert(hotPairs.forall(_.getLong(0) == 0L))
    assert(hotPairs.map(_.getLong(1)).toSet == (1L until n).toSet)
    // small bucket: full C(3,2) pair set, ordered p < q
    val smallPairs = pairs.filter(_.getLong(1) >= 1000000L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(smallPairs == Set((1000001L, 1000002L), (1000001L, 1000003L),
      (1000002L, 1000003L)))
  }

  test("randomized: bounded kernel matches a naive per-bucket reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    for (trial <- 0 until 3) {
      val rows = (0 until 500)
        .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(80).toLong)).distinct
      val cap = 1 + rnd.nextInt(10)
      val got = MinHashLSH.boundedBucketPairs(rows.toDF("key", "e"), Seq("key"), cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = rows.groupBy(_._1).values.flatMap { grp =>
        val ms = grp.map(_._2).sorted
        if (ms.length <= 1) Nil
        else if (ms.length <= cap)
          for (i <- ms.indices; j <- i + 1 until ms.length) yield (ms(i), ms(j))
        else ms.tail.map(y => (ms.head, y))
      }.toSet
      assert(got == naive, s"trial $trial cap $cap")
    }
  }

  test("randomized: bounded PROBE kernel matches a naive new-vs-all reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 3) {
      // disjoint old/new element sets (the caller's contract: a content key
      // registers exactly once)
      val all = (0 until 400)
        .map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(120).toLong)).distinct
      val els = all.map(_._2).distinct
      val newEls = els.filter(_ % 3 == 0).toSet
      val newRows = all.filter(r => newEls.contains(r._2))
      val oldRows = all.filterNot(r => newEls.contains(r._2))
      val cap = 1 + rnd.nextInt(8)
      val got = MinHashLSH.boundedProbePairs(
          newRows.toDF("key", "e"), oldRows.toDF("key", "e"), Seq("key"), cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // naive model: per key, small (≤ cap distinct members) buckets emit
      // every (new, other-member) pair in both roles; hot buckets emit
      // (anchor, new) with anchor = min old member if any, else min new
      val naive = all.groupBy(_._1).values.flatMap { grp =>
        val ms = grp.map(_._2).distinct
        val news = ms.filter(newEls.contains)
        val olds = ms.filterNot(newEls.contains)
        if (ms.length <= cap)
          for (p <- news; q <- ms if p != q) yield (p, q)
        else {
          val anchor = if (olds.nonEmpty) olds.min else news.min
          news.filter(_ != anchor).map(q => (anchor, q))
        }
      }.toSet
      assert(got == naive, s"trial $trial cap $cap")
      // every emitted pair touches a new element; no old-old pair ever
      // re-verifies (append-only disjointness)
      got.foreach { case (p, q) =>
        assert(newEls.contains(p) || newEls.contains(q), s"old-old pair ($p,$q)")
      }
      // the driver-LOCAL kernel (IncrementalDedup's small dispatch) matches
      // the distributed one exactly on the same inputs
      val local = MinHashLSH.boundedProbePairsLocal(
        newRows.toArray, oldRows.toArray, cap).toSet
      assert(local == naive, s"trial $trial cap $cap (local kernel)")
      // and with old EMPTY it reproduces the batch bucket kernel's
      // candidate set up to orientation (the snap-0 dispatch path)
      val localAll = MinHashLSH.boundedProbePairsLocal(
          all.toArray, Array.empty, cap)
        .map { case (p, q) => (math.min(p, q), math.max(p, q)) }.toSet
      val batch = MinHashLSH.boundedBucketPairs(
          all.toDF("key", "e"), Seq("key"), cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .map { case (p, q) => (math.min(p, q), math.max(p, q)) }.toSet
      assert(localAll == batch, s"trial $trial cap $cap (snap0 orientation)")
    }
  }

  test("the aggregation state is O(1) per key: collect_set only runs below maxBucket") {
    import spark.implicits._
    // structural guarantee: the only per-key array aggregation in the plan
    // sits behind the cnt <= maxBucket filter, so its groups are bounded by
    // construction — assert the filter is upstream of the ObjectHashAggregate
    val rows = spark.range(1000).select((col("id") % 10).as("key"), col("id").as("e"))
    val plan = MinHashLSH.boundedBucketPairs(rows, Seq("key"), maxBucket = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("collect_set"), plan)
    // the branch feeding collect_set filters on cnt <= 4
    val aggIdx = plan.indexOf("collect_set")
    val filtered = plan.substring(aggIdx)
    assert(filtered.contains("<= 4") || plan.substring(0, aggIdx).contains("<= 4"), plan)
  }
}
