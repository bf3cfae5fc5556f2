package graft

import graft.dedup.ChunkDedup
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's golden unit vectors
  * (/root/reference/test/test_case_01..10.cpp, chunk_size=1, 8-byte inputs,
  * two checkpoints) — expected first-occurrence / shifted-duplicate REGION
  * counts for step 1, from FIXTURES.md §3 — plus randomized restart
  * roundtrips (test/tree_chkpt.cpp analogue).
  */
class ChunkDedupSpec extends AnyFunSuite with SparkTestBase {

  private def runCase(step0: String, step1: String): (Long, Long) = {
    val chain = new ChunkDedup.Chain(spark, step0.length.toLong)
    chain.checkpoint(ChunkDedup.chunkify(spark, step0, 1))
    val r = chain.checkpoint(ChunkDedup.chunkify(spark, step1, 1))
    // restart must reproduce both checkpoints byte-for-byte
    assert(restartString(chain, 0, step0.length) == step0)
    assert(restartString(chain, 1, step1.length) == step1)
    (r.numFirstOcur, r.numShiftDupl)
  }

  private def restartString(chain: ChunkDedup.Chain, cid: Int, n: Int): String = {
    val rows = chain.restart(cid).collect()
    assert(rows.length == n, s"restart($cid) produced ${rows.length}/$n chunks")
    rows.sortBy(_.getLong(0)).map(_.getString(1)).mkString
  }

  val goldenVectors = Seq(
    // (step0, step1, expected FO regions, expected SD regions, case id)
    ("ABCDEFGH", "IJKLMNOP", 1L, 0L, "01"),
    ("ABCDEFGH", "ABCDEFGH", 0L, 0L, "02"),
    ("ABCDEFGH", "ABCDEIJK", 2L, 0L, "03"),
    ("ABCDEFGH", "IJABCDEK", 2L, 3L, "04"),
    ("ABCDEFGH", "ABCIABCJ", 2L, 2L, "05"),
    ("ABCDEFGH", "EFGBCDIJ", 1L, 4L, "06"),
    ("ABCDEFGH", "IJKLABIH", 1L, 2L, "07"),
    ("MNXYOPQR", "IJXYIJAB", 2L, 1L, "08"),
    ("MNXYOPQR", "IJXYIJIB", 2L, 2L, "09"),
    ("MNXYOPQR", "IJXYIJJI", 1L, 3L, "10")
  )

  goldenVectors.foreach { case (s0, s1, fo, sd, id) =>
    test(s"golden vector $id: $s0 → $s1 ⇒ FO=$fo SD=$sd") {
      assert(runCase(s0, s1) == ((fo, sd)))
    }
  }

  test("referencedCheckpoints (F4 chkpts_needed): shift sources pruned to actual refs") {
    // case 04: all shifted regions source from checkpoint 0
    val c1 = new ChunkDedup.Chain(spark, 8L)
    c1.checkpoint(ChunkDedup.chunkify(spark, "ABCDEFGH", 1))
    val r1 = c1.checkpoint(ChunkDedup.chunkify(spark, "IJABCDEK", 1))
    assert(r1.referencedCheckpoints.collect().map(_.getInt(0)).toSet == Set(0))
    // case 10: shifted leaves source from in-checkpoint winners (chkpt 1)
    val c2 = new ChunkDedup.Chain(spark, 8L)
    c2.checkpoint(ChunkDedup.chunkify(spark, "MNXYOPQR", 1))
    val r2 = c2.checkpoint(ChunkDedup.chunkify(spark, "IJXYIJJI", 1))
    assert(r2.referencedCheckpoints.collect().map(_.getInt(0)).toSet == Set(1))
  }

  test("ragged (non-power-of-two) chunk counts roundtrip") {
    val step0 = "ABCDEFGHIJK" // 11 chunks
    val step1 = "ABCXYFGHIJK"
    val chain = new ChunkDedup.Chain(spark, 11L)
    chain.checkpoint(ChunkDedup.chunkify(spark, step0, 1))
    chain.checkpoint(ChunkDedup.chunkify(spark, step1, 1))
    assert(restartString(chain, 0, 11) == step0)
    assert(restartString(chain, 1, 11) == step1)
  }

  test("serial, local-sweep and distributed paths agree (labels, counts, shift sources, restart)") {
    // same inputs through all THREE execution paths ⇒ identical region
    // counts, per-leaf labels, shift metadata and restarts. The storeless
    // default is the serial driver path (Chain.SERIAL_MAX); serialMax = 0
    // forces the Spark fast path; localSweepMax = 0 on top forces the
    // per-level distributed sweep.
    def labelMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def shiftMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    for ((s0, s1, fo, sd, id) <- goldenVectors) {
      val variants = Seq(
        "serial" -> new ChunkDedup.Chain(spark, 8L),
        "localsweep" -> new ChunkDedup.Chain(spark, 8L, serialMax = 0L),
        "distributed" -> new ChunkDedup.Chain(spark, 8L,
          localSweepMax = 0L, serialMax = 0L))
      val rs = variants.map { case (name, chain) =>
        chain.checkpoint(ChunkDedup.chunkify(spark, s0, 1))
        val r = chain.checkpoint(ChunkDedup.chunkify(spark, s1, 1))
        assert((r.numFirstOcur, r.numShiftDupl) == ((fo, sd)), s"case $id ($name)")
        assert(restartString(chain, 1, 8) == s1, s"case $id ($name) restart")
        (name, r)
      }
      val (_, base) = rs.head
      for ((name, r) <- rs.tail) {
        assert(labelMap(r.labels) == labelMap(base.labels), s"case $id $name labels")
        assert(shiftMap(r.shiftLeafMap) == shiftMap(base.shiftLeafMap),
          s"case $id $name shift sources")
      }
      // region-size histograms (r5, reference STATS): serial and local-sweep
      // agree exactly; their per-label totals equal the region counts
      def hist(r: ChunkDedup.ChkptResult) =
        r.regionSizes.groupBy(identity).view.mapValues(_.size).toMap
      val serialR = rs(0)._2; val localR = rs(1)._2
      assert(hist(localR) == hist(serialR), s"case $id region-size histograms")
      for ((r, name) <- Seq((serialR, "serial"), (localR, "localsweep"))) {
        val byLabel = r.regionSizes.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        assert(byLabel.getOrElse(ChunkDedup.FIRST, 0L) == r.numFirstOcur,
          s"case $id $name FIRST root count vs histogram")
        assert(byLabel.getOrElse(ChunkDedup.SHIFT, 0L) == r.numShiftDupl,
          s"case $id $name SHIFT root count vs histogram")
      }
    }
  }

  test("cross-session restart: any checkpoint reconstructs from the store ALONE") {
    // the reference rebuilds any checkpoint from incremental FILES with no
    // in-memory chain state (restart_chkpt_files.cpp:171-195) — here: build
    // a chain against a SnapshotStore, drop the chain, reconstruct every
    // checkpoint via restartFromStore (reads only committed parquet)
    val root = java.nio.file.Files.createTempDirectory("graft_chunk_store").toString
    val store = new graft.state.SnapshotStore(spark, root)
    val rnd = new scala.util.Random(7)
    val n = 32
    val alphabet = "ABCDEFGH"
    var cur = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[String]
    locally {
      val chain = new ChunkDedup.Chain(spark, n.toLong, store = Some(store))
      for (step <- 0 until 4) {
        if (step > 0)
          for (i <- 0 until n if rnd.nextDouble() < 0.15)
            cur(i) = alphabet(rnd.nextInt(alphabet.length))
        val s = new String(cur)
        snapshots += s
        chain.checkpoint(ChunkDedup.chunkify(spark, s, 1))
      }
    } // chain out of scope: only the store survives
    val fresh = new graft.state.SnapshotStore(spark, root) // new handle, files only
    for (cid <- snapshots.indices) {
      // every restart below also re-verifies the committed full-buffer MD5
      // (restartFromStore requires it when present)
      assert(fresh.manifestJson("chunk_first", cid).contains("\"full_md5\""),
        s"checkpoint $cid manifest lacks the full-buffer digest")
      val rows = ChunkDedup.restartFromStore(spark, fresh, cid).collect()
      assert(rows.length == n, s"checkpoint $cid: ${rows.length}/$n chunks")
      val got = rows.sortBy(_.getLong(0)).map(_.getString(1)).mkString
      assert(got == snapshots(cid), s"checkpoint $cid mismatch")
    }
  }

  test("restart scan pruning: only REFERENCED checkpoints are read (F4 chkpts_needed)") {
    // A 6-checkpoint chain where checkpoint 5 is built ONLY from fresh
    // content and checkpoint-0 content: restartFromStore(5) must jump its
    // claim scan straight from 5 to 0 — the reference's chkpts_needed
    // pruning (list_approach.cpp:98-110) — never touching 4..1. The store's
    // read counter proves it: 5 reads (init + first/shift of 5 and of 0)
    // instead of 13 with an unpruned walk.
    val root = java.nio.file.Files.createTempDirectory("graft_chunk_prune").toString
    val store = new graft.state.SnapshotStore(spark, root)
    val n = 32
    def rep(s: String) = (s * (n / s.length + 1)).take(n)
    val steps = Seq( // disjoint alphabets ⇒ no FIXED fall-through at 5
      rep("abcdefgh"), rep("ijklmnop"), rep("qrstuvwx"), rep("01234567"),
      rep("ABCDEFGH"), rep("IJKLabcd")) // 5 = fresh I..L + cp0's a..d
    locally {
      val chain = new ChunkDedup.Chain(spark, n.toLong, store = Some(store))
      steps.foreach(s => chain.checkpoint(ChunkDedup.chunkify(spark, s, 1)))
    }
    val fresh = new graft.state.SnapshotStore(spark, root) // counter at 0
    val rows = ChunkDedup.restartFromStore(spark, fresh, 5).collect()
    assert(rows.length == n)
    assert(rows.sortBy(_.getLong(0)).map(_.getString(1)).mkString == steps(5))
    assert(fresh.readCount <= 6,
      s"restart read ${fresh.readCount} store snapshots — scan not pruned to refs")
  }

  test("thin distributed sweep matches the local path at 4096 chunks") {
    // big enough that frontier thinning matters (12 tree levels); both
    // paths must agree on region counts AND leaf labels
    val rnd = new scala.util.Random(11)
    val n = 4096
    val alphabet = "AB" // heavy duplication → deep coalescing forests
    def randStr() = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val s0 = randStr()
    val s1 = {
      val a = s0.toCharArray
      for (i <- 0 until n if rnd.nextDouble() < 0.05)
        a(i) = alphabet(rnd.nextInt(alphabet.length))
      new String(a)
    }
    val dist = new ChunkDedup.Chain(spark, n.toLong, localSweepMax = 0L)
    dist.checkpoint(ChunkDedup.chunkify(spark, s0, 1))
    val rd = dist.checkpoint(ChunkDedup.chunkify(spark, s1, 1))
    val loc = new ChunkDedup.Chain(spark, n.toLong)
    loc.checkpoint(ChunkDedup.chunkify(spark, s0, 1))
    val rl = loc.checkpoint(ChunkDedup.chunkify(spark, s1, 1))
    assert((rd.numFirstOcur, rd.numShiftDupl) == ((rl.numFirstOcur, rl.numShiftDupl)))
    val ld = rd.labels.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ll = rl.labels.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ld == ll)
  }

  test("subtreeLeafPositions: ragged heaps enumerate non-contiguous leaf positions left-to-right") {
    // n=5: leaves are nodes 4..8 (positions 0..4); node 1's subtree is
    // {3,4,7,8} with leaves {7,8,4} → positions {3,4,0}, and LEFT-TO-RIGHT
    // order is (3, 4, 0): the documented case where the reference's
    // contiguous-span arithmetic cannot describe a region
    assert(ChunkDedup.subtreeLeafPositions(1L, 5L).toSeq == Seq(3L, 4L, 0L))
    assert(ChunkDedup.subtreeLeafPositions(2L, 5L).toSeq == Seq(1L, 2L))
    assert(ChunkDedup.subtreeLeafPositions(0L, 5L).toSeq == Seq(3L, 4L, 0L, 1L, 2L))
    assert(ChunkDedup.subtreeLeafPositions(6L, 5L).toSeq == Seq(2L))
    // perfect tree: contiguous ascending
    assert(ChunkDedup.subtreeLeafPositions(1L, 4L).toSeq == Seq(0L, 1L))
    assert(ChunkDedup.subtreeLeafPositions(0L, 8L).toSeq == (0L until 8L))
  }

  test("region-compacted shift store: expansion covers exactly the shifted leaves, both sweep paths restart byte-identically, and regions actually compact") {
    // ragged n (not a power of two) + a 2-letter alphabet ⇒ deep coalescing
    // forests: the committed shift section must be one row per REGION root
    // (reference layout, tree_approach.cpp:593-622), restart must expand it
    // back to the exact shifted-leaf positions, and the local and thin-sweep
    // paths must commit stores that reconstruct identical bytes.
    val n = 96
    val rnd = new scala.util.Random(23)
    val alphabet = "AB"
    var cur = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
    val steps = scala.collection.mutable.ArrayBuffer.empty[String]
    for (step <- 0 until 3) {
      if (step > 0)
        for (i <- 0 until n if rnd.nextDouble() < 0.1)
          cur(i) = alphabet(rnd.nextInt(alphabet.length))
      steps += new String(cur)
    }
    def buildStore(sweepMax: Long): (graft.state.SnapshotStore, Seq[ChunkDedup.ChkptResult]) = {
      val root = java.nio.file.Files.createTempDirectory("graft_regions").toString
      val store = new graft.state.SnapshotStore(spark, root)
      val chain = new ChunkDedup.Chain(spark, n.toLong, localSweepMax = sweepMax,
        store = Some(store))
      val rs = steps.map(s => chain.checkpoint(ChunkDedup.chunkify(spark, s, 1)))
      (store, rs.toSeq)
    }
    val (localStore, localRs) = buildStore(Chain_localMax)
    val (distStore, _) = buildStore(0L)
    for (cid <- steps.indices) {
      // one committed row per region root (the compaction claim itself)
      assert(localStore.committedRows("chunk_shift", cid) ==
        localRs(cid).numShiftDupl, s"cid $cid region-row count")
      // expansion covers exactly the shifted leaf positions
      val expanded = ChunkDedup.expandShiftRegions(spark,
        localStore.read("chunk_shift", cid), n.toLong)
        .select("pos").collect().map(_.getLong(0)).sorted
      val perLeaf = localRs(cid).shiftLeafMap
        .select("pos").collect().map(_.getLong(0)).sorted
      assert(expanded.toSeq == perLeaf.toSeq, s"cid $cid expansion positions")
      // both execution paths' stores reconstruct the exact bytes
      for (store <- Seq(localStore, distStore)) {
        val got = ChunkDedup.restartFromStore(spark, store, cid).collect()
          .sortBy(_.getLong(0)).map(_.getString(1)).mkString
        assert(got == steps(cid), s"cid $cid restart bytes")
      }
    }
  }
  private val Chain_localMax = ChunkDedup.Chain.LOCAL_SWEEP_MAX

  test("randomized multi-checkpoint roundtrip (tree_chkpt analogue)") {
    val rnd = new scala.util.Random(1931) // reference generator seed
    val n = 64
    val alphabet = "ABCDEFGH"
    var cur = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
    val chain = new ChunkDedup.Chain(spark, n.toLong)
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[String]
    for (step <- 0 until 4) {
      if (step > 0) {
        // Sparse perturbation: flip ~10% of chunks; Swap: exchange two blocks
        for (i <- 0 until n if rnd.nextDouble() < 0.1)
          cur(i) = alphabet(rnd.nextInt(alphabet.length))
        val (b1, b2) = (rnd.nextInt(n / 16), rnd.nextInt(n / 16))
        val tmp = cur.slice(b1 * 16, b1 * 16 + 16)
        Array.copy(cur, b2 * 16, cur, b1 * 16, 16)
        Array.copy(tmp, 0, cur, b2 * 16, 16)
      }
      val s = new String(cur)
      snapshots += s
      chain.checkpoint(ChunkDedup.chunkify(spark, s, 1))
    }
    for (cid <- snapshots.indices)
      assert(restartString(chain, cid, n) == snapshots(cid), s"checkpoint $cid")
  }

  test("store-backed serial path: commits identical to the Spark path, jobs halved") {
    // r6: store-backed chains <= SERIAL_MAX take the serial driver path and
    // commit driver-built frames. Gate BOTH properties the promotion claims:
    // (a) the committed chunk_first/chunk_shift tables + manifest metadata
    // (num_chunks, full-buffer MD5) are identical to the forced Spark
    // path's, so restartFromStore is path-agnostic; (b) the serial path
    // runs at most HALF the Spark path's jobs per checkpoint (the ask's
    // measured bound; in practice ~3 vs ~18).
    val rnd = new scala.util.Random(13)
    val n = 64
    val alphabet = "ABCD"
    var cur = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
    val steps = (0 until 3).map { i =>
      if (i > 0) for (j <- 0 until n if rnd.nextDouble() < 0.2)
        cur(j) = alphabet(rnd.nextInt(alphabet.length))
      new String(cur)
    }
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCounter.incrementAndGet()
    }
    def run(serialMax: Long): (String, Seq[Int]) = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_serialstore_$serialMax").toString
      val store = new graft.state.SnapshotStore(spark, root)
      val chain = new ChunkDedup.Chain(spark, n.toLong,
        store = Some(store), serialMax = serialMax)
      val jobs = steps.map { s =>
        val chunks = ChunkDedup.chunkify(spark, s, 1)
        org.apache.spark.sql.graftx.Bridge.drainListenerBus(spark.sparkContext)
        val before = jobCounter.get()
        chain.checkpoint(chunks)
        org.apache.spark.sql.graftx.Bridge.drainListenerBus(spark.sparkContext)
        jobCounter.get() - before
      }
      (root, jobs)
    }
    spark.sparkContext.addSparkListener(listener)
    val ((serRoot, serJobs), (spkRoot, spkJobs)) =
      try (run(ChunkDedup.Chain.SERIAL_MAX), run(0L))
      finally spark.sparkContext.removeSparkListener(listener)

    val ser = new graft.state.SnapshotStore(spark, serRoot)
    val spk = new graft.state.SnapshotStore(spark, spkRoot)
    for (cid <- steps.indices) {
      def rows(st: graft.state.SnapshotStore, t: String) =
        st.read(t, cid).collect().map(_.toSeq).toSet
      assert(rows(ser, "chunk_first") == rows(spk, "chunk_first"),
        s"chunk_first $cid differs")
      assert(rows(ser, "chunk_shift") == rows(spk, "chunk_shift"),
        s"chunk_shift $cid differs")
      def meta(st: graft.state.SnapshotStore, k: String) =
        (s""""$k":\\s*"([^"]+)"""").r
          .findFirstMatchIn(st.manifestJson("chunk_first", cid)).map(_.group(1))
      for (k <- Seq("num_chunks", "full_md5"))
        assert(meta(ser, k).nonEmpty && meta(ser, k) == meta(spk, k),
          s"manifest $k $cid differs")
      // file-only restart over the serial-committed store
      val got = ChunkDedup.restartFromStore(spark, ser, cid).collect()
        .sortBy(_.getLong(0)).map(_.getString(1)).mkString
      assert(got == steps(cid), s"restart($cid) from serial store")
    }
    for (cid <- steps.indices)
      assert(serJobs(cid) * 2 <= spkJobs(cid),
        s"checkpoint $cid: serial path ran ${serJobs(cid)} jobs vs Spark " +
          s"path ${spkJobs(cid)} — not halved")
  }
}
