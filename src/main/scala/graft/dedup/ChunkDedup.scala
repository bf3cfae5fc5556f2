package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Reference-semantics incremental chunk deduplication — the Spark rebuild of
  * the reference's flagship Tree approach (/root/reference/src/tree_approach.cpp):
  *
  *   - chunks hashed with murmur3_x64_128 seed 0 (kokkos_murmur3.hpp:436);
  *   - per-checkpoint labels: FIXED_DUPL (same digest, same position vs the
  *     previous checkpoint, :326-327), FIRST_OCUR (new digest, lowest-position
  *     winner, atomic_min :337-343 ⇒ `min` aggregate here), SHIFT_DUPL (digest
  *     seen elsewhere, :344-348);
  *   - maximal-region coalescing over the implicit complete binary tree
  *     (2n-1 nodes, chunk j ↦ node n-1+j): first-occurrence forest bottom-up
  *     (:372-404), then duplicate forest (:413-477) — a parent coalesces two
  *     SHIFT children only when its combined digest already exists in the
  *     distinct map;
  *   - the distinct map (digest → first NodeID(chkpt, node)) is an Iceberg-
  *     style accumulating state table, NOT a hash table: insert-if-absent is
  *     a left-anti join + union (SURVEY.md §2.4 J1).
  *
  * Restart (tree_approach.cpp:713-1128) is the inverse: reconstruct any
  * checkpoint from stored first-occurrence bytes + shift metadata via joins
  * against prior reconstructions (§2.8: per-step left-anti fall-through).
  *
  * Scale note: the level sweep is O(log n) shuffles of geometrically
  * shrinking node sets; the distinct map is partitioned by digest and grows
  * with distinct content only. At web scale the per-leaf tables dominate and
  * partition freely; nothing is collected to the driver.
  */
object ChunkDedup {

  final val FIRST = "FIRST_OCUR"
  final val FIXED = "FIXED_DUPL"
  final val SHIFT = "SHIFT_DUPL"
  final val DONE = "DONE" // absorbed into a parent region

  case class ChkptResult(
      chkptId: Int,
      labels: DataFrame,      // (node, label) — per-LEAF classification
                              // (FIRST/FIXED/SHIFT, identical on both
                              // execution paths); region coalescing is
                              // reported via numFirstOcur/numShiftDupl
      numFirstOcur: Long,     // count of first-occurrence region roots
      numShiftDupl: Long,     // count of shifted-duplicate region roots
      firstLeaves: DataFrame, // (pos, chunk) bytes stored in the incremental chkpt
      shiftLeafMap: DataFrame, // (pos, src_chkpt, src_pos) duplicate metadata
      regionSizes: Seq[(String, Long)] = Nil // one (label, leaves-under-root)
                              // entry per region root — the reference's
                              // STATS histograms (tree_approach.cpp:229-256);
                              // filled on the serial and local-sweep paths,
                              // empty on the thin distributed sweep (whose
                              // region info is the regionsDf it commits)
  ) {
    /** Distinct prior checkpoints this incremental references — the
      * reference's `chkpts_needed` bitset (F4, list_approach.cpp:98-110)
      * as a `distinct` aggregate; drives restart-scan pruning.
      */
    def referencedCheckpoints: DataFrame =
      shiftLeafMap.select("src_chkpt").distinct()
  }

  @inline private def level(i: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(i + 1)

  /** Leaf POSITIONS under heap node `u` in left-to-right order. Correct for
    * ragged heaps (leaves occupy nodes nLeaves−1 .. 2·nLeaves−2 across up to
    * two levels; every internal node has both children).
    */
  private[graft] def subtreeLeafPositions(u: Long, nLeaves: Long): Array[Long] = {
    val leafBase = nLeaves - 1
    val out = Array.newBuilder[Long]
    val stack = new scala.collection.mutable.ArrayBuffer[Long]
    stack += u
    while (stack.nonEmpty) {
      val x = stack.remove(stack.length - 1)
      if (x >= leafBase) out += x - leafBase
      else { stack += 2 * x + 2; stack += 2 * x + 1 } // left popped first
    }
    out.result()
  }

  /** Expand region-compacted shift metadata (node, src_chkpt, src_node) —
    * one row per coalesced region root, the stored layout — into per-leaf
    * (pos, src_chkpt, src_pos) claims: the i-th leaf of a region sources
    * from the i-th leaf of its source subtree (equal digests ⇒ equal
    * shapes). Distributed: each region expands independently; output volume
    * is the claim count, which any restart must materialize anyway.
    */
  private[graft] def expandShiftRegions(spark: SparkSession, regions: DataFrame,
                                        nLeaves: Long): DataFrame = {
    import spark.implicits._
    regions.select(col("node"), col("src_chkpt").cast("int"), col("src_node"))
      .as[(Long, Int, Long)]
      .flatMap { case (u, sc, su) =>
        val cur = subtreeLeafPositions(u, nLeaves)
        val src = subtreeLeafPositions(su, nLeaves)
        require(cur.length == src.length,
          s"region $u -> $su leaf-count mismatch (${cur.length} vs ${src.length})")
        cur.iterator.zip(src.iterator).map { case (p, sp) => (p, sc, sp) }
      }
      .toDF("pos", "src_chkpt", "src_pos")
  }

  /** MD5 of the full checkpoint buffer (chunks concatenated in position
    * order) — the reference's whole-buffer restart digest
    * (restart_chkpt_files.cpp:104-108). One aggregation job; a full-buffer
    * hash is inherently sequential in ANY engine, so the sort+concat runs
    * inside one agg rather than pretending to parallelize.
    */
  private[graft] def fullBufferMd5(chunks: DataFrame): String =
    chunks.agg(md5(concat_ws("",
        array_sort(collect_list(struct(col("pos"), col("chunk"))))
          .getField("chunk")).cast("binary")))
      .head().getString(0)

  /** Split a text into fixed-size character chunks (ragged tail), one row per
    * chunk — the reference's P1 chunking (basic_approach.cpp:29-33).
    */
  def chunkify(spark: SparkSession, text: String, chunkSize: Int): DataFrame = {
    import spark.implicits._
    text.grouped(chunkSize).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("pos", "chunk")
  }

  /** Reconstruct checkpoint `cid` from a [[graft.state.SnapshotStore]] ALONE
    * — no in-session chain state; the reference's file-only restart
    * (tree_approach.cpp:713-1128, driver restart_chkpt_files.cpp:171-195).
    *
    * The newest→oldest loop (tree_approach.cpp:943): every position of
    * `cid` carries a (src_chkpt, src_pos) claim; per older checkpoint the
    * claims at that checkpoint either hit its first-occurrence bytes,
    * follow its shift indirection, or fall through FIXED to the previous
    * checkpoint at the same position (§2.8 left-anti semantics). Each round
    * is a few joins over narrow columns; rounds = chain length.
    */
  def restartFromStore(spark: SparkSession, store: graft.state.SnapshotStore,
                       cid: Int): DataFrame = {
    val numChunks =
      """"num_chunks":\s*"(\d+)"""".r
        .findFirstMatchIn(store.manifestJson("chunk_first", cid))
        .map(_.group(1).toLong)
        .getOrElse(sys.error("chunk_first manifest lacks num_chunks"))
    def first(c: Int): DataFrame = store.read("chunk_first", c)
    // the stored shift section is region-compacted — expand each region
    // root back to per-leaf (pos, src_chkpt, src_pos) claims
    def shift(c: Int): DataFrame =
      expandShiftRegions(spark, store.read("chunk_shift", c), numChunks)

    // initial claims: every position of cid sources from (cid, pos)
    var pending = spark.range(numChunks)
      .select(col("id").as("pos"), lit(cid).as("src_chkpt"), col("id").as("src_pos"))
    var resolved = first(cid).limit(0).select(col("pos"), col("chunk"))
    var cur = cid
    // chkpts_needed scan pruning (F4, list_approach.cpp:98-110): each round
    // jumps straight to the NEWEST checkpoint any pending claim still
    // references, so a restart touches only REFERENCED checkpoints — a
    // shift pointing at checkpoint 0 never drags the scan through the
    // unreferenced ones in between (ChunkDedupSpec counts store reads)
    while (cur >= 0) {
      val pCur = pending.filter(col("src_chkpt") === cur)
        .select(col("pos"), col("src_pos"))
      val f = first(cur).select(col("pos").as("src_pos"), col("chunk"))
      val sh = shift(cur).select(col("pos").as("src_pos"),
        col("src_chkpt").as("sc2"), col("src_pos").as("sp2"))
      val hit = pCur.join(f, Seq("src_pos")).select(col("pos"), col("chunk"))
      val redir = pCur.join(sh, Seq("src_pos")).select(col("pos"), col("sc2"), col("sp2"))
      // a same-checkpoint indirection targets a first-occurrence of cur
      val hit2 = redir.filter(col("sc2") === cur)
        .select(col("pos"), col("sp2").as("src_pos"))
        .join(f, Seq("src_pos")).select(col("pos"), col("chunk"))
      val redirOld = redir.filter(col("sc2") < cur)
        .select(col("pos"), col("sc2").as("src_chkpt"), col("sp2").as("src_pos"))
      // FIXED fall-through: same position, previous checkpoint
      val fall = pCur
        .join(f.select("src_pos"), Seq("src_pos"), "left_anti")
        .join(sh.select("src_pos"), Seq("src_pos"), "left_anti")
        .select(col("pos"), lit(cur - 1).as("src_chkpt"), col("src_pos"))
      // both accumulators need per-round lineage cuts: the loop otherwise
      // nests O(chain length) union+join subtrees in the final plan
      resolved = resolved.union(hit).union(hit2).localCheckpoint(true)
      pending = pending.filter(col("src_chkpt") =!= cur)
        .union(redirOld).union(fall)
        .localCheckpoint(true)
      // next referenced checkpoint (tiny agg over the checkpointed claims;
      // null ⇔ every claim resolved — the old isEmpty early termination)
      val nxt = pending.agg(max("src_chkpt")).head()
      cur = if (nxt.isNullAt(0)) -1 else nxt.getInt(0)
    }
    // completeness gate: an inconsistent or truncated store (a claim whose
    // first/shift row is missing, or pending claims left below chkpt 0)
    // must fail loudly, not return a silently-shorter reconstruction
    val out = resolved.select("pos", "chunk").localCheckpoint(true)
    val got = out.count()
    require(got == numChunks,
      s"restart($cid) resolved only $got of $numChunks positions — store is " +
        "inconsistent (missing first/shift rows or claims fell past chkpt 0)")
    // full-buffer digest verification (restart_chkpt_files.cpp:104-108):
    // the reconstruction's MD5 must equal the digest recorded at commit —
    // stronger than row counts, catches any content-level corruption
    for (expected <- """"full_md5":\s*"([0-9a-f]+)"""".r
        .findFirstMatchIn(store.manifestJson("chunk_first", cid)).map(_.group(1))) {
      val actual = fullBufferMd5(out)
      require(actual == expected,
        s"restart($cid) full-buffer md5 $actual != committed $expected")
    }
    out
  }

  object Chain {
    /** Checkpoints up to this many chunks use the in-memory forest sweep with
      * batched map probes; larger ones use the per-level DataFrame sweep.
      * Driver footprint at the bound (honest boxed arithmetic, the
      * IncrementalDedup.LOCAL_PROBE_MAX_CONTENTS convention): the sweep
      * collects the labeled leaves — Rows of (Long node, 16-B digest,
      * label) ≈ 100 B boxed — plus the SHIFT-leaf source triples, so 2²⁰
      * leaves ≈ 100–150 MB transient on the 8 g driver heap. Chunk CONTENT
      * is never collected (commits pull it distributed), which is what lets
      * this bound sit 16× above SERIAL_MAX.
      */
    final val LOCAL_SWEEP_MAX: Long = 1L << 20

    /** Chains up to this many chunks run fully serial on the driver (the
      * reference's own in-memory single-device mode): one collect per
      * checkpoint instead of ~18 eager toy-scale Spark jobs. Since r6 this
      * includes STORE-BACKED chains — the serial path commits the same
      * chunk_first/chunk_shift tables (driver-built frames, identical
      * schema + manifest metadata incl. the full-buffer MD5), so a
      * checkpoint costs 1 collect + 2 commit writes; commit/restart parity
      * with the forced Spark path is spec-gated alongside the three-way
      * label parity (serial / local-sweep / distributed). Driver footprint
      * at the bound: 2¹² chunks of content collected — the input buffer
      * itself, KBs to a few MB.
      */
    final val SERIAL_MAX: Long = 1L << 12

    /** Build the three uniform-label forests in memory. Returns the internal
      * nodes of (first, fixed, shift-candidate) forests as (node, digest).
      * Pure index arithmetic — correct for ragged heaps.
      */
    def localForests(leaves: Array[(Long, Array[Byte], String)])
      : (Vector[(Long, Array[Byte])], Vector[(Long, Array[Byte])], Vector[(Long, Array[Byte])]) = {
      def forest(label: String): Vector[(Long, Array[Byte])] = {
        val active = scala.collection.mutable.HashMap.empty[Long, Array[Byte]]
        leaves.foreach { case (n, d, l) => if (l == label) active(n) = d }
        val internals = Vector.newBuilder[(Long, Array[Byte])]
        // max-first order: children always pop before their parent could
        val queue = scala.collection.mutable.PriorityQueue.empty[Long]
        active.keys.foreach(queue.enqueue(_))
        while (queue.nonEmpty) {
          val n = queue.dequeue()
          if (n > 0 && active.contains(n)) {
            val sib = if (n % 2 == 1) n + 1 else n - 1
            if (active.contains(sib)) {
              val l = math.min(n, sib); val r = math.max(n, sib)
              val pd = graft.functions.Impl.murmur128Digest(active(l) ++ active(r))
              active.remove(l); active.remove(r)
              val p = (n - 1) / 2
              active(p) = pd
              internals += ((p, pd))
              queue.enqueue(p)
            }
          }
        }
        internals.result()
      }
      (forest(FIRST), forest(FIXED), forest(SHIFT))
    }

    /** One entry per region ROOT: (label, region size in leaves). A node is
      * a region root iff it is not absorbed by a coalescing parent
      * (FIRST/FIXED: parent in the forest; SHIFT: parent's digest present in
      * the distinct map). Region size = leaves under the root — the
      * reference's STATS region-size histograms
      * (tree_approach.cpp:229-256 `first/shift_region_sizes`).
      */
    def regionRootSizes(leaves: Array[(Long, Array[Byte], String)],
                        firstInt: Vector[(Long, Array[Byte])],
                        fixedInt: Vector[(Long, Array[Byte])],
                        shiftCand: Vector[(Long, Array[Byte])],
                        presentShift: Set[Long],
                        nLeaves: Long): Vector[(String, Long)] = {
      @inline def parent(n: Long): Long = (n - 1) / 2
      val firstSet = firstInt.map(_._1).toSet
      val fixedSet = fixedInt.map(_._1).toSet
      def roots(leafLabel: String, internals: Vector[(Long, Array[Byte])],
                inForest: Long => Boolean): Vector[(String, Long)] = {
        val leafRoots = leaves.iterator.collect {
          case (n, _, l) if l == leafLabel && (n == 0 || !inForest(parent(n))) =>
            (leafLabel, 1L)
        }.toVector
        val intRoots = internals.collect {
          case (n, _) if inForest(n) && (n == 0 || !inForest(parent(n))) =>
            (leafLabel, subtreeLeafPositions(n, nLeaves).length.toLong)
        }
        leafRoots ++ intRoots
      }
      roots(FIRST, firstInt, firstSet.contains) ++
        roots(FIXED, fixedInt, fixedSet.contains) ++
        roots(SHIFT, shiftCand, presentShift.contains)
    }

    /** Region-root counts per label (derived from [[regionRootSizes]] — one
      * source of truth for what a region root is).
      */
    def regionCounts(leaves: Array[(Long, Array[Byte], String)],
                     firstInt: Vector[(Long, Array[Byte])],
                     fixedInt: Vector[(Long, Array[Byte])],
                     shiftCand: Vector[(Long, Array[Byte])],
                     presentShift: Set[Long]): Map[String, Long] = {
      val nLeaves = leaves.length.toLong
      regionRootSizes(leaves, firstInt, fixedInt, shiftCand, presentShift,
        nLeaves)
        .groupBy(_._1).map { case (l, v) => l -> v.size.toLong }
    }
  }

  /** Stateful dedup over a chain of checkpoints (all with the same chunk
    * count, like the reference's fixed data_len). Not thread-safe.
    *
    * With a [[graft.state.SnapshotStore]] attached, each checkpoint's
    * incremental outputs (first-occurrence bytes + shift metadata — exactly
    * the reference's checkpoint file sections, tree_approach.cpp:593-622)
    * are committed durably, and [[ChunkDedup.restartFromStore]] reconstructs
    * ANY checkpoint in a fresh process from files alone
    * (restart_chkpt_files.cpp:171-195).
    */
  final class Chain(spark: SparkSession, numChunks: Long,
                    localSweepMax: Long = Chain.LOCAL_SWEEP_MAX,
                    store: Option[graft.state.SnapshotStore] = None,
                    serialMax: Long = Chain.SERIAL_MAX) {
    require(numChunks >= 1)
    private val nLeaves = numChunks
    private val leafBase = nLeaves - 1 // chunk j ↦ node leafBase + j
    private val maxLevel = level(2 * nLeaves - 2)

    /** digest → first occurrence (chkpt, node); accumulates across chkpts. */
    private var distinctMap: DataFrame = _
    /** previous checkpoint's leaves (node, digest) for the FIXED probe. */
    private var prevTree: DataFrame = _
    private var curId: Int = -1
    private val results = scala.collection.mutable.ArrayBuffer.empty[ChkptResult]
    /** accumulated reconstructions used by restart(): (chkpt, pos, chunk). */
    private var reconAll: DataFrame = _

    // serial-mode state (toy chains, store-backed or not: one driver map per
    // structure; commits go through driver-built frames — Chain.SERIAL_MAX)
    private val serialMode = numChunks <= serialMax
    private type SDigest = scala.collection.immutable.ArraySeq[Byte]
    private def skey(d: Array[Byte]): SDigest =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(d)
    private val sDistinct = scala.collection.mutable.LinkedHashMap.empty[SDigest, (Int, Long)]
    private var sPrev: Array[Array[Byte]] = _
    private val sRecon = scala.collection.mutable.ArrayBuffer.empty[Array[String]]

    def history: Seq[ChkptResult] = results.toSeq

    /** Process the next checkpoint; chunks = (pos: Long, chunk: String). */
    def checkpoint(chunks: DataFrame): ChkptResult =
      if (serialMode) serialCheckpoint(chunks) else sparkCheckpoint(chunks)

    /** Serial path: identical semantics, one collect, zero shuffles — the
      * reference's in-memory single-device execution. Region counting and
      * forest building REUSE the exact local kernels the Spark fast path
      * collects into (Chain.localForests / regionCounts), so the only
      * serial-specific logic is leaf labeling + the distinct-map probes.
      */
    private def serialCheckpoint(chunks: DataFrame): ChkptResult = {
      curId += 1
      val cid = curId
      val rows = chunks.select(col("pos"), col("chunk")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      require(rows.length == numChunks, s"expected $numChunks chunks, got ${rows.length}")
      // positions must be a permutation of 0..n-1 — a duplicated+missing pos
      // would pass the count check and silently mislabel (the distributed
      // path has the matching cardinality gate)
      for (i <- rows.indices)
        require(rows(i)._1 == i, s"chunk positions are not a permutation of " +
          s"0..${numChunks - 1}: index $i holds pos ${rows(i)._1}")
      val chunkStrs = rows.map(_._2)
      val digests = chunkStrs.map(s => graft.functions.Impl.murmur128Digest(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val n = numChunks.toInt

      // ---- leaf labeling (FIXED → global SHIFT → fresh election) ----------
      val labels = new Array[String](n)
      val srcOf = new Array[(Int, Long)](n) // per SHIFT leaf: (src_chkpt, src_node)
      val freshByDigest = scala.collection.mutable.LinkedHashMap
        .empty[SDigest, scala.collection.mutable.ArrayBuffer[Int]]
      for (pos <- 0 until n) {
        val d = skey(digests(pos))
        if (sPrev != null && java.util.Arrays.equals(sPrev(pos), digests(pos))) {
          labels(pos) = FIXED
        } else sDistinct.get(d) match {
          case Some(src) => labels(pos) = SHIFT; srcOf(pos) = src
          case None =>
            freshByDigest.getOrElseUpdate(d,
              scala.collection.mutable.ArrayBuffer.empty) += pos
        }
      }
      for ((d, positions) <- freshByDigest) {
        val win = positions.min // lowest node wins (J2 atomic_min)
        labels(win) = FIRST
        for (p <- positions if p != win) {
          labels(p) = SHIFT; srcOf(p) = (cid, leafBase + win)
        }
        sDistinct.put(d, (cid, leafBase + win)) // insert-if-absent: d is absent
      }

      // ---- forests + region counts (shared local kernels) ------------------
      val leafEntries = Array.tabulate(n)(pos =>
        ((leafBase + pos).toLong, digests(pos), labels(pos)))
      val (firstInt, fixedInt, shiftCand) = Chain.localForests(leafEntries)
      firstInt.foreach { case (node, d) =>
        val k = skey(d)
        if (!sDistinct.contains(k)) sDistinct.put(k, (cid, node))
      }
      // internal SHIFT candidates present in the map, WITH their map sources
      // (region roots inherit the map entry — same probe the Spark local
      // branch batches through shiftIntSrc)
      val shiftIntSrc: Map[Long, (Int, Long)] = shiftCand.iterator.flatMap {
        case (node, d) => sDistinct.get(skey(d)).map(node -> _)
      }.toMap
      val presentShift = shiftIntSrc.keySet
      val counts = Chain.regionCounts(leafEntries, firstInt, fixedInt,
        shiftCand, presentShift)

      // ---- outputs (tiny local DataFrames; no jobs until consumed) ---------
      import spark.implicits._
      val labelDf = (0 until n).map(p => ((leafBase + p).toLong, labels(p)))
        .toDF("node", "label")
      val firstDf = (0 until n).collect {
        case p if labels(p) == FIRST => (p.toLong, chunkStrs(p))
      }.toDF("pos", "chunk")
      val shiftDf = (0 until n).collect {
        case p if labels(p) == SHIFT =>
          (p.toLong, srcOf(p)._1, srcOf(p)._2 - leafBase)
      }.toDF("pos", "src_chkpt", "src_pos")

      val res = ChkptResult(cid, labelDf,
        counts.getOrElse(FIRST, 0L), counts.getOrElse(SHIFT, 0L),
        firstDf, shiftDf,
        Chain.regionRootSizes(leafEntries, firstInt, fixedInt, shiftCand,
          presentShift, numChunks))
      results += res

      // durable incremental checkpoint — the same two file sections, schema
      // and manifest metadata as the Spark path (restartFromStore is
      // path-agnostic): region-compacted shift table = SHIFT leaves + map-hit
      // internals whose parent is NOT itself a map-hit internal, each with
      // its source. Whole checkpoint = 1 input collect + 2 commit writes
      // instead of the Spark path's ~18 eager toy-scale jobs (parity +
      // job-count spec-gated).
      store.foreach { st =>
        @inline def parent(u: Long): Long = (u - 1) / 2
        val leafRegions = (0 until n).iterator.collect {
          case p if labels(p) == SHIFT => ((leafBase + p).toLong, srcOf(p))
        }.collect {
          case (u, (sc, sn)) if u == 0 || !presentShift.contains(parent(u)) =>
            (u, sc, sn)
        }
        val intRegions = shiftIntSrc.iterator.collect {
          case (u, (sc, sn)) if u == 0 || !presentShift.contains(parent(u)) =>
            (u, sc, sn)
        }
        if (!st.isCommitted("chunk_first", cid)) {
          // driver-side full-buffer MD5 — byte-identical to fullBufferMd5's
          // UTF-8 concat in position order
          val md = java.security.MessageDigest.getInstance("MD5")
          chunkStrs.foreach(c =>
            md.update(c.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          st.commit("chunk_first", cid, firstDf,
            Map("num_chunks" -> numChunks.toString,
              "full_md5" -> md.digest().map("%02x".format(_)).mkString))
        }
        st.commit("chunk_shift", cid,
          (leafRegions ++ intRegions).toSeq.toDF("node", "src_chkpt", "src_node"))
      }

      sRecon += chunkStrs
      sPrev = digests
      res
    }

    private def sparkCheckpoint(chunks: DataFrame): ChkptResult = {
      curId += 1
      val cid = curId
      val leaves = chunks
        .select((col("pos") + leafBase).as("node"), col("pos"),
          gf.murmur128(col("chunk")).as("digest"), col("chunk"))
        .localCheckpoint(true)

      // ---- leaf labeling ---------------------------------------------------
      val (fixedLeaves, restLeaves) =
        if (prevTree == null) {
          (leaves.limit(0), leaves)
        } else {
          val prev = prevTree.select(col("node"), col("digest").as("prev_digest"))
          val j = leaves.join(prev, Seq("node"), "left")
          (j.filter(col("prev_digest") === col("digest")).drop("prev_digest"),
            j.filter(col("prev_digest").isNull || col("prev_digest") =!= col("digest"))
              .drop("prev_digest"))
        }

      // global probe (J1): digest found → SHIFT with recorded source
      val probed = restLeaves.join(
        mapOrEmpty().select(col("digest"), col("src_chkpt"), col("src_node")),
        Seq("digest"), "left")
      val shiftedGlobal = probed.filter(col("src_chkpt").isNotNull)
      // new digests: lowest-node election (J2, atomic_min ⇒ min agg)
      val fresh = probed.filter(col("src_chkpt").isNull).drop("src_chkpt", "src_node")
      val winners = fresh.groupBy("digest").agg(min("node").as("win_node"))
      val freshTagged = fresh.join(winners, "digest")
      val firstLeavesDf = freshTagged.filter(col("node") === col("win_node"))
        .select("node", "pos", "digest", "chunk")
      val shiftedLocal = freshTagged.filter(col("node") =!= col("win_node"))
        .select(col("node"), col("pos"), col("digest"), col("chunk"),
          lit(cid).as("src_chkpt"), col("win_node").as("src_node"))

      // insert FIRST leaves into the distinct map (insert-if-absent)
      insertIntoMap(firstLeavesDf.select(col("digest"), lit(cid).as("src_chkpt"),
        col("node").as("src_node")))

      // state: (node, digest, label); leaf-level sources kept aside
      val st = firstLeavesDf.select(col("node"), col("digest"), lit(FIRST).as("label"))
        .union(fixedLeaves.select(col("node"), col("digest"), lit(FIXED).as("label")))
        .union(shiftedGlobal.select(col("node"), col("digest"), lit(SHIFT).as("label")))
        .union(shiftedLocal.select(col("node"), col("digest"), lit(SHIFT).as("label")))
        .localCheckpoint(true)
      // SHIFT leaves with their sources — the shift sweep's frontier (region
      // compaction needs each region ROOT's source, so sources ride along).
      // Plan only — materialized by the paths that consume it.
      def shiftLeaves: DataFrame = shiftedGlobal
        .select(col("node"), col("digest"), col("src_chkpt").cast("int").as("src_chkpt"),
          col("src_node"))
        .union(shiftedLocal.select(col("node"), col("digest"),
          col("src_chkpt").cast("int").as("src_chkpt"), col("src_node")))
      // leaf-level labels are the public per-chunk classification — captured
      // BEFORE the sweeps so both execution paths emit identical labels (the
      // sweeps absorb nodes into regions, which only the counts report)
      val leafLabels = st.select("node", "label")

      // ---- bottom-up sweeps -------------------------------------------------
      // Reference order preserved exactly: the FIRST forest is fully built
      // (all levels, parents inserted into the map, tree_approach.cpp:372-404)
      // BEFORE the duplicate forest probes it (:413-477). Sweeping per label
      // also keeps ragged trees correct: equal-height subtrees can sit on
      // different heap levels when n is not a power of two.

      /** One full bottom-up sweep coalescing same-label sibling pairs —
        * THIN: only the live frontier of this label is ever materialized
        * (absorbed children drop out, unpaired nodes retire to a small
        * root accumulator), so total materialized volume is O(label leaves)
        * instead of O(all nodes · log n).
        * @param accept parents → subset that actually coalesces
        * @param onParents side effect before absorption (map insertion)
        * @return number of region roots for this label
        */
      def thinSweep(label: String,
                    accept: DataFrame => DataFrame,
                    onParents: DataFrame => Unit): Long = {
        var frontier = st.filter(col("label") === label)
          .select(col("node"), col("digest")).localCheckpoint(true)
        var rootsAcc = frontier.select(col("node")).limit(0)
        var l = maxLevel - 1
        while (l >= 0) {
          // exact integer level (bin-string width): floor(log2(…)) on
          // doubles mis-rounds near 2^k for node ids ≥ ~2^48
          val withLvl = frontier
            .withColumn("lvl", (length(bin(col("node") + 1)) - 1).cast("int"))
          val lvlNodes = withLvl.filter(col("lvl") === l + 1).drop("lvl")
          val rest = withLvl.filter(col("lvl") =!= l + 1).drop("lvl")
          val paired = lvlNodes
            .withColumn("parent", ((col("node") - 1) / 2).cast("long"))
            .withColumn("is_left", (col("node") % 2) === 1)
            .groupBy("parent").agg(
              count(lit(1)).as("cnt"),
              max(when(col("is_left"), col("digest"))).as("dl"),
              max(when(!col("is_left"), col("digest"))).as("dr"))
            .filter(col("cnt") === 2)
            .select(col("parent").as("node"),
              gf.murmur128(concat(col("dl"), col("dr"))).as("digest"))
          val parents = accept(paired).select(col("node"), col("digest"))
            .localCheckpoint(true)
          onParents(parents)
          val absorbed = parents.select((col("node") * 2 + 1).as("node"))
            .union(parents.select((col("node") * 2 + 2).as("node")))
          // nodes of this level that were NOT absorbed are region roots
          val unpaired = lvlNodes.join(absorbed, Seq("node"), "left_anti")
          rootsAcc = rootsAcc.union(unpaired.select("node"))
          frontier = rest.union(parents).localCheckpoint(true)
          l -= 1
        }
        // anything left (level-0 root, single-leaf trees) is a region root
        rootsAcc.count() + frontier.count()
      }

      /** SHIFT sweep carrying SOURCES: like thinSweep, but frontier rows are
        * (node, digest, src_chkpt, src_node); a parent coalesces two SHIFT
        * children iff its combined digest is in the distinct map, and it
        * inherits THAT MAP ENTRY as its source. Returns the shift REGION
        * table (node, src_chkpt, src_node) — one row per region root, the
        * reference's compacted metadata (tree_approach.cpp:593-622).
        */
      def thinSweepShift(): DataFrame = {
        val srcCols = Seq(col("node"), col("src_chkpt"), col("src_node"))
        var frontier = shiftLeaves.localCheckpoint(true)
        var rootsAcc = frontier.select(srcCols: _*).limit(0)
        var l = maxLevel - 1
        while (l >= 0) {
          // exact integer level (bin-string width): floor(log2(…)) on
          // doubles mis-rounds near 2^k for node ids ≥ ~2^48
          val withLvl = frontier
            .withColumn("lvl", (length(bin(col("node") + 1)) - 1).cast("int"))
          val lvlNodes = withLvl.filter(col("lvl") === l + 1).drop("lvl")
          val rest = withLvl.filter(col("lvl") =!= l + 1).drop("lvl")
          val paired = lvlNodes
            .withColumn("parent", ((col("node") - 1) / 2).cast("long"))
            .withColumn("is_left", (col("node") % 2) === 1)
            .groupBy("parent").agg(
              count(lit(1)).as("cnt"),
              max(when(col("is_left"), col("digest"))).as("dl"),
              max(when(!col("is_left"), col("digest"))).as("dr"))
            .filter(col("cnt") === 2)
            .select(col("parent").as("node"),
              gf.murmur128(concat(col("dl"), col("dr"))).as("digest"))
          val parents = paired
            .join(mapOrEmpty(), Seq("digest")) // present in map ⇒ coalesce + src
            .select(col("node"), col("digest"),
              col("src_chkpt").cast("int").as("src_chkpt"), col("src_node"))
            .localCheckpoint(true)
          val absorbed = parents.select((col("node") * 2 + 1).as("node"))
            .union(parents.select((col("node") * 2 + 2).as("node")))
          val unpaired = lvlNodes.join(absorbed, Seq("node"), "left_anti")
          rootsAcc = rootsAcc.union(unpaired.select(srcCols: _*))
          frontier = rest.union(parents).localCheckpoint(true)
          l -= 1
        }
        rootsAcc.union(frontier.select(srcCols: _*)).localCheckpoint(true)
      }

      // shiftRegions: Some(region table) when it will be committed or when
      // the distributed sweep produced it anyway; None on the storeless
      // local fast path (golden harnesses skip the extra collect)
      val (counts, shiftRegions, regionSizes) =
        if (nLeaves <= localSweepMax) {
          // ---- fast path: in-memory sweeps, batched map probes -------------
          // The forests are a per-checkpoint tree computation; only the
          // distinct-map interactions are global. Collect the labeled leaves
          // (≤ 2²⁰ × 16 B), build all three forests locally, then do ONE
          // batched map insert (FIRST internals) and ONE batched probe (SHIFT
          // internal candidates) — 3 Spark jobs instead of 3·log n shuffles.
          val leafEntries = st.collect().map(r =>
            (r.getLong(0), r.getAs[Array[Byte]](1), r.getString(2)))
          val (firstInt, fixedInt, shiftCand) = Chain.localForests(leafEntries)

          // reference order: full first forest inserted before dup probing
          if (firstInt.nonEmpty) {
            import spark.implicits._
            insertIntoMap(firstInt.toSeq.toDF("node", "digest")
              .select(col("digest"), lit(cid).as("src_chkpt"), col("node").as("src_node")))
          }
          // batched probe WITH sources (region roots need them)
          val shiftIntSrc: Map[Long, (Int, Long)] =
            if (shiftCand.isEmpty) Map.empty
            else {
              import spark.implicits._
              shiftCand.toSeq.toDF("node", "digest")
                .join(mapOrEmpty(), Seq("digest"))
                .select("node", "src_chkpt", "src_node").collect()
                .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
            }
          val presentShift = shiftIntSrc.keySet
          // region table only when a store will commit it — storeless chains
          // (golden harnesses) skip the extra leaf-source collect
          val regionsDf: Option[DataFrame] =
            if (store.isEmpty) None
            else Some {
              @inline def parent(u: Long): Long = (u - 1) / 2
              val leafSrc = shiftLeaves
                .select("node", "src_chkpt", "src_node").collect()
                .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
              val regionRows =
                leafSrc.iterator.filter { case (u, _, _) =>
                  u == 0 || !presentShift.contains(parent(u))
                } ++
                shiftIntSrc.iterator.collect {
                  case (u, (sc, sn)) if u == 0 || !presentShift.contains(parent(u)) =>
                    (u, sc, sn)
                }
              import spark.implicits._
              regionRows.toSeq.toDF("node", "src_chkpt", "src_node")
            }
          (Chain.regionCounts(leafEntries, firstInt, fixedInt, shiftCand, presentShift),
            regionsDf,
            Chain.regionRootSizes(leafEntries, firstInt, fixedInt, shiftCand,
              presentShift, numChunks))
        } else {
          // ---- distributed path: per-level THIN sweeps ----------------------
          // log₂(n) shuffles of geometrically shrinking live frontiers; total
          // materialized volume is O(leaves), not O(nodes · log n). Used when
          // one checkpoint's chunk count exceeds driver-collectable size.
          val fo = thinSweep(FIRST, identity, parents =>
            insertIntoMap(parents.select(col("digest"), lit(cid).as("src_chkpt"),
              col("node").as("src_node"))))
          val fx = thinSweep(FIXED, identity, _ => ())
          val regionsDf = thinSweepShift()
          (Map(FIRST -> fo, FIXED -> fx, SHIFT -> regionsDf.count()),
            Some(regionsDf), Nil)
        }

      // ---- outputs ----------------------------------------------------------
      val shiftLeafMap = shiftedGlobal.select(col("pos"), col("src_chkpt"),
          (col("src_node") - leafBase).as("src_pos"))
        .union(shiftedLocal.select(col("pos"), col("src_chkpt"),
          (col("src_node") - leafBase).as("src_pos")))
        .localCheckpoint(true)
      val storedFirst = firstLeavesDf.select(col("pos"), col("chunk")).localCheckpoint(true)

      val res = ChkptResult(
        chkptId = cid,
        labels = leafLabels,
        numFirstOcur = counts.getOrElse(FIRST, 0L),
        numShiftDupl = counts.getOrElse(SHIFT, 0L),
        firstLeaves = storedFirst,
        shiftLeafMap = shiftLeafMap,
        regionSizes = regionSizes)
      results += res

      // durable incremental checkpoint: the two file sections restart needs.
      // The shift section is REGION-COMPACTED exactly like the reference's
      // (one entry per coalesced region root + its source NodeID,
      // tree_approach.cpp:593-622): the committed metadata volume is
      // O(regions), not O(shifted leaves). Ragged heaps are handled without
      // the reference's contiguous-span arithmetic (kokkos_merkle_tree.hpp:
      // 102-142, which assumes aligned subtrees): restart re-enumerates each
      // region's leaf POSITIONS by walking the subtree left-to-right
      // (subtreeLeafPositions) — positions need not be contiguous (n=5:
      // subtree(1) covers {0,3,4}) and the i-th leaf of the region maps to
      // the i-th leaf of its source subtree (equal digests ⇒ equal shapes).
      // The in-memory per-leaf shiftLeafMap remains the public API.
      store.foreach { st =>
        // the digest is computed ONLY when this commit will actually happen:
        // a resume over an already-committed checkpoint must not re-funnel
        // the whole buffer through the single-task digest aggregation
        // (commit() itself is a no-op then)
        if (!st.isCommitted("chunk_first", cid))
          st.commit("chunk_first", cid, storedFirst,
            Map("num_chunks" -> numChunks.toString,
              // full-buffer MD5 of the checkpoint content (reference:
              // restart_chkpt_files.cpp:104-108 hashes the restarted buffer
              // and compares) — restartFromStore recomputes and verifies.
              // Inherently sequential in any engine (ChunkDedup.fullBufferMd5
              // scaladoc); a 10⁸-chunk store-backed checkpoint should prefer
              // a Merkle-style digest — the per-leaf murmur128 tree above IS
              // that digest, so the full-buffer MD5 stays a reference-fidelity
              // extra, not the scale path.
              "full_md5" -> fullBufferMd5(chunks)))
        st.commit("chunk_shift", cid, shiftRegions.get)
      }

      // reconstruct this checkpoint into reconAll (restart support)
      val recon = reconstructCurrent(cid, storedFirst, shiftLeafMap)
      reconAll = (if (reconAll == null) recon else reconAll.union(recon)).localCheckpoint(true)

      // the FIXED probe only ever compares leaves at equal positions
      // (tree_approach.cpp:326-327); FIXED parents re-derive bottom-up.
      prevTree = leaves.select(col("node"), col("digest")).localCheckpoint(true)
      res
    }

    /** Rebuild checkpoint `cid` from ONLY incremental outputs + prior recons. */
    private def reconstructCurrent(cid: Int, storedFirst: DataFrame,
                                   shiftLeafMap: DataFrame): DataFrame = {
      val first = storedFirst.select(lit(cid).as("chkpt"), col("pos"), col("chunk"))
      val shifted =
        if (reconAll == null) shiftLeafMap // chkpt 0: may self-reference
          .join(storedFirst.select(col("pos").as("src_pos"), col("chunk")), Seq("src_pos"))
          .select(lit(cid).as("chkpt"), col("pos"), col("chunk"))
        else {
          val selfSrc = shiftLeafMap.filter(col("src_chkpt") === cid)
            .join(storedFirst.select(col("pos").as("src_pos"), col("chunk")), Seq("src_pos"))
            .select(lit(cid).as("chkpt"), col("pos"), col("chunk"))
          val priorSrc = shiftLeafMap.filter(col("src_chkpt") =!= cid)
            .join(reconAll.select(col("chkpt").as("src_chkpt"), col("pos").as("src_pos"),
              col("chunk")), Seq("src_chkpt", "src_pos"))
            .select(lit(cid).as("chkpt"), col("pos"), col("chunk"))
          selfSrc.union(priorSrc)
        }
      val explicitPos = first.select("pos").union(shifted.select("pos"))
      val fixed =
        if (reconAll == null) first.limit(0)
        else reconAll.filter(col("chkpt") === cid - 1)
          .join(explicitPos, Seq("pos"), "left_anti")
          .select(lit(cid).as("chkpt"), col("pos"), col("chunk"))
      first.union(shifted).union(fixed)
    }

    /** Restart: full chunk content of checkpoint `cid` (pos, chunk). */
    def restart(cid: Int): DataFrame =
      if (serialMode) {
        import spark.implicits._
        sRecon(cid).zipWithIndex.map { case (c, p) => (p.toLong, c) }
          .toSeq.toDF("pos", "chunk")
      } else reconAll.filter(col("chkpt") === cid).select("pos", "chunk")

    private def mapOrEmpty(): DataFrame =
      if (distinctMap == null) {
        import spark.implicits._
        Seq.empty[(Array[Byte], Int, Long)].toDF("digest", "src_chkpt", "src_node")
      } else distinctMap

    private def insertIntoMap(entries: DataFrame): Unit = {
      val newOnes = entries.join(mapOrEmpty().select("digest"), Seq("digest"), "left_anti")
        // within-batch first-wins (lowest node)
        .groupBy("digest").agg(min(struct(col("src_chkpt"), col("src_node"))).as("s"))
        .select(col("digest"), col("s.src_chkpt").as("src_chkpt"),
          col("s.src_node").as("src_node"))
      distinctMap = (if (distinctMap == null) newOnes else distinctMap.union(newOnes))
        .localCheckpoint(true)
    }
  }
}
