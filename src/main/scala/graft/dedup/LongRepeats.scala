package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.gf

/** Exact long-repeat detection — the engine's analogue of the reference's
  * maximal duplicated regions (Merkle forest, tree_approach.cpp:413-477),
  * re-expressed for variable-length text per the north_star's "suffix-array
  * substring pass for exact long-repeat detection".
  *
  * Two candidate generators feed ONE verify+extend expression:
  *
  *   - **winnowing** (Schleimer et al.): per-doc fingerprints, grouped by
  *     hash — detects EVERY repeat of length ≥ gram+window−1 across the whole
  *     corpus regardless of partitioning (one narrow shuffle of (hash, doc,
  *     pos) triples). This is the scale path: fingerprints are ~2/window of
  *     gram positions.
  *   - **per-partition suffix array** (prefix doubling + Kasai LCP): exact
  *     within a partition with no length slack; used where documents are
  *     co-partitioned (e.g. by host) and for in-doc repeats.
  *
  * Verification extends each anchor to its MAXIMAL span; anchors inside the
  * same repeat extend to the identical span, so `distinct` replaces interval
  * merging. Output rows: (a, b, a_start, b_start, length) with
  * (a, a_start) < (b, b_start) lexicographically.
  */
object LongRepeats {

  /** Lowercased text per doc (positions must refer to one concrete string,
    * shared by candidate generators and the extend verifier; char-level
    * repeats keep raw whitespace — no regex normalization on the hot path).
    */
  private def norm(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), lower(col(textCol)).as("t"))

  /** Per-doc winnowing fingerprints (h, doc_id, pos) over a (doc_id, t)
    * frame — the ONE corpus pass the repeat detector, the decontamination
    * probe and any gate slice all consume (per-doc fingerprints are
    * independent, so a shared materialized frame filters exactly).
    */
  def winnowFingerprints(normDocs: DataFrame, gram: Int, window: Int): DataFrame =
    normDocs
      .select(col("doc_id"), explode(gf.winnow(col("t"), gram, window)).as("f"))
      .select(col("f.hash").as("h"), col("doc_id"), col("f.pos").as("pos"))

  /** Winnowing candidates: (a, pa, b, pb). Hot fingerprints (ubiquitous
    * boilerplate grams) emit star pairs beyond `maxBucket` — linear, not
    * quadratic, in bucket size.
    */
  def winnowCandidates(normDocs: DataFrame, gram: Int, window: Int,
                       maxBucket: Int): DataFrame =
    winnowCandidatesFromFps(winnowFingerprints(normDocs, gram, window), maxBucket)

  /** Candidates from a (possibly shared/materialized) fingerprint frame. */
  def winnowCandidatesFromFps(fps: DataFrame, maxBucket: Int): DataFrame =
    // bounded kernel: hot fingerprints (ubiquitous boilerplate grams) emit
    // star pairs from a streaming pass — linear, and never a per-key buffer
    MinHashLSH.boundedBucketPairs(
        fps.select(col("h"),
          struct(col("doc_id"), col("pos").as("pos")).as("e")),
        Seq("h"), maxBucket)
      .select(col("p.doc_id").as("a"), col("p.pos").as("pa"),
        col("q.doc_id").as("b"), col("q.pos").as("pb"))

  /** How many suffixes of one lcp-run pair up exhaustively; larger runs fall
    * back to star pairs against the run head (the maxBucket analogue — a
    * degenerate 'aaaa…' flood stays linear). Runs are occurrence counts of
    * ONE repeated span inside one segment, normally tiny.
    */
  final val RUN_CAP = 512

  /** SA candidate pairs within one concatenated segment: one LEFT-MAXIMAL
    * anchor per occurrence PAIR with common prefix ≥ minLen. Pairs come from
    * maximal lcp ≥ minLen RUNS of the suffix array (every suffix pair inside
    * a run shares ≥ minLen), not just SA-adjacent entries — m occurrences of
    * one span yield the full C(m,2) pair set, the same all-pairs contract as
    * the winnowing pass and the LCE oracle. Left-maximality (preceding bytes
    * differ, or a doc boundary / 0x00 separator) keeps exactly one anchor
    * per pair-span: interior offsets of a span have equal preceding bytes.
    * A preceding 0x00 separator is a region START, not a shared byte: two
    * doc-start-aligned suffixes are both preceded by separators (which
    * compare equal) yet cannot extend left — dropping them would silently
    * miss doc-start repeats (e.g. shared boilerplate headers).
    */
  private def segmentPairs(docs: Array[(Long, Array[Byte])], minLen: Int,
                           cappedRuns: org.apache.spark.util.LongAccumulator)
    : Iterator[Row] = {
    // concatenate with 0x00 separators (absent from normalized text)
    val total = docs.map(_._2.length).sum + docs.length
    val buf = new Array[Byte](total)
    val bounds = new Array[(Long, Int, Int)](docs.length) // (doc, start, end)
    var off = 0
    for (i <- docs.indices) {
      val (id, bytes) = docs(i)
      System.arraycopy(bytes, 0, buf, off, bytes.length)
      bounds(i) = (id, off, off + bytes.length)
      off += bytes.length
      buf(off) = 0; off += 1
    }
    def locate(p: Int): (Long, Int) = {
      // binary search over bounds
      var lo = 0; var hi = bounds.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (bounds(mid)._2 <= p) lo = mid else hi = mid - 1
      }
      (bounds(lo)._1, p - bounds(lo)._2)
    }
    val sa = SuffixArray.build(buf)
    val lcp = SuffixArray.kasai(buf, sa)
    // lcp may cross a separator only if one suffix starts with it — the
    // separator byte 0 sorts first and never equals text bytes, so a common
    // prefix of length >= minLen cannot contain it.
    @inline def leftMaximalPair(x: Int, y: Int): Boolean =
      x == 0 || y == 0 || buf(x - 1) == 0 || buf(y - 1) == 0 ||
        buf(x - 1) != buf(y - 1)
    def emit(x: Int, y: Int): Option[Row] = {
      val (d1, p1) = locate(x)
      val (d2, p2) = locate(y)
      if (d1 != d2 || p1 != p2) {
        val ((aa, pa), (bb, pb)) =
          if (d1 < d2 || (d1 == d2 && p1 <= p2)) ((d1, p1), (d2, p2))
          else ((d2, p2), (d1, p1))
        Some(Row(aa, pa, bb, pb))
      } else None
    }
    // maximal runs: [s, e] with every lcp in [s, e-1] >= minLen
    var i = 0
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    while (i < lcp.length) {
      if (lcp(i) >= minLen) {
        var e = i
        while (e < lcp.length && lcp(e) >= minLen) e += 1
        // suffixes sa(i..e) form the run
        val runEnd = e
        val size = runEnd - i + 1
        if (size <= RUN_CAP) {
          var p = i
          while (p <= runEnd) {
            var q = p + 1
            while (q <= runEnd) {
              if (leftMaximalPair(sa(p), sa(q))) rows ++= emit(sa(p), sa(q))
              q += 1
            }
            p += 1
          }
        } else { // degenerate run: star pairs against the run head
          cappedRuns.add(1) // visible: star fallback diverges from the
                            // all-pairs C(m,2) contract (callers warn loudly)
          var q = i + 1
          while (q <= runEnd) {
            if (leftMaximalPair(sa(i), sa(q))) rows ++= emit(sa(i), sa(q))
            q += 1
          }
        }
        i = runEnd
      } else i += 1
    }
    rows.iterator
  }

  /** Pack docs into ≤ MAX_N-byte segments (cross-segment repeats are the
    * winnowing pass's job); oversized docs are skipped.
    */
  private def segmented(all: Array[(Long, Array[Byte])])
    : Iterator[Array[(Long, Array[Byte])]] = {
    val segments = scala.collection.mutable.ArrayBuffer.empty[Array[(Long, Array[Byte])]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var curBytes = 0L
    for (d <- all if d._2.length + 1 < SuffixArray.MAX_N) {
      if (curBytes + d._2.length + 1 > SuffixArray.MAX_N && cur.nonEmpty) {
        segments += cur.toArray; cur = scala.collection.mutable.ArrayBuffer.empty
        curBytes = 0L
      }
      cur += d; curBytes += d._2.length + 1
    }
    if (cur.nonEmpty) segments += cur.toArray
    segments.iterator
  }

  private val candidateSchema = StructType(Seq(
    StructField("a", LongType, false), StructField("pa", IntegerType, false),
    StructField("b", LongType, false), StructField("pb", IntegerType, false)))

  /** Suffix-array candidates within each partition: run pairs with LCP ≥
    * minLen spanning different docs (or different positions of one doc).
    * Exact for co-partitioned docs; O(n log² n) per partition.
    */
  def suffixArrayCandidates(normDocs: DataFrame, minLen: Int): DataFrame =
    suffixArrayCandidatesAcc(normDocs, minLen)._1

  private def suffixArrayCandidatesAcc(normDocs: DataFrame, minLen: Int)
    : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val spark = normDocs.sparkSession
    val acc = cappedRunsAcc(spark)
    val rdd = normDocs.select("doc_id", "t").rdd.mapPartitions { it =>
      val all = it.map(r => (r.getLong(0), r.getString(1)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))).toArray
      segmented(all).flatMap(docs => segmentPairs(docs, minLen, acc))
    }
    (spark.createDataFrame(rdd, candidateSchema), acc)
  }

  /** Per-session accumulator counting lcp-runs that exceeded RUN_CAP and fell
    * back to star pairs (diverging from the all-pairs contract — e.g. the
    * pages_sa_repeats LCE oracle). Checked after every eager SA pass below;
    * a nonzero count warns LOUDLY instead of silently under-emitting,
    * mirroring how simhash_ball_gate raises maxBucket.
    */
  private def cappedRunsAcc(spark: SparkSession) =
    spark.sparkContext.longAccumulator("graft.longrepeats.capped_runs")

  private def warnIfCapped(acc: org.apache.spark.util.LongAccumulator): Unit =
    if (acc.value > 0)
      System.err.println(s"[graft] WARNING: ${acc.value} suffix-array lcp " +
        s"run(s) exceeded RUN_CAP=$RUN_CAP and emitted star pairs only — " +
        "output diverges from the all-pairs C(m,2) contract (an LCE oracle " +
        "over this output will see missing pairs)")

  /** Verify + extend candidates to maximal spans ≥ minLen.
    *
    * Texts ship ONCE per doc PAIR, not once per anchor: anchors of one pair
    * (a near-dup pair carries one every ~window positions — 50×+ redundancy
    * vs distinct spans) are set-aggregated first, the two texts join against
    * the pair row, and the anchors explode AFTER the join inside the same
    * stage. At sf0.1 this turns an ~8 GB two-join text shuffle (3.4M anchor
    * rows × two ~2.5 KB texts) into ~1 GB (distinct pairs only). Per-pair
    * anchor lists are bounded by the per-doc fingerprint count
    * (~2·len/window), never by corpus size.
    */
  def verifyAndExtend(normDocs: DataFrame, candidates: DataFrame,
                      gram: Int, minLen: Int): DataFrame = {
    // ---- diagonal chain-collapse: one anchor per (pair, diagonal, span) ----
    // All anchors of ONE maximal span lie on one diagonal (pa − pb constant)
    // with consecutive gaps < gram: winnowing selects a shared fingerprint at
    // the same relative offset at least every `window` < gram positions
    // inside the span; the SA generator emits one left-maximal anchor per
    // span to begin with. Conversely two same-diagonal anchors closer than
    // `gram` MUST belong to the same span — their gram-length matches
    // overlap, so the union region matches contiguously and extendMatch
    // yields the identical maximal span from either. Keeping only chain
    // HEADS (first anchor of each ≥gram-gapped chain) therefore preserves
    // the exact span set while cutting extendMatch evaluations by the
    // anchor redundancy (~2·len/window per near-dup pair ⇒ 30–50× at sf0.1)
    // and shrinking the per-pair anchor lists the next aggregation buffers.
    // lag() runs in a sort-based window — spillable, no hash-agg buffer of
    // 10⁶ structs (the r4 bench's memory-pressure amplifier).
    // (Masking caveat: a chain head whose gram is a HASH-collision false
    // anchor could suppress a real anchor behind it — a 64-bit collision
    // between two specific nearby grams, the same risk class as the ckey
    // content key used for exact dedup; accepted corpus-wide.)
    // r7 exchange fusion: hash-repartition by (a, b) ONCE — HashPartitioning
    // on (a, b) satisfies the window's ClusteredDistribution(a, b, diag) (a
    // subset of the clustering keys) AND the per-pair aggregation's
    // ClusteredDistribution(a, b), so the lag window and the anchor groupBy
    // run on one exchange instead of two (the r5 form exchanged candidates
    // on (a, b, diag) and the collapsed heads again on (a, b)).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a"), col("b"), col("diag")).orderBy(col("pa"))
    val heads = candidates
      .withColumn("diag", col("pa") - col("pb"))
      .repartition(col("a"), col("b"))
      .withColumn("prev_pa", lag(col("pa"), 1).over(w))
      .filter(col("prev_pa").isNull || col("pa") - col("prev_pa") >= gram)
      .select(col("a"), col("b"), col("pa"), col("pb"))
    val byPair = heads.groupBy(col("a"), col("b"))
      .agg(collect_set(struct(col("pa"), col("pb"))).as("anchors"))
    val ta = normDocs.select(col("doc_id").as("a"), col("t").as("ta"))
    val tb = normDocs.select(col("doc_id").as("b"), col("t").as("tb"))
    byPair
      .join(ta, "a").join(tb, "b")
      .select(col("a"), col("b"), col("ta"), col("tb"),
        explode(col("anchors")).as("an"))
      .withColumn("m", gf.extendMatch(col("ta"), col("tb"),
        col("an.pa").cast("int"), col("an.pb").cast("int"), gram))
      .filter(col("m").isNotNull && col("m.len") >= minLen)
      .filter(col("a") =!= col("b") || col("m.a_start") =!= col("m.b_start"))
      .select(col("a"), col("b"), col("m.a_start").as("a_start"),
        col("m.b_start").as("b_start"), col("m.len").as("length"))
      .distinct()
  }

  /** Full winnowing pass: detects ALL maximal repeats ≥ gram+window−1
    * (guarantee of the winnowing scheme), any partitioning.
    */
  def repeats(docs: DataFrame, gram: Int = 24, window: Int = 12,
              maxBucket: Int = 32, idCol: String = "doc_id",
              textCol: String = "text",
              /** optional pre-materialized winnowFingerprints(norm docs,
                * gram, window) — MUST come from the same (gram, window) and
                * the lowercased text of the same docs (a session cache
                * shares the one corpus pass across repeat/decontaminate
                * consumers). */
              precomputedFps: Option[DataFrame] = None): DataFrame = {
    // r7: persist the normalized corpus ONLY when this call computes the
    // fingerprint pass from it (two heavy consumers: winnow + the extend
    // joins). With precomputed fingerprints the norm frame feeds only the
    // two pruned text joins in verifyAndExtend — two cheap columnar scans,
    // not worth a ~50 MB materialization + count job per call.
    val nRaw = norm(docs, idCol, textCol)
    val n =
      if (precomputedFps.isEmpty)
        nRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else nRaw
    val minLen = gram + window - 1
    val cand = winnowCandidatesFromFps(
      precomputedFps.getOrElse(winnowFingerprints(n, gram, window)), maxBucket)
    // eager output + unpersist: the span set is tiny; the persisted corpus
    // copy must NOT outlive the call (a many-query session would otherwise
    // accumulate one pinned corpus per repeat pass and degrade under memory
    // pressure — the round-3 driver-bench outlier)
    try verifyAndExtend(n, cand, gram, minLen).localCheckpoint(true)
    finally if (precomputedFps.isEmpty) n.unpersist()
  }

  /** Full suffix-array pass over the current partitioning (gram anchors the
    * verifier; detection is exact within partitions at exactly minLen).
    */
  def repeatsWithinPartitions(docs: DataFrame, minLen: Int = 35,
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame = {
    val n = norm(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager + unpersist: see repeats()
    val (cand, acc) = suffixArrayCandidatesAcc(n, minLen)
    try {
      val out = verifyAndExtend(n, cand, minLen, minLen).localCheckpoint(true)
      warnIfCapped(acc)
      out
    } finally n.unpersist()
  }

  /** Suffix-array pass scoped to GROUPS (e.g. host buckets): docs of one
    * group are hash-shuffled together and sorted contiguously, and each
    * group builds its own suffix array — the output is EXACTLY the maximal
    * repeats ≥ minLen whose two occurrences share a group, a deterministic,
    * partitioning-INDEPENDENT contract (the per-partition variant's output
    * depends on which groups hash-co-reside, which no SQL oracle can
    * reproduce; this one has one). One narrow shuffle on the group key;
    * groups bigger than MAX_N bytes segment like partitions do.
    */
  def repeatsWithinGroups(docs: DataFrame, groupExpr: org.apache.spark.sql.Column,
                          minLen: Int, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val n = docs
      .select(groupExpr.as("g"), col(idCol).as("doc_id"),
        lower(col(textCol)).as("t"))
      .repartition(spark.sparkContext.defaultParallelism, col("g"))
      .sortWithinPartitions("g", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val acc = cappedRunsAcc(spark)
    val rdd = n.select("g", "doc_id", "t").rdd.mapPartitions { it =>
      val all = it.map(r => (r.getLong(0), r.getLong(1), r.getString(2)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))).toArray
      all.groupBy(_._1).valuesIterator.flatMap { grp =>
        val docsArr = grp.sortBy(_._2).map(d => (d._2, d._3))
        segmented(docsArr).flatMap(seg => segmentPairs(seg, minLen, acc))
      }
    }
    val candidates = spark.createDataFrame(rdd, candidateSchema)
    try {
      val out = verifyAndExtend(n.select("doc_id", "t"), candidates,
        minLen, minLen).localCheckpoint(true)
      warnIfCapped(acc)
      out
    } finally n.unpersist()
  }
}
