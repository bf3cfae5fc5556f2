package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.gf

/** MinHash + LSH banding near-duplicate detection (north_star core).
  *
  * Reference analogue: the digest insert-or-probe J1 (SURVEY.md §2.4) with the
  * 128-bit exact digest replaced by banded MinHash keys, so "same content
  * elsewhere" generalizes to "Jaccard ≥ τ elsewhere".
  *
  * Scale shape (10¹²-doc design):
  *   - one narrow features table (doc_id, sh, sig) — computed in one codegen'd
  *     projection pass, no shuffle;
  *   - band explosion shuffles (band, bandHash, doc_id) triples only (24 B a
  *     row, not documents);
  *   - bucket groups emit pairs bounded by `maxBucket` (star edges beyond) —
  *     boilerplate-hot buckets cost O(bucket), never O(bucket²);
  *   - candidate pairs deduped, then verified with a cheap signature-agreement
  *     estimate before the exact shingle-set Jaccard is evaluated (the exact
  *     compare runs only on rows surviving the estimate — Catalyst `If` is
  *     lazy per row).
  */
object MinHashLSH {

  /** (doc_id, sh, sig): distinct sorted shingle hashes + MinHash signature.
    * Empty docs (no shingles) are excluded — they are exact dups of each
    * other and are handled by ExactDedup.
    */
  def features(docs: DataFrame, cfg: DedupConfig,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      // equivalent to size(shingles) > 0, but cheap and scan-pushable —
      // filtering on size(sh) would get pushed through the projection by
      // Catalyst and recompute the shingle kernel twice per row
      .filter(length(trim(col(textCol))) > 0)
      .select(
        col(idCol).as("doc_id"),
        gf.shingles(col(textCol), cfg.shingleK).as("sh")) // kernel normalizes
      .withColumn("sig", gf.minhash(col("sh"), cfg.numPerm, cfg.seed))

  /** (doc_id, sh, sig, sim64) in ONE tokenization pass — the pipeline's
    * feature table (a separate simhash pass would rescan and re-tokenize
    * every text; memory traffic is the local-mode scaling ceiling).
    */
  def featuresFused(docs: DataFrame, cfg: DedupConfig,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        gf.featureStruct(col(textCol), cfg.shingleK, cfg.numPerm, cfg.seed).as("f"))
      .select(col("doc_id"), col("f.sh").as("sh"), col("f.sig").as("sig"),
        col("f.sim64").as("sim64"))

  /** (key, doc_id) LSH probe rows — the band index is already folded into
    * each band hash, so the bare 64-bit key is the grouping key.
    */
  def bandKeyRows(features: DataFrame, cfg: DedupConfig): DataFrame =
    features.select(col("doc_id"), explode(gf.bands(col("sig"), cfg.bands)).as("key"))

  /** Candidate pairs (p < q) from bucketed probe rows with BOUNDED executor
    * memory — shared by every bucket-pair source (LSH bands, SimHash block
    * keys, winnow fingerprints, SRP buckets).
    *
    * `keyRows` must have columns `keyCols :+ "e"` (element; any orderable
    * type). Two-phase:
    *
    *   1. per-key stats (min element + count) — a pure partial+final hash
    *      aggregate, O(1) state per key, never a per-key array;
    *   2. join the stats back (same key ⇒ the shuffle partitioning is
    *      reused): keys with count ≤ maxBucket aggregate their (bounded)
    *      member list and emit all pairs; HOT keys emit star edges
    *      (min, member) straight from the joined rows — one row in, ≤ one
    *      pair out, no aggregation buffer at all.
    *
    * A boilerplate flood of 10⁸ rows on one key therefore costs a streaming
    * pass, not a 10⁸-element ObjectHashAggregate buffer; connectivity (what
    * clustering needs) is preserved by the star.
    */
  def boundedBucketPairs(keyRows: DataFrame, keyCols: Seq[String],
                         maxBucket: Int): DataFrame = {
    val k = keyCols.map(col)
    // CONTRACT: (key, e) rows should be unique — every caller's key family
    // emits one row per (key, element) by construction (band hashes, block
    // combinations, winnow positions, SRP table buckets). A violating
    // duplicate row can only DEMOTE its bucket to star edges early (cnt is
    // a row count — one shuffle; count_distinct would cost a second
    // (key,e)-keyed exchange of the full probe stream) and duplicate star
    // edges (callers dedup pairs); it can never produce self-pairs —
    // smallPairs aggregates a SET and the hot path filters e =!= mn.
    //
    // r7 (guide §2.4): per-key stats come from WINDOW aggregates over ONE
    // exchange of the probe stream, not a stats aggregation joined back —
    // the r6 form exchanged the full stream twice (once into the partial
    // agg, once for the join probe side) and scanned the feature subtree
    // twice to feed them. The window's hash partitioning on the key also
    // feeds smallPairs' groupBy exchange-free, so the whole kernel costs
    // exactly one full-stream shuffle. Flood bound: WindowExec buffers one
    // KEY GROUP at a time in a spillable row array (heap use capped by the
    // spill threshold, a 10⁸-row boilerplate key costs sequential disk,
    // never executor memory) — the hot path stays one-row-in/≤one-out after
    // it, and collect_set still only runs behind the cnt ≤ maxBucket filter.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(k: _*)
    val joined = keyRows
      .withColumn("mn", min(col("e")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") > 1)
    val hotPairs = joined.filter(col("cnt") > maxBucket && col("e") =!= col("mn"))
      .select(col("mn").as("p"), col("e").as("q"))
    val smallPairsExpr =
      """flatten(transform(ids, (x, i) ->
        |  transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS p, y AS q))))"""
        .stripMargin
    val smallPairs = joined.filter(col("cnt") <= maxBucket)
      .groupBy(k: _*).agg(sort_array(collect_set(col("e"))).as("ids"))
      .select(explode(expr(smallPairsExpr)).as("pr"))
      .select(col("pr.p").as("p"), col("pr.q").as("q"))
    smallPairs.union(hotPairs)
  }

  /** Incremental new-vs-accumulated candidate pairs with the SAME hot-key
    * guard as [[boundedBucketPairs]] — the probe-side analogue for an
    * append-only index (IncrementalDedup): emits only pairs touching a NEW
    * element, so per-snapshot edge sets stay disjoint and no old pair is
    * ever re-verified.
    *
    * `newRows` and `oldRows` carry columns `keyCols :+ "e"` and must be
    * element-disjoint (new content is registered exactly once — the caller's
    * invariant). Per key:
    *
    *   - total distinct size ≤ maxBucket: plain new×(old∪new) equi-join
    *     (the previous unbounded behavior, now gated);
    *   - hot keys: star edges (anchor, e_new) streamed one-in/one-out, where
    *     anchor = min OLD element when any exists (so a hot bucket's new
    *     minimum still links into the component its old members already
    *     form), else min new element.
    *
    * A boilerplate band key with 10⁶ accumulated entries × 10³ new arrivals
    * therefore emits ≤10³ candidate rows, not 10⁹.
    */
  def boundedProbePairs(newRows: DataFrame, oldRows: DataFrame,
                        keyCols: Seq[String], maxBucket: Int): DataFrame = {
    val k = keyCols.map(col)
    // same unique-(key, e) caller contract as boundedBucketPairs (the
    // committed index tables hold one row per (content, key) by
    // construction); disjointness ⇒ the counts add exactly.
    //
    // ONE tagged stream, ONE exchange: old∪new rows are tagged and shuffled
    // by key once; the per-key stats aggregate, the stats join-back (same
    // partitioning — the exchange is reused, not repeated) and the
    // small-key pair aggregation all run on that single shuffle. The
    // previous form shuffled the accumulated old index TWICE (stats + the
    // new×all join) and the new side three times — ~6 exchanges of plan
    // latency per snapshot at toy scale, and a doubled accumulated-index
    // scan at 100 TB (the index is the side that grows forever; the fused
    // kernel reads and shuffles it exactly once per snapshot).
    val tagged = oldRows.select(k :+ col("e") :+ lit(false).as("is_new"): _*)
      .unionByName(newRows.select(k :+ col("e") :+ lit(true).as("is_new"): _*))
    // r7: per-key stats as WINDOW aggregates over the one tagged exchange
    // (see boundedBucketPairs) — the stats-agg + join-back form paid a
    // second full exchange of the tagged stream and a second scan of the
    // index subtrees. Keys with no new arrival emit nothing (their old
    // pairs surfaced when the newer member registered); singleton keys
    // have no pair.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(k: _*)
    val joined = tagged
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("cnt_new", sum(when(col("is_new"), 1L).otherwise(0L)).over(w))
      .withColumn("mn_old", min(when(!col("is_new"), col("e"))).over(w))
      .withColumn("mn_new", min(when(col("is_new"), col("e"))).over(w))
      .filter(col("cnt_new") > 0 && col("cnt") > 1)
    // hot keys: star edges (anchor, e_new) streamed one-in/≤one-out, anchor
    // = min OLD element when any exists (a hot bucket's new minimum still
    // links into the component its old members already form), else min new
    val hot = joined
      .filter(col("cnt") > maxBucket && col("is_new")
        && col("e") =!= coalesce(col("mn_old"), col("mn_new")))
      .select(coalesce(col("mn_old"), col("mn_new")).as("p"), col("e").as("q"))
    // small keys: new×(old∪new) minus self via bounded per-key arrays
    // (collect_set ignores the nulls the `when` leaves on old rows)
    val pairsExpr =
      """flatten(transform(news, x ->
        |  transform(alls, y -> struct(x AS p, y AS q))))""".stripMargin
    val small = joined.filter(col("cnt") <= maxBucket)
      .groupBy(k: _*)
      .agg(collect_set(when(col("is_new"), col("e"))).as("news"),
        sort_array(collect_set(col("e"))).as("alls"))
      .select(explode(expr(pairsExpr)).as("pr"))
      .select(col("pr.p").as("p"), col("pr.q").as("q"))
      .filter(col("p") =!= col("q"))
    small.union(hot)
  }

  /** Driver-local mirror of [[boundedProbePairs]] for SMALL key streams
    * (the incremental toy/verify regime): identical per-key contract —
    * keys with a new arrival and ≥2 members; small keys emit new×(old∪new)
    * minus self; hot keys emit (anchor, e_new) stars with anchor = min old
    * else min new. With `oldRows` empty this also reproduces
    * [[boundedBucketPairs]]' candidate set up to pair orientation (callers
    * normalize with least/greatest + distinct). Parity is spec-gated on
    * randomized inputs (BoundedBucketSpec). The point: a probe over a few
    * hundred thousand (key, e) rows costs ONE collect instead of ~6
    * sequential AQE query stages — the same small-input dispatch the
    * serial chunk chain and the driver union-find already use.
    */
  def boundedProbePairsLocal(newRows: Array[(Long, Long)],
                             oldRows: Array[(Long, Long)],
                             maxBucket: Int): Array[(Long, Long)] =
    boundedProbePairsLocalP(
      newRows.map(_._1), newRows.map(_._2),
      oldRows.map(_._1), oldRows.map(_._2), maxBucket)

  /** Primitive-parallel-array core of [[boundedProbePairsLocal]] (r6): the
    * caller keeps keys and elements in two long arrays, so the collected
    * probe state really is ~16 B/row — the arithmetic
    * IncrementalDedup.LOCAL_PROBE_MAX_CONTENTS documents — instead of boxed
    * Tuple2 rows. The tuple form above delegates here, so the
    * BoundedBucketSpec parity gates cover both entry points.
    */
  def boundedProbePairsLocalP(newKeys: Array[Long], newEs: Array[Long],
                              oldKeys: Array[Long], oldEs: Array[Long],
                              maxBucket: Int): Array[(Long, Long)] = {
    require(newKeys.length == newEs.length && oldKeys.length == oldEs.length)
    val byKey = scala.collection.mutable.LongMap
      .empty[(scala.collection.mutable.ArrayBuffer[Long],
              scala.collection.mutable.ArrayBuffer[Long])] // (old, new)
    var i = 0
    while (i < oldKeys.length) {
      byKey.getOrElseUpdate(oldKeys(i),
        (scala.collection.mutable.ArrayBuffer.empty,
          scala.collection.mutable.ArrayBuffer.empty))._1 += oldEs(i)
      i += 1
    }
    i = 0
    while (i < newKeys.length) {
      byKey.getOrElseUpdate(newKeys(i),
        (scala.collection.mutable.ArrayBuffer.empty,
          scala.collection.mutable.ArrayBuffer.empty))._2 += newEs(i)
      i += 1
    }
    val out = Array.newBuilder[(Long, Long)]
    for ((_, (olds, news)) <- byKey if news.nonEmpty
         && olds.length + news.length > 1) {
      if (olds.length + news.length <= maxBucket) {
        for (p <- news) {
          for (q <- olds) if (p != q) out += ((p, q))
          for (q <- news) if (p != q) out += ((p, q))
        }
      } else {
        val anchor = if (olds.nonEmpty) olds.min else news.min
        for (q <- news) if (q != anchor) out += ((anchor, q))
      }
    }
    out.result()
  }

  /** Driver-side form of the normalize step the distributed edge path runs
    * as filter + least/greatest + distinct: drop self-pairs, orient each
    * pair (min, max), dedupe. Bounded callers only (the local probe
    * kernel's output).
    */
  def normalizedDistinctPairsLocal(raw: Array[(Long, Long)]): Array[(Long, Long)] = {
    // exact pair-set dedup (ADVICE r6): the r6 form deduped on the packed
    // key rotl(a,32)^b, which two DISTINCT normalized pairs can collide on
    // without any ckey collision (rotl(a^a',32) == b^b' needs no shared
    // halves) — silently dropping a candidate edge where the distributed
    // path's distinct() is exact. The tuple set is exact and the caller is
    // bounded (driver-local small regime).
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val out = Array.newBuilder[(Long, Long)]
    for ((p, q) <- raw if p != q) {
      val a = math.min(p, q); val b = math.max(p, q)
      if (seen.add((a, b))) out += ((a, b))
    }
    out.result()
  }

  /** Driver-side form of [[verifiedPairs]] for the small regime: the same
    * exact-Jaccard >= tau verify through the SAME kernel
    * (Impl.jaccardArr — what gf.jaccard's codegen evaluates), over shingle
    * sets already collected to the driver. A pair either of whose sides has
    * no shingle set (NULL sh: empty-text content) is dropped, matching the
    * distributed filter's null semantics. Returns verified (a, b) pairs in
    * input order.
    */
  def verifiedPairsLocal(sh: scala.collection.mutable.LongMap[Array[Int]],
                         candidates: Array[(Long, Long)],
                         tau: Double): Array[(Long, Long)] =
    candidates.filter { case (a, b) =>
      (sh.get(a), sh.get(b)) match {
        case (Some(sa), Some(sb)) => graft.functions.Impl.jaccardArr(sa, sb) >= tau
        case _ => false
      }
    }

  /** Candidate pairs (a < b) from bucketed probe keys: one hash-shuffle on
    * the key — the explicit global exchange the reference never needs
    * (rank-local dedup, dedup_files_mpi.cpp:53-65) — then the bounded
    * bucket-pair kernel + one distinct.
    */
  def pairsFromKeyRows(keyRows: DataFrame, cfg: DedupConfig): DataFrame =
    boundedBucketPairs(keyRows.select(col("key"), col("doc_id").as("e")),
      Seq("key"), cfg.maxBucket)
      .select(col("p").as("a"), col("q").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Candidate pairs (a < b) from LSH band buckets. */
  def candidatePairs(features: DataFrame, cfg: DedupConfig): DataFrame =
    pairsFromKeyRows(bandKeyRows(features, cfg), cfg)

  /** Verified near-dup pairs: (a, b, jac) with exact Jaccard >= cfg.tau.
    * Ships ONLY the int shingle sets through the pair joins — the exact
    * sorted-merge intersection on two ~300-int arrays is cheaper than
    * shipping 1 KB signatures for an estimate pre-filter would be.
    */
  def verifiedPairs(features: DataFrame, candidates: DataFrame,
                    cfg: DedupConfig): DataFrame = {
    val fa = features.select(col("doc_id").as("a"), col("sh").as("sh_a"))
    val fb = features.select(col("doc_id").as("b"), col("sh").as("sh_b"))
    candidates
      .join(fa, "a")
      .join(fb, "b")
      .withColumn("jac", gf.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= cfg.tau)
      .select(col("a"), col("b"), col("jac"))
  }

  /** Full LSH pass: docs → verified near-dup pairs. */
  def nearDupPairs(docs: DataFrame, cfg: DedupConfig,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val feats = features(docs, cfg, idCol, textCol)
    verifiedPairs(feats, candidatePairs(feats, cfg), cfg)
  }
}
