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

  /** (key, doc_id) LSH probe rows — the band index is already folded into
    * each band hash, so the bare 64-bit key is the grouping key.
    */
  def bandKeyRows(features: DataFrame, cfg: DedupConfig): DataFrame =
    features.select(col("doc_id"), explode(gf.bands(col("sig"), cfg.bands)).as("key"))

  /** Candidate pairs (a < b) from bucketed probe keys — shared by every
    * candidate source (LSH bands, SimHash block keys): one hash-shuffle on
    * the key — the explicit global exchange the reference never needs
    * (rank-local dedup, dedup_files_mpi.cpp:53-65) — one bucket aggregation,
    * one distinct. Buckets beyond `maxBucket` emit star edges (linear).
    */
  def pairsFromKeyRows(keyRows: DataFrame, cfg: DedupConfig): DataFrame = {
    val buckets = keyRows
      .groupBy(col("key"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairsExpr =
      s"""CASE WHEN size(ids) <= ${cfg.maxBucket} THEN
         |  flatten(transform(ids, (x, i) ->
         |    transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS a, y AS b))))
         |ELSE
         |  transform(slice(ids, 2, size(ids) - 1), y -> struct(ids[0] AS a, y AS b))
         |END""".stripMargin
    buckets
      .select(explode(expr(pairsExpr)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

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
