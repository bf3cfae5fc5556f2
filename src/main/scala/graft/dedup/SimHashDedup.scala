package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.gf

/** SimHash-64 fingerprints with Hamming-ball probing (north_star).
  *
  * Candidate generation is the pigeonhole block probe: split the 64-bit
  * fingerprint into 4×16-bit blocks; any two fingerprints within Hamming
  * distance ≤ 3 agree on at least one block, so grouping by (block index,
  * block value) is a *bounded theta-join expressed as 4 equi-joins* —
  * exactly the SURVEY.md §2.4 note ("union of exact joins over bit-flip
  * enumerations", here block enumeration). Pairs are then filtered by true
  * Hamming distance; precision against the Jaccard oracle is preserved by
  * feeding survivors into the shared exact-Jaccard verifier.
  */
object SimHashDedup {

  /** (doc_id, sim64) fingerprints; empty docs excluded. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), gf.simhash64(col(textCol)).as("sim64"),
        length(trim(col(textCol))).as("_len")) // kernel normalizes
      .filter(col("_len") > 0)
      .drop("_len")

  /** Candidate pairs (a < b) within Hamming distance cfg.simhashMaxHamming.
    * Keys are multi-block (Manku-style): pairs within the ball share ≥1 key;
    * ~32-bit keys keep chance collisions (⇒ bucket sizes ⇒ pair-generation
    * cost) linear where single 16-bit blocks go quadratic.
    */
  def candidatePairs(fps: DataFrame, cfg: DedupConfig): DataFrame = {
    val blocks = fps.select(
      col("doc_id"), col("sim64"),
      explode(gf.simhashKeys(col("sim64"), cfg.simhashBlocks, cfg.simhashMaxHamming))
        .as("bv"))
    val buckets = blocks
      .groupBy(col("bv"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sim64")))).as("ids"))
      .filter(size(col("ids")) > 1)
    // all pairs within bucket, capped like MinHashLSH (hot buckets → star)
    val pairsExpr =
      s"""CASE WHEN size(ids) <= ${cfg.maxBucket} THEN
         |  flatten(transform(ids, (x, i) ->
         |    transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS pa, y AS pb))))
         |ELSE
         |  transform(slice(ids, 2, size(ids) - 1), y -> struct(ids[0] AS pa, y AS pb))
         |END""".stripMargin
    buckets
      .select(explode(expr(pairsExpr)).as("p"))
      .select(
        col("p.pa.doc_id").as("a"), col("p.pb.doc_id").as("b"),
        gf.hamming(col("p.pa.sim64"), col("p.pb.sim64")).as("hdist"))
      .filter(col("hdist") <= cfg.simhashMaxHamming)
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Full pass: docs → Hamming-ball candidate pairs (a < b, distinct). */
  def hammingPairs(docs: DataFrame, cfg: DedupConfig,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    candidatePairs(fingerprints(docs, idCol, textCol), cfg)
}
