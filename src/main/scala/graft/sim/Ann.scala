package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Similarity search over an embedding column (array<float>).
  *
  * - `exactTopK`: brute-force cosine — the small-query-set baseline
  *   (broadcast the queries, scan the corpus once, per-query window top-k).
  * - `lshTopK`: signed-random-projection LSH — the scale path. Each vector
  *   lands in `tables` buckets (one per hash table); candidates are bucket
  *   collisions; exact cosine re-ranks candidates only. Corpus is never
  *   cross-joined.
  */
object Ann {

  /** Exact top-k neighbors for each query id. Queries should be small enough
    * to broadcast (the corpus side streams).
    */
  def exactTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val sims = emb.select(col(idCol).as("nbr"), col(vecCol).as("nv"))
      .join(broadcast(q), col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"),
        round(gf.cosine(col("qv"), col("nv")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nbr").asc)
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Approximate top-k for EVERY vector via SRP-LSH bucket collisions.
    * maxBucket guards degenerate buckets (skew: near-identical embedding
    * floods) — beyond it only the lowest-id star pairs are emitted.
    */
  def lshTopK(emb: DataFrame, k: Int, bits: Int = 12, tables: Int = 4,
              seed: Long = 42L, maxBucket: Int = 256,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketCols = (0 until tables).map(t =>
      gf.srpBucket(col(vecCol), bits, seed + t).as(s"b$t"))
    val bucketed = emb.select(col(idCol).as("id") +: col(vecCol).as("v") +: bucketCols: _*)
      .select(col("id"), col("v"),
        posexplode(array((0 until tables).map(t => col(s"b$t")): _*)).as(Seq("table", "bucket")))
    // bounded bucket-pair kernel: degenerate buckets (near-identical
    // embedding floods) emit star pairs from a streaming pass, never a
    // per-bucket aggregation buffer
    val cand = graft.dedup.MinHashLSH.boundedBucketPairs(
        bucketed.select(col("table"), col("bucket"), col("id").as("e")),
        Seq("table", "bucket"), maxBucket)
      .select(col("p").as("a"), col("q").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // directed candidates, exact cosine re-rank
    val directed = cand.union(cand.select(col("b").as("a"), col("a").as("b")))
    val va = emb.select(col(idCol).as("a"), col(vecCol).as("va"))
    val vb = emb.select(col(idCol).as("b"), col(vecCol).as("vb"))
    val sims = directed.join(va, "a").join(vb, "b")
      .select(col("a").as("qid"), col("b").as("nbr"),
        round(gf.cosine(col("va"), col("vb")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nbr").asc)
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
