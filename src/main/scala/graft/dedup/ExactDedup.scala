package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Exact-duplicate collapse — the reference's first-occurrence election
  * restricted to whole-document chunks (insert-or-probe + atomic_min,
  * /root/reference/src/list_approach.cpp:50-58, tree_approach.cpp:340):
  * `groupBy(content key).agg(min(doc_id))`, a partial+final hash aggregate
  * (no hash table, no atomics — Catalyst's two-phase agg IS the ScatterView
  * pattern).
  *
  * Running this BEFORE LSH is also the first skew guard: groups of identical
  * documents (the hottest LSH buckets at web scale) collapse to one
  * representative each.
  */
object ExactDedup {

  /** (doc_id, key): one-pass normalized 64-bit content key (no regex, no
    * normalized-string materialization). 64-bit keys group faster than
    * 16-byte binary; the full 128-bit digest is available via gf.murmur128
    * where collision-paranoia matters.
    */
  def keyed(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), gf.contentKey64(col(textCol)).as("ckey"))

  /** One row per document: (doc_id, ckey, rep) with rep = min doc_id of its
    * identical-content group. Window form: ONE corpus scan + one shuffle of
    * narrow (doc_id, ckey) rows — the groupBy+join form scans the corpus
    * twice.
    */
  def assignments(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    keyed(docs, idCol, textCol)
      .withColumn("rep", min("doc_id").over(Window.partitionBy("ckey")))
      .select("doc_id", "ckey", "rep")
  }

  /** Exact-dup edges (rep, member) for the clustering union. */
  def edges(assign: DataFrame): DataFrame =
    assign.filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a"), col("doc_id").as("b"))

  /** Distinct-content representatives to feed the near-dup stages. */
  def representatives(docs: DataFrame, assign: DataFrame,
                      idCol: String = "doc_id"): DataFrame =
    docs.join(assign.filter(col("doc_id") === col("rep")).select("doc_id"),
      Seq(idCol))
}
