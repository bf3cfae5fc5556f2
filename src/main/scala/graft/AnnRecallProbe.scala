package graft

import org.apache.spark.sql.functions._

/** Dev tool: measured recall of the ANN scale paths vs exact top-k on the
  * driver's embeddings tables — picks the pinned config + threshold for the
  * ann_*_recall CORRECTNESS gates.
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[8]", 8)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val n = e.count()
      val exact = graft.sim.Ann.exactTopK(e, 0L until 20L, 5)
        .select(col("qid"), col("nbr")).persist()
      val nExact = exact.count()
      val auto = graft.sim.Ann.lshBitsFor(n)
      for ((bits, tables) <- Seq((10, 6), (8, 8), (6, 8), (6, 12), (4, 12),
        (auto, 12))) {
        val approx = graft.sim.Ann.lshTopK(e, k = 5, bits = bits,
          tables = tables, seed = 7L, queryIds = 0L until 20L)
          .select(col("qid"), col("nbr"))
        val hits = exact.join(approx, Seq("qid", "nbr"), "left_semi").count()
        println(s"[annrecall] $sf n=$n lsh bits=$bits tables=$tables: " +
          s"$hits/$nExact = ${hits.toDouble / nExact}")
      }
      for ((cells, probe) <- Seq((16, 4), (16, 6), (8, 4))) {
        val approx = graft.sim.Ann.ivfTopK(e, k = 5, nCells = cells, nProbe = probe)
          .filter(col("qid") < 20).select(col("qid"), col("nbr"))
        val hits = exact.join(approx, Seq("qid", "nbr"), "left_semi").count()
        println(s"[annrecall] $sf n=$n ivf cells=$cells probe=$probe: " +
          s"$hits/$nExact = ${hits.toDouble / nExact}")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
