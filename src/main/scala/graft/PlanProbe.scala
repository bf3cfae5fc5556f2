package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dedup._
import graft.pages.PagesGen

/** Dev probe: executed plan of the LSH candidate stage (AQE final). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "400000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cores]", cores)
    val cfg = DedupConfig()
    val docs = PagesGen.pages(spark, n, 42L, cores * 2).select("doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val exact = ExactDedup.assignments(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val reps = docs.join(exact.filter(col("doc_id") === col("rep")).select("doc_id"), Seq("doc_id"))
    val feats = MinHashLSH.features(reps, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    feats.count()
    val cand = MinHashLSH.candidatePairs(feats, cfg)
    val t0 = System.nanoTime()
    println(s"[plan] cand count = ${cand.count()} in ${(System.nanoTime()-t0)/1e9}s")
    println(cand.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
