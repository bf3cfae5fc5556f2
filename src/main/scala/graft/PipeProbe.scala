package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dedup._

/** Dev probe (r7): stage decomposition of the FUSED NearDupPipeline at the
  * bench's sf corpus shape (reads the session corpus dump like primePipeline
  * does). StageProfile still covers the unfused historical shape at 100k.
  * Usage: spark-submit --class graft.PipeProbe <jar> [sfDir] [cpus]
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.get(s"local[$cpus]", math.max(cpus, 8))
    val sc = spark.sparkContext
    def t[A](name: String)(f: => A): A = {
      sc.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"[pipe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      sc.setJobDescription(null); r
    }
    val n = SparkEntry.pagesN(sfDir)
    val corpus = spark.read
      .parquet(s"/tmp/graft_oracle/pages_n${n}_s42_v2")
      .select("doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)
    t("corpus_persist")(corpus.count())

    val cfg = DedupConfig()
    val tAll0 = System.nanoTime()
    val exact = ExactDedup.assignments(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    t("exact_assignments")(exact.count())
    val reps = corpus.join(
      exact.filter(col("doc_id") === col("rep")).select("doc_id"), Seq("doc_id"))
    val feats = MinHashLSH.featuresFused(reps, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    t("features_fused")(feats.count())
    val keyRows = MinHashLSH.bandKeyRows(feats, cfg).union(
      SimHashDedup.keyRows(feats.select(col("doc_id"), col("sim64")), cfg))
    val cand = MinHashLSH.pairsFromKeyRows(keyRows, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("candidates")(cand.count())
    val pairs = MinHashLSH.verifiedPairs(feats, cand, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("verified_pairs")(pairs.count())
    val edges = ExactDedup.edges(exact).select("a", "b").union(pairs.select("a", "b"))
    t("connected_components")(
      ConnectedComponents.assignAll(spark, corpus.select(col("doc_id").as("id")), edges)
        .count())
    println(f"[pipe] TOTAL(decomposed) ${(System.nanoTime() - tAll0) / 1e9}%8.2f s")
    Seq(exact, feats, cand, pairs).foreach(_.unpersist())

    // the real thing, twice (second run = warm JIT, what the bench measures
    // after the 100k warmup)
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val r = NearDupPipeline.run(spark, corpus, DedupConfig())
      r.assignments.count()
      println(f"[pipe] full_pipeline_$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r.close()
    }
    spark.stop()
  }
}
