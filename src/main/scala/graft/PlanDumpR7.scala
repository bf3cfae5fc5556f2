package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Dev tool (r7): dump `explain("formatted")` for every query the r7
  * optimization round touched, to plans/r07/<query>_<tag>.txt. Run once on
  * the r6 jar in a worktree (tag=before) and once on HEAD (tag=after).
  * Usage: spark-submit --class graft.PlanDumpR7 <jar> <tag> [outDir] [sfDir]
  */
object PlanDumpR7 {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "after"
    val outDir = if (args.length > 1) args(1) else "/root/repo/plans/r07"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.get("local[8]", 8)

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val nEx = "Exchange".r.findAllIn(s).length
      println(f"[plandump-r7] $name%-32s exchanges=$nEx")
    }

    // queries whose bodies the round touched (plans are lazy — memoized
    // session frames materialize their builds, which is fine at sf0.001)
    val touched = Seq(
      "pages_neardup_pairs", "pages_neardup_clusters", "pages_simhash_pairs",
      "simhash_ball_gate", "pages_long_repeats", "sa_winnow_consistency_gate",
      "pages_sa_repeats", "emb_cosine_pairs", "ann_topk_lsh", "ann_topk_ivf",
      "pages_stream_neardup_pairs", "pages_stream_neardup_clusters")
    for (name <- touched)
      try dump(name, SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable =>
        println(s"[plandump-r7] $name FAILED: ${e.getMessage}") }

    // kernel-level shapes (the load-bearing sub-plans the queries share)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    dump("kernel_bounded_bucket_pairs",
      graft.dedup.MinHashLSH.boundedBucketPairs(
        docs.select(pmod(col("doc_id"), lit(50)).as("key"), col("doc_id").as("e")),
        Seq("key"), 64))
    dump("kernel_bounded_probe_pairs",
      graft.dedup.MinHashLSH.boundedProbePairs(
        docs.select(pmod(col("doc_id"), lit(50)).as("key"), col("doc_id").as("e"))
          .filter(col("e") >= 400),
        docs.select(pmod(col("doc_id"), lit(50)).as("key"), col("doc_id").as("e"))
          .filter(col("e") < 400),
        Seq("key"), 64))
    dump("kernel_verify_extend", {
      val norm = docs.select(col("doc_id"), lower(col("text")).as("t"))
      graft.dedup.LongRepeats.verifyAndExtend(norm,
        graft.dedup.LongRepeats.winnowCandidates(norm, 24, 12, 32), 24, 35)
    })
    SparkEntry.releaseSessionCaches(spark)
    spark.stop()
  }
}
