package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Driver bench: one JSON line. `queries` carries per-query wall seconds;
  * extra keys report the flagship near-dup pipeline throughput (docs/sec,
  * corpus generation excluded — the metric BASELINE.md pins).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = math.max(cpus, 8))

    // flagship: near-dup pipeline docs/sec on the synthesized corpus —
    // input materialized (dump creation + read excluded) before timing.
    // The run SEEDS the session pipeline cache, so the pages_neardup_*
    // queries below consume it instead of rebuilding (the sf-scale
    // pipeline executes once per session) and close it after the second
    // named consumer. Its persisted frames (~10⁸ B at sf0.1) stay pinned
    // across the 100k run below — two orders below the heap, measured
    // harmless.
    val nDocs = SparkEntry.pagesN(sfDir)
    val pipelineSec = SparkEntry.primePipeline(spark, sfDir)
    val docsPerSec = nDocs / pipelineSec

    // representative throughput: the sf-scaled corpus (20k docs at sf0.1) is
    // stage-latency-bound; a 100k-doc run shows the parallel-work rate the
    // scaling section of BASELINE.md reports
    val big = graft.pages.PagesGen.pages(spark, 100000L, 42L, cpus * 2)
      .select("doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)
    big.count()
    val tb0 = System.nanoTime()
    val bigRes = graft.dedup.NearDupPipeline.run(spark, big, graft.dedup.DedupConfig())
    bigRes.assignments.count()
    val bigSec = (System.nanoTime() - tb0) / 1e9
    val bigDocsPerSec = 100000L / bigSec
    bigRes.close() // a leaked 100k-doc feature table would pin memory for
    big.unpersist() // the entire 36-query sweep below

    // build every session-shared memo frame BEFORE the timed sweep and
    // charge the one-time cost to a named bucket: per-query numbers then
    // stay comparable across rounds instead of jumping whenever alphabetical
    // order changes which consumer pays a shared build first (r5:
    // pages_decontaminate 2.9 → 14.8 s for exactly that reason)
    val prepSec = SparkEntry.prepareSessionFrames(spark, sfDir)
    val results = ("session_prep" -> prepSec) +:
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // loud, not silent: a bench-only failure must never read as a
          // fast query (correctness still catches it in the driver's own
          // Verify run, but the bench JSON should not look healthy)
          System.err.println(s"[bench] WARNING: $name FAILED: ${e.getMessage}")
          -1L
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipelineSec
    // driver contract shape (metric/value/unit/queries/sf) + throughput extras
    println(s"""{"metric":"total","value":$total,"unit":"sec","dedup_docs_per_sec":$docsPerSec,"pipeline_sec":$pipelineSec,"pipeline_docs":$nDocs,"dedup_docs_per_sec_100k":$bigDocsPerSec,"pipeline_sec_100k":$bigSec,"cpus":$cpus,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
