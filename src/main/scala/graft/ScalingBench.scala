package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Two-parallelism scaling evidence (north_rule: N vs 4N executors; sandbox
  * stand-in is local[8] vs local[32] on the SAME deterministic input —
  * BASELINE.json adaptation). Prints one JSON line with both throughputs and
  * the strong-scaling efficiency eff = (T_8 / T_32) / 4.
  */
object ScalingBench {

  case class RunResult(cores: Int, docs: Long, pipelineSec: Double) {
    def docsPerSec: Double = docs / pipelineSec
  }

  def runAt(cores: Int, nDocs: Long): RunResult = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder(s"local[$cores]", shufflePartitions = cores)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val corpus = graft.pages.PagesGen.pages(spark, nDocs, 42L, cores * 2)
        .select("doc_id", "text") // columns the pipeline reads
        .persist(StorageLevel.MEMORY_AND_DISK)
      corpus.count() // generation excluded from the timed section
      val t0 = System.nanoTime()
      val res = graft.dedup.NearDupPipeline.run(spark, corpus, graft.dedup.DedupConfig())
      res.assignments.count()
      val sec = (System.nanoTime() - t0) / 1e9
      corpus.unpersist()
      RunResult(cores, nDocs, sec)
    } finally spark.stop()
  }

  /** No args: both levels in one JVM (convenience). With a cores arg: ONE
    * measurement per JVM — the clean methodology (no heap/GC carry-over
    * between the two runs); a wrapper combines the two JSON lines.
    */
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    if (args.nonEmpty) {
      val cores = args(0).toInt
      val r = runAt(cores, nDocs)
      println(s"""{"metric":"pipeline_run","cores":$cores,"docs":$nDocs,"sec":${r.pipelineSec},"docs_per_sec":${r.docsPerSec}}""")
    } else {
      // alternate levels, best-of-N per level: robust to host noise (GC,
      // page-cache, co-tenant IO); minimum is the standard wall-clock
      // estimator on shared machines
      val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
      val runs = (0 until reps).flatMap { _ =>
        val a = runAt(8, nDocs); System.gc()
        val b = runAt(32, nDocs); System.gc()
        Seq(a, b)
      }
      val lo = runs.filter(_.cores == 8).minBy(_.pipelineSec)
      val hi = runs.filter(_.cores == 32).minBy(_.pipelineSec)
      val eff = (lo.pipelineSec / hi.pipelineSec) / 4.0
      println(
        s"""{"metric":"scaling_efficiency","value":$eff,"unit":"fraction",
           |"docs":$nDocs,"reps":$reps,
           |"run_low":{"cores":8,"sec":${lo.pipelineSec},"docs_per_sec":${lo.docsPerSec}},
           |"run_high":{"cores":32,"sec":${hi.pipelineSec},"docs_per_sec":${hi.docsPerSec}},
           |"all_runs":[${runs.map(r => s"""{"cores":${r.cores},"sec":${r.pipelineSec}}""").mkString(",")}],
           |"speedup":${lo.pipelineSec / hi.pipelineSec}}""".stripMargin.replace("\n", ""))
    }
  }
}
