package graft

/** Dev probe: the disk-vs-tmpfs scratch A/B (r5 VERDICT next-round #1).
  * Times the three scratch-IO-touching driver queries in one session and
  * prints the active scratch root, so two invocations —
  *
  *   sbt "runMain graft.ScratchProbe"                      (tmpfs default)
  *   SPARK_GRAFT_SCRATCH=/tmp/graft_scratch_disk sbt ...   (disk-backed)
  *
  * — give the paired measurement. Alternate reps; the host's IO weather
  * swings on a minutes timescale (CLAUDE.md).
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = math.max(cpus, 8))
    println(s"[scratchprobe] scratchRoot=${GraftSession.scratchRoot} sf=$sfDir")
    for (q <- Seq("pages_stream_exact_dedup", "events_windowed_agg",
      "pages_incremental_clusters")) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[scratchprobe] $q rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    SparkEntry.releaseSessionCaches(spark)
    spark.stop()
  }
}
