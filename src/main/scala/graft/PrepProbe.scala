package graft

/** Dev probe (r7): decompose `session_prep` — time each session-shared frame
  * build individually, in prepareSessionFrames' order, on a fresh session.
  * Usage: spark-submit --class graft.PrepProbe <jar> [sfDir] [cpus]
  */
object PrepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1).toInt else
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", math.max(cpus, 8))
    val serial = args.length > 2 && args(2) == "serial"
    val t0 = System.nanoTime()
    if (serial) {
      val timings = SparkEntry.prepareSessionFramesTimed(spark, sfDir)
      timings.foreach { case (name, sec) =>
        println(f"[prep] $name%-28s $sec%8.2f s")
      }
    } else SparkEntry.prepareSessionFrames(spark, sfDir)
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[prep] TOTAL $total%.2f s")
    SparkEntry.releaseSessionCaches(spark)
    spark.stop()
  }
}
