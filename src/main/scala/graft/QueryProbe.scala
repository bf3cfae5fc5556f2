package graft

/** Dev tool: run one named SparkEntry query at a given sf dir and print its
  * row count (and the rows themselves for small outputs).
  * Usage: runMain graft.QueryProbe <query> [sfDir] [cpus]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2).toInt else 16
    val spark = GraftSession.get(s"local[$cpus]", math.max(cpus, 8))
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val rows = df.count()
    println(f"[queryprobe] $name @ $sfDir: $rows rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    if (rows <= 20) df.collect().foreach(r => println(s"[queryprobe]   $r"))
    SparkEntry.releaseSessionCaches(spark) // one-consumer session: close the
    spark.stop()                           // pipeline instead of pinning it
  }
}
