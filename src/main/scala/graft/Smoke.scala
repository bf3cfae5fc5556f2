package graft

/** Local stand-in for the driver's t1 smoke: entry() on sf0.001, rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[8]", 8)
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry() must return rows")
    spark.stop()
  }
}
