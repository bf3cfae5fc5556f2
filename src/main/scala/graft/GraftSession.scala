package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory: one place that wires GraftExtensions + the configs that
  * matter at scale (AQE, skew-join handling, shuffle partition sizing).
  * `parallelism` stands in for executor count in this sandbox (local[N]).
  */
object GraftSession {
  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-dedup")
      .withExtensions(new org.apache.spark.sql.graftx.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // several shuffle stages here are byte-small but CPU-dense (bucket →
      // pair generation, band grouping); default 1 MB min-partition coalesces
      // them to a handful of tasks and serializes the stage — keep enough
      // partitions for the cores instead
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(master: String, shufflePartitions: Int = 32): SparkSession = {
    val b = builder(master, shufflePartitions)
    // experiment hook (ScalingBench/IncProbe latency attribution): AQE stays
    // the product default — its skew-join splitting is load-bearing at scale
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      b.config("spark.sql.adaptive.enabled", (v != "0").toString))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Ensure graft_* SQL functions exist on a session we did not create (the
    * driver's Verify/Bench sessions are built without extensions).
    */
  def ensureFunctions(spark: SparkSession): Unit = synchronized {
    if (!spark.catalog.functionExists("graft_hash64")) {
      // Re-register through the public extensions hook is not possible on a
      // live session; fall back to the column API (no SQL names needed) —
      // every internal pipeline uses graft.functions.gf, not SQL strings.
      ()
    }
  }

  /** Table loader for the driver-provided testdata directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
