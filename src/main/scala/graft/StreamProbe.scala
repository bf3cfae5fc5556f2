package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool: attribute pages_stream_exact_dedup cost — micro-batch count,
  * per-batch durations (addBatch/getBatch/commit/state ms) from the
  * StreamingQueryProgress events. Usage: runMain graft.StreamProbe [sfDir] [cpus]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.get(s"local[$cpus]", math.max(cpus, 8))
    import graft.functions.gf
    val pagesDir = {
      // same dump path SparkEntry uses
      val n = SparkEntry.pagesN(sfDir)
      s"/tmp/graft_oracle/pages_n${n}_s42_v2"
    }
    if (args.length > 2) spark.conf.set("spark.sql.shuffle.partitions", args(2).toInt)
    val t0 = System.nanoTime()
    val schema = spark.read.parquet(pagesDir).schema
    val stream = spark.readStream.schema(schema).parquet(pagesDir)
    val agg = stream
      .groupBy(gf.contentKey64(col("text")).as("ckey"))
      .agg(min(col("doc_id")).as("rep_doc"), count(lit(1)).as("cnt"))
      .select(col("rep_doc"), col("cnt"))
    val q = agg.writeStream
      .outputMode("complete").format("memory").queryName("probe")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[streamprobe] total ${total}%.2f s, batches=${q.recentProgress.length}")
    q.recentProgress.foreach { p =>
      println(s"[streamprobe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} state=${p.stateOperators.map(s =>
          s"commit=${s.commitTimeMs} mem=${s.memoryUsedBytes}").mkString(";")}")
    }
    println(s"[streamprobe] result rows=${spark.table("probe").count()}")
    spark.stop()
  }
}
