package graft

import org.apache.spark.sql.functions._

/** Dev probe: per-stage timing of the incremental dedup at a given SF. */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = math.max(cpus, 8))
    val root = java.nio.file.Files.createTempDirectory("graft_inc_probe").toString
    val store = new graft.state.SnapshotStore(spark, root)
    val inc = new graft.dedup.IncrementalDedup(spark, store, graft.dedup.DedupConfig())
    val n = math.max(100L, SparkEntry.pagesN(sfDir) / 2)
    val (snap0, snap1) = SparkEntry.incSnapshots(spark, sfDir, n)
    for ((snap, df) <- Seq((0, snap0), (1, snap1))) {
      val t0 = System.nanoTime()
      // time each stage by watching manifest appearance: easier — just time
      // the whole snapshot and print per-stage write_ms from manifests after
      inc.processSnapshot(snap, df).count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[probe] snapshot $snap total $total%.2f s")
      for (t <- Seq("pages_keyed", "changed", "registry", "features",
        "probe_index", "edges", "content_clusters", "assignments", "metrics")
           if store.isCommitted(t, snap)) {
        val j = store.manifestJson(t, snap)
        val ms = """"write_ms":\s*(\d+)""".r.findFirstMatchIn(j).map(_.group(1)).getOrElse("?")
        val rows = """"rows":\s*(\d+)""".r.findFirstMatchIn(j).map(_.group(1)).getOrElse("?")
        println(s"[probe]   $t/$snap write_ms=$ms rows=$rows")
      }
    }
    spark.stop()
  }
}
