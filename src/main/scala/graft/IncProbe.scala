package graft

import org.apache.spark.sql.functions._

/** Dev probe: per-snapshot + per-stage timing of the incremental dedup at a
  * given SF and chain depth (SPARK_GRAFT_INC_DEPTH, default 2 — the driver
  * query's shape; 10 = the reference's jobscript chain length). Snapshot s
  * holds the first n + s·(n/10) docs with every 37th base doc's text revised
  * PER SNAPSHOT ("rev s" suffix) — steady url churn, like the driver's
  * workload but deeper. Prints per-snapshot wall seconds (flat within noise
  * = per-snapshot cost does not grow with chain depth) and committed-stage
  * write_ms breakdowns.
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val depth = sys.env.getOrElse("SPARK_GRAFT_INC_DEPTH", "2").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "4").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = math.max(cpus, 8))
    val root = GraftSession.scratchDir("graft_inc_probe")
    val store = new graft.state.SnapshotStore(spark, root)
    val inc = new graft.dedup.IncrementalDedup(spark, store,
      graft.dedup.DedupConfig(), compactEvery)
    val n = math.max(100L, SparkEntry.pagesN(sfDir) / 2)
    val step = math.max(1L, n / 10)
    val corpus = graft.pages.PagesGen.pages(spark, n + (depth - 1) * step, 42L, cpus * 2)
      .select("url", "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count() // generation excluded from the timed sections
    // job/stage counts are DETERMINISTIC (weather-independent) — the
    // latency floor of a tiny-input snapshot is ~jobs × scheduling latency,
    // so these are the attributable numbers when wall seconds are noisy
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        sites.add(Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("?") + " @ " + j.stageInfos.map(_.name.takeWhile(_ != '\n'))
          .mkString("; ").take(120))
      }
    })
    println(s"[probe] depth=$depth n=$n step=$step compactEvery=$compactEvery")
    for (snap <- 0 until depth) {
      val df = corpus.filter(col("doc_id") < n + snap * step)
        .withColumn("text", when(col("doc_id") % 37 === 0 && col("doc_id") < n,
          concat(col("text"), lit(s" rev$snap"))).otherwise(col("text")))
      val t0 = System.nanoTime()
      val (j0, s0) = (jobs.get, stages.get)
      inc.processSnapshot(snap, df, expectedPages = Some(n + snap * step)).count()
      org.apache.spark.sql.graftx.Bridge.drainListenerBus(spark.sparkContext)
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[probe] snapshot $snap total $total%.2f s " +
        s"jobs=${jobs.get - j0} stages=${stages.get - s0}")
      if (sys.env.contains("SPARK_GRAFT_INC_JOBSITES")) {
        import scala.jdk.CollectionConverters._
        sites.asScala.zipWithIndex.foreach { case (s, i) =>
          println(s"[probe]   job#$i $s") }
        sites.clear()
      } else sites.clear()
      for (t <- Seq("pages_keyed", "content", "edges", "assignments", "metrics")
           if store.isCommitted(t, snap)) {
        val j = store.manifestJson(t, snap)
        val ms = """"write_ms":\s*(\d+)""".r.findFirstMatchIn(j).map(_.group(1)).getOrElse("?")
        val rows = """"rows":\s*(\d+)""".r.findFirstMatchIn(j).map(_.group(1)).getOrElse("?")
        println(s"[probe]   $t/$snap write_ms=$ms rows=$rows")
      }
    }
    GraftSession.dropScratch(root)
    spark.stop()
  }
}
