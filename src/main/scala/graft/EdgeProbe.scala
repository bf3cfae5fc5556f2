package graft

import org.apache.spark.sql.functions._

/** Dev probe: decompose the incremental `edges` stage cost against an
  * already-committed store (pass the store root as arg 0): candidate
  * generation vs exact-Jaccard verification vs parquet write.
  */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = GraftSession.get("local[32]", 32)
    val store = new graft.state.SnapshotStore(spark, root)
    val cfg = graft.dedup.DedupConfig()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[edgeprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def keysOf(features: org.apache.spark.sql.DataFrame) =
      features.select(col("ckey"),
          explode(graft.functions.gf.bands(col("sig"), cfg.bands)).as("key"))
        .unionByName(features.select(col("ckey"),
          explode(graft.functions.gf.simhashKeys(col("sim64"),
            cfg.simhashBlocks, cfg.simhashMaxHamming)).as("key")))
    for (snap <- Seq(0, 1)) {
      val newKeys = keysOf(store.read("content", snap))
      val oldKeys =
        if (snap == 0) newKeys.limit(0).select("key", "ckey")
        else keysOf(store.readRange("content", 0, snap - 1)).select("key", "ckey")
      t(s"snap$snap scan newKeys")(newKeys.count())
      val cand = graft.dedup.MinHashLSH.boundedProbePairs(
          newKeys.select(col("key"), col("ckey").as("e")),
          oldKeys.withColumnRenamed("ckey", "e"),
          Seq("key"), cfg.maxBucket)
        .filter(col("p") =!= col("q"))
        .select(least(col("p"), col("q")).as("a"),
          greatest(col("p"), col("q")).as("b"))
        .distinct()
      val candP = cand.persist()
      t(s"snap$snap candidates")(println(s"[edgeprobe]   n_cand=${candP.count()}"))
      val allFeatures = store.readRange("content", 0, snap)
        .select(col("ckey").as("doc_id"), col("sh"))
      val verified = graft.dedup.MinHashLSH
        .verifiedPairs(allFeatures, candP, cfg).select("a", "b")
      t(s"snap$snap verify")(println(s"[edgeprobe]   n_edges=${verified.count()}"))
      t(s"snap$snap write")(verified.write.mode("overwrite")
        .parquet(GraftSession.scratchRoot + s"/edgeprobe_out_$snap"))
      candP.unpersist()
    }
    spark.stop()
  }
}
