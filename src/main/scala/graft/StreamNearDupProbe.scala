package graft

import org.apache.spark.sql.functions._

/** Dev tool: streaming near-dup discovery vs the batch pipeline at a given
  * corpus size — quantifies the state-store tax of the streaming form on
  * identical input (the batch form is the throughput ceiling: one shuffle,
  * no per-batch state commits). Usage:
  *   runMain graft.StreamNearDupProbe [nDocs] [cpus] [statePartitions]
  */
object StreamNearDupProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 100000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val stateParts = if (args.length > 2) args(2).toInt else 8
    val spark = GraftSession.get(s"local[$cpus]", math.max(cpus, 8))
    val cfg = graft.dedup.DedupConfig(maxBucket = 1 << 20)

    val corpus = graft.pages.PagesGen.pages(spark, nDocs, 42L, cpus * 2)
      .select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val dir = GraftSession.scratchDir("snd_probe")
    corpus.write.mode("overwrite").parquet(s"$dir/pages")

    val t0 = System.nanoTime()
    val pipe = graft.dedup.NearDupPipeline.run(spark, corpus, cfg)
    val batchPairs = pipe.pairs.count()
    val batchSec = (System.nanoTime() - t0) / 1e9
    pipe.close()

    val t1 = System.nanoTime()
    val streamed = graft.streaming.StreamNearDup.pairs(
      spark, s"$dir/pages", corpus, cfg, statePartitions = stateParts)
    val streamPairs = streamed.count()
    val streamSec = (System.nanoTime() - t1) / 1e9

    println(f"[sndprobe] docs=$nDocs stateParts=$stateParts " +
      f"batch ${batchSec}%.2f s ($batchPairs pairs, ${nDocs / batchSec}%.0f docs/s) " +
      f"stream ${streamSec}%.2f s ($streamPairs pairs, ${nDocs / streamSec}%.0f docs/s) " +
      f"ratio ${streamSec / batchSec}%.2f")

    // state growth: bucket state must be LINEAR in registered contents
    // (the 100-TB design property — state = the index, ~52 keys/content).
    // Drain half and full corpus through the durable sink and report the
    // state store's own accounting, under both providers: HDFS-backed
    // (toy default: whole state as a JVM map) and RocksDB (the 100-TB
    // choice: off-heap, incremental snapshots, state ≫ memory).
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    for (provider <- Seq(None, Some(rocks)); frac <- Seq(2, 1)) {
      val old = spark.conf.getOption(providerKey)
      provider.foreach(spark.conf.set(providerKey, _))
      try {
        val n = nDocs / frac
        val tag = provider.fold("hdfs")(_ => "rocksdb")
        val sub = s"$dir/sub_${tag}_$frac"
        corpus.filter(col("doc_id") < n).write.mode("overwrite").parquet(s"$sub/pages")
        val t = System.nanoTime()
        val q = graft.streaming.StreamNearDup.drainCandidatesToDir(
          spark, s"$sub/pages", s"$sub/out", s"$sub/ckpt", cfg, stateParts)
        val sec = (System.nanoTime() - t) / 1e9
        val st = q.recentProgress.flatMap(_.stateOperators)
        val keys = st.map(_.numRowsTotal).sum
        val mem = st.map(_.memoryUsedBytes).sum
        println(f"[sndprobe] state provider=$tag docs=$n keys=$keys " +
          f"memMB=${mem / 1e6}%.1f bytesPerDoc=${mem.toDouble / n}%.0f " +
          f"drain ${sec}%.2f s")
      } finally {
        old.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      }
    }
    GraftSession.dropScratch(dir)
    spark.stop()
  }
}
