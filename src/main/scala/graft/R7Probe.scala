package graft

import org.apache.spark.sql.functions._

/** Dev probe (r7): decompose the heavy session_prep builds — stream near-dup
  * drain vs verify, SA repeats candidate vs extend, LSH top-k — with noop
  * sinks so the computation is timed, not the sink.
  * Usage: spark-submit --class graft.R7Probe <jar> [sfDir] [cpus]
  */
object R7Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.get(s"local[$cpus]", math.max(cpus, 8))
    val sc = spark.sparkContext
    def t[A](name: String)(f: => A): A = {
      sc.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"[r7] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      sc.setJobDescription(null); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val n = SparkEntry.pagesN(sfDir)
    val corpusPath = s"/tmp/graft_oracle/pages_n${n}_s42_v2"
    val corpus = spark.read.parquet(corpusPath).select("doc_id", "text")
    t("corpus_warm")(noop(corpus))

    val cfg = graft.dedup.DedupConfig(maxBucket = 1 << 20)
    // stream drain alone (memory sink appended — the real query's sink)
    for (sp <- Seq(8, 16, 32, 8, 16, 32, 8, 16, 32)) {
      val drained = t(s"stream_drain_sp$sp") {
        graft.streaming.StreamNearDup.pairs(spark, corpusPath, corpus, cfg,
          statePartitions = sp)
      }
      t(s"stream_verify_sp$sp")(noop(drained))
    }

    // SA repeats: candidates vs extend
    val sa = t("sa_repeats_full") {
      graft.dedup.LongRepeats.repeatsWithinGroups(
        spark.read.parquet(corpusPath),
        (col("doc_id") / graft.pages.PagesGen.GROUP).cast("long"), minLen = 60)
    }
    println(s"[r7] sa rows ${sa.count()}")

    // LSH / IVF topk
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("emb_warm")(noop(emb))
    t("lsh_topk") {
      val c = graft.sim.Ann.PinnedLsh
      noop(graft.sim.Ann.lshTopK(emb, k = 5, bits = c.bits, tables = c.tables,
        seed = c.seed))
    }
    t("ivf_topk") {
      val c = graft.sim.Ann.PinnedIvf
      noop(graft.sim.Ann.ivfTopK(emb, k = 5, nCells = c.nCells, nProbe = c.nProbe))
    }
    t("exact_topk") {
      noop(graft.sim.Ann.exactTopK(emb, 0L until 20L, 5))
    }
    t("winnow_fps") {
      noop(graft.dedup.LongRepeats.winnowFingerprints(
        corpus.select(col("doc_id"), lower(col("text")).as("t")), 24, 12))
    }
    spark.stop()
  }
}
