package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dedup._
import graft.pages.PagesGen

/** Dev probe: where does feature time go — kernel, cache build, or GC? */
object FeatProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "400000").toLong
    val spark = GraftSession.get("local[32]", 32)
    val cfg = DedupConfig()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = PagesGen.pages(spark, n, 42L, 64)
    t("gen count (no persist)")(docs.count())
    t("gen agg len (no persist)")(docs.agg(sum(length(col("text")))).collect())
    val cached = docs.persist(StorageLevel.MEMORY_AND_DISK)
    t("gen persist+count")(cached.count())
    t("cached re-agg")(cached.agg(sum(length(col("text")))).collect())
    val feats = MinHashLSH.features(cached, cfg)
    t("features count (no persist)")(feats.agg(sum(size(col("sh")))).collect())
    val fc = feats.persist(StorageLevel.MEMORY_AND_DISK)
    t("features persist+count")(fc.count())
    t("features cached re-agg")(fc.agg(sum(size(col("sh")))).collect())
    spark.stop()
  }
}
