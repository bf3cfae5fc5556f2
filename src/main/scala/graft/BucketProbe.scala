package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dedup._
import graft.functions.gf
import graft.pages.PagesGen

/** Dev probe: bucket-size distributions of the candidate generators. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "400000").toLong
    val spark = GraftSession.get("local[32]", 32)
    val cfg = DedupConfig()
    val docs = PagesGen.pages(spark, n, 42L, 64).persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val exact = ExactDedup.assignments(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val reps = docs.join(exact.filter(col("doc_id") === col("rep")).select("doc_id"), Seq("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] reps=${reps.count()}")

    val feats = MinHashLSH.features(reps, cfg)
    val bandSizes = feats
      .select(posexplode(gf.bands(col("sig"), cfg.bands)).as(Seq("band", "bh")))
      .groupBy("band", "bh").count()
    println("[probe] minhash band buckets: " +
      bandSizes.agg(max("count"), expr("percentile(count, 0.999)"), count(lit(1))).collect()(0))

    val fps = SimHashDedup.fingerprints(reps, "doc_id", "text")
    val blockSizes = fps.select(
      posexplode(array((0 until 4).map(i => gf.simhashBlock(col("sim64"), i)): _*))
        .as(Seq("blk", "bv")))
      .groupBy("blk", "bv").count()
    println("[probe] simhash block buckets: " +
      blockSizes.agg(max("count"), expr("percentile(count, 0.999)"), count(lit(1))).collect()(0))
    blockSizes.orderBy(desc("count")).show(10)
    spark.stop()
  }
}
