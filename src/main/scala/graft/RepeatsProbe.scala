package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: stage decomposition of the winnowing long-repeat pass at a
  * given SF — fingerprint scan vs bucket pairs vs the verify/extend join.
  */
object RepeatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", math.max(cpus, 8))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[repprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val n = SparkEntry.pagesN(sfDir)
    val docs = graft.pages.PagesGen.pages(spark, n, 42L, cpus * 2)
      .select("doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)
    t("corpus")(docs.count())
    val (gram, window, maxBucket) = (24, 12, 32)
    val norm = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("norm")(norm.count())
    val fps = norm
      .select(col("doc_id"), explode(graft.functions.gf.winnow(col("t"), gram, window)).as("f"))
      .select(col("f.hash").as("h"),
        struct(col("doc_id"), col("f.pos").as("pos")).as("e"))
    t("fingerprints")(println(s"[repprobe]   n_fps=${fps.count()}"))
    val cand = graft.dedup.MinHashLSH.boundedBucketPairs(fps, Seq("h"), maxBucket)
      .select(col("p.doc_id").as("a"), col("p.pos").as("pa"),
        col("q.doc_id").as("b"), col("q.pos").as("pb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("candidates")(println(s"[repprobe]   n_cand=${cand.count()}"))
    val out = graft.dedup.LongRepeats.verifyAndExtend(norm, cand, gram, gram + window - 1)
    t("verify+extend")(println(s"[repprobe]   n_spans=${out.count()}"))
    spark.stop()
  }
}
