package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dedup._
import graft.pages.PagesGen

/** Dev profiling main: per-stage wall times of the flagship pipeline. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cores]", shufflePartitions = cores)
    val cfg = DedupConfig()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = PagesGen.pages(spark, n, 42L, cores * 2).persist(StorageLevel.MEMORY_AND_DISK)
    t("gen+persist")(docs.count())

    val exact = ExactDedup.assignments(docs).persist(StorageLevel.MEMORY_AND_DISK)
    t("exact_assignments")(exact.count())
    val reps = docs.join(exact.filter(col("doc_id") === col("rep")).select("doc_id"), Seq("doc_id"))
    val feats = MinHashLSH.features(reps, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    t("features(shingle+minhash)")(feats.count())
    val lshCand = MinHashLSH.candidatePairs(feats, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    t("lsh_candidates")(lshCand.count())
    val simPairs = SimHashDedup.hammingPairs(reps, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    t("simhash_candidates")(simPairs.count())
    val cand = lshCand.union(simPairs).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    t("candidate_union_distinct")(cand.count())
    val pairs = MinHashLSH.verifiedPairs(feats, cand, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    t("verify(jaccard)")(pairs.count())
    val edges = ExactDedup.edges(exact).select("a", "b").union(pairs.select("a", "b"))
    val assign = t("connected_components")(
      ConnectedComponents.assignAll(spark, docs.select(col("doc_id").as("id")), edges)
        .persist(StorageLevel.MEMORY_AND_DISK).count())
    println(s"[stage] done assign=$assign pairs=${pairs.count()} cand=${cand.count()}")
    spark.stop()
  }
}
