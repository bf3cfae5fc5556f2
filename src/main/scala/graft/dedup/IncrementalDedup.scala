package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.state.SnapshotStore

/** Snapshot-over-snapshot near-dup dedup with checkpointed, resumable stages —
  * the engine's analogue of the reference's incremental checkpoint loop
  * (/root/reference/src/dedup_files.cpp:65-105).
  *
  * The dedup graph is keyed by CONTENT, not by document: a content unit
  * (ckey = content hash of normalized text) is immutable, so the registry,
  * feature, band-index and edge tables are append-only across snapshots —
  * no state row is ever invalidated when a url's text changes (the url just
  * points at a different content node). Per snapshot:
  *
  *   - FIXED fast path (F1/F2, basic_approach.cpp:36-44): urls whose ckey
  *     equals their previous snapshot's bypass all content work;
  *   - new ckeys register (first-presenting doc_id becomes the content_id —
  *     min-id election, J1/J2) and are shingled/banded ONCE ever;
  *   - LSH candidates: new bands vs the accumulated band index (the world is
  *     never re-banded — each content pair surfaces when its newer member
  *     arrives) + exact-Jaccard verification;
  *   - content-level connected components; documents inherit their content's
  *     cluster via two hash joins.
  *
  * Every stage runs through [[SnapshotStore.stage]]: a killed job rerun with
  * the same store resumes after the last committed stage (north_rule
  * resumability; per-partition lineage lands in each stage manifest).
  */
final class IncrementalDedup(spark: SparkSession, store: SnapshotStore,
                             cfg: DedupConfig = DedupConfig()) {

  /** Process snapshot `snap` of the pages table; returns (doc_id, cluster)
    * for this snapshot's documents. Idempotent.
    */
  def processSnapshot(snap: Int, pages: DataFrame): DataFrame = {
    val t0 = System.nanoTime()

    val keyed = store.stage("pages_keyed", snap) {
      pages.select(col("url"), col("doc_id"),
        gf.contentKey64(col("text")).as("ckey"), col("text"))
    }

    // F1/F2 fixed fast path: only urls with new/changed content continue
    val changed = store.stage("changed", snap) {
      if (snap == 0) keyed
      else {
        val prev = store.read("pages_keyed", snap - 1)
          .select(col("url"), col("ckey").as("prev_ckey"))
        keyed.join(prev, Seq("url"), "left")
          .filter(col("prev_ckey").isNull || col("prev_ckey") =!= col("ckey"))
          .drop("prev_ckey")
      }
    }

    // content registry (J1 insert-if-absent): ckey → content_id (min doc_id)
    def prevReg() = if (snap == 0) emptyReg() else store.read("registry", snap - 1)
    val registry = store.stage("registry", snap) {
      val fresh = changed.join(prevReg().select("ckey"), Seq("ckey"), "left_anti")
        .groupBy("ckey").agg(min("doc_id").as("content_id"))
      prevReg().unionByName(fresh)
    }

    // fresh content of THIS snapshot: registered here, banded once, never
    // re-processed (text comes from the electing document's row)
    val freshContent = changed
      .join(prevReg().select("ckey"), Seq("ckey"), "left_anti")
      .groupBy("ckey")
      .agg(min(struct(col("doc_id"), col("text"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.text").as("text"))

    val newFeatures = store.stage("features", snap) {
      MinHashLSH.features(freshContent, cfg)
        .withColumnRenamed("doc_id", "content_id")
    }

    val newBands = store.stage("band_index", snap) {
      newFeatures.select(col("content_id"),
        posexplode(gf.bands(col("sig"), cfg.bands)).as(Seq("band", "bh")))
    }

    // near-dup edges between content nodes (append-only)
    val edges = store.stage("edges", snap) {
      val allBands = store.readRange("band_index", 0, snap).drop("snapshot_id")
      val cand = newBands.select(col("band"), col("bh"), col("content_id").as("a"))
        .join(allBands.select(col("band"), col("bh"), col("content_id").as("b")),
          Seq("band", "bh"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct()
      val allFeatures = store.readRange("features", 0, snap)
        .drop("snapshot_id").withColumnRenamed("content_id", "doc_id")
      val near = MinHashLSH.verifiedPairs(allFeatures, cand, cfg).select("a", "b")
      val prevEdges = if (snap == 0) near.limit(0) else store.read("edges", snap - 1)
      prevEdges.unionByName(near).distinct()
    }

    // content-level clustering; min content_id = deterministic cluster label
    val contentClusters = store.stage("content_clusters", snap) {
      ConnectedComponents.assignAll(spark,
        registry.select(col("content_id")).distinct(), edges)
        .select(col("id").as("content_id"), col("cluster"))
    }

    // documents inherit their content's cluster (two hash joins, no rescan)
    val assignments = store.stage("assignments", snap) {
      keyed.select(col("doc_id"), col("ckey"))
        .join(registry.select("ckey", "content_id"), Seq("ckey"))
        .join(contentClusters, Seq("content_id"))
        .select(col("doc_id"), col("cluster"))
    }

    store.stage("metrics", snap, Map("stage" -> "snapshot_summary")) {
      import spark.implicits._
      Seq((snap, keyed.count(), changed.count(), newFeatures.count(),
        edges.count(), contentClusters.select("cluster").distinct().count(),
        (System.nanoTime() - t0) / 1000000))
        .toDF("snapshot", "n_pages", "n_changed", "n_new_content",
          "n_edges", "n_content_clusters", "elapsed_ms")
    }
    assignments
  }

  private def emptyReg(): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("ckey", "content_id")
  }
}
