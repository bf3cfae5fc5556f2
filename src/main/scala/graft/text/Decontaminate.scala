package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Benchmark decontamination — find every document that contains any probe
  * string VERBATIM (the training-data hygiene pass that keeps eval-set
  * text out of a corpus). The reference has no analogue; this is an engine
  * addition in the spirit of SURVEY §2.12, built from the same winnowing
  * kernel as the long-repeat pass.
  *
  * Exactness: for probes of length ≥ gram+window−1, the winnowing guarantee
  * (Schleimer et al. §3: any match at least w+g−1 long shares a selected
  * fingerprint) holds POSITIONALLY here — a full gram-window inside the
  * occurrence is content-identical in doc and probe, so the rightmost-min
  * selection picks the same gram at the same relative offset in both.
  * Every occurrence therefore yields ≥1 correctly-aligned candidate
  * (start = docPos − probePos), and the exact substring verification
  * removes hash-collision and misaligned candidates. No false negatives,
  * no false positives.
  *
  * Scale shape (the decontamination reality: corpus ≫ probe set): probe
  * fingerprints (~2·len/window rows per probe) BROADCAST; the corpus side
  * streams one narrow (hash, doc, pos) fingerprint pass — no shuffle of
  * documents, no self-join. Verification joins text back per DISTINCT
  * candidate (doc, probe, start) only.
  */
object Decontaminate {

  /** (doc_id, probe_id, at): probes found verbatim in docs, `at` = 0-based
    * FIRST occurrence in the lowercased text. Probe strings must already be
    * lowercase (matching is over lower(textCol)) and ≥ gram+window−1 chars.
    */
  def matches(docs: DataFrame, probes: DataFrame,
              gram: Int = 24, window: Int = 12,
              idCol: String = "doc_id", textCol: String = "text",
              probeIdCol: String = "probe_id",
              probeCol: String = "probe",
              /** optional pre-materialized corpus fingerprints — MUST be
                * LongRepeats.winnowFingerprints over lower(textCol) of the
                * same docs at the same (gram, window); a session cache can
                * then share the one corpus pass with the repeat detector. */
              precomputedDocFps: Option[DataFrame] = None): DataFrame = {
    val nd = docs.select(col(idCol).as("doc_id"), lower(col(textCol)).as("nt"))
    val np = probes.select(col(probeIdCol).as("probe_id"), col(probeCol).as("p"))
    // ENFORCE the exactness precondition instead of documenting it: a probe
    // shorter than gram+window−1 is outside the winnowing guarantee and
    // would silently produce false negatives. The probe side is tiny
    // (broadcast by design), so the check is one cheap job.
    // NULL probes count as short too: length(NULL) is NULL (filter would
    // drop them) and a NULL probe silently yields zero fingerprints — the
    // exact silent-false-negative class this require eliminates
    val minProbe = gram + window - 1
    val nShort = np.filter(col("p").isNull || length(col("p")) < minProbe).count()
    require(nShort == 0,
      s"$nShort probe(s) NULL or shorter than gram+window-1 = $minProbe chars — " +
        "detection is only exact at or above that length; lengthen the " +
        "probes or lower (gram, window)")
    def fps(df: DataFrame, id: String, text: Column): DataFrame =
      df.select(col(id), explode(gf.winnow(text, gram, window)).as("f"))
        .select(col("f.hash").as("h"), col(id), col("f.pos").as("pos"))
    val docFps = precomputedDocFps.getOrElse(fps(nd, "doc_id", col("nt")))
    val probeFps = fps(np, "probe_id", col("p"))
      .withColumnRenamed("pos", "ppos")
    val cand = docFps.join(broadcast(probeFps), "h")
      .select(col("doc_id"), col("probe_id"),
        (col("pos") - col("ppos")).as("start"))
      .filter(col("start") >= 0)
      .distinct()
    cand
      .join(nd, "doc_id")
      .join(broadcast(np), "probe_id")
      .filter(expr("substring(nt, start + 1, length(p)) = p"))
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(min(col("start")).as("at"))
  }
}
