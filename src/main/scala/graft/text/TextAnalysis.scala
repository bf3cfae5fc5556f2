package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-marker heuristic), quality scoring, token counting (whitespace +
  * BPE-ish subword estimate), document fingerprinting. Built-ins only (stay
  * codegen'd, SQL-oracle-expressible); the fingerprint uses the graft rolling
  * hash expression.
  */
object TextAnalysis {

  /** Marker stopwords per language — tiny deterministic n-gram-free
    * heuristic; precision is not the point, the pipeline shape is.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "de", "que", "los", "una", "es"))

  private def markerCount(textCol: String, words: Seq[String]): Column = {
    val lst = words.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(split(lower($textCol), ' '), x -> x IN ($lst)))")
  }

  /** (doc_id, lang_pred, en/de/fr/es marker counts). Deterministic argmax
    * with fixed tie order (en > de > fr > es); 'und' (undetermined) when no
    * marker hits at all.
    */
  def langId(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val withCounts = markers.foldLeft(docs.select(col(idCol), col(textCol))) {
      case (d, (lang, ws)) => d.withColumn(s"m_$lang", markerCount(textCol, ws))
    }
    // argmax with fixed priority: en beats de beats fr beats es on ties
    val pred = when(col("m_en") >= col("m_de") && col("m_en") >= col("m_fr")
        && col("m_en") >= col("m_es") && col("m_en") > 0, lit("en"))
      .when(col("m_de") >= col("m_fr") && col("m_de") >= col("m_es")
        && col("m_de") > 0, lit("de"))
      .when(col("m_fr") >= col("m_es") && col("m_fr") > 0, lit("fr"))
      .when(col("m_es") > 0, lit("es"))
      .otherwise(lit("und"))
    withCounts.select(col(idCol),
      col("m_en").cast("long").as("m_en"), col("m_de").cast("long").as("m_de"),
      col("m_fr").cast("long").as("m_fr"), col("m_es").cast("long").as("m_es"),
      pred.as("lang_pred"))
  }

  /** Quality features + a deterministic composite score: token count,
    * mean token length, stopword ratio, digit/punct char counts.
    */
  def quality(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val nTok = size(split(col(textCol), " ")).cast("long")
    val nChars = length(col(textCol)).cast("long")
    val stopHits = markerCount(textCol, markers.head._2).cast("long")
    val digits = (nChars - length(regexp_replace(col(textCol), "[0-9]", ""))).cast("long")
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      nChars.as("n_chars_text"),
      stopHits.as("stop_hits"),
      digits.as("n_digits"),
      // composite in fixed evaluation order; round for oracle comparison
      round(
        least(nTok.cast("double") / 100.0, lit(1.0)) * 0.5 +
          (stopHits.cast("double") / greatest(nTok, lit(1L)).cast("double")) * 0.3 +
          when(nChars > 0, lit(0.2)).otherwise(lit(0.0)),
        6).as("quality"))
  }

  /** Token counting: whitespace tokens + a BPE-ish subword estimate
    * (ceil(chars/4) is the classic large-vocab approximation) + distinct
    * token count.
    */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_ws_tokens"),
      ceil(length(col(textCol)).cast("double") / 4.0).cast("long").as("n_bpe_est"),
      size(array_distinct(split(lower(col(textCol)), " "))).cast("long").as("n_distinct"))

  /** 64-bit rolling content fingerprint per document (graft expression). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      gf.fingerprint64(gf.normalizeText(col(textCol))).as("fp64"),
      hex(gf.murmur128(gf.normalizeText(col(textCol)))).as("digest128"))
}
