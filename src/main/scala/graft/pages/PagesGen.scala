package graft.pages

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.functions.Impl.{fmix64, splitmix64}

/** One Common-Crawl-style page (BASELINE.json input_hint schema) plus the
  * hidden provenance columns tests use for ground truth (FIXTURES.md §2).
  */
case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    doc_id: Long,
    src_doc: Long, // base doc this row derives from (== doc_id for bases)
    mode: String   // unique | exact | near | swap | boiler | zero
)

/** Deterministic synthetic webtext corpus with controlled duplicate modes —
  * the Spark analogue of the reference's seeded perturbation generator
  * (/root/reference/include/data_generation.hpp:13-95, seed 1931; modes
  * Identical/Sparse/Swap/BeginningIdentical/Zero/Random ↦
  * exact/near/swap/boiler/zero/unique).
  *
  * Every row is a pure function of (seed, doc_id): generation distributes
  * embarrassingly over `spark.range(n)`, re-runs are byte-identical (the
  * input_hint invariant), and no partition sees another's RNG state.
  *
  * Layout: docs come in groups of 4; member 0 is the base, members 1..3
  * draw a mode. Ground-truth dup pairs = (member, base) for exact/near/swap.
  */
object PagesGen {

  final val GROUP = 4
  private final val VOCAB = 5000
  private final val HOSTS = 50

  /** Counter-based RNG stream: k-th draw for document id. */
  @inline private def rnd(seed: Long, id: Long, k: Long): Long =
    fmix64(splitmix64(seed ^ (id * 0x9e3779b97f4a7c15L)) ^ k * 0xbf58476d1ce4e5b9L)

  @inline private def uniform(r: Long): Double =
    ((r >>> 11).toDouble / (1L << 53).toDouble)

  /** Zipf-ish vocabulary draw (quadratic skew towards low word ids). */
  @inline private def word(r: Long): String = {
    val u = uniform(r)
    "w" + (u * u * VOCAB).toInt
  }

  private def baseWords(seed: Long, baseId: Long): Array[String] = {
    val n = 150 + (uniform(rnd(seed, baseId, 0)) * 450).toInt
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = word(rnd(seed, baseId, 100 + i)); i += 1 }
    out
  }

  private def boilerHeader(seed: Long, host: Int): Array[String] = {
    val out = new Array[String](40)
    var i = 0
    while (i < 40) { out(i) = word(rnd(seed, 0x5eed0000L + host, 7000 + i)); i += 1 }
    out
  }

  /** Mode of member m (1..3) of group g. Member 0 is always a base. */
  def modeOf(seed: Long, g: Long, m: Int): String = {
    if (m == 0) return "unique"
    val u = uniform(rnd(seed, g * 31 + m, 1))
    if (u < 0.20) "exact"
    else if (u < 0.40) "near"
    else if (u < 0.50) "swap"
    else if (u < 0.70) "boiler"
    else if (u < 0.75) "zero"
    else "unique"
  }

  /** Pure text generator for doc id (deterministic, partition-independent). */
  def genText(seed: Long, id: Long): (String, Long, String) = {
    val g = id / GROUP
    val m = (id % GROUP).toInt
    val baseId = g * GROUP
    val mode = modeOf(seed, g, m)
    val host = (g % HOSTS).toInt
    mode match {
      case "zero" =>
        ("", id, mode)
      case "unique" =>
        (baseWords(seed, id).mkString(" "), id, mode)
      case "exact" =>
        (baseWords(seed, baseId).mkString(" "), baseId, mode)
      case "near" =>
        // Sparse perturbation: ~2% word substitutions
        val w = baseWords(seed, baseId).clone()
        var i = 0
        while (i < w.length) {
          if (uniform(rnd(seed, id, 5000 + i)) < 0.02)
            w(i) = word(rnd(seed, id, 9000 + i))
          i += 1
        }
        (w.mkString(" "), baseId, mode)
      case "swap" =>
        // Swap two interior quarters (shifted duplicate)
        val w = baseWords(seed, baseId)
        val q = w.length / 4
        val out = new Array[String](w.length)
        System.arraycopy(w, 0, out, 0, q)
        System.arraycopy(w, 2 * q, out, q, q)
        System.arraycopy(w, q, out, 2 * q, q)
        System.arraycopy(w, 3 * q, out, 3 * q, w.length - 3 * q)
        (out.mkString(" "), baseId, mode)
      case "boiler" =>
        // BeginningIdentical: shared per-host header + unique body
        val body = baseWords(seed, id)
        ((boilerHeader(seed, host) ++ body).mkString(" "), id, mode)
    }
  }

  def genRow(seed: Long, id: Long): PageRow = {
    val (text, src, mode) = genText(seed, id)
    val g = id / GROUP
    val host = (g % HOSTS).toInt
    val langU = uniform(rnd(seed, id, 2))
    val lang = if (langU < 0.95) "en" else if (langU < 0.975) "de" else "fr"
    PageRow(
      url = s"https://host$host.example/p$id",
      warc_ts = new Timestamp(1767225600000L + id * 1000L), // 2026-01-01 + id sec
      html = ("<html><body>" + text + "</body></html>")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = text,
      lang = lang,
      doc_id = id,
      src_doc = src,
      mode = mode)
  }

  /** Distributed corpus with provenance columns (tests/bench only). */
  def pagesWithTruth(spark: SparkSession, n: Long, seed: Long = 42L,
                     partitions: Int = 0): Dataset[PageRow] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.map(id => genRow(seed, id))
  }

  /** Public `pages` table (input_hint schema, provenance stripped). */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            partitions: Int = 0): DataFrame =
    pagesWithTruth(spark, n, seed, partitions)
      .select("url", "warc_ts", "html", "text", "lang", "doc_id")

  /** Ground-truth directly-duplicated pairs (member, base): exact/near/swap. */
  def truePairs(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.functions._
    pagesWithTruth(spark, n, seed).toDF()
      .filter(col("mode").isin("exact", "near", "swap"))
      .select(col("src_doc").as("a"), col("doc_id").as("b"))
  }
}
