package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.functions.Impl

/** Multimodal columns: image/audio/video as opaque BINARY + typed metadata.
  *
  * The decode kernels are STUBS — no image/audio codecs ship in this
  * container — marked [STUB] below. Each stub is a deterministic pure
  * function of the bytes, so the Spark-side plumbing that matters at scale
  * (schema, batch iteration, partition-preserving mapPartitions, column
  * pruning of the heavy binary column) is real and tested; swapping a stub
  * for a JNI/codec call changes one function body.
  *
  * Batching shape mirrors Arrow-batched UDF execution: mapPartitions pulls
  * rows in groups of `batchSize` and processes each batch as one unit, which
  * is exactly the contract a vectorized decode kernel needs.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, false),
    StructField("kind", StringType, false), // image | audio | video
    StructField("bytes", BinaryType, false),
    StructField("meta", StructType(Seq(
      StructField("declared_w", IntegerType, false),
      StructField("declared_h", IntegerType, false),
      StructField("duration_ms", IntegerType, false),
      StructField("codec", StringType, false))), false)))

  /** Deterministic fake media table derived from the pages corpus (html bytes
    * stand in for encoded assets). Kind cycles image/audio/video.
    */
  def mediaFromPages(pages: DataFrame): DataFrame = {
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    pages.select(
      col("doc_id").as("asset_id"),
      kind.as("kind"),
      col("html").as("bytes"),
      struct(
        (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("declared_w"),
        (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("declared_h"),
        (pmod(col("doc_id"), lit(60)) * 1000 + 5000).cast("int").as("duration_ms"),
        lit("stub/v1").as("codec")).as("meta"))
  }

  /** [STUB] "decode" an image: width/height/channels + 16-bin byte histogram.
    * Real plumbing, fake pixels: every field is a pure function of the bytes.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    val h64 = Impl.hash64(bytes, 0, bytes.length)
    val hist = new Array[Int](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    (((h64 & 0x3ff) + 16).toInt, (((h64 >>> 10) & 0x3ff) + 16).toInt, 3, hist)
  }

  /** [STUB] "resize": deterministic w*h-byte payload derived from content. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.min(w * h, 4096))
    var s = Impl.hash64(bytes, 0, bytes.length)
    var i = 0
    while (i < out.length) { s = Impl.splitmix64(s); out(i) = (s & 0xff).toByte; i += 1 }
    out
  }

  /** [STUB] "frame sample": n deterministic frame digests from a video. */
  def frameSampleStub(bytes: Array[Byte], n: Int): Array[Array[Byte]] =
    Array.tabulate(n) { i =>
      Impl.murmur128Digest(bytes ++ Array[Byte]((i & 0xff).toByte))
    }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, false),
    StructField("kind", StringType, false),
    StructField("width", IntegerType, false),
    StructField("height", IntegerType, false),
    StructField("channels", IntegerType, false),
    // canonical CSV string, not array<int>: array columns are unhashable /
    // unsortable in the pandas-based compare harness
    StructField("hist", StringType, false),
    StructField("n_frames", IntegerType, false),
    StructField("batch_size_seen", IntegerType, false)))

  /** Batched decode/feature pass: partition-preserving mapPartitions over
    * batches of `batchSize` rows (the Arrow-UDF batch contract). The binary
    * column is the only heavy input; everything else prunes.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("asset_id", "kind", "bytes").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val bs = batch.size // real batch shape, observable by tests
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, h, c, hist) = decodeImageStub(bytes)
          val frames = if (kind == "video") frameSampleStub(bytes, 4).length else 0
          Row(id, kind, w, h, c, hist.mkString(","), frames, bs)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
