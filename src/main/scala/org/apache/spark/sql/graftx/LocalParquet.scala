package org.apache.spark.sql.graftx

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Driver-direct parquet writer for TINY frames whose rows already live on
  * the driver (a snapshot store's 1-row metrics table, a local-regime edge
  * list): writing them through `df.write.parquet` costs a full Spark job —
  * scheduling, an AQE stage, task launch — per commit, pure latency at
  * toy scale. This writes the same bytes through Spark's own
  * [[ParquetWriteSupport]] (so the file is indistinguishable from a
  * task-written one: identical schema conversion, logical types and rebase
  * handling), with ZERO jobs. Bounded callers only — every use sites a
  * driver-side row array that is already in memory by construction.
  */
object LocalParquet {

  private final class B(path: Path, conf: Configuration)
    extends ParquetWriter.Builder[InternalRow, B](path) {
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
    override def self(): B = this
  }

  /** Write `rows` (external Rows matching `schema`) as one parquet file.
    * Returns the row count written.
    */
  def write(spark: SparkSession, file: String, schema: StructType,
            rows: IterableOnce[Row]): Long = {
    val conf = spark.sessionState.newHadoopConf()
    // ParquetWriteSupport.init asserts these SQL confs are present in the
    // hadoop conf — FileFormat.prepareWrite sets them on the task side;
    // mirror the session's effective values here
    val sqlConf = spark.sessionState.conf
    for (key <- Seq(
        SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
        SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
        SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
        SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
        SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
        SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key))
      conf.set(key, sqlConf.getConfString(key))
    ParquetWriteSupport.setSchema(schema, conf)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    val writer = new B(new Path(file), conf)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    var n = 0L
    try rows.iterator.foreach { r =>
      writer.write(toCatalyst(r).asInstanceOf[InternalRow]); n += 1
    } finally writer.close()
    n
  }
}
