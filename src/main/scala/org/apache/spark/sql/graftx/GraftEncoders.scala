package org.apache.spark.sql.graftx

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Encoders for collection types that `org.apache.spark.sql.Encoders` does
  * not expose statically (they normally come from `spark.implicits._`).
  */
object GraftEncoders {
  val longSeq: Encoder[Seq[Long]] = ExpressionEncoder()
  val longArray: Encoder[Array[Long]] = ExpressionEncoder()
}
