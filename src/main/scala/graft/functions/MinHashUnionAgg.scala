package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftx.GraftEncoders

/** Typed Aggregator (SURVEY.md §2.11): merges MinHash signatures by
  * elementwise min — the signature of the UNION of the group's shingle
  * sets — and finishes with the k-min cardinality estimate of the union.
  * The distributed-sketch analogue of the reference's distinct-map
  * cardinality (list_approach.cpp:88): per-group distinct-shingle counts in
  * one partial+final aggregation, no set materialization.
  */
object MinHashUnionAgg extends Aggregator[Seq[Long], Array[Long], Long] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig == null || sig.isEmpty) return buf
    if (buf.length == 0) return sig.toArray
    var i = 0
    while (i < buf.length) {
      val v = sig(i)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** k-min estimator: each slot's min is ~ Uniform(0,1)·(n+1)⁻¹ after
    * normalizing the signed 64-bit hash to [0,1); n̂ = m/Σu − 1.
    */
  override def finish(buf: Array[Long]): Long = {
    if (buf.length == 0) return 0L
    var su = 0.0
    var i = 0
    while (i < buf.length) {
      // map signed long to [0,1): flip sign bit, scale by 2^64
      su += ((buf(i) ^ Long.MinValue).toDouble / 1.8446744073709552e19) + 5.421e-20
      i += 1
    }
    math.max(0L, math.round(buf.length / su - 1))
  }

  override def bufferEncoder: Encoder[Array[Long]] = GraftEncoders.longArray
  override def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong

  private lazy val asUdaf =
    org.apache.spark.sql.functions.udaf(MinHashUnionAgg, GraftEncoders.longSeq)

  /** Column form: distinct-shingle estimate of the group's union. */
  def estimateDistinct(sig: Column): Column = asUdaf(sig)
}
