package graft

import graft.functions.{gf, Impl}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite with SparkTestBase {

  test("expressions run under codegen and match Impl") {
    import spark.implicits._
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs"),
      (2L, "the quick brown fox jumps over the lazy dog")
    ).toDF("id", "text")

    val out = df.select(
      col("id"),
      hex(gf.murmur128(col("text"))).as("digest"),
      gf.hash64(col("text")).as("h64"),
      gf.simhash64(col("text")).as("sh"),
      gf.fingerprint64(col("text")).as("fp"),
      gf.shingles(col("text"), 3).as("sh3"),
      gf.minhash(gf.shingles(col("text"), 3), 128, 42L).as("sig")
    ).collect().sortBy(_.getLong(0))

    // rows 0 and 2 identical text → identical everything
    assert(out(0).getString(1) == out(2).getString(1))
    assert(out(0).getLong(2) == out(2).getLong(2))
    assert(out(0).getSeq[Long](5) == out(2).getSeq[Long](5))
    assert(out(0).getSeq[Long](6) == out(2).getSeq[Long](6))
    assert(out(0).getString(1) != out(1).getString(1))

    // matches direct Impl calls (same bytes through expression path)
    val t = "the quick brown fox jumps over the lazy dog"
    assert(out(0).getString(1).toLowerCase ==
      Impl.murmur128Digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out(0).getLong(2) == Impl.hash64(t))
    assert(out(0).getSeq[Long](5) ==
      Impl.shinglesFromWords(Impl.wordHashes(t.getBytes), 3).toSeq)
  }

  test("SQL-registered graft_* functions work via extensions") {
    import spark.implicits._
    Seq(("a b c d e", 1)).toDF("text", "i").createOrReplaceTempView("t_expr")
    val r = spark.sql(
      """SELECT graft_hash64(text) AS h,
        |       size(graft_shingles(text, 2)) AS n_sh,
        |       size(graft_minhash(graft_shingles(text, 2), 64, 42)) AS n_sig,
        |       graft_hamming(graft_simhash64(text), graft_simhash64(text)) AS hd,
        |       graft_jaccard(graft_shingles(text, 2), graft_shingles(text, 2)) AS j
        |FROM t_expr""".stripMargin).collect().head
    assert(r.getInt(1) == 4)
    assert(r.getInt(2) == 64)
    assert(r.getInt(3) == 0)
    assert(r.getDouble(4) == 1.0)
  }

  test("jaccard / intersect / hamming / cosine column functions") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val c = df.select(gf.cosine(col("a"), col("b")).as("c")).collect().head.getDouble(0)
    assert(math.abs(c - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("null inputs propagate as null") {
    import spark.implicits._
    val df = Seq((Option.empty[String], 1)).toDF("text", "i")
    val r = df.select(gf.hash64(col("text")), gf.simhash64(col("text")),
      gf.shingles(col("text"), 2)).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("whole-stage codegen stays enabled for the shingle→minhash→bands chain") {
    val df = spark.range(100)
      .select(col("id"), concat(lit("w"), col("id"), lit(" x y z a b c")).as("text"))
    val q = df.select(gf.bands(gf.minhash(gf.shingles(col("text"), 3), 128, 42L), 16).as("b"))
    val hasWSC = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWSC, s"codegen missing in:\n${q.queryExecution.executedPlan}")
    assert(q.collect().length == 100) // and the generated code actually runs
  }
}
