package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  /** The composable (builtin higher-order-function) spelling the native
    * expression must match bit-for-bit.
    */
  private val composed =
    """aggregate(zip_with(a, b, (x, y) -> cast(x as double) * y), cast(0.0 as double), (acc, v) -> acc + v)
      | / (sqrt(aggregate(transform(a, x -> cast(x as double) * x), cast(0.0 as double), (acc, v) -> acc + v))
      |    * sqrt(aggregate(transform(b, x -> cast(x as double) * x), cast(0.0 as double), (acc, v) -> acc + v)))""".stripMargin

  test("cosine_sim is registered via GraftExtensions and matches the composed form") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(0.3f, -0.7f, 0.1f), Array(-0.2f, 0.5f, 0.9f))
    ).toDF("a", "b")
    val rows = df.select(
        expr("cosine_sim(a, b)").as("native"),
        expr(composed).as("composed"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, c) => assert(n == c, s"native=$n composed=$c") }
    assert(math.abs(rows(0)._1 - 1.0) < 1e-12)
    assert(rows(1)._1 == 0.0)
  }

  test("cosine_sim agrees with the composed form on real embeddings") {
    import spark.implicits._
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = e.select($"vec_id", $"embedding".as("a"))
      .crossJoin(broadcast(
        e.filter($"vec_id" < 3).select($"embedding".as("b"))))
    val diff = pairs
      .select(expr("cosine_sim(a, b)").as("n"), expr(composed).as("c"))
      .filter($"n" =!= $"c")
      .count()
    assert(diff == 0)
  }

  test("cosine_sim null and zero-norm semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 2f)), None: Option[Array[Float]]),
      (Some(Array(0f, 0f)), Some(Array(1f, 2f)))
    ).toDF("a", "b")
    val out = df.select(expr("cosine_sim(a, b)")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0).isNaN)
  }

  test("dot_i64 matches the composed integer dot product exactly") {
    import spark.implicits._
    val composedDot =
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-10000L, 60000L), Array(60000L, -10000L)),
      (Array.empty[Long], Array.empty[Long])
    ).toDF("a", "b")
    val rows = df.select(
        expr("dot_i64(a, b)").as("n"), expr(composedDot).as("c"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, c) => assert(n == c) }
    assert(rows(0)._1 == 32L && rows(2)._1 == 0L)
    // on real quantized embeddings (the q47 hot loop)
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
        .as("a"))
    val pairs = e.crossJoin(broadcast(e.limit(3).select($"a".as("b"))))
    val diff = pairs
      .select(expr("dot_i64(a, b)").as("n"), expr(composedDot).as("c"))
      .filter($"n" =!= $"c").count()
    assert(diff == 0)
    // null semantics match the composed form
    val nulls = Seq((Some(Array(1L)), None: Option[Array[Long]])).toDF("a", "b")
    assert(nulls.select(expr("dot_i64(a, b)")).collect()(0).isNullAt(0))
  }

  test("nfc_normalize composes and strip_accents recovers the base letters") {
    import spark.implicits._
    // decomposed e+U+0301 vs precomposed \u00e9; ASCII passthrough;
    // standalone non-mark letters survive stripping; null propagates
    val df = Seq(
      Some("e\u0301cole"),   // decomposed
      Some("\u00e9cole"),    // precomposed
      Some("plain ascii"),
      Some("na\u00efve \u00f1o\u00f1o M\u00fcller"),
      Some("\u00f8 \u0111"), // letters, not combining marks
      None).toDF("s")
    val rows = df.select(
        expr("nfc_normalize(s)").as("nfc"),
        expr("strip_accents(s)").as("bare"),
        length(expr("nfc_normalize(s)")).as("n"))
      .collect()
    assert(rows(0).getString(0) == "\u00e9cole" && rows(0).getInt(2) == 5)
    assert(rows(1).getString(0) == "\u00e9cole")
    assert(rows(0).getString(1) == "ecole" && rows(1).getString(1) == "ecole")
    assert(rows(2).getString(0) == "plain ascii" &&
      rows(2).getString(1) == "plain ascii")
    assert(rows(3).getString(1) == "naive nono Muller")
    assert(rows(4).getString(1) == "\u00f8 \u0111")
    assert(rows(5).isNullAt(0) && rows(5).isNullAt(1))
    // the interpreted kernel must agree with what codegen calls
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.UnicodeNorm
      .nfc(UTF8String.fromString("e\u0301")).toString == "\u00e9")
    assert(graft.functions.UnicodeNorm
      .stripAccents(UTF8String.fromString("\u00e9")).toString == "e")
  }
}
