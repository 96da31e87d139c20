package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of q149's substring-span dedup on a hand-computed fixture:
  * cross-doc duplication, overlapping-shingle merging (one maximal
  * span, not per-shingle spans), within-doc repetition (two disjoint
  * islands), full-coverage docs, and exclusion of dup-free / short docs.
  */
class SubstringSpanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  test("q149 merges overlapping duplicated shingles into maximal spans") {
    import spark.implicits._
    val docs = Seq(
      // docs 1+2 share exactly one shingle ("a b c d e" at i=1 of both)
      (1L, "a b c d e f g h", "en", "src0"),
      (2L, "a b c d e z z q r s", "en", "src0"),
      // docs 3+4 share two OVERLAPPING shingles (i=1,2) -> one merged span
      (3L, "p q r s t u v w x", "en", "src1"),
      (4L, "p q r s t u", "en", "src1"),
      // doc 5 repeats its own opening shingle at i=9 -> two disjoint islands
      (5L, "m n o p q x y z m n o p q", "en", "src2"),
      // dup-free doc and a <5-token doc: excluded from the output
      (6L, "aa bb cc dd ee ff", "en", "src3"),
      (7L, "xx yy zz", "en", "src3"))
      .map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("spanspec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q149_substring_spans")(spark, dir)
      .select("doc_id", "n_spans", "covered_tokens", "n_tokens", "dup_frac")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 1L, 5L, 8L, 5.0 / 8),
      (2L, 1L, 5L, 10L, 5.0 / 10),
      (3L, 1L, 6L, 9L, 6.0 / 9),
      (4L, 1L, 6L, 6L, 1.0),
      (5L, 2L, 10L, 13L, 10.0 / 13)))
  }
}
