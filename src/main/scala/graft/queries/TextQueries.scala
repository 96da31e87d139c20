package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token stats,
  * quality scoring, language ID, document fingerprinting. These are
  * LLM-training-pipeline extensions (absent from the reference, whose
  * only scalar op is 64-bit equality — SURVEY.md §2.8); all built from
  * codegen'd builtin functions (split/filter/transform/md5), no UDFs.
  *
  * Cross-engine determinism: all ratios are computed from integer
  * counts with identical operation order in Spark and DuckDB, so the
  * doubles are bit-identical without rounding tricks.
  */
object TextQueries {
  import Tables.t

  def all: Seq[GQuery] = Seq(

    // token counting: whitespace tokenization, distinct counts, lengths
    GQuery(
      "q39_doc_token_stats",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", $"n_chars", split($"text", " ").as("w"))
          .select(
            $"doc_id",
            size($"w").cast("long").as("n_tokens"),
            size(array_distinct($"w")).cast("long").as("n_uniq"),
            (($"n_chars" - size($"w") + 1) * lit(1.0) / size($"w")).as("avg_token_len"))
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
             |  (n_chars - len(string_split(text, ' ')) + 1) * 1.0
             |    / len(string_split(text, ' ')) AS avg_token_len
             |FROM documents""".stripMargin),
      headline = true),

    // document fingerprinting: exact hash + order-insensitive
    // bag-of-words hash (catches token-reordered duplicates)
    GQuery(
      "q40_doc_fingerprint",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(
            $"doc_id",
            md5($"text".cast("binary")).as("exact_fp"),
            md5(array_join(array_sort(array_distinct(split($"text", " "))), " ")
              .cast("binary")).as("bow_fp"))
      },
      Some("""SELECT doc_id, md5(text) AS exact_fp,
             |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fp
             |FROM documents""".stripMargin)),

    // quality scoring: uniqueness + length + stopword-density mix
    GQuery(
      "q41_doc_quality",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "documents")
          .select($"doc_id", split($"text", " ").as("w"))
          .select(
            $"doc_id",
            size($"w").as("n"),
            size(array_distinct($"w")).as("nu"),
            expr("size(filter(w, t -> t IN ('the', 'a')))").as("stop"))
        base.select(
          $"doc_id",
          ($"nu" * lit(1.0) / $"n").as("uniq_ratio"),
          ($"stop" * lit(1.0) / $"n").as("stop_ratio"),
          ($"nu" * lit(1.0) / $"n" * lit(0.5)
            + least($"n", lit(50)) * lit(1.0) / lit(50.0) * lit(0.3)
            + (lit(1.0) - $"stop" * lit(1.0) / $"n") * lit(0.2)).as("quality"))
      },
      Some("""WITH b AS (SELECT doc_id,
             |    len(string_split(text, ' ')) AS n,
             |    len(list_distinct(string_split(text, ' '))) AS nu,
             |    len(list_filter(string_split(text, ' '),
             |        t -> t IN ('the', 'a'))) AS stop
             |  FROM documents)
             |SELECT doc_id,
             |  nu * 1.0 / n AS uniq_ratio,
             |  stop * 1.0 / n AS stop_ratio,
             |  nu * 1.0 / n * 0.5 + least(n, 50) * 1.0 / 50.0 * 0.3
             |    + (1.0 - stop * 1.0 / n) * 0.2 AS quality
             |FROM b""".stripMargin)),

    // language ID: marker-token heuristic (n-gram-style, argmax with
    // deterministic tie order), reported as a confusion matrix vs the
    // labeled lang column
    GQuery(
      "q42_doc_langid",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", $"lang", split($"text", " ").as("w"))
          .select($"doc_id", $"lang",
            expr("size(filter(w, t -> t IN ('the', 'a', 'and', 'of')))").as("en_hits"),
            expr("size(filter(w, t -> t IN ('el', 'la', 'de', 'los')))").as("es_hits"),
            expr("size(filter(w, t -> t IN ('le', 'les', 'et', 'un')))").as("fr_hits"))
          .select($"doc_id", $"lang",
            when($"en_hits" >= $"es_hits" && $"en_hits" >= $"fr_hits" && $"en_hits" > 0, "en")
              .when($"es_hits" >= $"fr_hits" && $"es_hits" > 0, "es")
              .when($"fr_hits" > 0, "fr")
              .otherwise("und").as("pred_lang"))
          .groupBy($"lang", $"pred_lang")
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH h AS (SELECT doc_id, lang,
             |    len(list_filter(string_split(text, ' '),
             |        t -> t IN ('the', 'a', 'and', 'of'))) AS en_hits,
             |    len(list_filter(string_split(text, ' '),
             |        t -> t IN ('el', 'la', 'de', 'los'))) AS es_hits,
             |    len(list_filter(string_split(text, ' '),
             |        t -> t IN ('le', 'les', 'et', 'un'))) AS fr_hits
             |  FROM documents)
             |SELECT lang,
             |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
             |       WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
             |       WHEN fr_hits > 0 THEN 'fr'
             |       ELSE 'und' END AS pred_lang,
             |  count(*) AS n
             |FROM h GROUP BY 1, 2""".stripMargin)),

    // BPE-style pre-tokenization: runs of letters / digits / single
    // punctuation (the GPT-2-ish split), compared against whitespace
    // tokens — the ratio is a fertility proxy a data pipeline tracks
    GQuery(
      "q64_bpe_token_count",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"))
              .cast("long").as("n_bpe"),
            size(split($"text", " ")).cast("long").as("n_ws"))
          .withColumn("fertility", $"n_bpe" * lit(1.0) / $"n_ws")
      },
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe,
             |  len(string_split(text, ' ')) AS n_ws,
             |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) * 1.0
             |    / len(string_split(text, ' ')) AS fertility
             |FROM documents""".stripMargin)),

    // polynomial rolling hash (h = h·31 + c mod 1e9+7) over the whole
    // document and over the 64-char prefix window — the Rabin-Karp
    // fingerprint a shingling/winnowing pipeline builds on; exact
    // integer folding in both engines
    GQuery(
      "q65_rolling_hash",
      (s, dir) => {
        import s.implicits._
        def roll(e: String) =
          expr(s"aggregate(transform(split($e, ''), ch -> cast(ascii(ch) as bigint)), " +
            "cast(0 as bigint), (acc, c) -> (acc * 31 + c) % 1000000007)")
        t(s, dir, "documents")
          .select($"doc_id",
            roll("text").as("roll_full"),
            roll("substring(text, 1, 64)").as("roll_prefix64"))
      },
      Some("""SELECT doc_id,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))),
             |    (acc, c) -> (acc * 31 + c) % 1000000007) AS roll_full,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(string_split(substr(text, 1, 64), ''), ch -> CAST(ascii(ch) AS BIGINT))),
             |    (acc, c) -> (acc * 31 + c) % 1000000007) AS roll_prefix64
             |FROM documents""".stripMargin))
  )
}
