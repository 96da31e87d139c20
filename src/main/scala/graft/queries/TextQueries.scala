package graft.queries

import graft.scale.{BoundedWindow, ExactRank, GuardedBroadcast}
import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
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

  /** Number of BPE merges q376/q377 train — small enough for an
    * unrolled DuckDB-CTE oracle, large enough that merged tokens merge
    * AGAIN (the part iteration one can't exercise).
    */
  val BpeMerges = 6

  // learned merge table per (session, dataset) — training runs once,
  // tokenize-apply (q377) reuses q376's result
  private val bpeMemo = new graft.tools.BoundedMemo[
      (org.apache.spark.sql.SparkSession, String),
      Seq[(String, String, Long)]](4)

  /** Word relation for BPE: lowercased ASCII-alpha runs, ≥2 chars —
    * the ONE corpus-sized pass (map-side combine into a
    * vocabulary-sized (word, freq) relation); everything after runs at
    * vocabulary grain.
    */
  private def bpeWords(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Segmentation-state invariant shared by trainer, applier, and the
    * DuckDB oracle: tokens joined by TWO spaces, two spaces at both
    * ends ("  h  e  y  "). A merge (a,b→ab) is then the LITERAL
    * replace of " a  b " with " ab " — the single-space flanks leave
    * one space to the neighbor on each side, so the invariant is
    * preserved AND adjacent merge sites stay matchable under the
    * leftmost-non-overlapping semantics both engines' literal replace
    * share ("a b a b" merges twice; "a a a" greedily once — standard
    * BPE left-to-right application).
    */
  private val bpeSeg0 = "concat('  ', regexp_replace(word, '(.)', '$1  '))"

  private[graft] def bpeSegExpr(merges: Seq[(String, String, Long)]): String =
    merges.foldLeft(bpeSeg0) { case (e, (a, b, _)) =>
      s"replace($e, ' $a  $b ', ' $a$b ')"
    }

  /** BPE merge training, the driver loop: each iteration aggregates
    * adjacent-pair counts over the vocabulary-sized segmentation
    * relation (pair expansion is word-length-bounded inside the row;
    * the shuffle is pair-vocabulary-sized after map-side combine),
    * takes the top pair (ONE row to the driver — the inherent
    * sequential sync point of BPE; k driver round-trips total), and
    * folds the merge into the segmentation expression (a literal
    * replace — embarrassingly parallel, no shuffle). Ties break
    * (count DESC, a, b) so Spark and the unrolled-CTE oracle pick
    * identical merges.
    */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int): Seq[(String, String, Long)] =
    bpeMemo.getOrElseUpdate((s, dir), {
      val words = bpeWords(s, dir).cache()
      try bpeTrainLoop(words, k)
      finally { words.unpersist(); () }
    })

  /** The training loop over a (word, freq) relation, INCREMENTALLY
    * materialized: the segmented relation carries each round's state,
    * round i applies ONLY merge i (one literal replace) on top of the
    * previous round's lazily-checkpointed rows, and the lineage
    * truncates every [[BpeCheckpointEvery]] merges — per-round work is
    * one replace plus one pair aggregate, FLAT in the round index.
    * (The round-13 spelling re-evaluated an i-deep nested replace
    * chain over the BASE segmentation each round: O(k²) total replace
    * work and a Catalyst expression tree growing per round — invisible
    * at k=6, the wrong shape twice over at a real tokenizer's k≈30k.)
    * Merge choices are identical: the cumulative replaces commute with
    * nesting because both apply the same merges in the same order.
    * Old checkpoints unreference as `seg` rebinds, so the
    * ContextCleaner reclaims them; TextSpec pins flat per-round cost
    * at 96 merges and merge-sequence equality with the naive chain.
    */
  private[graft] val BpeCheckpointEvery = 4

  private[graft] def bpeTrainLoop(words: org.apache.spark.sql.DataFrame,
      k: Int,
      probe: org.apache.spark.sql.DataFrame => Unit = _ => ())
      : Seq[(String, String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var seg = words.select(col("freq"), expr(bpeSeg0).as("seg"))
      .localCheckpoint(eager = false)
    var sinceCp = 0
    var exhausted = false
    for (_ <- 1 to k if !exhausted) {
      probe(seg)
      val top = seg
        .select(col("freq"), expr("split(trim(seg), '  ')").as("tok"))
        .filter(size(col("tok")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(tok) - 1), j ->
            |  struct(element_at(tok, j) AS a,
            |         element_at(tok, j + 1) AS b))""".stripMargin)).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        out += ((a, b, c))
        seg = seg.withColumn("seg",
          expr(s"replace(seg, ' $a  $b ', ' $a$b ')"))
        sinceCp += 1
        if (sinceCp >= BpeCheckpointEvery) {
          seg = seg.localCheckpoint(eager = false)
          sinceCp = 0
        }
      }
    }
    out.toSeq
  }

  /** Ranked BPE apply at word grain — the arm for REAL merge counts,
    * where the chained-replace EXPRESSION (one nested `replace` per
    * merge) blows past codegen method limits around k≈10³ and costs
    * O(k·len) per word regardless of which merges fire. Semantics are
    * identical to the replace chain by construction: merges apply IN
    * RANK ORDER, each firing pass scanning the token sequence
    * left-to-right and merging non-overlapping occurrences (the
    * leftmost-non-overlapping contract the double-space literal
    * replace implements). Per word, a merge whose pair is absent
    * costs ONE hash probe against the current adjacent-pair set, so
    * the work is O(len + fired·len + k probes) — at k = 30k with
    * typical words firing a handful of merges, the probe stream
    * dominates and stays branch-predictable. The merge table ships
    * once as a bounded broadcast value (vocabulary-of-merges-sized,
    * never corpus-sized). Input rows (source, word, freq); output
    * adds `ntok`. AuditOpsSpec pins token-count equality with the
    * replace-chain expression over randomized vocabularies.
    */
  private[graft] def bpeTokensRanked(
      words: org.apache.spark.sql.DataFrame,
      merges: Seq[(String, String, Long)]): org.apache.spark.sql.DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val table = merges.map { case (a, b, _) => (a, b) }
    val bc = graft.scale.GuardedBroadcast.boundedValue(
      spark, table, "BPE merge table")
    words.select(col("source"), col("word"), col("freq"))
      .as[(String, String, Long)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (source, word, freq) =>
          var toks: Array[String] = word.split("").filter(_.nonEmpty)
          if (toks.length >= 2) {
            // current adjacent-pair set: O(1) skip for absent merges
            var pairs = scala.collection.mutable.HashSet.empty[(String, String)]
            var i = 0
            while (i + 1 < toks.length) {
              pairs += ((toks(i), toks(i + 1))); i += 1
            }
            ms.foreach { case (a, b) =>
              if (pairs.contains((a, b))) {
                val out = scala.collection.mutable.ArrayBuffer.empty[String]
                var j = 0
                while (j < toks.length) {
                  if (j + 1 < toks.length && toks(j) == a && toks(j + 1) == b) {
                    out += a + b; j += 2
                  } else { out += toks(j); j += 1 }
                }
                toks = out.toArray
                pairs = scala.collection.mutable.HashSet.empty[(String, String)]
                var p = 0
                while (p + 1 < toks.length) {
                  pairs += ((toks(p), toks(p + 1))); p += 1
                }
              }
            }
          }
          (source, word, freq, toks.length.toLong)
        }
      }.toDF("source", "word", "freq", "ntok")
  }

  // q381's trained model (per-step weights + accuracy) per
  // (session, dataset) — training runs once; the apply arm (q382) and
  // the streaming scorer reuse the learned weights
  private val clfMemo = new graft.tools.BoundedMemo[
      (org.apache.spark.sql.SparkSession, String),
      Seq[(Long, Long, Long, Long, Long)]](4)

  /** q381/q382's feature relation: exact fixed-point document
    * features + the distillation label (unique-token ratio ≥ 600‰).
    */
  private def clfFeatures(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    t(s, dir, "documents")
      .withColumn("uniq", expr(
        """cast(size(array_distinct(split(text, ' '))) as bigint) * 1000
          |  div cast(size(split(text, ' ')) as bigint)""".stripMargin))
      .select(col("source"),
        when(col("uniq") >= 600, 1000L).otherwise(0L).as("y"),
        lit(100L).as("x0"),
        (least(col("n_chars").cast("long"), lit(1000L)) - 500L).as("x1"),
        (lit(500L) - col("uniq")).as("x2"))

  /** Final trained weights (w0, w1, w2) of the q381 classifier — the
    * composition surface q389's release gate scores with.
    */
  private[queries] def trainedWeights(s: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Long, Long) = {
    val w = clfTrain(s, dir).last
    (w._2, w._3, w._4)
  }

  /** The q381 training loop (see the q381 comment for the math):
    * 6 full-batch gradient steps + a final eval pass, every step ONE
    * map-side-combined aggregate; returns (step, w0, w1, w2,
    * n_correct) rows, memoized per (session, dataset).
    */
  private def clfTrain(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Long, Long, Long, Long, Long)] =
    clfMemo.getOrElseUpdate((s, dir), {
      val feat = clfFeatures(s, dir).cache()
      try {
        var w = Array(0L, 0L, 0L)
        val rows = Seq.newBuilder[(Long, Long, Long, Long, Long)]
        def pass(): (Array[Long], Long, Long) = {
          val r = feat
            .withColumn("z", expr(
              s"${w(0)}L * x0 + ${w(1)}L * x1 + ${w(2)}L * x2"))
            .withColumn("yh", expr(
              "greatest(0L, least(1000L, 500L + z div 4000))"))
            .agg(
              sum((col("yh") - col("y")) * col("x0")),
              sum((col("yh") - col("y")) * col("x1")),
              sum((col("yh") - col("y")) * col("x2")), count(lit(1)),
              sum(when((col("yh") >= 500) === (col("y") === 1000), 1L)
                .otherwise(0L)))
            .head()
          (Array(r.getLong(0), r.getLong(1), r.getLong(2)),
            r.getLong(3), r.getLong(4))
        }
        for (step <- 1L to 6L) {
          val (sums, n, nc) = pass()
          w = w.zip(sums).map { case (wj, sj) => wj - sj / (n * 200L) }
          rows += ((step, w(0), w(1), w(2), nc))
        }
        val (_, _, ncFinal) = pass()
        rows += ((7L, w(0), w(1), w(2), ncFinal))
        rows.result()
      } finally { feat.unpersist(); () }
    })

  /** Unrolled DuckDB mirror of one training iteration: pair counts
    * over s{i-1}, top-1 by (count DESC, a, b), literal-replace into
    * s{i} via scalar subqueries. Every CTE is MATERIALIZED — DuckDB
    * inlines CTEs by default, and each level here references the
    * previous one several times (the replace pattern reads t{i}
    * thrice), so inlining would re-evaluate s0 ~4^k times.
    */
  private def bpeOracleSteps(k: Int): String = {
    val base =
      """w AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
        |        FROM documents)
        |  WHERE length(word) >= 2 GROUP BY 1),
        |s0 AS MATERIALIZED (SELECT '  ' || regexp_replace(word, '(.)', '\1  ', 'g') AS seg, freq
        |       FROM w)""".stripMargin
    val steps = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (SELECT t.a AS a, t.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq,
         |      unnest(list_transform(generate_series(1, len(tok) - 1),
         |        j -> {'a': tok[j], 'b': tok[j + 1]})) AS t
         |    FROM (SELECT string_split(trim(seg), '  ') AS tok, freq FROM s${i - 1})
         |    WHERE len(tok) >= 2)
         |  GROUP BY 1, 2),
         |t$i AS MATERIALIZED (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
         |s$i AS MATERIALIZED (SELECT replace(seg,
         |    ' ' || (SELECT a FROM t$i) || '  ' || (SELECT b FROM t$i) || ' ',
         |    ' ' || (SELECT a FROM t$i) || (SELECT b FROM t$i) || ' ') AS seg, freq
         |  FROM s${i - 1})""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

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
             |FROM documents""".stripMargin)),

    // BM25 retrieval scoring for a fixed 3-term query (k1=1.2, b=0.75).
    // idf is kept rational — (N − df + 0.5)/(df + 0.5), Robertson's idf
    // without the log, because libm transcendentals are not bit-portable
    // across engines. Every per-term score is ONE fixed-shape double
    // expression over exact integer stats (same operation tree in Spark
    // and DuckDB ⇒ bit-identical); the three term scores add in fixed
    // left-assoc order and the total floor-quantizes to 1e-4 (the
    // OracleNum discipline without an aggregation).
    // Scale shape: corpus stats (N, Σdl, per-term df) are ONE tiny
    // aggregate broadcast back over a single documents scan — no
    // corpus-sized shuffle, no per-term join.
    GQuery(
      "q80_bm25",
      (s, dir) => {
        import s.implicits._
        val terms = Seq("spark", "join", "hash")
        val docs = t(s, dir, "documents")
          .select($"doc_id", split($"text", " ").as("w"))
          .select(($"doc_id" +: size($"w").cast("long").as("dl") +:
            terms.indices.map(i =>
              expr(s"size(filter(w, t -> t = '${terms(i)}'))")
                .cast("long").as(s"tf$i"))): _*)
        val aggExprs = count(lit(1)).as("n") +: sum($"dl").as("sumdl") +:
          terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
        val stats = docs.agg(aggExprs.head, aggExprs.tail: _*)
          .withColumn("avgdl", $"sumdl".cast("double") / $"n")
        def score(i: Int) = {
          val tf = col(s"tf$i"); val df = col(s"df$i")
          (($"n" - df + lit(0.5)) / (df + lit(0.5))) *
            ((tf * lit(2.2)) /
              (tf + lit(1.2) * (lit(0.25) + lit(0.75) * ($"dl" / $"avgdl"))))
        }
        docs.crossJoin(GuardedBroadcast.maybe(stats))
          .filter($"tf0" + $"tf1" + $"tf2" > 0)
          .select($"doc_id",
            floor((score(0) + score(1) + score(2)) * 10000 + 0.5)
              .cast("long").as("score_q"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
             |    CAST(len(list_filter(string_split(text, ' '), t -> t = 'spark')) AS BIGINT) AS tf0,
             |    CAST(len(list_filter(string_split(text, ' '), t -> t = 'join')) AS BIGINT) AS tf1,
             |    CAST(len(list_filter(string_split(text, ' '), t -> t = 'hash')) AS BIGINT) AS tf2
             |  FROM documents),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(dl) AS BIGINT) AS sumdl,
             |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
             |  FROM d),
             |stx AS (SELECT n, df0, df1, df2, CAST(sumdl AS DOUBLE) / n AS avgdl FROM st)
             |SELECT doc_id, CAST(floor((
             |    ((n - df0 + 0.5) / (df0 + 0.5)) * ((tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
             |  + ((n - df1 + 0.5) / (df1 + 0.5)) * ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
             |  + ((n - df2 + 0.5) / (df2 + 0.5)) * ((tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
             |  ) * 10000 + 0.5) AS BIGINT) AS score_q
             |FROM d, stx WHERE tf0 + tf1 + tf2 > 0""".stripMargin)),

    // deterministic hash sampling, stratified by language: keep a doc
    // iff an md5-derived bucket of its id falls under the stratum's
    // rate (en 20%, others 50%). The predicate is a pure function of
    // the row — at 100 TB it pushes into the scan, needs no shuffle, no
    // RNG state, and re-runs reproducibly on any engine or cluster
    // (seeded `sample()` is implementation-defined across engines).
    GQuery(
      "q82_hash_sample",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("bucket",
            conv(substring(md5(concat($"doc_id".cast("string"), lit(":s1"))
              .cast("binary")), 1, 8), 16, 10).cast("long") % 100)
          .filter($"bucket" < when($"lang" === "en", 20L).otherwise(50L))
          .select($"doc_id", $"lang", $"bucket")
      },
      Some("""SELECT doc_id, lang, bucket FROM (
             |  SELECT doc_id, lang,
             |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':s1')), 1, 8)) AS BIGINT) % 100 AS bucket
             |  FROM documents)
             |WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 50 END""".stripMargin)),

    // vocabulary building: corpus token frequencies + document
    // frequencies with a min-count threshold — the tokenizer-training
    // input step. One explode + one groupBy (map-side partial counts);
    // the threshold keeps the output vocabulary-sized, not corpus-sized.
    GQuery(
      "q88_vocab",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", explode(split($"text", " ")).as("tk"))
          .groupBy($"tk")
          .agg(count(lit(1)).as("freq"),
            countDistinct($"doc_id").as("n_docs"))
          .filter($"freq" >= 50)
      },
      Some("""SELECT tk, CAST(count(*) AS BIGINT) AS freq,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
             |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
             |      FROM documents)
             |GROUP BY tk HAVING count(*) >= 50""".stripMargin)),

    // concat-and-chunk sequence packing: documents concatenated in
    // doc_id order, chunk boundaries every 512 tokens — each doc maps
    // to the [first, last] chunk index it lands in (the GPT-style
    // training-sequence prep). Scale shape: a GLOBAL running sum would
    // put every row in one window partition, so the prefix sum is
    // two-phase — per-block partial sums (tiny: one row per 100 docs),
    // a block-level prefix over that small relation, then a
    // block-partitioned within-block cumsum. Every data-sized window
    // stays partitioned; the only global pass is over block sums.
    GQuery(
      "q95_sequence_pack",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
          .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
          .withColumn("b", expr("doc_id div 100"))
        val bsums = docs.groupBy($"b").agg(sum($"n").as("bn"))
        val wb = BoundedWindow.ordered($"b")
          .rowsBetween(Window.unboundedPreceding, -1)
        val bpre = bsums
          .withColumn("bpre", coalesce(sum($"bn").over(wb), lit(0L)))
          .select($"b", $"bpre")
        val wi = Window.partitionBy($"b").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        docs.join(GuardedBroadcast.maybe(bpre), Seq("b"))
          .withColumn("cb", $"bpre" + coalesce(sum($"n").over(wi), lit(0L)))
          .select($"doc_id", $"n".as("n_tokens"),
            floor($"cb" / lit(512.0)).cast("long").as("chunk_first"),
            floor(($"cb" + $"n" - 1) / lit(512.0)).cast("long").as("chunk_last"))
          .withColumn("n_chunks", $"chunk_last" - $"chunk_first" + lit(1L))
      },
      Some("""SELECT doc_id, n AS n_tokens,
             |  CAST(floor(cb / 512.0) AS BIGINT) AS chunk_first,
             |  CAST(floor((cb + n - 1) / 512.0) AS BIGINT) AS chunk_last,
             |  CAST(floor((cb + n - 1) / 512.0) - floor(cb / 512.0) + 1 AS BIGINT) AS n_chunks
             |FROM (
             |  SELECT doc_id, len(string_split(text, ' ')) AS n,
             |    coalesce(sum(len(string_split(text, ' '))) OVER (
             |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
             |  FROM documents)""".stripMargin)),

    // repetition-ratio quality signal: the most frequent bigram's share
    // of all bigrams per document — high ratio = boilerplate/looping
    // text, the n-gram-repetition filter of a web-scale pipeline. One
    // explode + per-doc groupBy; ratios divide exact integer counts.
    GQuery(
      "q97_repetition_ratio",
      (s, dir) => {
        import s.implicits._
        val bi = t(s, dir, "documents")
          .select($"doc_id", split($"text", " ").as("w"))
          .filter(size($"w") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
            .as("bg"))
        bi.groupBy($"doc_id", $"bg").agg(count(lit(1)).as("cnt"))
          .groupBy($"doc_id")
          .agg(sum($"cnt").cast("long").as("n_bigrams"),
            max($"cnt").as("top_rep"))
          .withColumn("rep_ratio", $"top_rep" * lit(1.0) / $"n_bigrams")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
             |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
             |             FROM toks WHERE len(w) >= 2)),
             |c AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
             |  CAST(max(cnt) AS BIGINT) AS top_rep,
             |  max(cnt) * 1.0 / CAST(sum(cnt) AS BIGINT) AS rep_ratio
             |FROM c GROUP BY doc_id""".stripMargin)),

    // within-doc repetition REMOVAL (the transformation q97's ratio
    // only detects): over the same non-overlapping 2-token chunk grid
    // as q113, keep the first occurrence of each chunk per document —
    // dedup is per-doc (partial aggregation collapses everything
    // map-side when docs are partition-local; no cross-doc shuffle of
    // chunk text, only of per-doc counts)
    GQuery(
      "q119_repetition_removal",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", split($"text", " ").as("w"))
          .filter(size($"w") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(1, size(w) div 2), i -> " +
              "concat_ws(' ', element_at(w, CAST((i-1)*2+1 AS INT)), " +
              "element_at(w, CAST(i*2 AS INT))))"))
            .as("chunk"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            countDistinct($"chunk").as("kept_chunks"),
            (count(lit(1)) - countDistinct($"chunk")).as("dropped_chunks"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
             |           FROM documents),
             |c AS (SELECT doc_id,
             |        list_aggregate(w[(i-1)*2+1:i*2], 'string_agg', ' ') AS chunk
             |      FROM (SELECT doc_id, w,
             |              unnest(generate_series(1, len(w) // 2)) AS i
             |            FROM w WHERE len(w) >= 2))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(count(DISTINCT chunk) AS BIGINT) AS kept_chunks,
             |  CAST(count(*) - count(DISTINCT chunk) AS BIGINT) AS dropped_chunks
             |FROM c GROUP BY 1""".stripMargin)),

    // collocation scoring: corpus-wide bigram lift — the log-free PMI
    // form `P(ab) / (P(a)·P(b)) = n_ab·T² / (B·n_a·n_b)` (phrase-mining
    // / tokenizer-merge-candidate step). Numerator and denominator stay
    // exact BIGINTs (all counts < 2^53 headroom at bench scales), so the
    // single divide is bit-identical across engines — the rational
    // discipline that replaces non-portable log() PMI. One explode +
    // three hash aggregates + two broadcast joins; min-count 20 keeps
    // the output phrase-sized.
    GQuery(
      "q107_bigram_lift",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val toks = docs.select(explode(split($"text", " ")).as("tk"))
        val bi = docs.select(split($"text", " ").as("w"))
          .filter(size($"w") >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))"))
            .as("p"))
          .select($"p.a".as("a"), $"p.b".as("b"))
        val na = toks.groupBy($"tk").agg(count(lit(1)).as("n"))
        val totals = toks.agg(count(lit(1)).as("tt"))
          .crossJoin(bi.agg(count(lit(1)).as("bb")))
        bi.groupBy($"a", $"b").agg(count(lit(1)).as("n_ab"))
          .filter($"n_ab" >= 20)
          .join(GuardedBroadcast.maybe(na.select($"tk".as("a"), $"n".as("n_a"))), Seq("a"))
          .join(GuardedBroadcast.maybe(na.select($"tk".as("b"), $"n".as("n_b"))), Seq("b"))
          .crossJoin(GuardedBroadcast.maybe(totals))
          .select($"a", $"b", $"n_ab",
            (($"n_ab" * $"tt" * $"tt").cast("double") /
              ($"bb" * $"n_a" * $"n_b").cast("double")).as("lift"))
      },
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
             |w AS (SELECT string_split(text, ' ') AS w FROM documents),
             |bi AS (SELECT w[i] AS a, w[i+1] AS b
             |       FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
             |             FROM w WHERE len(w) >= 2)),
             |na AS (SELECT tk, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM toks),
             |btot AS (SELECT CAST(count(*) AS BIGINT) AS bb FROM bi),
             |nab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
             |        FROM bi GROUP BY 1, 2 HAVING count(*) >= 20)
             |SELECT a, b, n_ab,
             |  CAST(n_ab * tt * tt AS DOUBLE) / CAST(bb * x.n * y.n AS DOUBLE) AS lift
             |FROM nab
             |JOIN na x ON x.tk = a
             |JOIN na y ON y.tk = b
             |CROSS JOIN tot CROSS JOIN btot""".stripMargin)),

    // cross-document boilerplate removal (the CCNet/RefinedWeb line-
    // dedup step, over fixed 2-token chunks since the synthetic corpus
    // has no newlines): a chunk appearing in more than F distinct docs
    // is boilerplate; per-doc output counts surviving content. Shape:
    // one explode, one distinct-count aggregate, and a broadcast of the
    // (threshold-bounded) boilerplate set back onto the chunk stream —
    // at real scale the chunk key would be xxhash64'd to an 8-byte
    // join key, exactly as the shingle dedup family does.
    GQuery(
      "q113_boilerplate",
      (s, dir) => {
        import s.implicits._
        // the chunk relation feeds BOTH the df aggregate and the
        // rejoin; materialize it once instead of exploding twice
        // (the q58 shingle lesson)
        val chunks = t(s, dir, "documents")
          .select($"doc_id", split($"text", " ").as("w"))
          .filter(size($"w") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(1, size(w) div 2), i -> " +
              "concat_ws(' ', element_at(w, CAST((i-1)*2+1 AS INT)), " +
              "element_at(w, CAST(i*2 AS INT))))"))
            .as("chunk"))
          .localCheckpoint()
        val boiler = chunks.groupBy($"chunk")
          .agg(countDistinct($"doc_id").as("df"))
          .filter($"df" > 10)
          .select($"chunk", lit(1).as("__b"))
        // df-thresholded ⇒ boilerplate-sized, but the bound is an
        // argument, not a guarantee: the guard measures the set and
        // falls back to a shuffle join if it outgrows the threshold
        chunks.join(graft.scale.GuardedBroadcast.maybe(boiler),
            Seq("chunk"), "left_outer")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when($"__b".isNotNull, 1L).otherwise(0L)).as("n_boiler"),
            (lit(2L) * sum(when($"__b".isNotNull, 0L).otherwise(1L)))
              .as("kept_tokens"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
             |           FROM documents),
             |c AS (SELECT doc_id,
             |        list_aggregate(w[(i-1)*2+1:i*2], 'string_agg', ' ') AS chunk
             |      FROM (SELECT doc_id, w,
             |              unnest(generate_series(1, len(w) // 2)) AS i
             |            FROM w WHERE len(w) >= 2)),
             |b AS (SELECT chunk FROM c GROUP BY chunk
             |      HAVING count(DISTINCT doc_id) > 10)
             |SELECT c.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(sum(CASE WHEN b.chunk IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             |    AS n_boiler,
             |  CAST(2 * sum(CASE WHEN b.chunk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS kept_tokens
             |FROM c LEFT JOIN b USING (chunk)
             |GROUP BY 1""".stripMargin)),

    // sliding-window chunking (context-window prep): overlapping
    // 20-token windows at stride 10 per document, deterministic chunk
    // ids — one explode per doc, no shuffle until the caller's next
    // op. Chunk count = ceil((n-20)/10)+1 (min 1); the final window
    // may run short (slice truncates at the document end), so every
    // token lands in at least one chunk and none repeat beyond the
    // designed overlap.
    GQuery(
      "q116_chunking",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", split($"text", " ").as("w"))
          .select($"doc_id", explode(expr(
            "transform(sequence(0, (greatest(size(w) - 20, 0) + 9) div 10), " +
              "i -> struct(CAST(i AS INT) AS cid, " +
              "slice(w, CAST(i * 10 + 1 AS INT), 20) AS toks))"))
            .as("c"))
          .select($"doc_id", $"c.cid".as("chunk_id"),
            size($"c.toks").cast("long").as("chunk_len"),
            element_at($"c.toks", 1).as("first_tok"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
             |           FROM documents),
             |c AS (SELECT doc_id, w,
             |        unnest(generate_series(0,
             |          (greatest(len(w) - 20, 0) + 9) // 10)) AS i
             |      FROM w)
             |SELECT doc_id, CAST(i AS INT) AS chunk_id,
             |  CAST(len(w[i*10+1:i*10+20]) AS BIGINT) AS chunk_len,
             |  w[i*10+1] AS first_tok
             |FROM c""".stripMargin)),

    // adaptive quality threshold: keep each language's above-median
    // half by distinct-token ratio — the data-dependent cousin of a
    // fixed quality cutoff. The median is EXACT rank arithmetic
    // (rank·2 > count), not approx_percentile, so it is cross-engine
    // deterministic and still one window pass per language partition;
    // the ratio itself is a single IEEE divide of exact integers.
    GQuery(
      "q121_adaptive_quality",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"lang", split($"text", " ").as("w"))
          .select($"doc_id", $"lang",
            (size(array_distinct($"w")).cast("double") / size($"w")).as("q"))
        val rw = Window.partitionBy($"lang").orderBy($"q".asc, $"doc_id".asc)
        val cw = Window.partitionBy($"lang")
        docs.withColumn("rk", row_number().over(rw))
          .withColumn("cnt", count(lit(1)).over(cw))
          .filter($"rk" * 2 > $"cnt")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_kept"), min($"q").as("min_q"),
            max($"q").as("max_q"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
             |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |      / len(string_split(text, ' ')) AS q
             |  FROM documents),
             |r AS (SELECT lang, q,
             |    row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rk,
             |    count(*) OVER (PARTITION BY lang) AS cnt
             |  FROM d)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
             |  min(q) AS min_q, max(q) AS max_q
             |FROM r WHERE rk * 2 > cnt GROUP BY lang""".stripMargin)),

    // keyword extraction: top-3 terms per document ranked by term
    // frequency, tie-broken by corpus rarity (ascending document
    // frequency) then term — the rank-by-integers form of tf-idf that
    // needs no log() (non-portable across engines). The df relation is
    // vocabulary-sized and broadcast; the per-doc window never shuffles
    // more than the tf rows.
    GQuery(
      "q124_keywords",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val toks = t(s, dir, "documents")
          .select($"doc_id", explode(split($"text", " ")).as("term"))
        val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        val dfreq = toks.select($"doc_id", $"term").distinct()
          .groupBy($"term").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy($"doc_id")
          .orderBy($"tf".desc, $"df".asc, $"term".asc)
        tf.join(GuardedBroadcast.maybe(dfreq), Seq("term"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter($"rank" <= 3)
          .select($"doc_id", $"rank", $"term", $"tf", $"df")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |              FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
             |       FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1)
             |SELECT doc_id, rank, term, tf, df FROM (
             |  SELECT doc_id, term, tf, df,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY tf DESC, df, term) AS rank
             |  FROM tf JOIN df USING (term))
             |WHERE rank <= 3""".stripMargin)),

    // domain mixing: deterministically downsample every language to the
    // smallest language's share (uniform target mix). The keep decision
    // is pure integer arithmetic on an md5 bucket — `bucket/1e6 <
    // min_cnt/cnt` cross-multiplied to avoid any float — so membership
    // is reproducible, engine-independent, and needs no global sort or
    // reservoir state: one count aggregate, one broadcast, one scan.
    GQuery(
      "q98_domain_mix",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"lang",
            (conv(substring(md5(concat($"doc_id".cast("string"), lit(":mix"))
              .cast("binary")), 1, 8), 16, 10).cast("long") % 1000000L)
              .as("bucket"))
        val counts = docs.groupBy($"lang").agg(count(lit(1)).as("cnt"))
        val minc = counts.agg(min($"cnt").as("mn"))
        docs.join(GuardedBroadcast.maybe(counts), Seq("lang"))
          .crossJoin(GuardedBroadcast.maybe(minc))
          .filter($"bucket" * $"cnt" < $"mn" * lit(1000000L))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_kept"), max($"cnt").as("n_total"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
             |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':mix')), 1, 8)) AS BIGINT) % 1000000 AS bucket
             |  FROM documents),
             |c AS (SELECT lang, count(*) AS cnt FROM d GROUP BY 1),
             |m AS (SELECT min(cnt) AS mn FROM c)
             |SELECT lang, count(*) AS n_kept, CAST(max(cnt) AS BIGINT) AS n_total
             |FROM d JOIN c USING (lang) CROSS JOIN m
             |WHERE bucket * cnt < mn * 1000000
             |GROUP BY lang""".stripMargin)),

    // per-source corpus curation report: the provenance-level view a
    // crawl pipeline triages by — volume, language spread, exact-dup
    // rate (md5 fingerprints), and total characters per source. One
    // hash aggregate; at 100 TB the fingerprint is the same 8-byte-ish
    // shuffle key every dedup op here uses, and source cardinality is
    // tiny (output is source-count-sized).
    GQuery(
      "q131_source_mix",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("fp", md5($"text".cast("binary")))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"lang").as("n_langs"),
            (count(lit(1)) - countDistinct($"fp")).as("n_exact_dups"),
            sum($"n_chars").as("total_chars"))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY 1""".stripMargin)),

    // PII detection + redaction — a training-data pipeline MUST strip
    // emails/phone numbers before the corpus ships. The synthetic docs
    // carry no PII, so a deterministic injection (mirrored exactly in
    // the oracle) plants emails on every 7th doc and phone numbers on
    // every 11th; the operator then counts matches per pattern and
    // measures the redaction delta, aggregated per source. Everything
    // is codegen'd regexp_count/regexp_replace over one scan — no UDF,
    // no shuffle beyond the source-count-sized final aggregate.
    GQuery(
      "q147_pii_redaction",
      (s, dir) => {
        import s.implicits._
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
        val injected = t(s, dir, "documents")
          .withColumn("t1", when($"doc_id" % 7 === 0,
            concat($"text", lit(" contact user"), $"doc_id".cast("string"),
              lit("@mail.example.com now"))).otherwise($"text"))
          .withColumn("t2", when($"doc_id" % 11 === 0,
            concat($"t1", lit(" call 555-"),
              lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
              lit("-0199"))).otherwise($"t1"))
        injected.select($"source",
            regexp_count($"t2", lit(emailRe)).as("ne"),
            regexp_count($"t2", lit(phoneRe)).as("np"),
            (length($"t2") - length(
              regexp_replace(regexp_replace($"t2", emailRe, "<EMAIL>"),
                phoneRe, "<PHONE>"))).cast("long").as("delta"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"ne" + $"np" > 0, 1L).otherwise(0L)).as("docs_with_pii"),
            sum($"ne").cast("long").as("n_emails"),
            sum($"np").cast("long").as("n_phones"),
            sum($"delta").as("chars_redacted"))
      },
      Some("""WITH p AS (SELECT source, doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || doc_id
             |      || '@mail.example.com now' ELSE text END AS t1
             |  FROM documents),
             |p2 AS (SELECT source,
             |    CASE WHEN doc_id % 11 = 0 THEN t1 || ' call 555-'
             |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
             |      ELSE t1 END AS t2
             |  FROM p),
             |c AS (SELECT source,
             |    len(regexp_extract_all(t2,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
             |    len(regexp_extract_all(t2, '\d{3}-\d{3}-\d{4}')) AS np,
             |    length(t2) - length(regexp_replace(regexp_replace(t2,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |      '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS delta
             |  FROM p2)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS docs_with_pii,
             |  CAST(sum(ne) AS BIGINT) AS n_emails,
             |  CAST(sum(np) AS BIGINT) AS n_phones,
             |  CAST(sum(delta) AS BIGINT) AS chars_redacted
             |FROM c GROUP BY 1""".stripMargin)),

    // HTML/markup stripping — crawl text arrives wrapped in markup a
    // pipeline must remove before tokenization. Deterministic markup
    // injection (every 5th doc gains tags, every 10th an inline
    // script block), then the cleaner drops script blocks FIRST
    // (content and all), then remaining tags, and reports per-source
    // how much was stripped. Same one-scan regexp shape as q147.
    GQuery(
      "q148_markup_strip",
      (s, dir) => {
        import s.implicits._
        val scriptRe = "<script>.*?</script>"
        val tagRe = "<[^>]+>"
        val injected = t(s, dir, "documents")
          .withColumn("t1", when($"doc_id" % 5 === 0,
            concat(lit("<html><p class=\"a\">"), $"text", lit("</p></html>")))
            .otherwise($"text"))
          .withColumn("t2", when($"doc_id" % 10 === 0,
            concat($"t1", lit("<script>var x=1;</script>"))).otherwise($"t1"))
        injected.select($"source",
            regexp_count($"t2", lit(tagRe)).as("n_tags"),
            length($"t2").as("raw_len"),
            length(regexp_replace(regexp_replace($"t2", scriptRe, " "),
              tagRe, "")).as("clean_len"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tags").cast("long").as("n_tags"),
            sum($"raw_len").cast("long").as("raw_chars"),
            sum($"clean_len").cast("long").as("clean_chars"))
      },
      Some("""WITH p AS (SELECT source, doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN '<html><p class="a">' || text
             |      || '</p></html>' ELSE text END AS t1
             |  FROM documents),
             |p2 AS (SELECT source,
             |    CASE WHEN doc_id % 10 = 0 THEN t1 || '<script>var x=1;</script>'
             |      ELSE t1 END AS t2
             |  FROM p),
             |c AS (SELECT source,
             |    len(regexp_extract_all(t2, '<[^>]+>')) AS n_tags,
             |    length(t2) AS raw_len,
             |    length(regexp_replace(regexp_replace(t2,
             |      '<script>.*?</script>', ' ', 'g'), '<[^>]+>', '', 'g'))
             |      AS clean_len
             |  FROM p2)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_tags) AS BIGINT) AS n_tags,
             |  CAST(sum(raw_len) AS BIGINT) AS raw_chars,
             |  CAST(sum(clean_len) AS BIGINT) AS clean_chars
             |FROM c GROUP BY 1""".stripMargin)),

    // data-mixture realization: given per-language target sampling
    // weights (the DoReMi/Pile-style mixture spec a training run is
    // configured with), compute each language's natural token mass,
    // the repeat factor (epochs) needed to realize its target share of
    // the total budget, and the effective token count it contributes.
    // One scan + a language-count-sized aggregate; the window that
    // totals the 5-row aggregate is partition-less BY DESIGN over a
    // lang-cardinality relation, never data-sized. Doubles are exact
    // integer ratios — identical in both engines.
    GQuery(
      "q151_mixture_realization",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Seq(("en", 40L), ("fr", 15L), ("es", 15L), ("zh", 20L),
          ("de", 10L)).toDF("lang", "target_w")
        val nat = t(s, dir, "documents")
          .select($"lang", size(split($"text", " ")).cast("long").as("tk"))
          .groupBy($"lang").agg(sum($"tk").as("natural_tokens"))
        nat.join(w, Seq("lang"))
          .withColumn("total_tokens",
            sum($"natural_tokens").over(BoundedWindow.all))
          .select($"lang", $"natural_tokens", $"target_w",
            ($"target_w" * $"total_tokens" * lit(1.0)
              / (lit(100) * $"natural_tokens")).as("repeat_factor"),
            ($"target_w" * $"total_tokens" * lit(1.0) / 100)
              .as("effective_tokens"))
      },
      Some("""WITH w(lang, target_w) AS (VALUES ('en', 40), ('fr', 15),
             |    ('es', 15), ('zh', 20), ('de', 10)),
             |nat AS (SELECT lang,
             |          CAST(sum(len(string_split(text, ' '))) AS BIGINT)
             |            AS natural_tokens
             |        FROM documents GROUP BY 1),
             |j AS (SELECT n.lang, natural_tokens, target_w,
             |        CAST(sum(natural_tokens) OVER () AS BIGINT)
             |          AS total_tokens
             |      FROM nat n JOIN w USING (lang))
             |SELECT lang, natural_tokens,
             |  CAST(target_w AS BIGINT) AS target_w,
             |  target_w * total_tokens * 1.0 / (100 * natural_tokens)
             |    AS repeat_factor,
             |  target_w * total_tokens * 1.0 / 100 AS effective_tokens
             |FROM j""".stripMargin)),

    // shard-manifest assignment: the final step of a corpus build —
    // deterministically hash-assign every doc to one of 16 output
    // shards and report per-shard doc/token mass plus its balance
    // ratio against the ideal 1/16 share (the "are my training shards
    // even" check before a run starts). The md5-derived bucket is
    // uniform and reproducible across engines; one scan, one
    // shard-count-sized aggregate, and the totalling window runs over
    // 16 rows.
    GQuery(
      "q152_shard_manifest",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sh = t(s, dir, "documents")
          .select(
            (conv(substring(md5(concat($"doc_id".cast("string"), lit(":shard"))
              .cast("binary")), 1, 8), 16, 10).cast("long") % 16).as("shard"),
            size(split($"text", " ")).cast("long").as("tk"))
        sh.groupBy($"shard")
          .agg(count(lit(1)).as("n_docs"), sum($"tk").as("n_tokens"))
          .withColumn("total", sum($"n_tokens").over(BoundedWindow.all))
          .select($"shard", $"n_docs", $"n_tokens",
            ($"n_tokens" * lit(16.0) / $"total").as("balance"))
      },
      Some("""WITH sh AS (SELECT
             |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
             |      ':shard')), 1, 8)) AS BIGINT) % 16 AS shard,
             |    len(string_split(text, ' ')) AS tk
             |  FROM documents),
             |agg AS (SELECT shard, count(*) AS n_docs,
             |          CAST(sum(tk) AS BIGINT) AS n_tokens
             |        FROM sh GROUP BY 1)
             |SELECT shard, n_docs, n_tokens,
             |  n_tokens * 16.0 / CAST(sum(n_tokens) OVER () AS BIGINT)
             |    AS balance
             |FROM agg""".stripMargin)),

    // length-distribution histogram: fixed-width 100-char buckets per
    // source, with each source's share of its bucket row — the
    // "did this feed's length profile shift" report a curation run
    // diffs between snapshots. Pure integer bucket arithmetic
    // (identical both engines), one scan, one bucket×source-sized
    // aggregate.
    GQuery(
      "q163_length_histogram",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        t(s, dir, "documents")
          .select($"source",
            least(floor($"n_chars" / 100), lit(19)).cast("long").as("bucket"))
          .groupBy($"source", $"bucket")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("source_share",
            $"n_docs" * lit(1.0) / sum($"n_docs").over(
              Window.partitionBy($"source")))
      },
      Some("""WITH b AS (SELECT source,
             |    least(CAST(floor(n_chars / 100) AS BIGINT), 19) AS bucket
             |  FROM documents),
             |agg AS (SELECT source, bucket, count(*) AS n_docs
             |        FROM b GROUP BY 1, 2)
             |SELECT source, bucket, n_docs,
             |  n_docs * 1.0
             |    / CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
             |    AS source_share
             |FROM agg""".stripMargin)),

    // filter-cascade audit: every curation pipeline runs an ordered
    // rule list, and the operational question is "which rule kills
    // how much of each feed" — attribution goes to the FIRST failing
    // rule so the per-source shares sum to 1 and rule order changes
    // are diffable. All thresholds are integer cross-products (no
    // float ratios), one scan, a source×verdict-sized aggregate.
    GQuery(
      "q167_filter_cascade",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val b = t(s, dir, "documents")
          .select($"doc_id", $"source", split($"text", " ").as("w"))
          .select($"doc_id", $"source",
            size($"w").cast("long").as("n"),
            size(array_distinct($"w")).cast("long").as("nu"),
            expr("size(filter(w, t -> t IN ('the', 'a')))")
              .cast("long").as("stop"))
        b.withColumn("verdict",
            when($"n" < 5, "too_short")
              .when($"nu" * 10 < $"n" * 3, "low_uniq")
              .when($"stop" * 5 > $"n", "stop_heavy")
              .otherwise("pass"))
          .groupBy($"source", $"verdict")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("source_share",
            $"n_docs" * lit(1.0) / sum($"n_docs").over(
              Window.partitionBy($"source")))
      },
      Some("""WITH b AS (SELECT doc_id, source,
             |    len(string_split(text, ' ')) AS n,
             |    len(list_distinct(string_split(text, ' '))) AS nu,
             |    len(list_filter(string_split(text, ' '),
             |        t -> t IN ('the', 'a'))) AS stop
             |  FROM documents),
             |v AS (SELECT source,
             |    CASE WHEN n < 5 THEN 'too_short'
             |         WHEN nu * 10 < n * 3 THEN 'low_uniq'
             |         WHEN stop * 5 > n THEN 'stop_heavy'
             |         ELSE 'pass' END AS verdict
             |  FROM b),
             |agg AS (SELECT source, verdict, count(*) AS n_docs
             |        FROM v GROUP BY 1, 2)
             |SELECT source, verdict, n_docs,
             |  n_docs * 1.0
             |    / CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
             |    AS source_share
             |FROM agg""".stripMargin)),

    // tokenizer OOV rate: share of token occurrences per source whose
    // token falls outside the corpus vocabulary (q88's freq>=50 rule
    // — a threshold, not a top-N, so no global sort anywhere). The
    // vocab is a derived aggregate joined back through the measuring
    // broadcast guard; a left join + flag count keeps the data-sized
    // side a single pass.
    GQuery(
      "q169_oov_rate",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"source", explode(split($"text", " ")).as("tk"))
        val vocab = toks.groupBy($"tk".as("v_tk"))
          .agg(count(lit(1)).as("freq"))
          .filter($"freq" >= 50)
          .select($"v_tk")
        toks.join(GuardedBroadcast.maybe(vocab), $"tk" === $"v_tk", "left")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_tokens"),
            count(when($"v_tk".isNull, 1)).as("n_oov"))
          .withColumn("oov_rate", $"n_oov" * lit(1.0) / $"n_tokens")
      },
      Some("""WITH toks AS (SELECT source,
             |    unnest(string_split(text, ' ')) AS tk FROM documents),
             |vocab AS (SELECT tk AS v_tk FROM toks
             |          GROUP BY 1 HAVING count(*) >= 50)
             |SELECT source, count(*) AS n_tokens,
             |  count(CASE WHEN v_tk IS NULL THEN 1 END) AS n_oov,
             |  count(CASE WHEN v_tk IS NULL THEN 1 END) * 1.0 / count(*)
             |    AS oov_rate
             |FROM toks LEFT JOIN vocab ON tk = v_tk
             |GROUP BY source""".stripMargin)),

    // JSONL ingestion audit — drives the DocIO source through the
    // DRIVER gate, not just a spec: the corpus round-trips through
    // write+read (explicit schema, corrupt isolation) and the per-
    // source counts must survive unchanged with zero corrupt lines
    // (the oracle pins n_corrupt = 0 from the parquet side).
    GQuery(
      "q180_jsonl_ingest_audit",
      (s, dir) => {
        import s.implicits._
        val out = s"target/tmp/q180_jsonl_${java.lang.Integer.toHexString(dir.hashCode)}"
        graft.sources.DocIO.writeJsonl(t(s, dir, "documents"), out)
        val (good, bad) = graft.sources.DocIO.readJsonl(s, out)
        good.groupBy($"source").agg(count(lit(1)).as("n_docs"))
          .crossJoin(bad.agg(count(lit(1)).as("n_corrupt")))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(0 AS BIGINT) AS n_corrupt
             |FROM documents GROUP BY source""".stripMargin)),

    // ORC round-trip audit — same driver-gate treatment for the ORC
    // source/sink: the corpus survives write+schema-enforced-read with
    // per-source doc and char mass unchanged (the oracle computes the
    // same masses from the parquet original).
    GQuery(
      "q187_orc_roundtrip",
      (s, dir) => {
        import s.implicits._
        val out = s"target/tmp/q187_orc_${java.lang.Integer.toHexString(dir.hashCode)}"
        graft.sources.DocIO.writeOrc(t(s, dir, "documents"), out)
        graft.sources.DocIO.readOrc(s, out, graft.sources.DocIO.docSchema)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM documents GROUP BY source""".stripMargin)),

    // sharded-corpus WRITE path — q152 plans the shard layout, this
    // drives it: hash-shard the corpus, write one directory per shard
    // (repartition → one task per shard, sortWithinPartitions → files
    // clustered by doc_id), then read the layout back and prove the
    // per-shard masses match what the manifest promised (the oracle
    // recomputes them straight from the source table).
    GQuery(
      "q188_corpus_shard_write",
      (s, dir) => {
        import s.implicits._
        val out = s"target/tmp/q188_shards_${java.lang.Integer.toHexString(dir.hashCode)}"
        val sh = t(s, dir, "documents").select(
          (conv(substring(md5(concat($"doc_id".cast("string"), lit(":shard"))
            .cast("binary")), 1, 8), 16, 10).cast("long") % 16).as("shard"),
          $"doc_id", $"n_chars")
        graft.sources.DocIO.writeShardedCorpus(sh, out, "shard", "doc_id")
        s.read.parquet(out)
          .groupBy(col("shard").cast("long").as("shard"))
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      },
      Some("""WITH sh AS (SELECT
             |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
             |      ':shard')), 1, 8)) AS BIGINT) % 16 AS shard,
             |    n_chars
             |  FROM documents)
             |SELECT shard, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars
             |FROM sh GROUP BY shard""".stripMargin)),

    // CSV ingestion audit — the last interchange format in the DocIO
    // family (JSONL q180, ORC q187) driven through the driver gate:
    // corpus → headered/quoted CSV → line-based schema-enforced read
    // with corrupt isolation; per-source doc counts and char mass
    // must survive unchanged and the corrupt side must be empty (the
    // oracle pins n_corrupt = 0 from the parquet original). The read
    // is a plain text scan + codegen'd from_csv — splittable and
    // parallel, no multiLine single-task trap.
    GQuery(
      "q204_csv_ingest_audit",
      (s, dir) => {
        import s.implicits._
        val out = s"target/tmp/q204_csv_${java.lang.Integer.toHexString(dir.hashCode)}"
        graft.sources.DocIO.writeCsv(t(s, dir, "documents"), out)
        val (good, bad) = graft.sources.DocIO.readCsv(s, out)
        good.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
          .crossJoin(bad.agg(count(lit(1)).as("n_corrupt")))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars,
             |  CAST(0 AS BIGINT) AS n_corrupt
             |FROM documents GROUP BY source""".stripMargin)),

    // token-budget corpus fill — the selection step after q151 sets
    // mixture targets: per language, keep the highest-quality docs
    // (unique-token count desc, doc_id tiebreak) until a budget of
    // 60% of the language's natural token mass is full, and report
    // the fill. The greedy prefix is an exact cumulative sum — but a
    // naive `Window.partitionBy(lang)` puts ALL of a dominant
    // language in one task at 100 TB, so the running sum is
    // two-phase like q95: within-(lang, uniqueness-band) local sums
    // plus band prefix offsets computed on the band-count-sized
    // relation (band = n_uniq div 32 is monotone in the sort key, so
    // banded order == global order). Budgets and offsets rejoin via
    // GuardedBroadcast; the ratio divides exact integers.
    GQuery(
      "q205_token_budget_fill",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val d = t(s, dir, "documents")
          .select($"lang", $"doc_id",
            size(array_distinct(split($"text", " "))).cast("long").as("n_uniq"),
            size(split($"text", " ")).cast("long").as("tk"))
          .withColumn("band", expr("n_uniq div 32"))
        val wb = Window.partitionBy($"lang").orderBy($"band".desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val bands = d.groupBy($"lang", $"band").agg(sum($"tk").as("btk"))
          .withColumn("off", coalesce(sum($"btk").over(wb), lit(0L)))
          .select($"lang", $"band", $"off")
        val budget = d.groupBy($"lang")
          .agg(sum($"tk").as("nat"))
          .select($"lang", expr("nat * 6 div 10").as("budget"))
        val wi = Window.partitionBy($"lang", $"band")
          .orderBy($"n_uniq".desc, $"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.join(GuardedBroadcast.maybe(bands), Seq("lang", "band"))
          .withColumn("cum", $"off" + sum($"tk").over(wi))
          .join(GuardedBroadcast.maybe(budget), Seq("lang"))
          .groupBy($"lang", $"budget")
          .agg(count(lit(1)).as("n_total"),
            sum(when($"cum" <= $"budget", 1L).otherwise(0L)).as("n_kept"),
            sum(when($"cum" <= $"budget", $"tk").otherwise(0L)).as("kept_tokens"))
          .select($"lang", $"n_total", $"n_kept", $"kept_tokens", $"budget",
            ($"kept_tokens" * lit(1.0) / $"budget").as("utilization"))
      },
      Some("""WITH d AS (SELECT lang, doc_id,
             |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
             |    len(string_split(text, ' ')) AS tk
             |  FROM documents),
             |b AS (SELECT lang, CAST(sum(tk) AS BIGINT) * 6 // 10 AS budget
             |      FROM d GROUP BY 1),
             |c AS (SELECT lang, tk,
             |    sum(tk) OVER (PARTITION BY lang ORDER BY n_uniq DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM d)
             |SELECT c.lang, count(*) AS n_total,
             |  CAST(sum(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN cum <= budget THEN tk ELSE 0 END) AS BIGINT) AS kept_tokens,
             |  budget,
             |  CAST(sum(CASE WHEN cum <= budget THEN tk ELSE 0 END) AS BIGINT) * 1.0 / budget
             |    AS utilization
             |FROM c JOIN b USING (lang)
             |GROUP BY c.lang, budget""".stripMargin)),

    // split-aware packing manifest: the SEQUENCE-side view of q95's
    // doc→chunk spans — each doc's token interval is exploded onto the
    // 512-token sequences it touches, and the per-sequence rollup is
    // what a training loader actually reads: how many docs land in the
    // sequence, how full it is (512 everywhere except the tail), and
    // how many of its docs are boundary-crossing fragments. Scale
    // shape: the global token offset is q95's banded two-phase prefix
    // sum (per-block partials, a block-count-sized global window, a
    // block-partitioned within-block window — the corpus never sorts
    // in one task); the explode fans out to ceil(tokens/512) rows per
    // doc (bounded by doc length) and the rollup shuffles on seq_id.
    GQuery(
      "q210_sequence_pack_split",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
          .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
          .withColumn("b", expr("doc_id div 100"))
        val bsums = docs.groupBy($"b").agg(sum($"n").as("bn"))
        val wb = BoundedWindow.ordered($"b")
          .rowsBetween(Window.unboundedPreceding, -1)
        val bpre = bsums
          .withColumn("bpre", coalesce(sum($"bn").over(wb), lit(0L)))
          .select($"b", $"bpre")
        val wi = Window.partitionBy($"b").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        docs.join(GuardedBroadcast.maybe(bpre), Seq("b"))
          .withColumn("cb", $"bpre" + coalesce(sum($"n").over(wi), lit(0L)))
          .filter($"n" > 0)
          .withColumn("seq_id", explode(sequence(
            expr("cb div 512"), expr("(cb + n - 1) div 512"))))
          .withColumn("frag",
            least(($"seq_id" + 1) * 512, $"cb" + $"n") -
              greatest($"seq_id" * 512, $"cb"))
          .groupBy($"seq_id")
          .agg(count(lit(1)).as("n_docs"),
            sum($"frag").as("n_tokens"),
            expr("count_if(frag < n)").as("n_split_docs"))
      },
      Some("""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n,
             |    coalesce(sum(len(string_split(text, ' '))) OVER (
             |      ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
             |  FROM documents),
             |x AS (SELECT d.doc_id, d.n, d.cb, u.seq_id
             |      FROM d, LATERAL (SELECT unnest(generate_series(
             |          CAST(d.cb AS BIGINT) // 512,
             |          (CAST(d.cb AS BIGINT) + d.n - 1) // 512)) AS seq_id) u
             |      WHERE d.n > 0)
             |SELECT seq_id, count(*) AS n_docs,
             |  CAST(sum(least((seq_id + 1) * 512, cb + n)
             |    - greatest(seq_id * 512, cb)) AS BIGINT) AS n_tokens,
             |  CAST(count(*) FILTER (WHERE least((seq_id + 1) * 512, cb + n)
             |    - greatest(seq_id * 512, cb) < n) AS BIGINT) AS n_split_docs
             |FROM x GROUP BY 1""".stripMargin)),

    // distribution-drift audit: does an incoming batch's length
    // distribution match the reference corpus, per source? The batch
    // is hash-selected (the q162 convention), histograms share q163's
    // fixed 100-char buckets, and the drift test is the integer
    // cross-product form of |rate_batch - rate_ref| > 0.1 —
    // |c_b*n_ref - c_ref*n_b|*10 > n_ref*n_b — so both engines compare
    // exact BIGINTs and the gate can't flap on float division. One
    // scan, a source x bucket aggregate, a source-partitioned window
    // over report-sized rows.
    GQuery(
      "q212_distribution_drift",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val d = t(s, dir, "documents")
          .select($"source",
            least(expr("n_chars div 100"), lit(19L)).as("bucket"),
            (conv(substring(md5(concat($"doc_id".cast("string"), lit(":drift"))
              .cast("binary")), 1, 8), 16, 10).cast("long") % 10 === 0)
              .as("is_batch"))
        val w = Window.partitionBy($"source")
        d.groupBy($"source", $"bucket")
          .agg(sum(when($"is_batch", 1L).otherwise(0L)).as("c_batch"),
            sum(when(!$"is_batch", 1L).otherwise(0L)).as("c_ref"))
          .withColumn("n_batch", sum($"c_batch").over(w))
          .withColumn("n_ref", sum($"c_ref").over(w))
          .select($"source", $"bucket", $"c_ref", $"c_batch",
            (abs($"c_batch" * $"n_ref" - $"c_ref" * $"n_batch") * 10 >
              $"n_ref" * $"n_batch").as("drifted"))
      },
      Some("""WITH d AS (SELECT source,
             |    least(n_chars // 100, 19) AS bucket,
             |    CAST(concat('0x', substr(md5(concat(
             |      CAST(doc_id AS VARCHAR), ':drift')), 1, 8)) AS BIGINT)
             |      % 10 = 0 AS is_batch
             |  FROM documents),
             |h AS (SELECT source, bucket,
             |        CAST(sum(CASE WHEN is_batch THEN 1 ELSE 0 END) AS BIGINT)
             |          AS c_batch,
             |        CAST(sum(CASE WHEN is_batch THEN 0 ELSE 1 END) AS BIGINT)
             |          AS c_ref
             |      FROM d GROUP BY 1, 2),
             |tot AS (SELECT source, bucket, c_ref, c_batch,
             |          CAST(sum(c_batch) OVER (PARTITION BY source) AS BIGINT)
             |            AS n_batch,
             |          CAST(sum(c_ref) OVER (PARTITION BY source) AS BIGINT)
             |            AS n_ref
             |        FROM h)
             |SELECT source, bucket, c_ref, c_batch,
             |  abs(c_batch * n_ref - c_ref * n_batch) * 10 > n_ref * n_batch
             |    AS drifted
             |FROM tot""".stripMargin)),

    // exact stratified split: deterministic train/val/test assignment
    // with EXACT 8/1/1 proportions per source (largest-prefix integer
    // rule over a hash ordering: rank*10 <= n*8 -> train,
    // rank*10 <= n*9 -> val, else test), so a re-run on the same
    // corpus reproduces the same membership and the per-source counts
    // are off by at most the integer rounding — the property a
    // "no eval leakage" audit needs. Hash ordering is md5-derived
    // (engine-portable); the rank is a source-partitioned window, the
    // report a source x split aggregate.
    GQuery(
      "q213_stratified_split",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val d = t(s, dir, "documents")
          .select($"source", $"doc_id",
            size(split($"text", " ")).cast("long").as("tk"),
            conv(substring(md5(concat($"doc_id".cast("string"), lit(":split"))
              .cast("binary")), 1, 8), 16, 10).cast("long").as("h"))
        val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
        val n = Window.partitionBy($"source")
        d.withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(n))
          .withColumn("split",
            when($"rk" * 10 <= $"n" * 8, "train")
              .when($"rk" * 10 <= $"n" * 9, "val")
              .otherwise("test"))
          .groupBy($"source", $"split")
          .agg(count(lit(1)).as("n_docs"), sum($"tk").as("n_tokens"))
      },
      Some("""WITH d AS (SELECT source, doc_id,
             |    len(string_split(text, ' ')) AS tk,
             |    CAST(concat('0x', substr(md5(concat(
             |      CAST(doc_id AS VARCHAR), ':split')), 1, 8)) AS BIGINT) AS h
             |  FROM documents),
             |r AS (SELECT source, tk,
             |        CAST(row_number() OVER (PARTITION BY source
             |          ORDER BY h, doc_id) AS BIGINT) AS rk,
             |        CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
             |      FROM d)
             |SELECT source,
             |  CASE WHEN rk * 10 <= n * 8 THEN 'train'
             |       WHEN rk * 10 <= n * 9 THEN 'val'
             |       ELSE 'test' END AS split,
             |  count(*) AS n_docs, CAST(sum(tk) AS BIGINT) AS n_tokens
             |FROM r GROUP BY 1, 2""".stripMargin)),

    // unigram-LM pseudo-perplexity (the CCNet/Wikipedia-LM quality
    // signal, reduced to its order-0 form): train a unigram model on
    // the corpus itself — p(w) = count(w)/total — and score every doc
    // by its mean per-token information content in bits,
    // bits/token = avg over tokens of (log2 total − log2 count(w)).
    // Low = repetitive boilerplate, high = rare-token noise; the
    // middle band is what a curation pass keeps. Scale shape: one
    // explode, one vocabulary-sized groupBy (map-side partial counts),
    // and the LM rejoins the token stream via GuardedBroadcast —
    // vocabulary outgrowing the broadcast cap falls back to a shuffle
    // hash join on the word key, never a driver collect. Per-token
    // bits are integerized to milli-bits (floor(x·10⁴+0.5), the
    // OracleNum pattern) so the per-doc sum is an exact integer —
    // order-independent across Spark's partial aggregates and DuckDB's
    // sequential scan — and the only float ops are one identical
    // subtract/floor per vocab entry and one final division chain.
    GQuery(
      "q220_unigram_perplexity",
      (s, dir) => {
        import s.implicits._
        val w = t(s, dir, "documents")
          .select($"doc_id", $"lang", explode(split($"text", " ")).as("word"))
        val counts = w.groupBy($"word").agg(count(lit(1)).as("c"))
        val total = counts.agg(sum($"c").as("total"))
        val lm = counts.crossJoin(GuardedBroadcast.maybe(total))
          .select($"word",
            floor((log2($"total") - log2($"c")) * 10000 + 0.5)
              .cast("long").as("mb"))
        w.join(GuardedBroadcast.maybe(lm), Seq("word"))
          .groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("n_tokens"), sum($"mb").as("smb"))
          .select($"doc_id", $"lang", $"n_tokens",
            ($"smb" * lit(1.0) / lit(10000) / $"n_tokens").as("bits_per_token"))
      },
      Some("""WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
             |  FROM documents),
             |c AS (SELECT word, count(*) AS c FROM w GROUP BY word),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c),
             |lm AS (SELECT word,
             |    CAST(floor((log2(total) - log2(c)) * 10000 + 0.5) AS BIGINT) AS mb
             |  FROM c, tot)
             |SELECT doc_id, lang, count(*) AS n_tokens,
             |  CAST(sum(mb) AS BIGINT) * 1.0 / 10000 / count(*) AS bits_per_token
             |FROM w JOIN lm USING (word)
             |GROUP BY doc_id, lang""".stripMargin)),

    // Unicode normalization audit — exercises the native codegen
    // expressions nfc_normalize / strip_accents (GraftExtensions;
    // DuckDB twins of the same names). The corpus is ASCII, so the
    // query first synthesizes the hazard deterministically in BOTH
    // engines: translate a→á / e→é (precomposed), then decompose é
    // into e+U+0301. NFC must recompose back to the precomposed form,
    // and strip_accents must recover the original ASCII text —
    // byte-identical, pinned by the md5 fingerprint column. This is
    // the dedup-prerequisite in real corpora: visually-identical
    // strings with different codepoint sequences hash apart until
    // normalized. Scale shape: per-row codegen'd string kernels over
    // one scan, no shuffle at all.
    GQuery(
      "q221_unicode_normalize",
      (s, dir) => {
        import s.implicits._
        // unicode via escapes so tooling can never re-normalize the
        // source: \u00e1=a-acute, \u00e9=e-acute, \u0301=combining acute
        t(s, dir, "documents")
          .select($"doc_id", $"text",
            translate($"text", "ae", "\u00e1\u00e9").as("t1"))
          .withColumn("dx", replace($"t1", lit("\u00e9"), lit("e\u0301")))
          .select($"doc_id",
            length($"dx").as("n_decomposed"),
            length(expr("nfc_normalize(dx)")).as("n_nfc"),
            (expr("nfc_normalize(dx)") === $"t1").as("nfc_recomposes"),
            (expr("strip_accents(dx)") === $"text").as("strip_recovers"),
            md5(expr("strip_accents(nfc_normalize(dx))").cast("binary"))
              .as("norm_fp"))
      },
      Some("""WITH d AS (SELECT doc_id, text,
             |    translate(text, 'ae', 'áé') AS t1 FROM documents),
             |x AS (SELECT doc_id, text, t1,
             |    replace(t1, 'é', 'e' || chr(769)) AS dx FROM d)
             |SELECT doc_id,
             |  length(dx) AS n_decomposed,
             |  length(nfc_normalize(dx)) AS n_nfc,
             |  nfc_normalize(dx) = t1 AS nfc_recomposes,
             |  strip_accents(dx) = text AS strip_recovers,
             |  md5(strip_accents(nfc_normalize(dx))) AS norm_fp
             |FROM x""".stripMargin)),

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    // per language, draw 25 docs with inclusion odds proportional to
    // length — the length-debiased complement of q82's uniform hash
    // sample. Each doc gets a deterministic uniform u from md5 (seeded,
    // reproducible across engines and reruns) and priority ln(u)/w;
    // the top-k priorities per stratum are exactly a w-weighted draw
    // without replacement. The priority is integerized to 1e-6 (the
    // OracleNum idea) so a last-ulp ln() difference between engines
    // can't flip an ordering: a micro-unit collision falls to the
    // doc_id tiebreak, identical on both sides. Scale shape: per-row
    // hash + log over one scan, then a per-stratum top-k — Spark plans
    // the rank filter as WindowGroupLimit, so each partition keeps
    // only k rows before the (lang)-keyed shuffle.
    GQuery(
      "q223_weighted_sample",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val d = t(s, dir, "documents")
          .select($"lang", $"doc_id", $"n_chars",
            conv(substring(md5(concat($"doc_id".cast("string"), lit(":wrs"))
              .cast("binary")), 1, 8), 16, 10).cast("long").as("h"))
          .withColumn("u", ($"h" + 0.5) / 4294967296.0)
          .withColumn("pri",
            floor(log($"u") / $"n_chars" * 1000000).cast("long"))
        val w = Window.partitionBy($"lang").orderBy($"pri".desc, $"doc_id")
        d.withColumn("rank", row_number().over(w).cast("long"))
          .filter($"rank" <= 25)
          .select($"lang", $"rank", $"doc_id", $"n_chars")
      },
      Some("""WITH d AS (SELECT lang, doc_id, n_chars,
             |    CAST(concat('0x', substr(md5(concat(
             |      CAST(doc_id AS VARCHAR), ':wrs')), 1, 8)) AS BIGINT) AS h
             |  FROM documents),
             |p AS (SELECT lang, doc_id, n_chars,
             |    CAST(floor(ln((h + 0.5) / 4294967296.0) / n_chars * 1000000)
             |      AS BIGINT) AS pri
             |  FROM d)
             |SELECT lang, rank, doc_id, n_chars FROM (
             |  SELECT lang, doc_id, n_chars,
             |    CAST(row_number() OVER (PARTITION BY lang
             |      ORDER BY pri DESC, doc_id) AS BIGINT) AS rank
             |  FROM p)
             |WHERE rank <= 25""".stripMargin)),

    // bigram-LM perplexity (order-1 upgrade of q220): score each doc
    // by mean conditional information -log2 p(w2|w1), with
    // p(w2|w1) = c(w1,w2)/c(w1,·) trained on the corpus itself. Unlike
    // the unigram signal, this catches locally-incoherent text (high
    // bits) and copy-pasted runs (near-zero bits) even when the word
    // mix looks normal. The bigram stream is built map-side from each
    // doc's token array (transform over an index sequence — no
    // position self-join, which would be a data-sized join at 100 TB);
    // counts are one bigram-vocabulary-sized groupBy; context counts
    // roll up FROM the bigram counts (vocab-sized input, not corpus);
    // the LM rejoins via GuardedBroadcast with shuffle fallback. Same
    // milli-bit integerization as q220 for cross-engine exact sums.
    GQuery(
      "q225_bigram_perplexity",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
          .select($"doc_id", $"lang", split($"text", " ").as("w"))
          .filter(size($"w") >= 2)
        val bb = d.select($"doc_id", $"lang", explode(expr(
            "transform(sequence(1, size(w)-1), i -> named_struct('w1', w[i-1], 'w2', w[i]))"))
            .as("p"))
          .select($"doc_id", $"lang", $"p.w1".as("w1"), $"p.w2".as("w2"))
        val c2 = bb.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
        val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
        val lm = c2.join(c1, Seq("w1"))
          .select($"w1", $"w2",
            floor((log2($"c1") - log2($"c2")) * 10000 + 0.5)
              .cast("long").as("mb"))
        bb.join(GuardedBroadcast.maybe(lm), Seq("w1", "w2"))
          .groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("n_bigrams"), sum($"mb").as("smb"))
          .select($"doc_id", $"lang", $"n_bigrams",
            ($"smb" * lit(1.0) / lit(10000) / $"n_bigrams")
              .as("bits_per_bigram"))
      },
      Some("""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w
             |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
             |bb AS (SELECT doc_id, lang,
             |    unnest(list_transform(range(2, len(w) + 1),
             |      i -> {'w1': w[i-1], 'w2': w[i]})) AS p
             |  FROM d),
             |b2 AS (SELECT doc_id, lang, p.w1 AS w1, p.w2 AS w2 FROM bb),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM b2 GROUP BY 1, 2),
             |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
             |lm AS (SELECT w1, w2,
             |    CAST(floor((log2(c1) - log2(c2)) * 10000 + 0.5) AS BIGINT) AS mb
             |  FROM c2 JOIN c1 USING (w1))
             |SELECT doc_id, lang, count(*) AS n_bigrams,
             |  CAST(sum(mb) AS BIGINT) * 1.0 / 10000 / count(*) AS bits_per_bigram
             |FROM b2 JOIN lm USING (w1, w2)
             |GROUP BY doc_id, lang""".stripMargin)),

    // per-source token-distribution skew: KL(source ‖ corpus) in bits
    // over word frequencies — the information-theoretic upgrade of
    // q212's length-histogram drift, and the number that says WHICH
    // feed's language actually diverges from the mix (dedup siblings
    // and templated feeds score near 0; a topical feed scores high).
    // Every source's support is a subset of the corpus support, so the
    // MLE KL needs no smoothing. Exactness: the per-(source,word) term
    // c_sw·(log2 c_sw − log2 T_s − log2 c_w + log2 T_c) integerizes
    // its log factor to milli-bits, making the weighted sum an exact
    // integer; two final divides. Scale shape: one (source,word)
    // groupBy (vocab × sources, sublinear in tokens), corpus counts
    // rejoin via GuardedBroadcast, output is source-count-sized.
    GQuery(
      "q227_source_kl_divergence",
      (s, dir) => {
        import s.implicits._
        val w = t(s, dir, "documents")
          .select($"source", explode(split($"text", " ")).as("word"))
        val sw = w.groupBy($"source", $"word").agg(count(lit(1)).as("csw"))
        val st = sw.groupBy($"source").agg(sum($"csw").as("ts"))
        val cw = sw.groupBy($"word").agg(sum($"csw").as("c"))
        val tot = cw.agg(sum($"c").as("tc"))
        sw.join(GuardedBroadcast.maybe(cw), Seq("word"))
          .join(GuardedBroadcast.maybe(st), Seq("source"))
          .crossJoin(GuardedBroadcast.maybe(tot))
          .select($"source", $"csw", $"ts",
            floor((log2($"csw") - log2($"ts") - log2($"c") + log2($"tc"))
              * 10000 + 0.5).cast("long").as("mb"))
          .groupBy($"source")
          .agg(max($"ts").as("n_tokens"), sum($"csw" * $"mb").as("smb"))
          .select($"source", $"n_tokens",
            ($"smb" * lit(1.0) / $"n_tokens" / lit(10000))
              .as("kl_bits"))
      },
      Some("""WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
             |  FROM documents),
             |sw AS (SELECT source, word, count(*) AS csw FROM w GROUP BY 1, 2),
             |st AS (SELECT source, CAST(sum(csw) AS BIGINT) AS ts FROM sw GROUP BY 1),
             |cw AS (SELECT word, CAST(sum(csw) AS BIGINT) AS c FROM sw GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tc FROM cw),
             |terms AS (SELECT sw.source, sw.csw, st.ts,
             |    CAST(floor((log2(csw) - log2(ts) - log2(c) + log2(tc))
             |      * 10000 + 0.5) AS BIGINT) AS mb
             |  FROM sw JOIN cw USING (word) JOIN st USING (source), tot)
             |SELECT source, CAST(max(ts) AS BIGINT) AS n_tokens,
             |  CAST(sum(csw * mb) AS BIGINT) * 1.0 / max(ts) / 10000 AS kl_bits
             |FROM terms GROUP BY source""".stripMargin)),

    // curriculum shard manifest: every doc gets an exact global
    // difficulty decile (n_chars as the difficulty proxy) plus a
    // deterministic hash shard and an easy-to-hard reading position
    // within its shard — the writer-side plan for curriculum training
    // (each shard sees the full difficulty mix; within a shard the
    // loader reads easy docs first). The decile is EXACT without a
    // global sort: global rank = (docs with a smaller length, from a
    // length-histogram prefix sum — histogram is value-domain-sized
    // and broadcast) + (row_number among same-length docs by doc_id).
    // The only partition-less window runs over that histogram, never
    // over docs; the per-shard position window partitions by shard
    // (shard count is the scale knob, sized to the writer fleet).
    GQuery(
      "q233_curriculum_shards",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").select($"doc_id", $"n_chars")
          .withColumn("h",
            conv(substring(md5(concat($"doc_id".cast("string"), lit(":cur"))
              .cast("binary")), 1, 8), 16, 10).cast("long"))
        val hist = d.groupBy($"n_chars").agg(count(lit(1)).as("c"))
        val wl = BoundedWindow.ordered($"n_chars")
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = hist.select($"n_chars",
          coalesce(sum($"c").over(wl), lit(0L)).as("below"))
        val tot = hist.agg(sum($"c").as("total"))
        val wn = Window.partitionBy($"n_chars").orderBy($"doc_id")
        val wp = Window.partitionBy($"shard")
          .orderBy($"decile", $"h", $"doc_id")
        d.join(GuardedBroadcast.maybe(cum), Seq("n_chars"))
          .withColumn("grank", $"below" + row_number().over(wn))
          .crossJoin(GuardedBroadcast.maybe(tot))
          .select($"doc_id", ($"h" % 8).as("shard"),
            expr("(grank - 1) * 10 DIV total").as("decile"), $"h")
          .withColumn("pos", row_number().over(wp).cast("long"))
          .drop("h")
      },
      Some("""WITH d AS (SELECT doc_id, n_chars,
             |    CAST(concat('0x', substr(md5(concat(
             |      CAST(doc_id AS VARCHAR), ':cur')), 1, 8)) AS BIGINT) AS h,
             |    row_number() OVER (ORDER BY n_chars, doc_id) AS grank,
             |    count(*) OVER () AS total
             |  FROM documents),
             |dd AS (SELECT doc_id, h % 8 AS shard,
             |    (grank - 1) * 10 // total AS decile, h
             |  FROM d)
             |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
             |  CAST(decile AS BIGINT) AS decile,
             |  CAST(row_number() OVER (PARTITION BY shard
             |    ORDER BY decile, h, doc_id) AS BIGINT) AS pos
             |FROM dd""".stripMargin)),

    // per-doc character-level Shannon entropy (bits/char): the
    // model-free complement of q220's LM perplexity — near-zero
    // entropy catches padding/repeated-char junk that a corpus LM
    // scores as "fluent" if the junk is frequent corpus-wide.
    // H = log2 n − (1/n)·Σ c·log2 c over the doc's char counts;
    // q227's milli-bit discipline makes it cross-engine exact: both
    // log2 factors integerize to 1e-4 bits, the weighted sum
    // n·mb(n) − Σ c·mb(c) is an exact int64, one divide at output.
    // Scale shape: the char explode is map-side inside the scan
    // stage; one (doc, char) groupBy (keys ≤ 256·docs), then a
    // doc-keyed rollup — no joins, no windows.
    GQuery(
      "q240_char_entropy",
      (s, dir) => {
        import s.implicits._
        val mb = (c: org.apache.spark.sql.Column) =>
          floor(log2(c) * 10000 + 0.5).cast("long")
        t(s, dir, "documents")
          .filter(length($"text") > 0)
          .select($"doc_id", explode(split($"text", "")).as("ch"))
          .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(sum($"c").as("n"), sum($"c" * mb($"c")).as("smb"))
          .select($"doc_id", $"n",
            (($"n" * mb($"n") - $"smb") * lit(1.0) / $"n" / lit(10000))
              .as("entropy_bits"))
      },
      Some("""WITH ch AS (SELECT doc_id,
             |    unnest(string_split(text, '')) AS ch
             |  FROM documents WHERE length(text) > 0),
             |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
             |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             |    CAST(sum(c * CAST(floor(log2(c) * 10000 + 0.5) AS BIGINT))
             |      AS BIGINT) AS smb
             |  FROM cc GROUP BY 1)
             |SELECT doc_id, n,
             |  (n * CAST(floor(log2(n) * 10000 + 0.5) AS BIGINT) - smb)
             |    * 1.0 / n / 10000 AS entropy_bits
             |FROM d""".stripMargin)),

    // Flesch reading-ease per source (readability filter): syllables
    // via the standard vowel-group heuristic (runs of [aeiouy] after
    // lowercasing), sentences via terminal-punctuation runs, words via
    // the repo-wide whitespace split. All three are integer counts
    // from the same regex dialect in both engines, so the per-doc
    // score 206.835 − 1.015·(W/S) − 84.6·(Syl/W) is identical IEEE
    // arithmetic; the per-source mean uses the order-independent
    // 4-decimal dsum. Scale shape: one corpus scan, per-row regex in
    // codegen, output source-count-sized.
    GQuery(
      "q243_readability",
      (s, dir) => {
        import s.implicits._
        import OracleNum._
        val b = t(s, dir, "documents").select($"doc_id", $"source",
          size(split($"text", " ")).cast("double").as("w"),
          size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
            .cast("double").as("syl"),
          greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
            .cast("double").as("sent"))
        b.select($"source",
            (lit(206.835) - lit(1.015) * ($"w" / $"sent")
              - lit(84.6) * ($"syl" / $"w")).as("flesch"))
          .groupBy($"source")
          .agg(davg($"flesch").as("avg_flesch"),
            min($"flesch").as("min_flesch"),
            max($"flesch").as("max_flesch"),
            count(lit(1)).as("n_docs"))
      },
      Some(s"""WITH b AS (SELECT doc_id, source,
              |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS w,
              |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              |         AS DOUBLE) AS syl,
              |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              |         AS DOUBLE) AS sent
              |  FROM documents),
              |f AS (SELECT source,
              |    CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * (w / sent)
              |      - CAST(84.6 AS DOUBLE) * (syl / w) AS flesch
              |  FROM b)
              |SELECT source, ${OracleNum.davgSql("flesch")} AS avg_flesch,
              |  min(flesch) AS min_flesch, max(flesch) AS max_flesch,
              |  count(*) AS n_docs
              |FROM f GROUP BY source""".stripMargin)),

    // vocabulary-growth curve by ingest batch (doc_id div 25 = the
    // arrival order a crawl would have): bigram types are attributed
    // to the batch where they FIRST appear, giving new-type counts and
    // the cumulative vocabulary size — the saturation diagnostic that
    // tells a data-collection effort when a source stops contributing
    // novelty (bigrams, not unigrams, because a tiny closed word set
    // saturates instantly while its combinations keep growing — same
    // reason dedup shingles are n-grams). Scale shape: one bigram
    // explode + groupBy type (vocabulary-sized shuffle with map-side
    // combine), then a batch-count-sized aggregate; the only
    // single-partition window runs over batch rows, never the corpus.
    GQuery(
      "q247_vocab_growth",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(expr("doc_id div 25").as("batch"), split($"text", " ").as("w"))
          .select($"batch", explode(expr(
            """transform(sequence(0, size(w) - 2), i ->
              |  concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))"""
              .stripMargin)).as("token"))
          .groupBy($"token").agg(min($"batch").as("first_batch"))
          .groupBy($"first_batch").agg(count(lit(1)).as("new_types"))
          .withColumn("vocab_size", sum($"new_types").over(
            BoundedWindow.ordered($"first_batch")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      },
      Some("""WITH w AS (SELECT doc_id // 25 AS batch,
             |    string_split(text, ' ') AS w FROM documents),
             |tok AS (SELECT batch,
             |    unnest(list_transform(generate_series(1, len(w) - 1),
             |      i -> concat(w[i], ' ', w[i + 1]))) AS token FROM w),
             |f AS (SELECT token, min(batch) AS first_batch FROM tok GROUP BY 1),
             |g AS (SELECT first_batch, count(*) AS new_types FROM f GROUP BY 1)
             |SELECT first_batch, new_types,
             |  CAST(sum(new_types) OVER (ORDER BY first_batch
             |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
             |FROM g""".stripMargin)),

    // Zipf rank-frequency slope per language: the log₂-log₂ OLS slope
    // over the top-100 token ranks (natural text ≈ −1; a flat or
    // cliff-shaped slope flags templated/generated text — a corpus
    // forensic). Reuses q240's milli-bit integerization: log₂ of the
    // exact integer rank/count is floored to 1e-4 bits, so all four
    // OLS sums are exact int64 and the closed-form slope is one
    // identical IEEE division. Scale shape: token counts are a
    // vocabulary-sized groupBy; the per-lang top-100 is a
    // WindowGroupLimit (per-partition heads, k rows per map side),
    // and the regression runs over 100-row groups.
    GQuery(
      "q258_zipf_slope",
      (s, dir) => {
        import s.implicits._
        val mb = (c: org.apache.spark.sql.Column) =>
          floor(log2(c) * 10000 + 0.5).cast("long")
        val byLang = Window.partitionBy($"lang")
          .orderBy($"c".desc, $"token".asc)
        val ranked = t(s, dir, "documents")
          .select($"lang", explode(split($"text", " ")).as("token"))
          .groupBy($"lang", $"token").agg(count(lit(1)).as("c"))
          .withColumn("rank", row_number().over(byLang))
          .filter($"rank" <= 100)
          .select($"lang", mb($"rank").as("x"), mb($"c").as("y"))
        ranked.groupBy($"lang")
          .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
            sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
          .select($"lang", $"n",
            (($"n" * $"sxy" - $"sx" * $"sy") * lit(1.0)
              / ($"n" * $"sxx" - $"sx" * $"sx")).as("zipf_slope"))
      },
      Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |tc AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2),
             |rk AS (SELECT lang, c, row_number() OVER (PARTITION BY lang
             |    ORDER BY c DESC, token) AS rank FROM tc),
             |xy AS (SELECT lang,
             |    CAST(floor(log2(rank) * 10000 + 0.5) AS BIGINT) AS x,
             |    CAST(floor(log2(c) * 10000 + 0.5) AS BIGINT) AS y
             |  FROM rk WHERE rank <= 100),
             |s AS (SELECT lang, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM xy GROUP BY 1)
             |SELECT lang, n,
             |  (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) AS zipf_slope
             |FROM s""".stripMargin)),

    // keyword-in-context (KWIC) span extraction: per-document match
    // count and the ±16-char window around the FIRST occurrence of a
    // term — the snippet surface behind search previews and targeted
    // span audits (q216 removes spans; this one reads them). Match
    // counting uses a word-boundary regex (identical in Java regex
    // and RE2), position/substring are 1-based in both engines.
    // Scale shape: one corpus scan, per-row codegen'd string ops,
    // output = matching docs only.
    GQuery(
      "q259_kwic",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            size(expr("regexp_extract_all(text, '\\\\bdata\\\\b', 0)"))
              .cast("long").as("n_matches"),
            locate("data", $"text").cast("long").as("first_pos"),
            $"text")
          .filter($"n_matches" > 0)
          .select($"doc_id", $"n_matches", $"first_pos",
            substring_index(
              expr("substring(text, greatest(1, first_pos - 16), 36)"), "\n", 1)
              .as("snippet"))
      },
      Some("""WITH m AS (SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '\bdata\b')) AS BIGINT)
             |      AS n_matches,
             |    CAST(strpos(text, 'data') AS BIGINT) AS first_pos, text
             |  FROM documents)
             |SELECT doc_id, n_matches, first_pos,
             |  split_part(substring(text, greatest(1, first_pos - 16), 36),
             |             chr(10), 1) AS snippet
             |FROM m WHERE n_matches > 0""".stripMargin)),

    // source-pair vocabulary Jaccard: how much two feeds' BIGRAM
    // vocabularies overlap — the redundancy signal for source
    // selection that q139's doc-level mirror detection can't see
    // (mirrors share documents; these share only phrasing). Overlap
    // from a shared-type self-join whose fan-out per type is its
    // source-degree (≤ source count — the df-cap argument from q44
    // applies if sources proliferate), union by inclusion-exclusion,
    // one exact integer divide. Scale shape: distinct (source, type)
    // relation is vocabulary-sized; the pair join shuffles 8-byte-ish
    // keys, output source-pair-sized.
    GQuery(
      "q265_source_vocab_jaccard",
      (s, dir) => {
        import s.implicits._
        val sv = t(s, dir, "documents")
          .select($"source", split($"text", " ").as("w"))
          .select($"source", explode(expr(
            """transform(sequence(0, size(w) - 2), i ->
              |  concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))"""
              .stripMargin)).as("tok"))
          .distinct()
        val deg = sv.groupBy($"source").agg(count(lit(1)).as("d"))
        sv.as("a").join(sv.as("b"),
            $"a.tok" === $"b.tok" && $"a.source" < $"b.source")
          .groupBy($"a.source".as("s1"), $"b.source".as("s2"))
          .agg(count(lit(1)).as("inter"))
          .join(deg.select($"source".as("s1"), $"d".as("d1")), "s1")
          .join(deg.select($"source".as("s2"), $"d".as("d2")), "s2")
          .select($"s1", $"s2", $"inter",
            ($"inter" * lit(1.0) / ($"d1" + $"d2" - $"inter")).as("jaccard"))
      },
      Some("""WITH w AS (SELECT source, string_split(text, ' ') AS w
             |  FROM documents),
             |sv AS (SELECT DISTINCT source,
             |    unnest(list_transform(generate_series(1, len(w) - 1),
             |      i -> concat(w[i], ' ', w[i + 1]))) AS tok FROM w),
             |deg AS (SELECT source, count(*) AS d FROM sv GROUP BY 1),
             |i AS (SELECT a.source AS s1, b.source AS s2, count(*) AS inter
             |      FROM sv a JOIN sv b
             |        ON a.tok = b.tok AND a.source < b.source
             |      GROUP BY 1, 2)
             |SELECT s1, s2, inter,
             |  inter * 1.0 / (d1.d + d2.d - inter) AS jaccard
             |FROM i JOIN deg d1 ON i.s1 = d1.source
             |       JOIN deg d2 ON i.s2 = d2.source""".stripMargin)),

    // BPE training, iteration one: count adjacent character pairs
    // weighted by word frequency and rank the merge candidates — the
    // distributed step a tokenizer-training pipeline runs repeatedly
    // (each iteration merges the top pair and recounts; the data
    // layout is identical every round, so this one step IS the scale
    // shape). Pair generation happens inside the word row (constant-
    // bounded by word length); the count shuffle is alphabet²-sized
    // after map-side combine, and the top-20 is a
    // TakeOrderedAndProject. Exact integer counts.
    GQuery(
      "q278_bpe_merge_pairs",
      (s, dir) => {
        import s.implicits._
        val words = t(s, dir, "documents")
          .select(explode(split($"text", " ")).as("word"))
          .filter(length($"word") >= 2)
          .groupBy($"word").agg(count(lit(1)).as("freq"))
        words
          .select($"freq", explode(expr(
            """transform(sequence(1, length(word) - 1), i ->
              |  struct(substring(word, i, 1) AS a,
              |         substring(word, i + 1, 1) AS b))""".stripMargin))
            .as("p"))
          .groupBy($"p.a", $"p.b")
          .agg(sum($"freq").as("pair_count"))
          .orderBy($"pair_count".desc, $"a".asc, $"b".asc)
          .limit(20)
      },
      Some("""WITH words AS (SELECT word, count(*) AS freq FROM (
             |    SELECT unnest(string_split(text, ' ')) AS word
             |    FROM documents)
             |  WHERE length(word) >= 2 GROUP BY 1),
             |pairs AS (SELECT freq,
             |    unnest(list_transform(generate_series(1, length(word) - 1),
             |      i -> {'a': word[i], 'b': word[i + 1]})) AS p
             |  FROM words)
             |SELECT p.a AS a, p.b AS b,
             |  CAST(sum(freq) AS BIGINT) AS pair_count
             |FROM pairs GROUP BY 1, 2
             |ORDER BY pair_count DESC, a, b LIMIT 20""".stripMargin)),

    // Simpson diversity per source: D = Σc(c−1)/(N(N−1)) — the
    // probability two random tokens are the same type. An EXACT
    // integer companion to the entropy family (q240/q220 need log
    // quantization; Simpson's index needs none — every sum is int64
    // and the output is one divide), and the ecology-standard
    // concentration reading of vocabulary (1/D = effective types).
    // Scale: token counts are a vocabulary-sized groupBy with
    // map-side combine; output source-sized.
    GQuery(
      "q298_simpson_diversity",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"source", explode(split($"text", " ")).as("tok"))
          .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
          .groupBy($"source")
          .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_types"),
            sum($"c" * ($"c" - 1)).as("coll"))
          .select($"source", $"n_tokens", $"n_types",
            // divide twice rather than form n·(n−1): the product would
            // overflow int64 for billion-token sources
            ($"coll" * lit(1.0) / $"n_tokens" / ($"n_tokens" - 1))
              .as("simpson"))
      },
      Some("""WITH tc AS (SELECT source, tok, count(*) AS c FROM (
             |    SELECT source, unnest(string_split(text, ' ')) AS tok
             |    FROM documents) GROUP BY 1, 2),
             |a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    count(*) AS n_types,
             |    CAST(sum(c * (c - 1)) AS BIGINT) AS coll
             |  FROM tc GROUP BY 1)
             |SELECT source, n_tokens, n_types,
             |  coll * 1.0 / n_tokens / (n_tokens - 1) AS simpson
             |FROM a""".stripMargin)),

    // dataset card: the one-row release summary a corpus ships with —
    // sizes, vocabulary, language/source breadth, and mean document
    // length, every figure an exact integer or a single ratio. One
    // corpus scan feeds the doc-level aggregate; the bigram
    // vocabulary count is the only second aggregation (vocabulary-
    // sized). The engine-level point: the card is DERIVED inside the
    // engine and oracle-gated like any operator, so the numbers a
    // release quotes are the numbers the engine computed.
    GQuery(
      "q300_dataset_card",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "documents")
          .select($"doc_id", $"lang", $"source", $"n_chars",
            size(split($"text", " ")).cast("long").as("tk"),
            split($"text", " ").as("w"))
        val card = base.agg(
          count(lit(1)).as("n_docs"),
          sum($"tk").as("n_tokens"),
          sum($"n_chars").as("n_chars"),
          countDistinct($"lang").as("n_langs"),
          countDistinct($"source").as("n_sources"),
          min($"tk").as("min_doc_tokens"),
          max($"tk").as("max_doc_tokens"))
        val vocab = base
          .select(explode(expr(
            """transform(sequence(0, size(w) - 2), i ->
              |  concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))"""
              .stripMargin)).as("b"))
          .agg(countDistinct($"b").as("bigram_vocab"))
        card.crossJoin(vocab)
          .withColumn("mean_doc_tokens",
            $"n_tokens" * lit(1.0) / $"n_docs")
      },
      Some("""WITH b AS (SELECT doc_id, lang, source, n_chars,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tk,
             |    string_split(text, ' ') AS w
             |  FROM documents),
             |card AS (SELECT count(*) AS n_docs,
             |    CAST(sum(tk) AS BIGINT) AS n_tokens,
             |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
             |    count(DISTINCT lang) AS n_langs,
             |    count(DISTINCT source) AS n_sources,
             |    min(tk) AS min_doc_tokens, max(tk) AS max_doc_tokens
             |  FROM b),
             |v AS (SELECT count(DISTINCT bg) AS bigram_vocab FROM (
             |    SELECT unnest(list_transform(generate_series(1, len(w) - 1),
             |      i -> concat(w[i], ' ', w[i + 1]))) AS bg FROM b))
             |SELECT card.*, bigram_vocab,
             |  n_tokens * 1.0 / n_docs AS mean_doc_tokens
             |FROM card, v""".stripMargin)),

    // quality-score bias calibration: is q41's heuristic quality
    // score language-biased? — score deciles against the English
    // label. A flat curve means the score treats languages evenly; a
    // sloped one means gating on it would silently skew the language
    // mix — the fairness audit a curation team runs BEFORE
    // thresholding. The decile is the exact ntile formula over
    // ExactRank's banded global row_number under (score, md5-hash,
    // doc_id) — the r6-verdict fix for the former partition-less
    // ntile, which single-task-sorted doc-grain rows; the hash
    // tiebreak (mirrored in the oracle) splits exact score ties
    // across hash sub-bands. Scale: one corpus scan computes both
    // signals, every window partitioned, output is 10 rows.
    GQuery(
      "q288_quality_calibration",
      (s, dir) => {
        import s.implicits._
        val scored = t(s, dir, "documents")
          .select($"doc_id", ($"lang" === "en").cast("long").as("is_en"),
            split($"text", " ").as("w"))
          .select($"doc_id", $"is_en",
            (size(array_distinct($"w")) * lit(1.0) / size($"w"))
              .as("score"))
          .withColumn("h", ExactRank.h32($"doc_id", ":cal"))
        val tot = scored.agg(count(lit(1)).as("total"))
        ExactRank.rowNumber(
            GuardedBroadcast.pin(
              scored.crossJoin(GuardedBroadcast.maybe(tot))),
            $"score", $"h", $"doc_id", "rk")
          .withColumn("decile",
            ExactRank.ntileFromRank($"rk", $"total", 10))
          .groupBy($"decile")
          .agg(count(lit(1)).as("n_docs"), sum($"is_en").as("n_en"),
            (sum($"is_en") * lit(1.0) / count(lit(1))).as("en_rate"))
      },
      Some(s"""WITH l AS (SELECT doc_id,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
             |    len(list_distinct(string_split(text, ' '))) * 1.0
             |      / len(string_split(text, ' ')) AS score,
             |    CAST(concat('0x', substr(md5(concat(
             |      CAST(doc_id AS VARCHAR), ':cal')), 1, 8)) AS BIGINT) AS h
             |  FROM documents),
             |r AS (SELECT is_en,
             |    CAST(row_number() OVER (ORDER BY score, h, doc_id)
             |      AS BIGINT) AS rk,
             |    count(*) OVER () AS total FROM l),
             |d AS (SELECT is_en,
             |    ${ExactRank.ntileSql("rk", "total", 10)} AS decile FROM r)
             |SELECT decile, count(*) AS n_docs,
             |  CAST(sum(is_en) AS BIGINT) AS n_en,
             |  CAST(sum(is_en) AS BIGINT) * 1.0 / count(*) AS en_rate
             |FROM d GROUP BY 1""".stripMargin)),

    // inverse-probability-weighted estimation audit: estimate the
    // corpus token total from the deterministic 10% md5-bucket sample
    // (q82's sampler) by weighting each sampled doc 10×, against the
    // exact total — the estimator-correctness check a sampling
    // pipeline ships with its sample. Integer sums; the relative
    // error is one ratio at output. Scale: the sample predicate
    // pushes into the scan; both aggregates are one-pass.
    GQuery(
      "q289_ipw_estimate",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"doc_id", size(split($"text", " ")).cast("long").as("tk"),
            expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8)," +
              " 16, 10) AS BIGINT) % 10").as("bucket"))
        val exact = toks.agg(sum($"tk").as("exact_tokens"),
          count(lit(1)).as("n_docs"))
        val est = toks.filter($"bucket" === 0)
          .agg((sum($"tk") * 10).as("est_tokens"),
            count(lit(1)).as("n_sampled"))
        exact.crossJoin(est)
          .select($"exact_tokens", $"est_tokens", $"n_docs", $"n_sampled",
            (abs($"est_tokens" - $"exact_tokens") * lit(1.0)
              / $"exact_tokens").as("rel_err"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tk,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             |      AS BIGINT) % 10 AS bucket
             |  FROM documents),
             |e AS (SELECT CAST(sum(tk) AS BIGINT) AS exact_tokens,
             |    count(*) AS n_docs FROM t),
             |s AS (SELECT CAST(sum(tk) * 10 AS BIGINT) AS est_tokens,
             |    count(*) AS n_sampled FROM t WHERE bucket = 0)
             |SELECT exact_tokens, est_tokens, n_docs, n_sampled,
             |  abs(est_tokens - exact_tokens) * 1.0 / exact_tokens AS rel_err
             |FROM e, s""".stripMargin)),

    // chi-square independence test, lang × source: "is the language
    // mix the same across feeds?" — the contingency-table forensic
    // behind q227's KL drift. Every cell term (O−E)²/E derives from
    // exact integer counts with identical scalar ops, and the
    // cell-term SUM goes through the order-independent dsum so
    // Spark's partial aggregation and DuckDB's scan order agree;
    // Cramér's V normalizes to [0,1]. Scale: one (lang, source)
    // aggregate (domain-bounded), everything after is cell-sized.
    GQuery(
      "q290_chi_square",
      (s, dir) => {
        import s.implicits._
        import OracleNum._
        val cells = t(s, dir, "documents")
          .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
        val rows = cells.groupBy($"lang").agg(sum($"o").as("r"))
        val cols = cells.groupBy($"source").agg(sum($"o").as("c"))
        val n = cells.agg(sum($"o").as("n"),
          countDistinct($"lang").as("nr"),
          countDistinct($"source").as("nc"))
        cells.join(rows, "lang").join(cols, "source")
          .crossJoin(GuardedBroadcast.maybe(n))
          .select($"o", $"r", $"c", $"n", $"nr", $"nc",
            (($"o" * $"n" - $"r" * $"c")
              * ($"o" * $"n" - $"r" * $"c")
              * lit(1.0) / ($"n".cast("double") * $"r" * $"c"))
              .as("term"))
          .groupBy($"nr", $"nc")
          .agg(dsum($"term").as("chi2"), first($"n").as("n"))
          .select(
            (($"nr" - 1) * ($"nc" - 1)).as("dof"), $"n", $"chi2",
            sqrt($"chi2" / ($"n" * (least($"nr", $"nc") - 1)))
              .as("cramers_v"))
      },
      Some(s"""WITH cells AS (SELECT lang, source, count(*) AS o
              |  FROM documents GROUP BY 1, 2),
              |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells
              |      GROUP BY 1),
              |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells
              |      GROUP BY 1),
              |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
              |    count(DISTINCT lang) AS nr, count(DISTINCT source) AS nc
              |  FROM cells),
              |terms AS (SELECT nr, nc, n,
              |    (o * n - r.r * c.c) * (o * n - r.r * c.c) * 1.0
              |      / (CAST(n AS DOUBLE) * r.r * c.c) AS term
              |  FROM cells JOIN r USING (lang) JOIN c USING (source), t),
              |agg AS (SELECT nr, nc, n,
              |    ${OracleNum.dsumSql("term")} AS chi2
              |  FROM terms GROUP BY 1, 2, 3)
              |SELECT (nr - 1) * (nc - 1) AS dof, n, chi2,
              |  sqrt(chi2 / (n * (least(nr, nc) - 1))) AS cramers_v
              |FROM agg""".stripMargin)),

    // exact ROC AUC of the quality score against the English label
    // (q288's bias curve, collapsed to the one number a review
    // reads: 0.5 = language-neutral). Mann-Whitney form with tie
    // handling:
    // 2·avgrank of a tie group = min+max row_number (an INTEGER), so
    // the positive-rank sum stays exact and
    // AUC = (Σ2r − P(P+1)) / (2·P·N) is integer arithmetic until the
    // single output divide. No per-row rank is ever materialized
    // (the r6-verdict fix for the former doc-grain global sort): a
    // tie group with c rows, p positives, and `below` smaller-scored
    // rows contributes p·(2·below + c + 1) to Σ2r, and `below` comes
    // from the q233 banded prefix at SCORE-GROUP grain — score ∈
    // (0, 1], so floor(score·65536) is a bounded monotone banding;
    // the band histogram prefix-sums under BoundedWindow and the
    // within-band prefix partitions by band. Everything after the
    // one (score) groupBy is group-sized.
    GQuery(
      "q291_score_auc",
      (s, dir) => {
        import s.implicits._
        val labeled = t(s, dir, "documents")
          .select($"doc_id", ($"lang" === "en").cast("long").as("pos"),
            split($"text", " ").as("w"))
          .select($"doc_id", $"pos",
            (size(array_distinct($"w")) * lit(1.0) / size($"w"))
              .as("score"))
        val grp = labeled.groupBy($"score")
          .agg(count(lit(1)).as("c"), sum($"pos").as("p"))
          .withColumn("band", floor($"score" * 65536).cast("long"))
        val unb = Window.unboundedPreceding
        val bandHist = grp.groupBy($"band").agg(sum($"c").as("bc"))
          .withColumn("below_band", coalesce(sum($"bc").over(
            BoundedWindow.ordered($"band").rowsBetween(unb, -1)), lit(0L)))
        val wv = Window.partitionBy($"band").orderBy($"score")
          .rowsBetween(unb, -1)
        grp
          .join(GuardedBroadcast.maybe(
            bandHist.select($"band", $"below_band")), Seq("band"))
          .withColumn("below",
            $"below_band" + coalesce(sum($"c").over(wv), lit(0L)))
          .agg(sum($"p" * (lit(2L) * $"below" + $"c" + 1)).as("s2"),
            sum($"p").as("p"), sum($"c").as("total"))
          .select($"p".as("n_pos"), ($"total" - $"p").as("n_neg"),
            (($"s2" - $"p" * ($"p" + 1)) * lit(1.0)
              / (lit(2L) * $"p" * ($"total" - $"p"))).as("auc"))
      },
      Some("""WITH l AS (SELECT doc_id,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             |    len(list_distinct(string_split(text, ' '))) * 1.0
             |      / len(string_split(text, ' ')) AS score
             |  FROM documents),
             |rk AS (SELECT pos, score,
             |    CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT)
             |      AS r
             |  FROM l),
             |t AS (SELECT pos,
             |    min(r) OVER (PARTITION BY score)
             |      + max(r) OVER (PARTITION BY score) AS r2
             |  FROM rk),
             |agg AS (SELECT
             |    CAST(sum(CASE WHEN pos = 1 THEN r2 ELSE 0 END) AS BIGINT)
             |      AS s2,
             |    CAST(sum(pos) AS BIGINT) AS p, count(*) AS total FROM t)
             |SELECT p AS n_pos, total - p AS n_neg,
             |  (s2 - p * (p + 1)) * 1.0 / (2 * p * (total - p)) AS auc
             |FROM agg""".stripMargin)),

    // inverse-frequency class weights per language (the imbalance
    // correction every classifier-training pipeline computes before
    // sampling): w_c = N / (k·n_c), plus each class's share — one
    // aggregate, integer counts, two exact ratio divides spelled in
    // the same order on both engines.
    GQuery(
      "q280_class_weights",
      (s, dir) => {
        import s.implicits._
        val counts = t(s, dir, "documents")
          .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
        val tot = counts.agg(sum($"n_docs").as("total"),
          count(lit(1)).as("k"))
        counts.crossJoin(GuardedBroadcast.maybe(tot))
          .select($"lang", $"n_docs",
            ($"n_docs" * lit(1.0) / $"total").as("share"),
            ($"total" * lit(1.0) / ($"k" * $"n_docs")).as("class_weight"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
             |  GROUP BY 1),
             |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             |    count(*) AS k FROM c)
             |SELECT lang, n_docs, n_docs * 1.0 / total AS share,
             |  total * 1.0 / (k * n_docs) AS class_weight
             |FROM c, t""".stripMargin)),

    // overlapping chunk manifest (RAG / long-context prep): each doc
    // splits into token windows of size 64 with stride 48; the tail
    // window keeps its stride-aligned offset k*48 and TRUNCATES to the
    // remaining n − k*48 tokens (17..64 by construction — k_max =
    // (n−17) div 48 guarantees every tail holds more than the 16-token
    // overlap, so it is never a sub-window of its predecessor).
    // Scale shape: the offsets come from `sequence(0, k_max)` +
    // explode INSIDE the scan stage (map-side, codegen'd) — no join,
    // no shuffle at all until a downstream consumer groups the
    // manifest; output is chunk-grain, ~n_tokens/stride per doc.
    GQuery(
      "q308_chunk_manifest",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
          .withColumn("k_max",
            when($"n" > 64, expr("(n - 17) div 48")).otherwise(lit(0L)))
          .select($"doc_id", $"n",
            explode(expr("sequence(0L, k_max)")).as("chunk_idx"))
          .select($"doc_id", $"chunk_idx",
            ($"chunk_idx" * 48).as("off"),
            least(lit(64L), $"n" - $"chunk_idx" * 48).as("chunk_tokens"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents),
             |k AS (SELECT doc_id, n,
             |    CASE WHEN n > 64 THEN (n - 17) // 48 ELSE 0 END AS k_max
             |  FROM d),
             |c AS (SELECT doc_id, n,
             |    unnest(generate_series(0, k_max)) AS chunk_idx FROM k)
             |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             |  CAST(chunk_idx * 48 AS BIGINT) AS off,
             |  CAST(least(64, n - chunk_idx * 48) AS BIGINT) AS chunk_tokens
             |FROM c""".stripMargin)),

    // dedup length-bias audit: exact-dedup retention rate per length
    // decile — does dropping exact duplicates skew the corpus toward
    // long or short documents? (Short boilerplate duplicates far more
    // often, so naive dedup quietly reshapes the length mix; this is
    // the before/after evidence a curation review wants next to q171's
    // duplication profile.) Keep rule = min doc_id per md5(text), the
    // q43 canonical-winner convention; deciles via ExactRank's banded
    // rank over (n_chars, md5-hash, doc_id) — every window
    // partitioned, the r7 global-rank discipline. Output is 10 rows.
    GQuery(
      "q309_dedup_length_bias",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"n_chars", md5($"text").as("tid"))
        val keep = docs.groupBy($"tid").agg(min($"doc_id").as("keep_id"))
        val tot = docs.agg(count(lit(1)).as("total"))
        val flagged = docs
          .join(GuardedBroadcast.maybe(keep), Seq("tid"))
          .withColumn("kept", ($"doc_id" === $"keep_id").cast("long"))
          .withColumn("h", ExactRank.h32($"doc_id", ":lb"))
        ExactRank.rowNumber(
            GuardedBroadcast.pin(
              flagged.crossJoin(GuardedBroadcast.maybe(tot))),
            $"n_chars", $"h", $"doc_id", "rk")
          .withColumn("decile", ExactRank.ntileFromRank($"rk", $"total", 10))
          .groupBy($"decile")
          .agg(count(lit(1)).as("n_docs"), sum($"kept").as("n_kept"),
            (sum($"kept") * lit(1.0) / count(lit(1))).as("retention"))
      },
      Some(s"""WITH d AS (SELECT doc_id, n_chars, md5(text) AS tid,
             |    CAST(concat('0x', substr(md5(concat(
             |      CAST(doc_id AS VARCHAR), ':lb')), 1, 8)) AS BIGINT) AS h
             |  FROM documents),
             |k AS (SELECT tid, min(doc_id) AS keep_id FROM d GROUP BY 1),
             |f AS (SELECT d.doc_id, d.n_chars, d.h,
             |    CASE WHEN d.doc_id = k.keep_id THEN 1 ELSE 0 END AS kept
             |  FROM d JOIN k USING (tid)),
             |r AS (SELECT kept,
             |    CAST(row_number() OVER (ORDER BY n_chars, h, doc_id)
             |      AS BIGINT) AS rk,
             |    count(*) OVER () AS total FROM f),
             |x AS (SELECT kept,
             |    ${graft.scale.ExactRank.ntileSql("rk", "total", 10)}
             |      AS decile FROM r)
             |SELECT decile, count(*) AS n_docs,
             |  CAST(sum(kept) AS BIGINT) AS n_kept,
             |  CAST(sum(kept) AS BIGINT) * 1.0 / count(*) AS retention
             |FROM x GROUP BY 1""".stripMargin)),

    // split-contamination matrix: after the standard 80/10/10
    // hash-bucket split, how many of each split's exact fingerprints
    // ALSO occur in a lower-precedence split (train < val < test)? —
    // the leakage audit between a model's own splits, the sibling of
    // q94/q216's corpus-vs-eval decontamination (those check against
    // an external eval set; this checks the split boundary itself —
    // a duplicated document that lands in both train and test inflates
    // eval silently). Per-split row: docs, distinct fingerprints, and
    // fingerprints leaked from lower splits. Scale shape: fingerprint-
    // grain distinct + one fingerprint-keyed semi join; no doc-pair
    // join anywhere.
    GQuery(
      "q312_split_contamination",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
          .select($"doc_id", md5($"text").as("fp"),
            (ExactRank.h32($"doc_id", ":sp") % 10).as("bucket"))
          .withColumn("split",
            when($"bucket" < 8, "train")
              .when($"bucket" === 8, "val").otherwise("test"))
          .withColumn("r",
            when($"split" === "train", 0)
              .when($"split" === "val", 1).otherwise(2))
        val fps = d.select($"split", $"r", $"fp").distinct()
        val leaked = fps.as("a")
          .join(fps.as("b"),
            col("a.fp") === col("b.fp") && col("b.r") < col("a.r"),
            "left_semi")
          .groupBy(col("split")).agg(count(lit(1)).as("n_leaked"))
        d.groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"fp").as("n_fingerprints"))
          .join(leaked, Seq("split"), "left_outer")
          .select($"split", $"n_docs", $"n_fingerprints",
            coalesce($"n_leaked", lit(0L)).as("n_leaked"))
      },
      Some("""WITH d AS (SELECT doc_id, md5(text) AS fp,
             |    CAST(concat('0x', substr(md5(concat(
             |      CAST(doc_id AS VARCHAR), ':sp')), 1, 8)) AS BIGINT) % 10
             |      AS bucket
             |  FROM documents),
             |sp AS (SELECT doc_id, fp,
             |    CASE WHEN bucket < 8 THEN 'train'
             |         WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
             |    CASE WHEN bucket < 8 THEN 0
             |         WHEN bucket = 8 THEN 1 ELSE 2 END AS r
             |  FROM d),
             |fps AS (SELECT DISTINCT split, r, fp FROM sp),
             |lk AS (SELECT a.split, count(*) AS n_leaked FROM fps a
             |  WHERE EXISTS (SELECT 1 FROM fps b
             |    WHERE b.fp = a.fp AND b.r < a.r)
             |  GROUP BY 1),
             |base AS (SELECT split, count(*) AS n_docs,
             |    count(DISTINCT fp) AS n_fingerprints FROM sp GROUP BY 1)
             |SELECT base.split, n_docs, n_fingerprints,
             |  CAST(coalesce(lk.n_leaked, 0) AS BIGINT) AS n_leaked
             |FROM base LEFT JOIN lk ON lk.split = base.split"""
        .stripMargin)),

    // perplexity-gating audit (the CCNet filtering recipe, Wenzek et
    // al. 2020, arXiv:1911.00359 — keep documents an LM scores as
    // fluent): per-language retention at three bits-per-token gates
    // over q220's unigram LM. The gate compares EXACT integers —
    // doc passes threshold T bits/token iff Σmb ≤ T·10⁴·n_tokens
    // (mb is the milli-bit-integerized word surprisal) — so no
    // per-doc float divide enters the decision. This is the
    // language-bias readout a team checks BEFORE applying the filter:
    // an LM fit on the majority language scores minority-language
    // text as "non-fluent", and a sloped retention column here is
    // that bias made visible. Scale shape: vocabulary-sized LM
    // broadcast-joined to the token stream (the q220 shape), doc-grain
    // aggregate, ×3 thresholds at doc grain, output 3×langs rows.
    GQuery(
      "q313_perplexity_gate",
      (s, dir) => {
        import s.implicits._
        val w = t(s, dir, "documents")
          .select($"doc_id", $"lang", explode(split($"text", " ")).as("word"))
        val counts = w.groupBy($"word").agg(count(lit(1)).as("c"))
        val total = counts.agg(sum($"c").as("total"))
        val lm = counts.crossJoin(GuardedBroadcast.maybe(total))
          .select($"word",
            floor((log2($"total") - log2($"c")) * 10000 + 0.5)
              .cast("long").as("mb"))
        val perDoc = w.join(GuardedBroadcast.maybe(lm), Seq("word"))
          .groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("n_tokens"), sum($"mb").as("smb"))
        val thr = Seq(9L, 11L, 13L).toDF("thr_bits")
        perDoc.crossJoin(GuardedBroadcast.maybe(thr))
          .groupBy($"thr_bits", $"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(($"smb" <= $"thr_bits" * 10000 * $"n_tokens").cast("long"))
              .as("n_kept"),
            sum(when($"smb" <= $"thr_bits" * 10000 * $"n_tokens",
              $"n_tokens").otherwise(0L)).as("kept_tokens"))
      },
      Some("""WITH w AS (SELECT doc_id, lang,
             |    unnest(string_split(text, ' ')) AS word FROM documents),
             |c AS (SELECT word, count(*) AS c FROM w GROUP BY word),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c),
             |lm AS (SELECT word,
             |    CAST(floor((log2(total) - log2(c)) * 10000 + 0.5)
             |      AS BIGINT) AS mb
             |  FROM c, tot),
             |pd AS (SELECT doc_id, lang, count(*) AS n_tokens,
             |    CAST(sum(mb) AS BIGINT) AS smb
             |  FROM w JOIN lm USING (word) GROUP BY 1, 2),
             |t AS (SELECT CAST(unnest([9, 11, 13]) AS BIGINT) AS thr_bits)
             |SELECT thr_bits, lang, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN smb <= thr_bits * 10000 * n_tokens
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN smb <= thr_bits * 10000 * n_tokens
             |    THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
             |FROM pd, t GROUP BY 1, 2""".stripMargin)),

    // cross-source syndication matrix: for every ordered source pair,
    // how many LEDE fingerprints (md5 of the first 8 tokens — outlets
    // syndicate a wire lede and edit the tail, so whole-text hashing
    // misses exactly the duplication that matters) appear in BOTH —
    // the mirror/syndication detector; curation then dedups across
    // the pair or drops the mirror. Complements q131 (within-source
    // dup rate) and q312 (split leakage): fingerprint machinery at
    // source×source scope. Scale shape: (source, fp) distinct, then a
    // fingerprint-keyed self-join whose fan-out per fingerprint is
    // bounded by the SOURCE count, never by doc count — output
    // ≤ sources² rows.
    GQuery(
      "q314_source_overlap",
      (s, dir) => {
        import s.implicits._
        val fps = t(s, dir, "documents")
          .select($"source",
            md5(concat_ws(" ", slice(split($"text", " "), 1, 8))).as("fp"))
          .distinct()
        fps.as("a")
          .join(fps.as("b"),
            col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"),
            col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared"))
      },
      Some("""WITH f AS (SELECT DISTINCT source,
             |    md5(array_to_string(string_split(text, ' ')[1:8], ' '))
             |      AS fp
             |  FROM documents)
             |SELECT a.source AS source_a, b.source AS source_b,
             |  count(*) AS n_shared
             |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
             |GROUP BY 1, 2""".stripMargin)),

    // Gopher-style repetition-rule filter card (Rae et al. 2021 §A1.1
    // analog over the word-stream corpus): per doc, (a) type-token
    // ratio, (b) duplicate-SEGMENT fraction over non-overlapping
    // 8-token segments (the duplicate-line rule; this corpus has no
    // newlines, so the segment grid is the line analog — identical
    // rule in both engines), (c) length bounds; the card reports per
    // (source, lang) how much of the corpus each composite gate keeps.
    // Scale shape: segments come from transform(sequence)+slice INSIDE
    // the scan projection — higher-order array functions, zero
    // shuffles before the final name-sized groupBy. The avg columns
    // ride the OracleNum davg floor-pattern (order-independent).
    GQuery(
      "q323_gopher_rules",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"source", $"lang", split($"text", " ").as("toks"))
          .withColumn("n", size($"toks").cast("long"))
          .withColumn("nseg", expr("n div 8"))
          .withColumn("segs",
            when($"nseg" > 0, expr(
              "transform(sequence(0L, nseg - 1), " +
                "i -> array_join(slice(toks, int(i)*8 + 1, 8), ' '))"))
              .otherwise(expr("array()")))
          .withColumn("ttr",
            size(array_distinct($"toks")) * lit(1.0) / $"n")
          .withColumn("dupf",
            when($"nseg" > 0,
              lit(1.0) -
                size(array_distinct($"segs")) * lit(1.0) / $"nseg")
              .otherwise(lit(0.0)))
          .withColumn("pass",
            ($"ttr" >= 0.3 && $"dupf" <= 0.2 &&
              $"n".between(30, 5000)).cast("long"))
          .groupBy($"source", $"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"pass").as("n_pass"),
            (sum($"pass") * lit(1.0) / count(lit(1))).as("pass_rate"),
            OracleNum.davg($"ttr").as("avg_ttr"),
            OracleNum.davg($"dupf").as("avg_dupf"))
      },
      Some("""WITH d AS (SELECT source, lang,
             |    string_split(text, ' ') AS toks,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents),
             |e AS (SELECT source, lang, n,
             |    CAST(len(list_distinct(toks)) AS BIGINT) * 1.0 / n
             |      AS ttr,
             |    n // 8 AS nseg,
             |    list_transform(range(n // 8), i ->
             |      array_to_string(toks[i*8+1:i*8+8], ' ')) AS segs
             |  FROM d),
             |f AS (SELECT source, lang, n, ttr,
             |    CASE WHEN nseg > 0 THEN
             |      1.0 - CAST(len(list_distinct(segs)) AS BIGINT)
             |        * 1.0 / nseg
             |    ELSE 0.0 END AS dupf
             |  FROM e),
             |g AS (SELECT source, lang, n, ttr, dupf,
             |    CASE WHEN ttr >= 0.3 AND dupf <= 0.2
             |      AND n BETWEEN 30 AND 5000 THEN 1 ELSE 0 END AS pass
             |  FROM f)
             |SELECT source, lang,
             |  count(*) AS n_docs,
             |  CAST(sum(pass) AS BIGINT) AS n_pass,
             |  CAST(sum(pass) AS BIGINT) * 1.0 / count(*) AS pass_rate,
             |  CAST(sum(floor(ttr * 10000 + 0.5)) / 10000 / count(*)
             |    AS DOUBLE) AS avg_ttr,
             |  CAST(sum(floor(dupf * 10000 + 0.5)) / 10000 / count(*)
             |    AS DOUBLE) AS avg_dupf
             |FROM g GROUP BY 1, 2""".stripMargin)),

    // DSIR-style data selection via hashed importance resampling (Xie
    // et al. 2023): fit unigram bucket distributions (64 md5 buckets,
    // add-1 smoothing) over the TARGET slice (lang='en' here — the
    // "looks like my eval set" proxy) and the RAW corpus, score every
    // doc by its summed log-likelihood ratio, keep the top 100. Each
    // bucket's log2 ratio is quantized to an integer once (the q220
    // millibit discipline) so per-doc sums are exact integers — no
    // float-order sensitivity. Scale shape: the 64-row model is ONE
    // tiny aggregate broadcast back over the token stream; the only
    // data-sized shuffle is the partial-aggregated per-doc sum, and
    // the ranking is TakeOrderedAndProject (top-k, never a global
    // sort). Two linear corpus scans total — fit and score — exactly
    // the two passes the published method needs at 100 TB.
    GQuery(
      "q333_dsir_select",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"doc_id", $"lang", explode(split($"text", " ")).as("w"))
          .withColumn("b",
            conv(substring(md5($"w".cast("binary")), 1, 8), 16, 10)
              .cast("long") % 64)
        val buckets = toks.groupBy($"b").agg(
          sum(when($"lang" === "en", 1L).otherwise(0L)).as("ct"),
          count(lit(1)).as("cr"))
        val totals = buckets.agg(sum($"ct").as("nt"), sum($"cr").as("nr"))
        val model = buckets.crossJoin(GuardedBroadcast.maybe(totals))
          .select($"b",
            floor((log2(($"ct" + lit(1.0)) / ($"nt" + lit(64.0))) -
              log2(($"cr" + lit(1.0)) / ($"nr" + lit(64.0)))) * 10000 + 0.5)
              .cast("long").as("mb"))
        toks.join(GuardedBroadcast.maybe(model), Seq("b"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum($"mb").as("w_mb"))
          .orderBy($"w_mb".desc, $"doc_id")
          .limit(100)
      },
      Some("""WITH toks AS (SELECT doc_id, lang,
             |    CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % 64 AS b
             |  FROM (SELECT doc_id, lang,
             |          unnest(string_split(text, ' ')) AS w
             |        FROM documents)),
             |bk AS (SELECT b,
             |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             |    CAST(count(*) AS BIGINT) AS cr
             |  FROM toks GROUP BY b),
             |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
             |    CAST(sum(cr) AS BIGINT) AS nr FROM bk),
             |m AS (SELECT b,
             |    CAST(floor((log2((ct + 1.0) / (nt + 64.0)) -
             |      log2((cr + 1.0) / (nr + 64.0))) * 10000 + 0.5) AS BIGINT) AS mb
             |  FROM bk, tot)
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(sum(mb) AS BIGINT) AS w_mb
             |FROM toks JOIN m USING (b)
             |GROUP BY doc_id
             |ORDER BY w_mb DESC, doc_id LIMIT 100""".stripMargin)),

    // probability-proportional-to-size SYSTEMATIC sampling (round 10):
    // the sampling-by-token-count pass a mixture realization actually
    // executes — k equally-spaced thresholds walk the corpus's
    // cumulative weight, and a doc is drawn once per threshold its
    // weight interval covers (a doc heavier than the step gets
    // multiplicity > 1 — true PPS-with-replacement semantics). All
    // arithmetic is integer (cumsums, `div` thresholds), so membership
    // is exact and engine-independent — no float keys, no
    // transcendentals, unlike Efraimidis-Spirakis. Scale shape: the
    // global cumulative sum is the q95 banded two-phase prefix sum
    // (per-band partials, a band-count-sized ordered window, a
    // band-partitioned within-band window — the corpus never sorts in
    // one task), and the corpus total joins back as a 1-row broadcast.
    GQuery(
      "q341_pps_systematic_sample",
      (s, dir) => {
        import s.implicits._
        val k = 20L
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"n_chars".cast("long").as("w"))
          .withColumn("b", expr("doc_id div 100"))
        val bsums = docs.groupBy($"b").agg(sum($"w").as("bn"))
        val wb = BoundedWindow.ordered($"b")
          .rowsBetween(Window.unboundedPreceding, -1)
        val bpre = bsums
          .withColumn("bpre", coalesce(sum($"bn").over(wb), lit(0L)))
          .select($"b", $"bpre")
        val step = docs.agg(expr(s"sum(w) div $k").as("step"))
        val wi = Window.partitionBy($"b").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        docs.join(GuardedBroadcast.maybe(bpre), Seq("b"))
          .withColumn("cprev", $"bpre" + coalesce(sum($"w").over(wi), lit(0L)))
          .crossJoin(GuardedBroadcast.maybe(step))
          .select($"doc_id", $"w",
            (expr("(cprev + w) div step") - expr("cprev div step"))
              .as("n_draws"))
          .filter($"n_draws" > 0)
      },
      Some("""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             |    CAST(coalesce(sum(CAST(n_chars AS BIGINT)) OVER (
             |      ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cprev
             |  FROM documents),
             |t AS (SELECT CAST(sum(w) AS BIGINT) // 20 AS step FROM d)
             |SELECT doc_id, w,
             |  CAST((cprev + w) // step - cprev // step AS BIGINT) AS n_draws
             |FROM d, t
             |WHERE (cprev + w) // step - cprev // step > 0""".stripMargin)),

    // BPE merge TRAINING, the full loop (q278 is iteration one's pair
    // count; this trains the actual merge table): BpeMerges rounds of
    // count-adjacent-pairs → take the top pair → fold the merge into
    // the segmentation. Scale shape: the corpus-sized pass happens
    // ONCE (word-frequency groupBy, map-side combine, vocabulary-sized
    // output); each round then aggregates the vocabulary-sized
    // segmentation relation (pair expansion bounded by word length
    // inside the row, shuffle pair-vocabulary-sized after partials)
    // and ships ONE row to the driver — the sequential sync point BPE
    // intrinsically has; merge application is a literal string replace
    // with no shuffle at all. At 100 TB the corpus pass dominates and
    // runs exactly once. Output: the learned merge table, rank-ordered.
    GQuery(
      "q376_bpe_train",
      (s, dir) => {
        import s.implicits._
        bpeTrain(s, dir, BpeMerges).zipWithIndex.map { case ((a, b, c), i) =>
          (i + 1L, a, b, a + b, c)
        }.toDF("merge_rank", "pair_a", "pair_b", "merged", "pair_count")
          .orderBy($"merge_rank")
      },
      Some {
        val sel = (1 to BpeMerges).map(i =>
          s"""SELECT CAST($i AS BIGINT) AS merge_rank, a AS pair_a, b AS pair_b,
             |  a || b AS merged, cnt AS pair_count FROM t$i""".stripMargin)
          .mkString("\nUNION ALL\n")
        s"WITH ${bpeOracleSteps(BpeMerges)}\n$sel\nORDER BY merge_rank"
      }),

    // BPE tokenize-APPLY: re-segment the corpus with q376's learned
    // merge table and report per-source token economics — words,
    // characters, post-merge tokens, and fertility (tokens per 1000
    // words; integer division keeps it cross-engine exact). The merges
    // compose into ONE chained-replace projection, so the apply phase
    // is a single embarrassingly-parallel pass over the
    // vocabulary-sized per-source word relation followed by a
    // source-sized aggregate — no shuffle wider than (source, word).
    GQuery(
      "q377_bpe_tokenize",
      (s, dir) => {
        import s.implicits._
        val segExpr = bpeSegExpr(bpeTrain(s, dir, BpeMerges))
        val ws = t(s, dir, "documents")
          .select($"source",
            explode(split(lower($"text"), "[^a-z]+")).as("word"))
          .filter(length($"word") >= 2)
          .groupBy($"source", $"word").agg(count(lit(1)).as("freq"))
        ws.select($"source", $"freq", length($"word").cast("long").as("chars"),
            expr(s"size(split(trim($segExpr), '  '))").cast("long").as("ntok"))
          .groupBy($"source")
          .agg(sum($"freq").as("n_words"),
            sum($"freq" * $"chars").as("n_chars"),
            sum($"freq" * $"ntok").as("n_tokens"))
          .withColumn("fertility_milli",
            expr("n_tokens * 1000 div n_words"))
      },
      Some(bpeTokenizeSql)),

    // the SAME tokenize-apply through the RANKED per-word algorithm
    // (round 14): q377's chained-replace expression is the right
    // single-pass shape at k=6 but would blow codegen limits and pay
    // O(k*len) per word at a real tokenizer's k~30k; bpeTokensRanked
    // applies merges in rank order with O(1) skips for absent pairs.
    // Same oracle as q377 — the two arms must be indistinguishable.
    GQuery(
      "q391_bpe_tokenize_ranked",
      (s, dir) => {
        import s.implicits._
        val merges = bpeTrain(s, dir, BpeMerges)
        val ws = t(s, dir, "documents")
          .select($"source",
            explode(split(lower($"text"), "[^a-z]+")).as("word"))
          .filter(length($"word") >= 2)
          .groupBy($"source", $"word").agg(count(lit(1)).as("freq"))
        bpeTokensRanked(ws, merges)
          .select($"source", $"freq",
            length($"word").cast("long").as("chars"), $"ntok")
          .groupBy($"source")
          .agg(sum($"freq").as("n_words"),
            sum($"freq" * $"chars").as("n_chars"),
            sum($"freq" * $"ntok").as("n_tokens"))
          .withColumn("fertility_milli",
            expr("n_tokens * 1000 div n_words"))
      },
      Some(bpeTokenizeSql)),

    // TRAINABLE quality-classifier distillation — the fastText-filter
    // pattern every modern curation pipeline runs (CCNet-style):
    // distill an expensive per-doc quality signal (unique-token ratio
    // ≥ 600‰, the q121 family's signal — stand-in for human labels or
    // a big model's judgments) into a cheap linear scorer over
    // trivially-computable features, trained by 6 full-batch gradient
    // steps of a hard-sigmoid logistic model. Every quantity is exact
    // fixed-point: features x0=100 (bias, deliberately smaller than
    // the ±500-centered features so the first step's uniform residual
    // doesn't slam the bias past the signal), x1=capped length − 500,
    // x2=500 − distinct-per-mille; score yh = clamp(500 + (w·x) div
    // 4000, 0, 1000); update w_j −= Σ((yh−y)·x_j) div (N·200).
    // TRUNCATING integer division spells identically in Spark
    // (`div`), Scala driver math (Long `/`), and DuckDB (`//` —
    // verified truncating, not flooring), so the unrolled-CTE oracle
    // matches hash-exactly — no transcendental sigmoid anywhere.
    // Measured at sf0.01: accuracy 129 → 480 of 500 over the 6 steps.
    // Scale shape: each step is ONE map-side-combined aggregate over
    // the corpus (3 gradient sums + count + correct-count), weights
    // live on the driver (3 longs), k driver round-trips — the
    // synchronous-SGD skeleton of a real distributed trainer with an
    // embarrassingly parallel feature pass. Output: per-step weights
    // + training accuracy, then a final eval row.
    GQuery(
      "q381_quality_classifier",
      (s, dir) => {
        import s.implicits._
        clfTrain(s, dir)
          .toDF("step", "w0", "w1", "w2", "n_correct").orderBy($"step")
      },
      Some {
        s"""WITH $clfOracleSteps
           |SELECT CAST(1 AS BIGINT) AS step, w0, w1, w2, nc AS n_correct FROM g1
           |${(2 to 6).map(i =>
              s"UNION ALL SELECT $i, w0, w1, w2, nc FROM g$i").mkString("\n")}
           |UNION ALL SELECT 7, w0, w1, w2,
           |  (SELECT CAST(sum(CASE WHEN (yh >= 500) = (y = 1000)
           |    THEN 1 ELSE 0 END) AS BIGINT) FROM p7) FROM g6
           |ORDER BY step""".stripMargin
      }),

    // classifier APPLY — the filter step a curation run actually
    // executes with q381's trained weights: score every document with
    // the final model, keep yh ≥ 500, report per-source volumes and
    // keep rates. One embarrassingly parallel scoring pass (the
    // weights are three broadcast-inlined longs) + a source-sized
    // aggregate; at 100 TB this is a single map-side-combined scan.
    // The keep decision is oracle-exact because scoring reuses the
    // training discipline end to end.
    GQuery(
      "q382_classifier_apply",
      (s, dir) => {
        import s.implicits._
        val w = clfTrain(s, dir).last
        clfFeatures(s, dir)
          .withColumn("z", expr(s"${w._2}L * x0 + ${w._3}L * x1 + ${w._4}L * x2"))
          .withColumn("yh", expr(
            "greatest(0L, least(1000L, 500L + z div 4000))"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"yh" >= 500, 1L).otherwise(0L)).as("n_keep"),
            sum(when(($"yh" >= 500) === ($"y" === 1000), 1L).otherwise(0L))
              .as("n_agree"))
          .withColumn("keep_permille", expr("n_keep * 1000 div n_docs"))
      },
      Some {
        s"""WITH $clfOracleSteps
           |SELECT f.source,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN
           |    500 + (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2) // 4000 >= 500
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           |  CAST(sum(CASE WHEN
           |    (500 + (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2) // 4000 >= 500)
           |      = (f.y = 1000) THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           |  CAST(sum(CASE WHEN
           |    500 + (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2) // 4000 >= 500
           |    THEN 1 ELSE 0 END) AS BIGINT) * 1000 //
           |    CAST(count(*) AS BIGINT) AS keep_permille
           |FROM feat f, g6 w
           |GROUP BY 1""".stripMargin
      })
  )

  /** Shared oracle for q377/q391: the unrolled replace-chain apply
    * over the per-source word vocabulary — both the expression arm
    * and the ranked mapPartitions arm must hash-match it.
    */
  private def bpeTokenizeSql: String = {
    val applySeg = (1 to BpeMerges).foldLeft(
      "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')") { (e, i) =>
      s"""replace($e,
         |      ' ' || (SELECT a FROM t$i) || '  ' || (SELECT b FROM t$i) || ' ',
         |      ' ' || (SELECT a FROM t$i) || (SELECT b FROM t$i) || ' ')""".stripMargin
    }
    s"""WITH ${bpeOracleSteps(BpeMerges)},
       |ws AS (SELECT source, word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT source,
       |      unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
       |    FROM documents)
       |  WHERE length(word) >= 2 GROUP BY 1, 2),
       |applied AS (SELECT source, freq,
       |    CAST(length(word) AS BIGINT) AS chars,
       |    CAST(len(string_split(trim($applySeg), '  ')) AS BIGINT) AS ntok
       |  FROM ws)
       |SELECT source,
       |  CAST(sum(freq) AS BIGINT) AS n_words,
       |  CAST(sum(freq * chars) AS BIGINT) AS n_chars,
       |  CAST(sum(freq * ntok) AS BIGINT) AS n_tokens,
       |  CAST((CAST(sum(freq * ntok) AS BIGINT) * 1000) //
       |    CAST(sum(freq) AS BIGINT) AS BIGINT) AS fertility_milli
       |FROM applied GROUP BY 1""".stripMargin
  }

  /** Shared DuckDB CTE chain for the q381/q382 classifier: the
    * feature relation (WITH source for the apply arm), g0 init, six
    * unrolled gradient steps (p{i} scores under g{i-1}, g{i} the
    * update + that pass's accuracy), and p7 (scores under the final
    * g6). MATERIALIZED throughout — DuckDB inlines CTEs by default
    * and each level is referenced several times.
    */
  private[queries] val clfOracleSteps: String = {
    val feat =
      """feat AS MATERIALIZED (SELECT source,
        |  CASE WHEN uniq >= 600 THEN 1000 ELSE 0 END AS y,
        |  CAST(100 AS BIGINT) AS x0,
        |  CAST(least(n_chars, 1000) AS BIGINT) - 500 AS x1,
        |  500 - uniq AS x2
        |FROM (SELECT source, n_chars,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      * 1000 //
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS uniq
        |  FROM documents))""".stripMargin
    def step(i: Int) = {
      val prev = if (i == 1) "g0" else s"g${i - 1}"
      s"""p$i AS MATERIALIZED (SELECT f.y, f.x0, f.x1, f.x2,
         |    greatest(0, least(1000,
         |      500 + (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2) // 4000))
         |      AS yh
         |  FROM feat f, $prev w),
         |g$i AS MATERIALIZED (SELECT
         |    (SELECT w0 FROM $prev) -
         |      CAST(sum((yh - y) * x0) AS BIGINT) // (count(*) * 200) AS w0,
         |    (SELECT w1 FROM $prev) -
         |      CAST(sum((yh - y) * x1) AS BIGINT) // (count(*) * 200) AS w1,
         |    (SELECT w2 FROM $prev) -
         |      CAST(sum((yh - y) * x2) AS BIGINT) // (count(*) * 200) AS w2,
         |    CAST(sum(CASE WHEN (yh >= 500) = (y = 1000)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS nc
         |  FROM p$i)""".stripMargin
    }
    s"""$feat,
       |g0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |       CAST(0 AS BIGINT) AS w2),
       |${(1 to 6).map(step).mkString(",\n")},
       |p7 AS (SELECT f.y,
       |    greatest(0, least(1000,
       |      500 + (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2) // 4000))
       |      AS yh
       |  FROM feat f, g6 w)""".stripMargin
  }
}
