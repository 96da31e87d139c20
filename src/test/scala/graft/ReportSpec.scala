package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the curation-report family (q167–q172) that
  * a value-level oracle match can't distinguish from coincidence:
  * shares forming a distribution, the integer z-test agreeing with
  * its floating-point definition, percentile clip counts respecting
  * their nominal tail mass, and lift symmetry under support.
  */
class ReportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q167 cascade shares sum to 1 per source and verdicts partition the corpus") {
    import spark.implicits._
    val df = run("q167_filter_cascade").cache()
    val bad = df.groupBy($"source").agg(sum($"source_share").as("tot"))
      .filter(abs($"tot" - 1.0) > 1e-9)
    assert(bad.count() == 0, "per-source shares must sum to 1")
    val docTotal = df.agg(sum($"n_docs")).first().getLong(0)
    val corpus = Tables.t(spark, sf, "documents").count()
    assert(docTotal == corpus, "first-fail attribution must cover every doc exactly once")
    df.unpersist()
  }

  test("q168 integer z-test agrees with the floating-point 2-sigma definition") {
    import spark.implicits._
    val c = Tables.t(spark, sf, "events")
      .groupBy(date_trunc("hour", $"ts").as("hr"), $"event_type")
      .agg(count(lit(1)).cast("double").as("c"))
    val stats = c.groupBy($"event_type".as("st"))
      .agg(avg($"c").as("mean"), var_pop($"c").as("variance"))
    val float = c.join(stats, $"event_type" === $"st")
      .select($"hr", $"event_type",
        (($"c" - $"mean") * ($"c" - $"mean") > $"variance" * 4).as("f_anom"))
    val joined = run("q168_hourly_anomalies")
      .join(float, Seq("hr", "event_type"))
    assert(joined.filter($"is_anomaly" =!= $"f_anom").count() == 0)
    assert(joined.count() > 0)
  }

  test("q170 clip counts stay within the nominal 1% tail mass per type") {
    import spark.implicits._
    // strict < p01 / > p99 can clip at most the nominal tail (ties
    // and interpolation only shrink it); +1 absorbs the interpolated
    // boundary row on tiny cells
    val bad = run("q170_value_winsorize")
      .filter($"n_below" > $"n_total" * 0.01 + 1 ||
        $"n_above" > $"n_total" * 0.01 + 1)
    assert(bad.count() == 0)
  }

  test("q171 duplication factor is >= 1 and max cluster bounded by doc count") {
    import spark.implicits._
    val df = run("q171_dup_factor").cache()
    assert(df.filter($"dup_factor" < 1.0).count() == 0)
    assert(df.filter($"max_cluster" > $"n_docs").count() == 0)
    df.unpersist()
  }

  test("q169 OOV rates are probabilities and weight to the corpus-wide OOV share") {
    import spark.implicits._
    val df = run("q169_oov_rate").cache()
    assert(df.filter($"oov_rate" < 0.0 || $"oov_rate" > 1.0).count() == 0)
    val row = df.agg(sum($"n_oov"), sum($"n_tokens")).first()
    assert(row.getLong(0) <= row.getLong(1))
    df.unpersist()
  }

  test("q172 basket self-join is keyed, never a cartesian product") {
    val plan = run("q172_session_basket_lift")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "the (user, session) equi-keys must reach the join, only the " +
        "1-row totals relation may cross-join (as a broadcast loop)")
  }

  test("q168/q170 derived stats relations come back as broadcast joins") {
    for (name <- Seq("q168_hourly_anomalies", "q170_value_winsorize")) {
      val plan = run(name).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: the type-sized stats side must broadcast, got:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name: no data-sized shuffle join expected")
    }
  }

  test("q172 pair support never exceeds either side's session support") {
    import spark.implicits._
    val pairs = run("q172_session_basket_lift").cache()
    // recompute per-type session support with the same 30-min rule
    // via the registered sessionizer-free spelling: a pair (a,b) can
    // co-occur in at most min(sessions with a, sessions with b)
    assert(pairs.filter($"n_ab" <= 0).count() == 0)
    assert(pairs.filter($"lift" <= 0.0).count() == 0)
    // pairs are canonically ordered, so no (b,a) twin may exist
    val twins = pairs.as("x").join(pairs.as("y"),
      $"x.type_a" === $"y.type_b" && $"x.type_b" === $"y.type_a")
    assert(twins.count() == 0)
    pairs.unpersist()
  }

  test("q220 perplexity covers every doc and bits/token sits in [0, log2 N]") {
    import spark.implicits._
    val scored = run("q220_unigram_perplexity").cache()
    val docs = Tables.t(spark, sf, "documents")
    assert(scored.count() == docs.count(),
      "every document must be scored exactly once")
    // total token mass must reconcile with an independent tokenization
    val nTok = scored.agg(sum($"n_tokens")).first().getLong(0)
    val direct = docs.select(size(split($"text", " ")).cast("long").as("n"))
      .agg(sum($"n")).first().getLong(0)
    assert(nTok == direct, "token accounting must match a direct count")
    // information bound: a token's bits is log2(total/count) with
    // count >= 1, so 0 <= bits/token <= log2(total tokens); the
    // milli-bit integerization can overshoot by at most 5e-5
    val lim = math.log(direct.toDouble) / math.log(2.0) + 1e-4
    assert(scored.filter($"bits_per_token" < 0.0 ||
      $"bits_per_token" > lim).count() == 0)
    scored.unpersist()
  }

  test("q225 bigram bits are bounded and conditioning beats the unigram model") {
    import spark.implicits._
    val bi = run("q225_bigram_perplexity").cache()
    val docs = Tables.t(spark, sf, "documents")
    // coverage: every doc with >= 2 tokens scores exactly once
    val eligible = docs.filter(size(split($"text", " ")) >= 2).count()
    assert(bi.count() == eligible)
    val nBi = bi.agg(sum($"n_bigrams")).first().getLong(0)
    val lim = math.log(nBi.toDouble) / math.log(2.0) + 1e-4
    assert(bi.filter($"bits_per_bigram" < 0.0 ||
      $"bits_per_bigram" > lim).count() == 0)
    // Gibbs: the per-context MLE must beat the context-free model on
    // its own training corpus (token-weighted means; the unigram mean
    // includes each doc's first token, a sub-percent position skew
    // absorbed by the 0.1-bit slack)
    val uni = run("q220_unigram_perplexity")
    val uniMean = uni.agg(
      sum($"bits_per_token" * $"n_tokens") / sum($"n_tokens"))
      .first().getDouble(0)
    val biMean = bi.agg(
      sum($"bits_per_bigram" * $"n_bigrams") / sum($"n_bigrams"))
      .first().getDouble(0)
    assert(biMean < uniMean + 0.1,
      s"conditional MLE must not lose to unigram: bi=$biMean uni=$uniMean")
    bi.unpersist()
  }

  test("q223 weighted sample is per-stratum top-k, deterministic, length-biased") {
    import spark.implicits._
    // sf0.01: strata (~100 docs/lang) comfortably exceed k=25, so the
    // length-bias property is observable, not vacuous
    val sf = "/root/testdata/sf0.01"
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    val sample = run("q223_weighted_sample").cache()
    val docs = Tables.t(spark, sf, "documents").cache()
    // exactly min(25, stratum size) rows per lang, contiguous ranks
    val strata = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val got = sample.groupBy($"lang")
      .agg(count(lit(1)).as("k"), max($"rank").as("maxr"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (lang, k, maxr) =>
      assert(k == math.min(25L, strata(lang)) && maxr == k,
        s"$lang: k=$k maxr=$maxr stratum=${strata(lang)}") }
    // reruns are identical (hash-seeded, no rand())
    val again = run("q223_weighted_sample")
    assert(sample.except(again).count() == 0 &&
      again.except(sample).count() == 0)
    // w ∝ n_chars must overrepresent long docs vs the uniform mean
    // in any stratum the sample doesn't fully exhaust
    val partial = got.collect { case (l, k, _) if strata(l) > 3 * k => l }.toSet
    if (partial.nonEmpty) {
      val sMean = sample.filter($"lang".isin(partial.toSeq: _*))
        .agg(avg($"n_chars")).first().getDouble(0)
      val cMean = docs.filter($"lang".isin(partial.toSeq: _*))
        .agg(avg($"n_chars")).first().getDouble(0)
      assert(sMean > cMean,
        s"length-weighted draw must skew long: sample=$sMean corpus=$cMean")
    }
    // the rank filter must plan as a group-limit, not a full sort
    val plan = run("q223_weighted_sample").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "per-stratum top-k should push a WindowGroupLimit")
    sample.unpersist(); docs.unpersist()
  }

  test("q230 semdedup accounting partitions each cluster; pairs stay keyed") {
    import spark.implicits._
    val df = run("q230_semdedup").cache()
    // kept + dropped = cluster size, dropped strictly below cluster size
    // (the min-id coverer itself can never be covered by a smaller id)
    assert(df.filter($"n_kept" + $"n_dropped" =!= $"n_vecs").count() == 0)
    assert(df.filter($"n_dropped" >= $"n_vecs" && $"n_vecs" > 0).count() == 0)
    // every cluster is reported, sizes sum to the corpus
    val total = df.agg(sum($"n_vecs")).first().getLong(0)
    assert(total == Tables.t(spark, sf, "embeddings").count())
    // r6-verdict guardrail: the report self-monitors the quadratic
    // bound — exact per-cluster pair count and a cap flag that is the
    // re-quantize signal; on the test corpus no cluster may exceed it
    assert(df.filter(
      $"n_pairs" =!= ($"n_vecs" * ($"n_vecs" - 1) / 2).cast("long"))
      .count() == 0, "n_pairs must be the exact n·(n−1)/2")
    assert(df.filter($"pair_cap_exceeded" =!= 0L).count() == 0,
      "a degenerate coarse clustering must flag, not pass silently")
    // the pair generator must be an equi-join on the cluster label —
    // a nested-loop here is the all-pairs scan the design forbids
    val plan = run("q230_semdedup").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "semdedup candidates must come from the label equi-join")
    df.unpersist()
  }

  test("q231 diversified top-k honors both the global k and the cluster cap") {
    import spark.implicits._
    val df = run("q231_diversified_topk").cache()
    val perQ = df.groupBy($"qid").agg(count(lit(1)).as("n"),
      max($"rank").as("maxr"))
    assert(perQ.filter($"n" > 5 || $"maxr" > 5).count() == 0)
    val perCluster = df.groupBy($"qid", $"label").agg(count(lit(1)).as("n"))
    assert(perCluster.filter($"n" > 2).count() == 0,
      "no query may take more than 2 results from one cluster")
    // the capped list is a subset of the scored relation ranked by
    // cos_sim: ranks are contiguous from 1 and scores non-increasing
    val nonMono = df.as[(Long, Long, Long, Double, Long)].collect()
      .groupBy(_._1).values.exists { rows =>
        val sorted = rows.toSeq.sortBy(_._5)
        sorted.map(_._5) != (1L to sorted.length.toLong) ||
          sorted.sliding(2).exists(p =>
            p.length == 2 && p(0)._4 < p(1)._4)
      }
    assert(!nonMono, "ranks must be contiguous with non-increasing scores")
    // both rankings plan as group-limits
    val plan = run("q231_diversified_topk").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    df.unpersist()
  }

  test("q232 OHLC agrees with the window spelling and never plans a sort-window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = run("q232_event_ohlc").cache()
    // independent window-function spelling of the same bars
    val e = Tables.t(spark, sf, "events")
      .select($"event_type", to_date($"ts").as("day"), $"value",
        struct(unix_micros($"ts"), $"event_id").as("ord"))
    val w = Window.partitionBy($"event_type", $"day").orderBy($"ord")
    val twin = e
      .withColumn("open", first($"value").over(w
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("close", last($"value").over(w
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy($"event_type", $"day")
      .agg(first($"open").as("open"), max($"value").as("high"),
        min($"value").as("low"), first($"close").as("close"),
        count(lit(1)).as("n"))
    assert(df.except(twin).count() == 0 && twin.except(df).count() == 0)
    // the min_by/max_by form is ONE hash aggregate — no Window, no Sort
    // feeding it (that's the point vs the row_number spelling)
    val plan = run("q232_event_ohlc").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "argmin/argmax bars must not fall back to a sort-window")
    assert(df.filter($"high" < $"low" || $"open" > $"high" ||
      $"open" < $"low" || $"close" > $"high" || $"close" < $"low")
      .count() == 0, "bar invariant: low <= open, close <= high")
    df.unpersist()
  }

  test("q235 triplets pair each anchor's best positive with other-label hard negatives") {
    import spark.implicits._
    val df = run("q235_triplet_mining").cache()
    // exactly 2 negatives (ranks 1,2) per anchor that has a positive
    val perQ = df.groupBy($"qid")
      .agg(count(lit(1)).as("n"), countDistinct($"pos_id").as("np"))
    assert(perQ.filter($"n" =!= 2 || $"np" =!= 1).count() == 0)
    // negatives really are other-label; the positive same-label
    val lbl = Tables.t(spark, sf, "embeddings").select($"vec_id", $"label")
    val bad = df
      .join(lbl.select($"vec_id".as("qid"), $"label".as("ql")), "qid")
      .join(lbl.select($"vec_id".as("pos_id"), $"label".as("pl")), "pos_id")
      .join(lbl.select($"vec_id".as("neg_id"), $"label".as("nl")), "neg_id")
      .filter($"pl" =!= $"ql" || $"nl" === $"ql")
    assert(bad.count() == 0)
    assert(df.filter(abs($"margin" - ($"pos_sim" - $"neg_sim")) > 1e-12)
      .count() == 0)
    // hard negatives: rank-1 neg_sim >= rank-2 neg_sim per anchor
    val mono = df.groupBy($"qid").pivot("rank", Seq("1", "2"))
      .agg(first($"neg_sim"))
    assert(mono.filter($"1" < $"2").count() == 0)
    val plan = run("q235_triplet_mining").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    df.unpersist()
  }

  test("q236 integer-sum OLS agrees with the native regr_slope to float noise") {
    import spark.implicits._
    val df = run("q236_trend_slopes")
    // independent floating-point spelling over the same (x, y) pairs
    val e = Tables.t(spark, sf, "events").select($"event_type",
      expr("unix_micros(ts) DIV 60000000").as("xm"), $"value")
    val mn = e.groupBy($"event_type").agg(min($"xm").as("mnx"))
    val float = e.join(mn, Seq("event_type"))
      .groupBy($"event_type")
      .agg(expr("regr_slope(value, xm - mnx)").as("fslope"),
        avg($"value").as("fmean"))
    val j = df.join(float, Seq("event_type"))
    assert(j.filter(abs($"slope_per_min" - $"fslope") > 1e-6 ||
      abs($"mean_value" - $"fmean") > 1e-6).count() == 0)
    assert(j.count() == 5)
  }

  test("q237 CUSUM peak is the argmax of the float cumulative deviation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = run("q237_cusum_changepoint")
    val c = Tables.t(spark, sf, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
      .agg(count(lit(1)).cast("double").as("c"))
    val wt = Window.partitionBy($"event_type")
    val wo = Window.partitionBy($"event_type").orderBy($"hr")
    val s = c.withColumn("mean", avg($"c").over(wt))
      .withColumn("s", sum($"c" - $"mean").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val peak = s.withColumn("rk", row_number().over(
        Window.partitionBy($"event_type").orderBy(abs($"s").desc, $"hr".asc)))
      .filter($"rk" === 1)
      .select($"event_type", $"hr".as("f_hr"), $"s".as("f_peak"))
    val j = df.join(peak, Seq("event_type"))
    assert(j.filter($"change_hr" =!= $"f_hr").count() == 0,
      "integer argmax must pick the same hour as the float cumsum")
    assert(j.filter(abs($"cusum_peak" - $"f_peak") > 1e-6).count() == 0)
    assert(df.filter($"n_hours" > 24 * 31).count() == 0)
  }

  test("q239 top paths plan a bounded top-k and cover real user-days") {
    import spark.implicits._
    val df = run("q239_session_paths").cache()
    assert(df.count() <= 10)
    // every path is a '>'-chain of real event types
    val types = Tables.t(spark, sf, "events")
      .select($"event_type").distinct().as[String].collect().toSet
    val badTok = df.as[(String, Long)].collect()
      .flatMap(_._1.split(">")).filterNot(types.contains)
    assert(badTok.isEmpty, s"unknown event types in paths: ${badTok.toSet}")
    // path frequencies can't exceed the user-day universe
    val userDays = Tables.t(spark, sf, "events")
      .select($"user_id", to_date($"ts")).distinct().count()
    assert(df.agg(sum($"n")).first().getLong(0) <= userDays)
    // top-10 must plan as TakeOrderedAndProject, not a global sort
    val plan = run("q239_session_paths").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT should collapse to a bounded top-k")
    df.unpersist()
  }

  test("q240 char entropy respects the information-theoretic bounds") {
    import spark.implicits._
    val df = run("q240_char_entropy").cache()
    val docs = Tables.t(spark, sf, "documents").filter(length($"text") > 0)
    assert(df.count() == docs.count())
    // 0 <= H <= log2(distinct chars in the doc); milli-bit floors can
    // undershoot each log2 by <= 1e-4, so allow that much slack
    val dist = docs
      .select($"doc_id", explode(split($"text", "")).as("ch"))
      .groupBy($"doc_id").agg(countDistinct($"ch").as("k"))
    val j = df.join(dist, "doc_id")
    assert(j.filter($"entropy_bits" < -1e-4 ||
      $"entropy_bits" > log2($"k") + 1e-4).count() == 0)
    // single-char docs would score exactly 0; real prose must not
    assert(df.filter($"entropy_bits" < 1.0).count() == 0,
      "every corpus doc mixes chars; entropy under 1 bit means a bug")
    df.unpersist()
  }

  test("q233 curriculum deciles are exact and shards interleave the mix") {
    import spark.implicits._
    val df = run("q233_curriculum_shards").cache()
    val n = Tables.t(spark, sf, "documents").count()
    assert(df.count() == n, "every doc gets a slot")
    // exact deciles: each holds floor/ceil(n/10) docs
    val sizes = df.groupBy($"decile").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(sizes.keySet == (0L to 9L).toSet)
    assert(sizes.values.forall(c => c == n / 10 || c == n / 10 + 1),
      s"decile sizes must be n/10 +- 1: $sizes")
    // decile is monotone in difficulty: max length of decile d never
    // exceeds min length of decile d+2 (d+1 may straddle one length)
    val docs = Tables.t(spark, sf, "documents").select($"doc_id", $"n_chars")
    val rng = df.join(docs, "doc_id").groupBy($"decile")
      .agg(min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    rng.sliding(3).foreach { t =>
      if (t.length == 3) assert(t(0)._3 <= t(2)._2,
        s"decile ${t(0)._1} overlaps decile ${t(2)._1}") }
    // positions are contiguous per shard, and every shard sees
    // every decile (the interleaving property curriculum needs)
    val pos = df.groupBy($"shard").agg(count(lit(1)).as("c"),
      max($"pos").as("maxp"))
    assert(pos.filter($"c" =!= $"maxp").count() == 0)
    assert(df.select($"shard", $"decile").distinct().count() == 8 * 10,
      "each of the 8 shards must carry all 10 deciles")
    df.unpersist()
  }
}
