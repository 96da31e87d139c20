package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-6 audit operators (q242–q248) that
  * the value-level oracle can't distinguish from coincidence: the EWMA
  * closed form agreeing with the textbook recurrence, exact medians
  * splitting their partitions, label propagation conserving nodes,
  * Pearson r staying in [-1, 1], quantization error respecting the
  * half-step bound, and the vocabulary curve being a monotone partition
  * of the bigram vocabulary.
  */
class AuditOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q242 EWMA matches the y_n = x_n/2 + y_{n-1}/2 recurrence per type") {
    import spark.implicits._
    val daily = Tables.t(spark, sf, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(avg($"value").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.sortBy(_._2.toString).map(_._3) }
    val expect = daily.toSeq.flatMap { case (t, xs) =>
      xs.scanLeft(Option.empty[Double]) {
        case (None, x)       => Some(x)
        case (Some(prev), x) => Some(x / 2 + prev / 2)
      }.flatten.zipWithIndex.map { case (y, i) => (t, i) -> y }
    }.toMap
    val got = run("q242_ewma_daily").collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2)))
      .groupBy(_._1).toSeq
      .flatMap { case (t, rows) =>
        rows.sortBy(_._2.toString).map(_._3).zipWithIndex
          .map { case (y, i) => (t, i) -> y }
      }.toMap
    assert(got.keySet == expect.keySet)
    // the engine quantizes daily means to 2 decimals before the exact
    // power-of-two recurrence, so agreement is to the quantization step
    got.foreach { case (k, y) => assert(math.abs(y - expect(k)) < 0.02, k) }
  }

  test("q248 median splits its partition and MAD outliers match a direct count") {
    import spark.implicits._
    val res = run("q248_median_mad").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    val vals = Tables.t(spark, sf, "events")
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2) }
    vals.foreach { case (t, xs) =>
      val (med, mad, nOut, n) = res(t)
      assert(n == xs.length)
      // exact median: at most half strictly below, at most half strictly above
      assert(xs.count(_ < med) <= xs.length / 2)
      assert(xs.count(_ > med) <= xs.length / 2)
      assert(nOut == xs.count(x => math.abs(x - med) > mad * 1.4826 * 3.0))
    }
  }

  test("q244 label propagation conserves nodes and labels are node names") {
    import spark.implicits._
    val df = run("q244_label_prop").cache()
    val nodes = run("q53_entity_degrees").count()
    assert(df.agg(sum($"n_members")).first().getLong(0) == nodes,
      "every node keeps exactly one community label")
    // mode-propagation labels are drawn from the node-name space
    assert(df.filter(!$"community".rlike("^[a-z]+:[0-9]+$")).count() == 0)
    // denser than components: strictly more than one community
    assert(df.count() > 1)
    df.unpersist()
  }

  test("q245 Pearson r is bounded and pairs are canonical d1 < d2") {
    import spark.implicits._
    val df = run("q245_dim_correlation").cache()
    assert(df.count() == 20)
    assert(df.filter($"d1" >= $"d2").count() == 0)
    assert(df.filter(abs($"r") > 1.0 + 1e-9).count() == 0)
    df.unpersist()
  }

  test("q246 reconstruction error respects the half-step bound per dim") {
    import spark.implicits._
    // |x - q·m/127| <= m/254 for the max-abs dim scale m; the global
    // max_abs_err is bounded by the largest per-dim half step
    val maxScale = Tables.t(spark, sf, "embeddings")
      .select(posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .as(Seq("d", "x")))
      .groupBy($"d").agg(max(abs($"x")).as("m"))
      .agg(max($"m")).first().getDouble(0)
    val worst = run("q246_int8_quantize")
      .agg(max($"max_abs_err")).first().getDouble(0)
    assert(worst <= maxScale / 254.0 + 1e-12)
  }

  test("q247 vocabulary curve is monotone and ends at the full bigram vocabulary") {
    import spark.implicits._
    val rows = run("q247_vocab_growth").orderBy($"first_batch").collect()
    val sizes = rows.map(_.getLong(2))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a < b })
    assert(sizes.last == rows.map(_.getLong(1)).sum)
    val vocab = Tables.t(spark, sf, "documents")
      .select(explode(expr(
        """transform(sequence(0, size(split(text, ' ')) - 2), i ->
          |  concat(element_at(split(text, ' '), i + 1), ' ',
          |         element_at(split(text, ' '), i + 2)))""".stripMargin))
        .as("b"))
      .agg(countDistinct($"b")).first().getLong(0)
    assert(sizes.last == vocab)
  }

  test("q250 chosen supplier quotes the true per-part minimum") {
    import spark.implicits._
    val best = run("q250_min_cost_supplier")
      .select($"partkey", $"min_cents").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trueMin = Tables.t(spark, sf, "lineitem")
      .groupBy($"l_partkey")
      .agg(min(floor($"l_extendedprice" * 100 + 0.5).cast("long")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best.nonEmpty)
    best.foreach { case (p, c) => assert(c == trueMin(p), s"part $p") }
  }

  test("q251 waiting suppliers are the sole late supplier in shared orders") {
    import spark.implicits._
    val li = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 45 DAYS")).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = li.groupBy(_._1)
    val expect = li.filter(_._3).filter { case (k, sk, _) =>
      val rows = byOrder(k)
      rows.exists(r => r._2 != sk) && !rows.exists(r => r._2 != sk && r._3)
    }.groupBy(_._2).map { case (sk, rs) => sk -> rs.length.toLong }
    val names = Tables.t(spark, sf, "supplier").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val got = run("q251_waiting_suppliers").collect()
      .map(r => names(r.getString(0)) -> r.getLong(1)).toMap
    got.foreach { case (sk, n) => assert(expect(sk) == n, s"supplier $sk") }
    assert(got.nonEmpty)
  }

  test("q254 RFM segments partition the user base with valid 1-5 scores") {
    import spark.implicits._
    val df = run("q254_rfm_segments").cache()
    val users = Tables.t(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(df.agg(sum($"n_users")).first().getLong(0) == users)
    assert(df.filter(!$"segment".rlike("^[1-5]{3}$")).count() == 0)
    df.unpersist()
  }

  test("q253 inter-arrival gaps account for every event minus one per type") {
    import spark.implicits._
    val df = run("q253_interarrival").cache()
    val events = Tables.t(spark, sf, "events").count()
    val types = df.count()
    assert(df.agg(sum($"n_gaps")).first().getLong(0) == events - types)
    assert(df.filter($"mean_gap_us" > $"max_gap_us").count() == 0)
    df.unpersist()
  }

  test("q255 full-partition frames agree with a direct per-type reduction") {
    import spark.implicits._
    val df = run("q255_frame_surface").cache()
    // last_value over the unbounded frame is constant per type and
    // equals the cents of the latest day
    val byType = df.groupBy($"event_type")
      .agg(countDistinct($"last_cents").as("nlast"),
        max(struct($"day", $"cents")).as("latest"))
    assert(byType.filter($"nlast" =!= 1).count() == 0)
    val bad = df.join(byType, "event_type")
      .filter($"last_cents" =!= $"latest.cents")
    assert(bad.count() == 0)
    // the 3-day sliding sum equals cents on each type's first day
    val firstDays = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"day")))
      .filter($"rn" === 1)
    assert(firstDays.filter($"cents_3d" =!= $"cents").count() == 0)
    df.unpersist()
  }

  test("q256 first HITS authority pass equals the in-degree ranking seed") {
    import spark.implicits._
    val df = run("q256_hits").cache()
    assert(df.count() == 20)
    assert(df.filter($"auth" < 0 || $"hub" < 0).count() == 0)
    // authorities after 2 unnormalized passes dominate their 1-pass
    // seed: every listed entity has in-degree >= 1 reflected in auth
    assert(df.filter($"auth" === 0 && $"hub" === 0).count() == 0)
    df.unpersist()
  }

  test("q257 blocking generates exactly the within-block pair product") {
    import spark.implicits._
    val bad = run("q257_entity_blocks")
      .filter($"n_pairs" =!= $"n_entities" * ($"n_entities" - 1) / 2)
    assert(bad.count() == 0)
  }

  test("q258 Zipf slope is negative for every language") {
    import spark.implicits._
    val df = run("q258_zipf_slope").cache()
    assert(df.count() > 0)
    assert(df.filter($"zipf_slope" >= 0.0).count() == 0)
    df.unpersist()
  }

  test("q259 KWIC snippets contain the keyword at the expected offset") {
    import spark.implicits._
    val df = run("q259_kwic").cache()
    assert(df.count() > 0)
    assert(df.filter(!$"snippet".contains("data")).count() == 0)
    assert(df.filter($"n_matches" < 1 || $"first_pos" < 1).count() == 0)
    df.unpersist()
  }

  test("q260 two-hop Jaccard stays in (0, 1] with canonical pairs") {
    import spark.implicits._
    val df = run("q260_nation_jaccard").cache()
    assert(df.count() > 0)
    assert(df.filter($"jaccard" <= 0.0 || $"jaccard" > 1.0).count() == 0)
    assert(df.filter($"n1" >= $"n2").count() == 0)
    df.unpersist()
  }

  test("q261 seasonality shares form a distribution per type") {
    import spark.implicits._
    val df = run("q261_seasonality").cache()
    val bad = df.groupBy($"event_type").agg(sum($"type_share").as("tot"))
      .filter(abs($"tot" - 1.0) > 1e-9)
    assert(bad.count() == 0)
    assert(df.filter($"iso_dow" < 1 || $"iso_dow" > 7 ||
      $"hr" < 0 || $"hr" > 23).count() == 0)
    df.unpersist()
  }

  test("q262 TWAP lies within each day's value range") {
    import spark.implicits._
    val rng = Tables.t(spark, sf, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    val bad = run("q262_twap").join(rng, Seq("event_type", "day"))
      .filter($"twap" < $"lo" - 0.01 || $"twap" > $"hi" + 0.01)
    assert(bad.count() == 0)
  }

  test("q263 Gini agrees with a direct mean-absolute-difference computation") {
    import spark.implicits._
    val got = run("q263_gini").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val cents = Tables.t(spark, sf, "events")
      .groupBy($"event_type", $"user_id")
      .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2) }
    cents.foreach { case (t, xs) =>
      val n = xs.length.toDouble
      val mu = xs.map(_.toDouble).sum / n
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b).toDouble)
        .sum / (n * n)
      val direct = mad / (2 * mu)
      assert(math.abs(got(t) - direct) < 1e-9, t)
    }
  }

  test("q264 churn cohorts partition the user base") {
    import spark.implicits._
    val df = run("q264_churn_cohorts").cache()
    val users = Tables.t(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(df.agg(sum($"n_users")).first().getLong(0) == users)
    assert(df.filter($"n_churned" > $"n_users").count() == 0)
    df.unpersist()
  }

  test("q265 vocabulary Jaccard is symmetric-canonical and bounded") {
    import spark.implicits._
    val df = run("q265_source_vocab_jaccard").cache()
    assert(df.count() > 0)
    assert(df.filter($"s1" >= $"s2").count() == 0)
    assert(df.filter($"jaccard" <= 0.0 || $"jaccard" > 1.0).count() == 0)
    df.unpersist()
  }

  test("q266 drawdown matches a sequential scan of the daily series") {
    import spark.implicits._
    val daily = Tables.t(spark, sf, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    val expect = daily.map { case (t, rows) =>
      var cum = 0L; var peak = Long.MinValue; var dd = Long.MinValue
      rows.sortBy(_._2).foreach { case (_, _, c) =>
        cum += c; peak = math.max(peak, cum); dd = math.max(dd, peak - cum)
      }
      t -> dd
    }
    run("q266_drawdown").collect().foreach { r =>
      assert(r.getLong(2) == expect(r.getString(0)), r.getString(0))
    }
  }

  test("q267 profiler covers every column with sane cardinalities") {
    import spark.implicits._
    val df = run("q267_column_profile").cache()
    val cols = Tables.t(spark, sf, "orders").columns.toSet
    assert(df.collect().map(_.getString(0)).toSet == cols)
    assert(df.filter($"n_distinct" + $"n_null" > $"n_rows" * 2).count() == 0)
    assert(df.filter($"column" === "o_orderkey")
      .filter($"n_distinct" =!= $"n_rows").count() == 0,
      "primary key must be fully distinct")
    df.unpersist()
  }

  test("q268 Fano factor covers the dense hour grid including silent hours") {
    import spark.implicits._
    val df = run("q268_burstiness").cache()
    // all types share one global grid → identical n_hours
    assert(df.select($"n_hours").distinct().count() == 1)
    assert(df.filter($"fano" < 0.0).count() == 0)
    val events = Tables.t(spark, sf, "events").count()
    assert(df.agg(sum($"total")).first().getLong(0) == events)
    df.unpersist()
  }

  test("q269 Hampel rolling stats match a direct sliding recomputation") {
    import spark.implicits._
    val series = Tables.t(spark, sf, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).map { case (t, v) => t -> v.sortBy(_._2).map(_._3) }
    def mid(xs: Array[Double]) = {
      val s = xs.sorted; val n = s.length
      (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) / 2
    }
    val expect = series.flatMap { case (t, xs) =>
      xs.indices.map { i =>
        val w = xs.slice(math.max(0, i - 3), math.min(xs.length, i + 4))
          .map(_.toDouble)
        val med = mid(w)
        val mad = mid(w.map(x => math.abs(x - med)))
        (t, i) -> (med, mad)
      }
    }
    val got = run("q269_hampel").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(3), r.getDouble(4)))
      .groupBy(_._1).toSeq.flatMap { case (t, v) =>
        v.sortBy(_._2).zipWithIndex.map { case (row, i) =>
          (t, i) -> ((row._3, row._4))
        }
      }.toMap
    expect.foreach { case (k, (med, mad)) =>
      assert(got(k) == ((med, mad)), k)
    }
  }

  test("q270 two-phase sweep equals a single global sweep") {
    import spark.implicits._
    // rebuild sessions directly, run the naive one-ordering sweep,
    // and compare per-day peaks against the day-sharded carry-in plan
    val evs = Tables.t(spark, sf, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val sessions = evs.values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var s0 = -1L; var prev = -1L
      sorted.foreach { case (_, us, _) =>
        if (s0 < 0 || us - prev > 1800L * 1000000L) {
          if (s0 >= 0) out += ((s0, prev)); s0 = us
        }
        prev = us
      }
      if (s0 >= 0) out += ((s0, prev))
      out
    }.toSeq
    val deltas = (sessions.map(s => (s._1, 1L)) ++ sessions.map(s => (s._2, -1L)))
      .sortBy(d => (d._1, d._2))
    var open = 0L
    val peaks = scala.collection.mutable.Map.empty[String, Long]
    deltas.foreach { case (us, d) =>
      open += d
      val day = java.time.Instant.ofEpochSecond(us / 1000000L)
        .toString.substring(0, 10)
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), open)
    }
    run("q270_concurrency").collect().foreach { r =>
      assert(r.getLong(1) == peaks(r.getDate(0).toString), r.getDate(0))
    }
  }

  test("q276 prefix filtering loses no pair against the exhaustive join") {
    import spark.implicits._
    // exhaustive ground truth: ALL 4-gram-set pairs with Jaccard >= 0.5
    val toks = Tables.t(spark, sf, "documents")
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(w) - 4), i ->
          |  concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2),
          |    element_at(w, i + 3), element_at(w, i + 4))))"""
          .stripMargin)).as("tok"))
    val lens = toks.groupBy($"doc_id").agg(count(lit(1)).as("l"))
    val truth = toks.as("a")
      .join(toks.as("b"), $"a.tok" === $"b.tok" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(lens.select($"doc_id".as("d1"), $"l".as("l1")), "d1")
      .join(lens.select($"doc_id".as("d2"), $"l".as("l2")), "d2")
      .filter($"inter" * 10 >= ($"l1" + $"l2" - $"inter") * 5)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val got = run("q276_prefix_filter_join")
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == truth, "prefix filtering must be lossless at tau")
  }

  test("q277 coverage buckets partition users and stay in [0, 1000]") {
    import spark.implicits._
    val df = run("q277_active_time").cache()
    val users = Tables.t(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(df.agg(sum($"n_users")).first().getLong(0) == users)
    assert(df.filter($"permille_bucket" < 0 || $"permille_bucket" > 1000)
      .count() == 0)
    df.unpersist()
  }

  test("q278 BPE pair counts match a direct tally on the word list") {
    import spark.implicits._
    val words = Tables.t(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("w")).as[String].collect()
      .filter(_.length >= 2)
    val tally = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { w =>
      w.sliding(2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        tally(k) = tally.getOrElse(k, 0L) + 1L
      }
    }
    run("q278_bpe_merge_pairs").collect().foreach { r =>
      assert(tally((r.getString(0), r.getString(1))) == r.getLong(2),
        s"${r.getString(0)}${r.getString(1)}")
    }
  }

  test("q279 ABC classes partition parts and shares sum to 1") {
    import spark.implicits._
    val df = run("q279_abc_pareto").cache()
    val parts = Tables.t(spark, sf, "lineitem")
      .select($"l_partkey").distinct().count()
    assert(df.agg(sum($"n_parts")).first().getLong(0) == parts)
    assert(math.abs(df.agg(sum($"class_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    // the head classes hold higher-revenue parts by construction:
    // mean per-part cents must be non-increasing A >= B >= C
    val mean = df.collect()
      .map(r => r.getString(0) -> r.getLong(2).toDouble / r.getLong(1)).toMap
    assert(mean("A") >= mean("B") && mean("B") >= mean("C"))
    df.unpersist()
  }

  test("q280 class weights invert the share exactly") {
    import spark.implicits._
    val k = run("q280_class_weights").count()
    val bad = run("q280_class_weights")
      .filter(abs($"class_weight" * $"share" * k - 1.0) > 1e-9)
    assert(bad.count() == 0, "w_c * share_c * k == 1 by construction")
  }

  test("q281 zero-crossing rate stays in [0,1] and covers every clip") {
    import spark.implicits._
    val df = run("q281_audio_zcr").cache()
    val docs = Tables.t(spark, sf, "documents").count()
    assert(df.agg(sum($"n_clips")).first().getLong(0) == docs)
    assert(df.filter($"zcr" < 0.0 || $"zcr" > 1.0).count() == 0)
    assert(df.filter($"total_crossings" > $"total_transitions").count() == 0)
    df.unpersist()
  }

  test("q282 flagged bots are the lowest-dispersion decile") {
    import spark.implicits._
    val df = run("q282_bot_scores").cache()
    assert(df.count() > 0)
    assert(df.filter($"dispersion" < 0.0).count() == 0)
    assert(df.filter($"n_gaps" < 20).count() == 0)
    df.unpersist()
  }

  test("q283 latency histogram covers every order with monotone cum share") {
    import spark.implicits._
    val df = run("q283_ship_latency").cache()
    // only orders that shipped at least one lineitem have a latency
    val shipped = Tables.t(spark, sf, "lineitem")
      .select($"l_orderkey").distinct().count()
    assert(df.agg(sum($"n_orders")).first().getLong(0) == shipped)
    val shares = df.orderBy($"days").select($"cum_share")
      .collect().map(_.getDouble(0))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-9)
    df.unpersist()
  }

  test("q284 exposed rows only come from low-diversity classes") {
    import spark.implicits._
    val r = run("q284_l_diversity").first()
    val (nClasses, nLow, nExposed, minDiv) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nLow <= nClasses)
    assert(minDiv >= 1)
    // every low-diversity class contributes at least one row
    assert(nExposed >= nLow)
    if (nLow == 0) assert(nExposed == 0)
  }

  test("q285 survival table conserves users and n_at_risk telescopes") {
    import spark.implicits._
    val rows = run("q285_survival_table").orderBy($"t_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val users = Tables.t(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(rows.map(r => r._3 + r._4).sum == users,
      "every user either converts or is censored exactly once")
    assert(rows.head._2 == users, "all users at risk on the first day")
    // n_at_risk(t+1) = n_at_risk(t) - leaving(t)
    rows.zip(rows.tail).foreach { case ((_, ar, d, c), (_, ar2, _, _)) =>
      assert(ar2 == ar - d - c)
    }
  }

  test("q286 hashing-trick accounting is internally consistent") {
    import spark.implicits._
    val r = run("q286_hashing_trick_audit").first()
    val (used, feats, maxb, collided) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(used <= 32 && used >= 1)
    assert(maxb * used >= feats, "pigeonhole")
    assert(collided == 0 || collided >= 2, "a collision involves >= 2 features")
    val trueCrosses = Tables.t(spark, sf, "events")
      .select(concat($"event_type", lit(":"), hour($"ts"))).distinct().count()
    assert(feats == trueCrosses)
  }

  test("q287 one-hot indices are dense, zero-based, frequency-ordered") {
    import spark.implicits._
    val df = run("q287_onehot_vocab").cache()
    df.collect().groupBy(_.getString(0)).foreach { case (c, rows) =>
      val idx = rows.map(_.getLong(2)).sorted
      assert(idx.toSeq == (0L until idx.length).toSeq, s"dense in $c")
      val byIdx = rows.sortBy(_.getLong(2)).map(_.getLong(3))
      assert(byIdx.zip(byIdx.tail).forall { case (a, b) => a >= b },
        s"frequency-descending in $c")
    }
    df.unpersist()
  }

  test("q288 calibration deciles cover the corpus with bounded label counts") {
    import spark.implicits._
    val df = run("q288_quality_calibration").cache()
    val docs = Tables.t(spark, sf, "documents").count()
    assert(df.agg(sum($"n_docs")).first().getLong(0) == docs)
    assert(df.count() == 10)
    assert(df.filter($"n_en" > $"n_docs").count() == 0)
    val en = Tables.t(spark, sf, "documents").filter($"lang" === "en").count()
    assert(df.agg(sum($"n_en")).first().getLong(0) == en)
    df.unpersist()
  }

  test("q290 chi-square agrees with a driver-side contingency computation") {
    import spark.implicits._
    val cells = Tables.t(spark, sf, "documents")
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rows = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cols = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val n = cells.map(_._3).sum.toDouble
    val chi2 = cells.map { case (l, src, o) =>
      val e = rows(l) * cols(src) / n
      (o - e) * (o - e) / e
    }.sum
    val r = run("q290_chi_square").first()
    assert(r.getLong(0) == (rows.size - 1).toLong * (cols.size - 1))
    // dsum quantizes per-cell terms at 1e-4 — compare to that tolerance
    assert(math.abs(r.getDouble(2) - chi2) < cells.length * 1e-4 + 1e-6)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
  }

  test("q291 AUC matches a direct Mann-Whitney computation") {
    import spark.implicits._
    val data = Tables.t(spark, sf, "documents")
      .select($"doc_id", ($"lang" === "en").cast("long").as("pos"),
        (size(array_distinct(split($"text", " "))) * lit(1.0)
          / size(split($"text", " "))).as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pos = data.filter(_._2 == 1).map(_._3)
    val neg = data.filter(_._2 == 0).map(_._3)
    var wins = 0.0
    for (p <- pos; q <- neg)
      wins += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val direct = wins / (pos.length.toDouble * neg.length)
    val got = run("q291_score_auc").first().getDouble(2)
    assert(math.abs(got - direct) < 1e-9, s"$got vs $direct")
  }

  test("q289 IPW estimate is consistent and within a loose sampling bound") {
    import spark.implicits._
    val r = run("q289_ipw_estimate").first()
    val (exact, est, n, ns) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ns > 0 && ns < n)
    assert(est % 10 == 0, "the 10x weight makes the estimate a multiple of 10")
    // md5 buckets are uniform: the 10% sample is large enough here that
    // a >50% relative error would mean a broken sampler, not bad luck
    assert(math.abs(est - exact).toDouble / exact < 0.5)
  }

  test("q292 candidates shrink monotonically as bands widen") {
    import spark.implicits._
    val rows = run("q292_lsh_band_sweep").orderBy($"band_width")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    assert(rows.forall { case (r, b, _) => r * b == 16 })
    val counts = rows.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "wider bands demand more agreement, so candidates cannot grow")
  }

  test("q293 entropy rate is bounded by log2 of the type alphabet") {
    import spark.implicits._
    val r = run("q293_markov_entropy").first()
    val k = Tables.t(spark, sf, "events")
      .select($"event_type").distinct().count()
    val h = r.getDouble(1)
    // mb-quantization error is at most 2e-4 bits per term
    assert(h >= -1e-3 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-3)
    assert(r.getLong(0) > 0)
  }

  test("q294/q295 arms partition users and the effect matches the means") {
    import spark.implicits._
    val srm = run("q294_ab_srm").first()
    val users = Tables.t(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(srm.getLong(0) + srm.getLong(1) == users)
    assert(srm.getDouble(2) >= 0.0)
    val eff = run("q295_ab_effect").first()
    val events = Tables.t(spark, sf, "events").count()
    assert(eff.getLong(0) + eff.getLong(1) == events)
    assert(math.abs(eff.getDouble(4)
      - (eff.getDouble(3) - eff.getDouble(2))) < 1e-9)
    assert(eff.getDouble(5) > 0.0, "pooled standard error is positive")
  }

  test("q296 conversion rates and q297 CUPED stats stay in their ranges") {
    import spark.implicits._
    val f = run("q296_ab_funnel").first()
    val users = Tables.t(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(f.getLong(0) + f.getLong(2) == users)
    assert(f.getLong(1) <= f.getLong(0) && f.getLong(3) <= f.getLong(2))
    assert(math.abs(f.getDouble(6)
      - (f.getDouble(5) - f.getDouble(4))) < 1e-12)
    val c = run("q297_cuped").first()
    assert(c.getLong(0) == users)
    assert(c.getDouble(2) >= -1e-9 && c.getDouble(2) <= 1.0 + 1e-9,
      "rho-squared is a squared correlation")
    assert(math.abs(c.getDouble(3) - (1.0 - c.getDouble(2))) < 1e-12)
  }

  test("q298 Simpson index stays in (0,1] and inverts to <= type count") {
    import spark.implicits._
    val df = run("q298_simpson_diversity").cache()
    assert(df.filter($"simpson" <= 0.0 || $"simpson" > 1.0).count() == 0)
    // convexity floor of the unbiased estimator: with k types over N
    // tokens, sum c(c-1) >= N^2/k - N, so D >= (N/k - 1)/(N - 1)
    assert(df.filter($"simpson" <
      ($"n_tokens" * 1.0 / $"n_types" - 1.0) / ($"n_tokens" - 1) - 1e-12)
      .count() == 0)
    assert(df.filter($"n_types" > $"n_tokens").count() == 0)
    df.unpersist()
  }

  test("q299 CUPED theta matches q297 and q300 card counts the corpus") {
    import spark.implicits._
    val adj = run("q299_ab_cuped").first()
    val fit = run("q297_cuped").first()
    assert(adj.getDouble(0) == fit.getDouble(1), "same pooled theta")
    val card = run("q300_dataset_card").first()
    val docs = Tables.t(spark, sf, "documents").count()
    assert(card.getLong(0) == docs)
    assert(card.getLong(5) <= card.getLong(6), "min <= max doc tokens")
    assert(math.abs(card.getDouble(8)
      - card.getLong(1).toDouble / card.getLong(0)) < 1e-9)
  }

  test("q243 Flesch score matches a hand computation on one document") {
    import spark.implicits._
    val doc = Tables.t(spark, sf, "documents")
      .orderBy($"doc_id").select($"text", $"source").first()
    val text = doc.getString(0)
    val w = text.split(" ", -1).length.toDouble
    val syl = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toDouble
    val sent = math.max("[.!?]+".r.findAllIn(text).length, 1).toDouble
    val flesch = 206.835 - 1.015 * (w / sent) - 84.6 * (syl / w)
    val row = run("q243_readability")
      .filter($"source" === doc.getString(1)).first()
    assert(row.getDouble(2) - 1e-9 <= flesch && flesch <= row.getDouble(3) + 1e-9,
      "hand-computed doc score must lie within its source's [min, max]")
  }

  test("q308 chunk manifest tiles every doc: tail covered, strides exact") {
    import spark.implicits._
    val m = run("q308_chunk_manifest").cache()
    val docs = Tables.t(spark, sf, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    // per doc: chunk 0 exists, offsets stride by 48, the LAST chunk
    // reaches exactly the doc's token count, and no chunk overruns
    val per = m.groupBy($"doc_id")
      .agg(min($"chunk_idx").as("c0"), max($"chunk_idx").as("cmax"),
        count(lit(1)).as("nc"), max($"off" + $"chunk_tokens").as("covered"))
      .join(docs, "doc_id")
    assert(per.filter($"c0" =!= 0 || $"nc" =!= $"cmax" + 1).count() == 0,
      "chunk indices must be contiguous from 0")
    assert(per.filter($"covered" =!= $"n").count() == 0,
      "the last chunk must end exactly at the doc's token count")
    assert(m.filter($"off" =!= $"chunk_idx" * 48).count() == 0)
    assert(m.filter($"chunk_tokens" < 1 || $"chunk_tokens" > 64).count() == 0)
    m.unpersist()
  }

  test("q309 dedup length-bias accounting: deciles partition, kept = distinct texts") {
    import spark.implicits._
    val d = run("q309_dedup_length_bias").cache()
    val docs = Tables.t(spark, sf, "documents")
    assert(d.agg(sum($"n_docs")).first().getLong(0) == docs.count())
    assert(d.agg(sum($"n_kept")).first().getLong(0) ==
      docs.select(md5($"text")).distinct().count(),
      "exactly one survivor per distinct text across all deciles")
    assert(d.filter($"n_kept" > $"n_docs" || $"n_kept" < 0).count() == 0)
    assert(d.count() == 10)
    d.unpersist()
  }

  test("q310 video scene counts: bounded by frames, single-scene needs one hash") {
    import spark.implicits._
    val v = run("q310_video_scene_cuts").cache()
    // scenes per video ∈ [1, n_frames] → totals bounded by counts
    assert(v.filter($"total_scenes" < $"n_videos" ||
      $"total_scenes" > $"n_videos" * $"n_frames").count() == 0)
    // distinct hashes per video are also ∈ [1, n_frames], and a video
    // counted single-scene contributes exactly one distinct hash, so
    // totals obey: distinct ≥ singles + 2·(videos − singles) is NOT
    // guaranteed (scenes may reuse a hash) — but distinct ≤ scenes
    // IS: a new scene is exactly a hash CHANGE, so the distinct count
    // can never exceed the scene count per video
    assert(v.filter($"total_distinct_hashes" > $"total_scenes").count() == 0)
    assert(v.filter($"n_frames" < 2 || $"n_frames" > 9).count() == 0)
    v.unpersist()
  }

  test("q312 split contamination: train leaks nothing, leaks bounded by fingerprints") {
    import spark.implicits._
    val c = run("q312_split_contamination").cache()
    assert(c.count() == 3)
    // train is the lowest-precedence split: nothing can leak INTO it
    assert(c.filter($"split" === "train" && $"n_leaked" =!= 0).count() == 0)
    assert(c.filter($"n_leaked" > $"n_fingerprints").count() == 0)
    assert(c.agg(sum($"n_docs")).first().getLong(0) ==
      Tables.t(spark, sf, "documents").count())
    c.unpersist()
  }

  test("ranked BPE apply matches the replace-chain expression word-for-word") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 250).map { _ =>
      val len = 4 + rnd.nextInt(10)
      (Seq.fill(len)(('a' + rnd.nextInt(5)).toChar).mkString,
        1L + rnd.nextInt(40))
    }.toDF("word", "freq0")
      .groupBy("word").agg(sum($"freq0").as("freq")).cache()
    vocab.count()
    val merges = graft.queries.TextQueries.bpeTrainLoop(vocab, 48)
    assert(merges.length == 48)
    // the chained-replace expression (q377's arm) ...
    val segExpr = graft.queries.TextQueries.bpeSegExpr(merges)
    val viaExpr = vocab
      .select($"word",
        expr(s"size(split(trim($segExpr), '  '))").cast("long").as("ntok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ... vs the ranked per-word algorithm (q391's arm)
    val viaRanked = graft.queries.TextQueries.bpeTokensRanked(
        vocab.select(lit("src").as("source"), $"word", $"freq"), merges)
      .select($"word", $"ntok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaExpr.keySet == viaRanked.keySet)
    val diverged = viaExpr.keys.filter(w => viaExpr(w) != viaRanked(w))
    assert(diverged.isEmpty,
      s"ranked apply diverged from the replace chain on: " +
        diverged.take(5).map(w =>
          s"$w expr=${viaExpr(w)} ranked=${viaRanked(w)}").mkString("; "))
    vocab.unpersist()
    ()
  }

  test("BPE incremental trainer: merge-identical to the naive chain, flat per-round cost") {
    import spark.implicits._
    // deterministic synthetic vocabulary: 6-letter alphabet, 300 words
    val rnd = new scala.util.Random(42)
    val words = (0 until 300).map { _ =>
      val len = 6 + rnd.nextInt(8)
      (Seq.fill(len)(('a' + rnd.nextInt(6)).toChar).mkString,
        1L + rnd.nextInt(50))
    }.toDF("word", "freq0")
      .groupBy("word").agg(sum($"freq0").as("freq")).cache()
    words.count()
    // correctness of the refactor: the incrementally-materialized loop
    // must pick EXACTLY the merges the r13 nested-replace chain picked
    def naive(k: Int): Seq[(String, String, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      var segExpr = "concat('  ', regexp_replace(word, '(.)', '$1  '))"
      var exhausted = false
      for (_ <- 1 to k if !exhausted) {
        val top = words
          .select($"freq", expr(s"split(trim($segExpr), '  ')").as("tok"))
          .filter(size($"tok") >= 2)
          .select($"freq", explode(expr(
            """transform(sequence(1, size(tok) - 1), j ->
              |  struct(element_at(tok, j) AS a,
              |         element_at(tok, j + 1) AS b))""".stripMargin)).as("p"))
          .groupBy($"p.a", $"p.b")
          .agg(sum($"freq").as("cnt"))
          .orderBy($"cnt".desc, $"a".asc, $"b".asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, c) = (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
          out += ((a, b, c))
          segExpr = s"replace($segExpr, ' $a  $b ', ' $a$b ')"
        }
      }
      out.toSeq
    }
    assert(graft.queries.TextQueries.bpeTrainLoop(words, 16) == naive(16),
      "incremental trainer diverged from the nested-replace reference")
    // flat per-round cost at 96 merges, pinned two ways inside ONE
    // run (cross-run wall-clock ratios flake on a shared box):
    //  - the segmentation relation's EXPRESSION size stays bounded —
    //    the r13 chain grew one nested replace per round, so its
    //    expression count was O(round index);
    //  - within-run per-round wall times: median of the last third vs
    //    the first third (the quadratic chain reads ~5x here even
    //    with the constant pair-agg cost; flat reads ~1x).
    graft.queries.TextQueries.bpeTrainLoop(words, 8) // JIT/codegen warm-up
    val exprSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ticks = scala.collection.mutable.ArrayBuffer.empty[Long]
    val m = graft.queries.TextQueries.bpeTrainLoop(words, 96, seg => {
      ticks += System.nanoTime()
      exprSizes += seg.queryExecution.analyzed.expressions
        .map(_.collect { case e => e }.size).sum
    })
    assert(m.length == 96, s"vocabulary exhausted at ${m.length} < 96")
    assert(exprSizes.max <= exprSizes.take(8).max + 100,
      s"segmentation expression grew with the round index " +
        s"(first-8 max ${exprSizes.take(8).max}, overall ${exprSizes.max})")
    val rounds = ticks.sliding(2).map(w => (w(1) - w(0)) / 1e9).toSeq
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = median(rounds.take(32))
    val late = median(rounds.takeRight(32))
    assert(late < 3.5 * early,
      f"per-round cost is not flat: late median $late%.3fs vs early " +
        f"median $early%.3fs")
    words.unpersist()
    ()
  }
}
