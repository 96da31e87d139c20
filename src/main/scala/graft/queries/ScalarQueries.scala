package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import OracleNum.{dsum, davg}

/** Scalar function surface: string / date / math / conditional / JSON.
  * Absent from the reference (SURVEY.md §2.8 — its only value-level op
  * is 64-bit equality); provided here via codegen'd
  * `org.apache.spark.sql.functions._` builtins, never UDFs, so every
  * expression stays inside whole-stage codegen.
  */
object ScalarQueries {
  import Tables.t

  def all: Seq[GQuery] = Seq(

    // sketch aggregates: HyperLogLog++ distinct counts and t-digest-
    // style approximate percentiles — the sublinear-memory path for
    // 100 TB cardinality/quantile questions. The estimates themselves
    // are engine-specific, so the oracle-checked output carries the
    // EXACT answers plus boolean error-bound assertions (|err| within
    // the sketch's guarantee); DuckDB emits literal TRUE, so a sketch
    // drifting out of bounds hash-fails the gate. SketchSpec asserts
    // the same bounds with the raw estimates.
    GQuery(
      "q67_sketch_aggregates",
      (s, dir) => {
        import s.implicits._
        // the rsd is a STANDARD error, not a bound: assert at 5 sigma
        // (derived from the configured rsd, so the two can't drift), a
        // tolerance a correct sketch essentially never exceeds at any
        // scale factor, while a broken one blows through it
        val rsd = 0.01
        // r15: COUNT(DISTINCT) split from the imperative sketches.
        // Mixing them made the distinct rewrite key its first phase by
        // (returnflag, orderkey) — ~N_orders groups EACH carrying the
        // percentile value-map + t-digest + HLL buffer through two
        // exchanges (78 s at sf0.1; at 100 TB it would OOM outright).
        // Two single-purpose passes + a group-count-sized join: the
        // distinct pass is pure two-phase dedup, the sketch pass is a
        // 3-group ObjectHashAggregate with map-side partials.
        // 78.4 → 2.9 s measured; identical output.
        val li = t(s, dir, "lineitem")
        val exactD = li.groupBy($"l_returnflag")
          .agg(countDistinct($"l_orderkey").as("exact_orders"))
        val sketches = li.groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_orderkey", rsd = rsd).as("approx_orders"),
            percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("approx_median"),
            expr("percentile(l_extendedprice, 0.5)").as("exact_median"))
        exactD.join(graft.scale.GuardedBroadcast.maybe(sketches),
            Seq("l_returnflag"))
          .select($"l_returnflag", $"exact_orders", $"exact_median",
            (abs($"approx_orders" - $"exact_orders") <=
              $"exact_orders" * (5 * rsd)).as("hll_ok"),
            (abs($"approx_median" - $"exact_median") <=
              $"exact_median" * 0.01).as("tdigest_ok"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             |  quantile_cont(l_extendedprice, 0.5) AS exact_median,
             |  TRUE AS hll_ok, TRUE AS tdigest_ok
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // Bloom-filter semi-join pruning — the runtime-filter pattern a
    // distributed engine uses to pre-filter a fact scan against a dim
    // predicate without shuffling the dim. Spark keeps
    // BloomFilterAggregate/BloomFilterMightContain internal (it
    // injects them itself for runtime filtering); here they are
    // reused directly as catalyst expressions — native codegen'd
    // machinery, no UDF. The sketch is bits-sized and collected once
    // to the driver (exactly how a runtime filter broadcasts), then
    // probes the fact side as a constant. Bloom guarantees NO false
    // negatives (hard assertion) and the sized-for-10× bit budget
    // makes the false-positive allowance generous; like q67, the
    // oracle checks exact values plus boolean bounds pinned to TRUE.
    GQuery(
      "q137_bloom_prune",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.graftshim.GraftShim
        val rich = t(s, dir, "customer")
          .filter($"c_acctbal" > 5000).select($"c_custkey")
        val sketch = GraftShim.column(new BloomFilterAggregate(
          UnresolvedAttribute("c_custkey"), Literal(200000L), Literal(1600000L))
          .toAggregateExpression())
        val bytes = rich.agg(sketch.as("f")).head.getAs[Array[Byte]]("f")
        val probe = GraftShim.column(BloomFilterMightContain(
          Literal(bytes), UnresolvedAttribute("o_custkey")))
        t(s, dir, "orders").select($"o_custkey", probe.as("h"))
          .join(rich.select($"c_custkey".as("o_custkey"), lit(1L).as("m")),
            Seq("o_custkey"), "left_outer")
          .agg(
            sum(when($"m".isNotNull, 1L).otherwise(0L)).as("exact_in"),
            (sum(when($"m".isNotNull && !$"h", 1L).otherwise(0L)) === 0L)
              .as("no_false_negatives"),
            (sum(when($"h", 1L).otherwise(0L)) <=
              sum(when($"m".isNotNull, 1L).otherwise(0L)) +
                count(lit(1)) * 0.01 + 10).as("fp_within_bound"))
      },
      Some("""SELECT CAST(count(CASE WHEN c_custkey IS NOT NULL THEN 1 END) AS BIGINT)
             |    AS exact_in,
             |  TRUE AS no_false_negatives, TRUE AS fp_within_bound
             |FROM orders LEFT JOIN
             |  (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) r
             |  ON o_custkey = r.c_custkey""".stripMargin)),

    // string functions: substring / upper / lower / concat / length / trim / replace
    GQuery(
      "q19_string_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .filter($"p_size" <= 10)
          .select(
            $"p_partkey",
            upper($"p_name").as("name_upper"),
            lower($"p_brand").as("brand_lower"),
            substring($"p_type", 1, 5).as("type_prefix"),
            length($"p_name").as("name_len"),
            concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
            regexp_replace($"p_name", " ", "_").as("name_snake"))
      },
      Some("""SELECT p_partkey,
             |  upper(p_name) AS name_upper,
             |  lower(p_brand) AS brand_lower,
             |  substr(p_type, 1, 5) AS type_prefix,
             |  CAST(length(p_name) AS INT) AS name_len,
             |  concat(p_brand, ':', p_type) AS brand_type,
             |  replace(p_name, ' ', '_') AS name_snake
             |FROM part WHERE p_size <= 10""".stripMargin)),

    // date functions: year / month / day / date_trunc / datediff
    GQuery(
      "q20_date_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy(
            year($"o_orderdate").cast("long").as("o_year"),
            month($"o_orderdate").cast("long").as("o_month"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("revenue"))
      },
      Some("""SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
             |  count(*) AS n_orders, sum(floor((o_totalprice) * 10000 + 0.5)) / 10000 AS revenue
             |FROM orders GROUP BY 1, 2""".stripMargin),
      headline = true),

    // math functions: abs / round / floor / ceil / sqrt / ln / power / mod
    GQuery(
      "q21_math_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_orderkey" % 100 === 0)
          .select(
            $"l_orderkey", $"l_linenumber",
            OracleNum.dround(abs($"l_extendedprice" - lit(30000.0)), 2).as("abs_diff"),
            floor($"l_quantity" / 10).cast("long").as("qty_bucket"),
            ceil($"l_discount" * 100).cast("long").as("disc_pct"),
            round(sqrt($"l_extendedprice"), 4).as("price_sqrt"),
            round(log($"l_extendedprice" + 1.0), 4).as("price_ln"),
            round(pow($"l_quantity", 2.0), 1).as("qty_sq"))
      },
      Some(s"""SELECT l_orderkey, l_linenumber,
             |  ${OracleNum.droundSql("abs(l_extendedprice - 30000.0)", 2)} AS abs_diff,
             |  CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
             |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
             |  round(sqrt(l_extendedprice), 4) AS price_sqrt,
             |  round(ln(l_extendedprice + 1.0), 4) AS price_ln,
             |  round(pow(l_quantity, 2.0), 1) AS qty_sq
             |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin)),

    // CASE WHEN conditional buckets
    GQuery(
      "q22_case_buckets",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .select(
            $"c_custkey",
            when($"c_acctbal" < 0, "overdrawn")
              .when($"c_acctbal" < 5000, "low")
              .when($"c_acctbal" < 9000, "mid")
              .otherwise("high").as("bal_class"))
          .groupBy($"bal_class")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'overdrawn'
             |            WHEN c_acctbal < 5000 THEN 'low'
             |            WHEN c_acctbal < 9000 THEN 'mid'
             |            ELSE 'high' END AS bal_class,
             |  count(*) AS n
             |FROM customer GROUP BY 1""".stripMargin)),

    // JSON extraction from the events.props column
    GQuery(
      "q23_json_extract",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select(
            $"event_id",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"k")
          .agg(count(lit(1)).as("n_events"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |  count(*) AS n_events
             |FROM events GROUP BY 1""".stripMargin)),

    // hashing-trick audit: the (event_type × hour) feature cross
    // hashed into 32 buckets (md5 prefix — the engine-portable
    // deterministic hash, q188's shard convention), with the report
    // an ML-features team reads before committing to a hash width:
    // buckets used, features per bucket, and how many features
    // collide. All integers; the cross domain is bounded (types ×
    // 24), so every relation after the first aggregate is tiny.
    GQuery(
      "q286_hashing_trick_audit",
      (s, dir) => {
        import s.implicits._
        val crosses = t(s, dir, "events")
          .select(concat($"event_type", lit(":"),
            hour($"ts").cast("string")).as("feature"))
          .groupBy($"feature").agg(count(lit(1)).as("n_rows"))
          .withColumn("bucket",
            expr("CAST(conv(substring(md5(feature), 1, 8), 16, 10) AS BIGINT)" +
              " % 32"))
        val perBucket = crosses.groupBy($"bucket")
          .agg(count(lit(1)).as("n_features"), sum($"n_rows").as("n_rows"))
        perBucket.agg(
          count(lit(1)).as("n_buckets_used"),
          sum($"n_features").as("n_features"),
          max($"n_features").as("max_bucket_features"),
          sum(when($"n_features" > 1, $"n_features").otherwise(0L))
            .as("collided_features"))
      },
      Some("""WITH crosses AS (SELECT
             |    concat(event_type, ':', CAST(hour(ts) AS VARCHAR))
             |      AS feature,
             |    count(*) AS n_rows
             |  FROM events GROUP BY 1),
             |b AS (SELECT
             |    CAST(concat('0x', substr(md5(feature), 1, 8)) AS BIGINT)
             |      % 32 AS bucket,
             |    count(*) AS n_features, CAST(sum(n_rows) AS BIGINT) AS n_rows
             |  FROM crosses GROUP BY 1)
             |SELECT count(*) AS n_buckets_used,
             |  CAST(sum(n_features) AS BIGINT) AS n_features,
             |  max(n_features) AS max_bucket_features,
             |  CAST(sum(CASE WHEN n_features > 1 THEN n_features ELSE 0 END)
             |       AS BIGINT) AS collided_features
             |FROM b""".stripMargin)),

    // one-hot encoder manifest: the stable (column, value, index)
    // dictionary a feature pipeline persists so training and serving
    // agree on indices — frequency-descending with the value
    // tiebreak, indexed per column, over three categorical columns
    // from three tables. Each column's vocabulary is one aggregate;
    // the rank windows run over vocabulary rows.
    GQuery(
      "q287_onehot_vocab",
      (s, dir) => {
        import s.implicits._
        val cats = Seq(
          t(s, dir, "events").select(lit("event_type").as("col"),
            $"event_type".as("value")),
          t(s, dir, "orders").select(lit("o_orderpriority").as("col"),
            $"o_orderpriority".as("value")),
          t(s, dir, "customer").select(lit("c_mktsegment").as("col"),
            $"c_mktsegment".as("value")))
          .reduce(_ unionByName _)
          .groupBy($"col", $"value").agg(count(lit(1)).as("freq"))
        val w = Window.partitionBy($"col")
          .orderBy($"freq".desc, $"value".asc)
        cats.withColumn("index", (row_number().over(w) - 1).cast("long"))
          .select($"col", $"value", $"index", $"freq")
      },
      Some("""WITH cats AS (
             |  SELECT 'event_type' AS col, event_type AS value, count(*)
             |    AS freq FROM events GROUP BY 2
             |  UNION ALL
             |  SELECT 'o_orderpriority', o_orderpriority, count(*)
             |  FROM orders GROUP BY 2
             |  UNION ALL
             |  SELECT 'c_mktsegment', c_mktsegment, count(*)
             |  FROM customer GROUP BY 2)
             |SELECT col, value,
             |  CAST(row_number() OVER (PARTITION BY col
             |    ORDER BY freq DESC, value) - 1 AS BIGINT) AS index,
             |  freq
             |FROM cats""".stripMargin)),

    // Count-Min-Sketch heavy hitters: the third sublinear sketch of
    // the family (q67 HLL/t-digest, q137 Bloom) — one aggregate pass
    // builds a fixed-seed CMS over lineitem supplier keys, the exact
    // top-10 is computed distributively, and the driver probes the
    // bits-sized sketch (the same collect-once pattern as q137's
    // runtime filter) for each winner. CMS guarantees estimate ≥ exact
    // (hard assertion) and overcount ≤ ε·N with 99% confidence per
    // key; the oracle pins the exact counts plus both bounds at TRUE
    // (asserted at 2× the ε·N allowance so a correct sketch never
    // flips at a new scale factor, like q67's 5σ).
    GQuery(
      "q153_cms_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        val eps = 0.001
        val agg = t(s, dir, "lineitem").agg(
          expr(s"count_min_sketch(l_suppkey, ${eps}d, 0.99d, 42)").as("cms"),
          count(lit(1)).as("n")).head
        val cms = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]]("cms")))
        val allowance = 2 * eps * agg.getAs[Long]("n")
        // orderBy+limit plans as TakeOrderedAndProject — per-partition
        // top-10 then a 10-row driver merge, no single-partition window
        val top = t(s, dir, "lineitem")
          .groupBy($"l_suppkey").agg(count(lit(1)).as("exact_cnt"))
          .orderBy($"exact_cnt".desc, $"l_suppkey").limit(10)
          .as[(Long, Long)].collect()
        top.map { case (k, exact) =>
          val est = cms.estimateCount(k)
          (k, exact, est >= exact, est <= exact + allowance)
        }.toSeq.toDF("l_suppkey", "exact_cnt", "cms_no_undercount",
          "cms_within_bound")
      },
      Some("""SELECT l_suppkey, exact_cnt,
             |  TRUE AS cms_no_undercount, TRUE AS cms_within_bound
             |FROM (SELECT l_suppkey, count(*) AS exact_cnt,
             |        row_number() OVER (ORDER BY count(*) DESC, l_suppkey) AS rn
             |      FROM lineitem GROUP BY 1)
             |WHERE rn <= 10""".stripMargin)),

    // mergeable HLL sketch rollup — the pattern that actually runs at
    // 100 TB: each shard (here: source) builds a DataSketches HLL of
    // its fingerprints, and the GLOBAL distinct count comes from
    // unioning the bits-sized sketches, never re-scanning data. This
    // is a different capability from q67's one-shot
    // approx_count_distinct: the union-of-sketches estimate must agree
    // with the exact distinct of the union (mergeability). Bounds at
    // 5 sigma of lgK=12's ~1.6% standard error, pinned TRUE by the
    // oracle like q67/q137/q153.
    GQuery(
      "q173_hll_shard_rollup",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
          .select($"source", md5($"text".cast("binary")).as("fp"))
        val per = d.groupBy($"source")
          .agg(hll_sketch_agg($"fp").as("sk"),
            countDistinct($"fp").as("exact_fp"))
        val perOut = per.select($"source", $"exact_fp",
          (abs(hll_sketch_estimate($"sk") - $"exact_fp") <=
            $"exact_fp" * 0.08).as("hll_ok"))
        val totOut = per.agg(hll_union_agg($"sk").as("sk"))
          .crossJoin(d.agg(countDistinct($"fp").as("exact_fp")))
          .select(lit("__ALL__").as("source"), $"exact_fp",
            (abs(hll_sketch_estimate($"sk") - $"exact_fp") <=
              $"exact_fp" * 0.08).as("hll_ok"))
        perOut.unionByName(totOut)
      },
      Some("""SELECT source, CAST(count(DISTINCT md5(text)) AS BIGINT)
             |    AS exact_fp, TRUE AS hll_ok
             |FROM documents GROUP BY 1
             |UNION ALL
             |SELECT '__ALL__', CAST(count(DISTINCT md5(text)) AS BIGINT),
             |  TRUE
             |FROM documents""".stripMargin)),

    // mergeable quantile sketch via fixed-bin histograms — q173's
    // pattern for quantiles. Each shard reduces to a fixed-size vector
    // of 64 bin counts over the fixed domain [0, 512) (bin width 8);
    // vectors merge by elementwise add (`zip_with`), and any quantile
    // reads off the merged vector with guaranteed error ≤ one bin
    // width (SketchSpec asserts the bound against exact quantiles).
    // This is the shape that replaces a global sort at 100 TB: the
    // shuffle carries shard-count × 64 longs, not the data; the merge
    // fold runs over a shard-count-sized collect_list. Approximate
    // answers are bin upper edges — exact integers, so the DuckDB
    // oracle (same binning via a windowed cumsum) matches bit-for-bit.
    GQuery(
      "q195_histogram_quantile_rollup",
      (s, dir) => {
        import s.implicits._
        val binned = t(s, dir, "events").select(
          ($"user_id" % 8).cast("string").as("shard"),
          least(floor($"value" / 8.0), lit(63.0)).cast("int").as("bin"))
        val perShard = binned.groupBy($"shard", $"bin")
          .agg(count(lit(1)).as("c"))
          .groupBy($"shard")
          .agg(map_from_entries(collect_list(struct($"bin", $"c"))).as("m"),
            sum($"c").as("n"))
          .select($"shard", $"n",
            expr("transform(sequence(0, 63), i -> coalesce(m[i], cast(0 as bigint)))")
              .as("vec"))
        def qsel(p: Int) = expr(
          s"""cast(8 * (1 + filter(sequence(0, 63),
             |  b -> aggregate(slice(vec, 1, b + 1), cast(0 as bigint),
             |         (a, x) -> a + x)
             |    >= cast(ceil(n * $p / 100.0) as bigint))[0]) as bigint)""".stripMargin)
          .as(s"p$p")
        val shardRows = perShard.select($"shard", $"n", qsel(50), qsel(90), qsel(99))
        val merged = perShard
          .agg(collect_list($"vec").as("vecs"), sum($"n").as("n"))
          .select(lit("__ALL__").as("shard"), $"n",
            expr("""aggregate(vecs,
                   |  transform(sequence(0, 63), i -> cast(0 as bigint)),
                   |  (acc, v) -> zip_with(acc, v, (a, b) -> a + b))""".stripMargin)
              .as("vec"))
        shardRows.unionByName(
          merged.select($"shard", $"n", qsel(50), qsel(90), qsel(99)))
      },
      Some("""WITH base AS (SELECT CAST(user_id % 8 AS VARCHAR) AS shard,
             |    CAST(least(floor(value / 8.0), 63) AS BIGINT) AS bin
             |  FROM events),
             |lab AS (SELECT shard, bin FROM base
             |        UNION ALL SELECT '__ALL__', bin FROM base),
             |h AS (SELECT shard, bin, count(*) AS c FROM lab GROUP BY 1, 2),
             |c AS (SELECT shard, bin,
             |        sum(c) OVER (PARTITION BY shard ORDER BY bin) AS cum,
             |        sum(c) OVER (PARTITION BY shard) AS n
             |      FROM h)
             |SELECT shard, CAST(max(n) AS BIGINT) AS n,
             |  CAST(min(CASE WHEN cum >= ceil(n * 50 / 100.0) THEN 8 * (bin + 1) END) AS BIGINT) AS p50,
             |  CAST(min(CASE WHEN cum >= ceil(n * 90 / 100.0) THEN 8 * (bin + 1) END) AS BIGINT) AS p90,
             |  CAST(min(CASE WHEN cum >= ceil(n * 99 / 100.0) THEN 8 * (bin + 1) END) AS BIGINT) AS p99
             |FROM c GROUP BY shard""".stripMargin))
  )
}
