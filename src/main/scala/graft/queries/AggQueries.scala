package graft.queries

import graft.{Engine, Q}
import org.apache.spark.sql.functions._

/** Aggregate-function surface (reference:
  * datafusion/functions-aggregate/src/lib.rs:125
  * all_default_aggregate_functions — count/sum/avg/min/max, median,
  * approx_*, stddev/var, covar/corr, regr_*, bit_*, bool_*, string_agg,
  * array_agg, first/last_value, grouping; GROUPING SETS/ROLLUP/CUBE via
  * Expr::GroupingSet expr/src/expr.rs:951-958).
  *
  * All of these plan as two-phase (partial + final) HashAggregate in Spark
  * — map-side combine keeps shuffle volume proportional to group count, not
  * row count, which is what makes them safe at 100 TB. count(DISTINCT)
  * plans as a two-shuffle expand; approx_count_distinct (HLL++) is the
  * scale path and is covered rows-only (sketch internals differ from
  * DuckDB's).
  */
object AggQueries {

  val defs: Map[String, Q] = Map(
    // ── variance / stddev family ─────────────────────────────────────────
    "agg_stats" -> Q("""
      |SELECT c_mktsegment,
      |       round(stddev_samp(c_acctbal), 4) AS sd_samp,
      |       round(stddev_pop(c_acctbal),  4) AS sd_pop,
      |       round(var_samp(c_acctbal),    4) AS v_samp,
      |       round(var_pop(c_acctbal),     4) AS v_pop
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
      Engine.table(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          round(stddev_samp(col("c_acctbal")), 4).as("sd_samp"),
          round(stddev_pop(col("c_acctbal")), 4).as("sd_pop"),
          round(var_samp(col("c_acctbal")), 4).as("v_samp"),
          round(var_pop(col("c_acctbal")), 4).as("v_pop"))
        .orderBy(col("c_mktsegment"))
    },

    // ── higher moments: skewness / kurtosis ──────────────────────────────
    // Spark reports population moments (g1, excess g2); DuckDB reports
    // sample-corrected (G1, G2) — the oracle converts:
    // g1 = G1·(n-2)/sqrt(n(n-1)),  g2 = (G2·(n-2)(n-3)/(n-1) - 6)/(n+1)
    "agg_moments" -> Q("""
      |SELECT c_mktsegment,
      |       round(skewness(c_acctbal) * (count(*) - 2)
      |             / sqrt(count(*) * (count(*) - 1.0)), 6) AS skew,
      |       round((kurtosis(c_acctbal) * (count(*) - 2) * (count(*) - 3)
      |              / (count(*) - 1.0) - 6) / (count(*) + 1.0), 6) AS kurt,
      |       any_value(c_mktsegment) AS av
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
      Engine.table(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          round(skewness(col("c_acctbal")), 6).as("skew"),
          round(kurtosis(col("c_acctbal")), 6).as("kurt"),
          any_value(col("c_mktsegment")).as("av"))
        .orderBy(col("c_mktsegment"))
    },

    // ── covariance / correlation ─────────────────────────────────────────
    "agg_corr_covar" -> Q("""
      |SELECT o_orderstatus,
      |       round(corr(o_totalprice, o_custkey),       6) AS co,
      |       round(covar_samp(o_totalprice, o_custkey), 2) AS cv_samp,
      |       round(covar_pop(o_totalprice, o_custkey),  2) AS cv_pop
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, d) =>
      Engine.table(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(corr(col("o_totalprice"), col("o_custkey")), 6).as("co"),
          round(covar_samp(col("o_totalprice"), col("o_custkey")), 2).as("cv_samp"),
          round(covar_pop(col("o_totalprice"), col("o_custkey")), 2).as("cv_pop"))
        .orderBy(col("o_orderstatus"))
    },

    // ── linear regression aggregates ─────────────────────────────────────
    "agg_regr" -> Q("""
      |SELECT l_returnflag,
      |       round(regr_slope(l_extendedprice, l_quantity),     4) AS slope,
      |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
      |       round(regr_r2(l_extendedprice, l_quantity),        6) AS r2,
      |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
      |       round(regr_avgx(l_extendedprice, l_quantity),      4) AS ax,
      |       round(regr_avgy(l_extendedprice, l_quantity),      4) AS ay
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("ax"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4).as("ay"))
        .orderBy(col("l_returnflag"))
    },

    // ── bitwise aggregates ───────────────────────────────────────────────
    "agg_bitwise" -> Q("""
      |SELECT p_brand,
      |       CAST(bit_and(p_size) AS BIGINT) AS b_and,
      |       CAST(bit_or(p_size)  AS BIGINT) AS b_or,
      |       CAST(bit_xor(p_size) AS BIGINT) AS b_xor
      |FROM part GROUP BY p_brand ORDER BY p_brand""") { (s, d) =>
      Engine.table(s, d, "part")
        .groupBy(col("p_brand"))
        .agg(
          bit_and(col("p_size")).cast("long").as("b_and"),
          bit_or(col("p_size")).cast("long").as("b_or"),
          bit_xor(col("p_size")).cast("long").as("b_xor"))
        .orderBy(col("p_brand"))
    },

    // ── boolean aggregates ───────────────────────────────────────────────
    "agg_bool" -> Q("""
      |SELECT p_brand,
      |       bool_and(p_size > 5)   AS all_big,
      |       bool_or(p_size > 45)   AS any_huge
      |FROM part GROUP BY p_brand ORDER BY p_brand""") { (s, d) =>
      Engine.table(s, d, "part")
        .groupBy(col("p_brand"))
        .agg(
          bool_and(col("p_size") > 5).as("all_big"),
          bool_or(col("p_size") > 45).as("any_huge"))
        .orderBy(col("p_brand"))
    },

    // ── min_by / max_by (argmin/argmax) ───────────────────────────────────
    // ── mode(): engines break ties arbitrarily, so the modal value is
    //    constructed to strictly dominate (quantity 1..50 uniform →
    //    'lo' ≈ 60% of every multi-thousand-row group) ─────────────────────
    "agg_mode" -> Q("""
      |SELECT l_returnflag,
      |       mode(CASE WHEN l_quantity <= 30 THEN 'lo' ELSE 'hi' END) AS m,
      |       count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          mode(when(col("l_quantity") <= 30, lit("lo")).otherwise(lit("hi")))
            .as("m"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    "agg_minmax_by" -> Q("""
      |SELECT c_nationkey,
      |       max_by(c_custkey, c_acctbal) AS richest_cust,
      |       min_by(c_custkey, c_acctbal) AS poorest_cust,
      |       min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""") { (s, d) =>
      Engine.table(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(
          max_by(col("c_custkey"), col("c_acctbal")).as("richest_cust"),
          min_by(col("c_custkey"), col("c_acctbal")).as("poorest_cust"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
        .orderBy(col("c_nationkey"))
    },

    // ── exact median / interpolated percentiles ──────────────────────────
    "agg_median_percentile" -> Q("""
      |SELECT c_mktsegment,
      |       round(median(c_acctbal), 4) AS med,
      |       round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
      |       round(quantile_cont(c_acctbal, 0.75), 4) AS p75
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
      Engine.table(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          round(median(col("c_acctbal")), 4).as("med"),
          round(expr("percentile(c_acctbal, 0.25)"), 4).as("p25"),
          round(expr("percentile(c_acctbal, 0.75)"), 4).as("p75"))
        .orderBy(col("c_mktsegment"))
    },

    // ── weighted percentile (reference: approx_percentile_cont_with_
    //    weight, functions-aggregate/src/approx_percentile_cont.rs; here
    //    the EXACT form — Spark's percentile frequency arg; the oracle
    //    expands each row `weight` times via unnest(range(w))) ────────────
    "agg_weighted_percentile" -> Q("""
      |SELECT l_returnflag,
      |       round(quantile_cont(v, 0.5), 4) AS wmed,
      |       round(quantile_cont(v, 0.9), 4) AS wp90
      |FROM (SELECT l_returnflag, l_quantity AS v,
      |             unnest(range(l_linenumber)) AS rep
      |      FROM lineitem)
      |GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5, l_linenumber)"), 4)
            .as("wmed"),
          round(expr("percentile(l_quantity, 0.9, l_linenumber)"), 4)
            .as("wp90"))
        .orderBy(col("l_returnflag"))
    },

    // ── ordered string_agg equivalent ────────────────────────────────────
    "agg_string_agg" -> Q("""
      |SELECT c_nationkey,
      |       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""") { (s, d) =>
      Engine.table(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
          .as("segs"))
        .orderBy(col("c_nationkey"))
    },

    // ── ordered array_agg + nth_value-as-aggregate (flattened to a
    //    joined string: the driver's comparator can't hash list columns
    //    — ADVICE r01; nth = reference's nth_value agg via
    //    element_at(sorted collect_list, n)) ──────────────────────────────
    "agg_array_agg" -> Q("""
      |SELECT s_nationkey, array_to_string(list_sort(list(s_suppkey)), ',') AS supps,
      |       list_sort(list(s_suppkey))[2] AS nth2
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""") { (s, d) =>
      Engine.table(s, d, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(array_join(
          transform(array_sort(collect_list(col("s_suppkey"))),
            x => x.cast("string")), ",").as("supps"),
          // try_: groups with <2 rows yield NULL (= DuckDB list[2] OOB)
          try_element_at(array_sort(collect_list(col("s_suppkey"))), lit(2))
            .as("nth2"))
        .orderBy(col("s_nationkey"))
    },

    // ── count variants + distinct aggregation ────────────────────────────
    "agg_count_variants" -> Q("""
      |SELECT o_orderstatus,
      |       count(*) AS n_rows,
      |       count(DISTINCT o_custkey) AS n_cust,
      |       count(DISTINCT o_orderpriority) AS n_prio,
      |       round(sum(DISTINCT o_shipmonth), 2) AS sum_distinct_month
      |FROM (SELECT o_orderstatus, o_custkey, o_orderpriority,
      |             CAST(month(o_orderdate) AS DOUBLE) AS o_shipmonth FROM orders)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, d) =>
      Engine.table(s, d, "orders")
        .select(col("o_orderstatus"), col("o_custkey"), col("o_orderpriority"),
          month(col("o_orderdate")).cast("double").as("o_shipmonth"))
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          round(sum_distinct(col("o_shipmonth")), 2).as("sum_distinct_month"))
        .orderBy(col("o_orderstatus"))
    },

    // ── ROLLUP ───────────────────────────────────────────────────────────
    "agg_rollup" -> Q("""
      |SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
      |       count(*) AS n, round(sum(c_acctbal), 2) AS bal,
      |       CAST(grouping(c_mktsegment) * 2 + grouping(c_nationkey) AS BIGINT) AS gid
      |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)
      |ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""") { (s, d) =>
      Engine.table(s, d, "customer")
        .rollup(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("bal"),
          (grouping(col("c_mktsegment")) * 2 + grouping(col("c_nationkey")))
            .cast("long").as("gid"))
        .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("c_nationkey"),
          col("n"), col("bal"), col("gid"))
        .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
          col("c_nationkey").asc_nulls_first)
    },

    // ── CUBE ─────────────────────────────────────────────────────────────
    "agg_cube" -> Q("""
      |SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (s, d) =>
      Engine.table(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ── explicit GROUPING SETS ───────────────────────────────────────────
    "agg_grouping_sets" -> Q("""
      |SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""") { (s, d) =>
      // DataFrame API has no groupingSets combinator (SQL-only in Spark) —
      // this op is inherently SQL-surface; register views and use SQL.
      graft.Engine.registerAll(s, d)
      s.sql("""
        SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
               count(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""")
    },

    // ── approximate aggregates (HLL++) — bounded-pass adjudication ───────
    // Sketch internals differ from DuckDB's, so the raw estimate can't be
    // value-oracled; instead the query emits the EXACT distinct counts
    // (independently recomputed by the oracle) plus booleans asserting the
    // HLL++ estimate lands within its published bound (4×rsd; rsd 0.05
    // default / 0.01 requested). Every emitted column is adjudicated —
    // r6 verdict #2. The scale story is unchanged: fixed-size sketch
    // state vs count-distinct's expand+reshuffle at 100 TB.
    "agg_approx" -> Q("""
      |SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS exact_parts,
      |       count(DISTINCT l_orderkey) AS exact_orders,
      |       true AS parts_in_bound, true AS orders_in_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      // TWO aggregation passes joined on the 5-row group set, NOT one
      // combined aggregate (r11 — was 23.5 s of the full bench, now
      // ~1 s): mixing countDistinct with approx_count_distinct makes
      // the planner Expand every row ×3 (one projection per distinct
      // set + one for the plain aggregates), and the rsd=0.01 HLL++
      // buffer is ~1536 words — the Expand pushed every tripled row
      // through the wide-buffer aggregate. Split, the approx pass
      // streams rows once into fixed sketches (the actual 100 TB
      // shape) and the exact pass keeps its narrow dedup buffers.
      val li = Engine.table(s, d, "lineitem")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts"))
            <= col("exact_parts") * 4 * 0.05).as("parts_in_bound"),
          (abs(col("ao") - col("exact_orders"))
            <= col("exact_orders") * 4 * 0.01).as("orders_in_bound"))
        .orderBy(col("l_returnflag"))
    },

    // ── bitmap exact-distinct family: bit_position/bucket_number slice
    //    the key domain into 32768-bit buckets, construct_agg builds the
    //    partition-local bitmap, or_agg re-merges — an exact count-distinct
    //    whose shuffle payload is fixed-size bitmaps, not keys (the
    //    re-aggregatable pattern that survives 100 TB; the inner grouping
    //    stands in for per-partition / per-day pre-aggregation). Keys are
    //    spread (*13) so several buckets appear. Oracle: plain
    //    count(DISTINCT) per the same bucket arithmetic. ──────────────────
    "agg_bitmap" -> Q("""
      |SELECT CAST((o_orderkey * 13) // 32768 + 1 AS BIGINT) AS bucket,
      |       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
      |FROM orders GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val key = col("o_orderkey") * 13 + 1 // > 0 (o_orderkey starts at 0)
      Engine.table(s, d, "orders")
        .groupBy(bitmap_bucket_number(key).as("bucket"), col("o_orderpriority"))
        .agg(bitmap_construct_agg(bitmap_bit_position(key)).as("bm"))
        .groupBy(col("bucket"))
        .agg(bitmap_count(bitmap_or_agg(col("bm"))).as("n_distinct"))
        .orderBy(col("bucket"))
    },

    // ── FILTER clause on aggregates (reference: Expr::AggregateFunction
    //    filter field, expr/src/expr.rs — SELECT agg(x) FILTER (WHERE p)).
    //    Still one two-phase hash aggregate: each FILTER gates only its own
    //    accumulator, no extra scan or shuffle. Spark disallows FILTER
    //    together with DISTINCT, so the distinct variant uses the
    //    documented CASE-projection equivalent (count distinct skips the
    //    NULLs the CASE emits). ─────────────────────────────────────────
    "agg_filter_clause" -> Q("""
      |SELECT o_orderpriority,
      |       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
      |       round(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000), 2) AS sum_big,
      |       round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS avg_open,
      |       CAST(count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_cust_big
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      Engine.table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_f"),
          round(expr("sum(o_totalprice) FILTER (WHERE o_totalprice > 150000)"), 2)
            .as("sum_big"),
          round(expr("avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O')"), 2)
            .as("avg_open"),
          expr("count(DISTINCT CASE WHEN o_totalprice > 100000 THEN o_custkey END)")
            .as("n_cust_big"))
        .orderBy(col("o_orderpriority"))
    }
  )
}
