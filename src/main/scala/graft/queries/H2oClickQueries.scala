package graft.queries

import graft.{Engine, Q}
import org.apache.spark.sql.functions._

/** Benchmark-suite breadth: the reference ships h2o.ai db-benchmark
  * group-by queries (benchmarks/src/bin/h2o.rs) and the ClickBench suite
  * (benchmarks/src/clickbench.rs, benchmarks/queries/clickbench/
  * queries.sql). Those run on external datasets (x.csv, hits.parquet)
  * we don't have, so each family is re-expressed faithfully over the
  * driver-provided `events` and `documents` tables: the h2o queries map
  * x's id1..id6/v1..v3 onto (event_type, day-of-week, user_id) and
  * (value, event_id, length(props)); ClickBench's hits columns map onto
  * events/documents equivalents, keeping each query's SHAPE (the
  * aggregate mix, filters, LIMIT/OFFSET paging, regex key extraction).
  *
  * All plan as two-phase HashAggregate / TakeOrderedAndProject in Spark;
  * the ORDER BY ... LIMIT k group rankings are exactly the pattern the
  * TopKAggregationRule fuses when the aggregate is a bare min/max.
  */
object H2oClickQueries {

  private def sql(sparkSql: String, duckSql: String = null): Q =
    Q(Option(duckSql).getOrElse(sparkSql)) { (s, d) =>
      Engine.registerAll(s, d)
      s.sql(sparkSql.stripMargin)
    }

  val defs: Map[String, Q] = Map(
    // ── h2o groupby: q1 — sum by low-cardinality key ─────────────────────
    "h2o_g1" -> sql("""
      |SELECT event_type, round(sum(value), 2) AS v1
      |FROM events GROUP BY event_type ORDER BY event_type"""),

    // ── h2o q2 — sum by two keys ─────────────────────────────────────────
    "h2o_g2" -> sql(
      """
      |SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
      |       round(sum(value), 2) AS v1
      |FROM events GROUP BY event_type, dayofweek(ts)
      |ORDER BY event_type, dow""",
      """
      |SELECT event_type, date_part('dow', ts) + 1 AS dow,
      |       round(sum(value), 2) AS v1
      |FROM events GROUP BY event_type, date_part('dow', ts) + 1
      |ORDER BY event_type, dow"""),

    // ── h2o q3 — sum + mean by higher-cardinality key ────────────────────
    "h2o_g3" -> sql("""
      |SELECT user_id, round(sum(value), 2) AS v1, round(avg(value) + 1e-9, 4) AS v3
      |FROM events GROUP BY user_id ORDER BY user_id"""),

    // ── h2o q4 — three means by low-cardinality key ──────────────────────
    "h2o_g4" -> sql("""
      |SELECT event_type, round(avg(value) + 1e-9, 4) AS v1,
      |       round(avg(event_id) + 1e-9, 4) AS v2, round(avg(length(props)) + 1e-9, 4) AS v3
      |FROM events GROUP BY event_type ORDER BY event_type"""),

    // ── h2o q5 — three sums by higher-cardinality key ────────────────────
    "h2o_g5" -> sql("""
      |SELECT user_id, round(sum(value), 2) AS v1,
      |       CAST(sum(event_id) AS BIGINT) AS v2,
      |       CAST(sum(length(props)) AS BIGINT) AS v3
      |FROM events GROUP BY user_id ORDER BY user_id"""),

    // ── h2o q6 — median + stddev by two keys ─────────────────────────────
    "h2o_g6" -> sql(
      """
      |SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
      |       round(median(value) + 1e-9, 4) AS median_v3,
      |       round(stddev(value) + 1e-9, 4) AS sd_v3
      |FROM events GROUP BY event_type, dayofweek(ts)
      |ORDER BY event_type, dow""",
      """
      |SELECT event_type, date_part('dow', ts) + 1 AS dow,
      |       round(median(value) + 1e-9, 4) AS median_v3,
      |       round(stddev(value) + 1e-9, 4) AS sd_v3
      |FROM events GROUP BY event_type, date_part('dow', ts) + 1
      |ORDER BY event_type, dow"""),

    // ── h2o q7 — max-min range per key ───────────────────────────────────
    "h2o_g7" -> sql("""
      |SELECT user_id, round(max(value) - min(value) + 1e-9, 4) AS range_v1_v2
      |FROM events GROUP BY user_id ORDER BY user_id"""),

    // ── h2o q8 — top-2 rows per group via row_number window ──────────────
    "h2o_g8" -> sql("""
      |SELECT event_type, largest2_v3 FROM (
      |  SELECT event_type, value AS largest2_v3,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY value DESC, event_id) AS order_v3
      |  FROM events WHERE value IS NOT NULL) sub_query
      |WHERE order_v3 <= 2 ORDER BY event_type, largest2_v3 DESC"""),

    // ── h2o q9 — r² of two value columns by two keys ─────────────────────
    "h2o_g9" -> sql(
      """
      |SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
      |       round(pow(corr(value, user_id), 2) + 1e-9, 6) AS r2
      |FROM events GROUP BY event_type, dayofweek(ts)
      |ORDER BY event_type, dow""",
      """
      |SELECT event_type, date_part('dow', ts) + 1 AS dow,
      |       round(pow(corr(value, user_id), 2) + 1e-9, 6) AS r2
      |FROM events GROUP BY event_type, date_part('dow', ts) + 1
      |ORDER BY event_type, dow"""),

    // ── h2o q10 — sum + count over the full grouping set ─────────────────
    "h2o_g10" -> sql(
      """
      |SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow, user_id,
      |       round(sum(value), 2) AS v3, count(*) AS cnt
      |FROM events GROUP BY event_type, dayofweek(ts), user_id
      |ORDER BY event_type, dow, user_id""",
      """
      |SELECT event_type, date_part('dow', ts) + 1 AS dow, user_id,
      |       round(sum(value), 2) AS v3, count(*) AS cnt
      |FROM events GROUP BY event_type, date_part('dow', ts) + 1, user_id
      |ORDER BY event_type, dow, user_id"""),

    // ── h2o join family (db-benchmark join task; the reference ships only
    //    the groupby half in benchmarks/src/bin/h2o.rs — the join queries
    //    are re-expressed over TPC-H: lineitem as x, supplier/part/orders
    //    as the small/medium/big rhs, p_brand as the factor key). The
    //    small/medium rhs are SF-scaled so they carry no broadcast hint
    //    (AQE broadcasts them while they fit, shuffles past the
    //    threshold); only j4's brand dim — bounded by the p_brand domain,
    //    not by SF — keeps an explicit hint. Big-big shuffles on the key ──
    "h2o_j1" -> Q("""
      |SELECT s_nationkey, round(sum(l_quantity), 2) AS v1,
      |       round(sum(s_acctbal), 2) AS v2, count(*) AS c
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .join(Engine.table(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(round(sum(col("l_quantity")), 2).as("v1"),
          round(sum(col("s_acctbal")), 2).as("v2"), count(lit(1)).as("c"))
        .orderBy(col("s_nationkey"))
    },

    "h2o_j2" -> Q("""
      |SELECT p_brand, round(sum(l_extendedprice), 2) AS v1,
      |       round(sum(p_retailprice), 2) AS v2, count(*) AS c
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .join(Engine.table(s, d, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice")), 2).as("v1"),
          round(sum(col("p_retailprice")), 2).as("v2"), count(lit(1)).as("c"))
        .orderBy(col("p_brand"))
    },

    // left-outer variant: the rhs is filtered so ~half the probe rows have
    // no match — null-skipping sums and a matched-row count on both engines
    "h2o_j3" -> Q("""
      |SELECT coalesce(p_brand, '__none__') AS brand,
      |       round(sum(l_extendedprice), 2) AS v1,
      |       round(sum(p_retailprice), 2) AS v2,
      |       count(p_partkey) AS matched, count(*) AS c
      |FROM lineitem LEFT JOIN (SELECT * FROM part WHERE p_size < 15) p
      |  ON l_partkey = p_partkey
      |GROUP BY coalesce(p_brand, '__none__') ORDER BY brand""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .join(Engine.table(s, d, "part").filter(col("p_size") < 15),
          col("l_partkey") === col("p_partkey"), "left")
        .groupBy(coalesce(col("p_brand"), lit("__none__")).as("brand"))
        .agg(round(sum(col("l_extendedprice")), 2).as("v1"),
          round(sum(col("p_retailprice")), 2).as("v2"),
          count(col("p_partkey")).as("matched"), count(lit(1)).as("c"))
        .orderBy(col("brand"))
    },

    // factor (string) key join: part against a per-brand dim derived from
    // itself (exact min, no intermediate rounding)
    "h2o_j4" -> Q("""
      |WITH dim AS (SELECT p_brand AS b, min(p_retailprice) AS floor_price
      |             FROM part GROUP BY p_brand)
      |SELECT b, round(sum(p_retailprice), 2) AS v1,
      |       round(sum(floor_price), 2) AS v2, count(*) AS c
      |FROM part JOIN dim ON p_brand = b
      |GROUP BY b ORDER BY b""") { (s, d) =>
      val part = Engine.table(s, d, "part")
      val dim = part.groupBy(col("p_brand").as("b"))
        .agg(min(col("p_retailprice")).as("floor_price"))
      part.join(broadcast(dim), col("p_brand") === col("b"))
        .groupBy(col("b"))
        .agg(round(sum(col("p_retailprice")), 2).as("v1"),
          round(sum(col("floor_price")), 2).as("v2"), count(lit(1)).as("c"))
        .orderBy(col("b"))
    },

    "h2o_j5" -> Q("""
      |SELECT o_orderpriority, round(sum(l_extendedprice), 2) AS v1,
      |       round(sum(o_totalprice), 2) AS v2, count(*) AS c
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .join(Engine.table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("v1"),
          round(sum(col("o_totalprice")), 2).as("v2"), count(lit(1)).as("c"))
        .orderBy(col("o_orderpriority"))
    },

    // ── ClickBench q2/q3 shape — global sum/count/avg in one pass ────────
    // (sum over a BOUNDED per-row term: a raw sum(user_id) would wrap in
    //  Spark's non-ANSI long arithmetic at large scale while DuckDB's
    //  HUGEINT sum stays exact — an oracle divergence that only appears
    //  at scale)
    "click_global_aggs" -> sql("""
      |SELECT CAST(sum(user_id % 100) AS BIGINT) AS s, count(*) AS c,
      |       round(avg(value) + 1e-9, 4) AS a
      |FROM events"""),

    // ── ClickBench q4-q6 shape — global count distinct ───────────────────
    "click_count_distinct" -> sql("""
      |SELECT count(DISTINCT user_id) AS users,
      |       count(DISTINCT event_type) AS types
      |FROM events"""),

    // ── ClickBench q7 shape — min/max of a date column ───────────────────
    "click_minmax_date" -> sql("""
      |SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      |FROM events"""),

    // ── ClickBench q8 shape — filtered group-by ordered by count ─────────
    "click_top_groups" -> sql("""
      |SELECT event_type, count(*) AS c
      |FROM events WHERE event_type <> 'click'
      |GROUP BY event_type ORDER BY c DESC, event_type"""),

    // ── ClickBench q9/q11 shape — count(distinct) per group, top-10 ──────
    "click_group_distinct_users" -> sql("""
      |SELECT event_type, count(DISTINCT user_id) AS u
      |FROM events GROUP BY event_type ORDER BY u DESC, event_type
      |LIMIT 10"""),

    // ── ClickBench q22 shape — LIKE filter + grouped min/count ───────────
    "click_phrase_like" -> sql("""
      |SELECT lang, CAST(min(doc_id) AS BIGINT) AS first_doc, count(*) AS c
      |FROM documents WHERE text LIKE '%the%'
      |GROUP BY lang ORDER BY c DESC, lang LIMIT 10"""),

    // ── ClickBench q25 shape — filter + order by time, first rows ────────
    "click_sort_by_time" -> sql(
      """
      |SELECT event_id, CAST(unix_timestamp(ts) AS BIGINT) AS t
      |FROM events WHERE event_type <> 'click'
      |ORDER BY t, event_id LIMIT 10""",
      """
      |SELECT event_id, epoch_us(ts) // 1000000 AS t
      |FROM events WHERE event_type <> 'click'
      |ORDER BY t, event_id LIMIT 10"""),

    // ── ClickBench q31 shape — wide list of arithmetic sums, one pass ────
    "click_wide_sums" -> sql(
      Seq.range(0, 10).map(i => s"round(sum(value + $i), 2) AS s$i")
        .mkString("\n      |SELECT ", ",\n      |       ", "\n      |FROM events")),

    // ── ClickBench q28 shape — regex key extraction + HAVING + top-25 ────
    "click_regex_key" -> sql("""
      |SELECT regexp_extract(props, '([0-9]+)', 1) AS k,
      |       round(avg(length(props)) + 1e-9, 4) AS l, count(*) AS c,
      |       min(props) AS first_props
      |FROM events GROUP BY regexp_extract(props, '([0-9]+)', 1)
      |HAVING count(*) > 5 ORDER BY l DESC, k LIMIT 25"""),

    // ── ClickBench q35 shape — paged group ranking (LIMIT + OFFSET) ──────
    "click_offset_page" -> sql("""
      |SELECT user_id, count(*) AS c
      |FROM events GROUP BY user_id ORDER BY c DESC, user_id
      |LIMIT 10 OFFSET 100"""),

    // ── ClickBench extended.sql shape — several count(DISTINCT) per
    //    group (plans as a 3-way expand + reshuffle in Spark) ────────────
    "click_multi_distinct" -> sql("""
      |SELECT event_type,
      |       count(DISTINCT user_id) AS u,
      |       count(DISTINCT CAST(ts AS DATE)) AS days,
      |       count(DISTINCT regexp_extract(props, '([0-9]+)', 1)) AS ks
      |FROM events GROUP BY event_type
      |ORDER BY u DESC, event_type LIMIT 10"""),

    // ── conversion funnel (ClickHouse windowFunnel shape): first signup
    //    per user, then first purchase at-or-after it; non-converting
    //    signups keep NULL purchase. Two small grouped aggregates + a
    //    broadcast-sized join — the fact table is scanned twice but never
    //    shuffled whole (both aggregates reduce to per-user rows) ─────────
    "click_funnel" -> Q("""
      |WITH ev AS (SELECT user_id, event_type,
      |                   epoch_us(ts) // 1000000 AS es FROM events),
      |s AS (SELECT user_id, min(es) AS st FROM ev
      |      WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (SELECT ev.user_id, min(es) AS pt FROM ev
      |      JOIN s ON ev.user_id = s.user_id
      |      WHERE ev.event_type = 'purchase' AND ev.es >= s.st
      |      GROUP BY ev.user_id)
      |SELECT s.user_id, st, pt, pt - st AS secs_to_convert
      |FROM s LEFT JOIN p ON s.user_id = p.user_id
      |ORDER BY s.user_id""") { (s, d) =>
      // one-pass window shape (r10, same class as the tpch q21/q2
      // rewrites): the join formulation scanned events 3× and computed
      // the signup aggregate twice (the two subtrees carry different
      // null filters, so ReuseExchange can't unify them), and its
      // purchase⨝signup-mins join only broadcasts while the per-user
      // dim fits — at 100 TB it degrades to a raw-purchase shuffle PLUS
      // the two aggregate shuffles. Here: ONE scan (event_type IN
      // pushed down), ONE hash exchange on user_id; the window computes
      // each user's first signup and the groupBy reuses the window's
      // partitioning (zero extra exchanges before the output sort).
      val ev = Engine.table(s, d, "events")
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("es"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val isSignup = col("event_type") === "signup"
      ev.withColumn("stw", min(when(isSignup, col("es"))).over(w))
        .groupBy(col("user_id"))
        .agg(min(when(isSignup, col("es"))).as("st"),
          min(when(col("event_type") === "purchase" &&
            col("es") >= col("stw"), col("es"))).as("pt"))
        .filter(col("st").isNotNull)
        .select(col("user_id"), col("st"), col("pt"),
          (col("pt") - col("st")).as("secs_to_convert"))
        .orderBy(col("user_id"))
    },

    // ── ClickBench q42 shape — per-minute time series, paged ─────────────
    "click_minute_series" -> sql(
      """
      |SELECT CAST(unix_timestamp(date_trunc('minute', ts)) AS BIGINT) AS m,
      |       count(*) AS views
      |FROM events GROUP BY date_trunc('minute', ts)
      |ORDER BY m LIMIT 10 OFFSET 60""",
      """
      |SELECT epoch_us(date_trunc('minute', ts)) // 1000000 AS m,
      |       count(*) AS views
      |FROM events GROUP BY date_trunc('minute', ts)
      |ORDER BY m LIMIT 10 OFFSET 60"""),

    // ── The remaining ClickBench shapes (queries.sql has 43; the block
    //    below completes the sweep over our events/documents mapping) ────

    // q1 — bare COUNT(*) (metadata-only scan)
    "click_count" -> sql("SELECT count(*) AS c FROM events"),

    // q2 — filtered global count
    "click_filtered_count" -> sql("""
      |SELECT count(*) AS c FROM events WHERE event_type <> 'view'"""),

    // q4 — global average of a high-cardinality bigint
    "click_global_avg" -> sql("""
      |SELECT round(avg(user_id) + 1e-9, 4) AS a FROM events"""),

    // q16 — single-key frequency ranking
    "click_user_counts" -> sql("""
      |SELECT user_id, count(*) AS c FROM events
      |GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10"""),

    // q17 — two-key frequency ranking
    "click_two_key_counts" -> sql("""
      |SELECT user_id, event_type, count(*) AS c FROM events
      |GROUP BY user_id, event_type
      |ORDER BY c DESC, user_id, event_type LIMIT 10"""),

    // q19 — time-component group key alongside id keys
    "click_minute_user" -> sql("""
      |SELECT user_id, CAST(minute(ts) AS BIGINT) AS m, event_type,
      |       count(*) AS c
      |FROM events GROUP BY user_id, minute(ts), event_type
      |ORDER BY c DESC, user_id, m, event_type LIMIT 10"""),

    // q20 — point lookup on a high-cardinality key (scalar subquery keeps
    // the probe value valid at every SF)
    "click_point_lookup" -> sql("""
      |SELECT user_id FROM events
      |WHERE user_id = (SELECT max(user_id) FROM events)
      |ORDER BY user_id"""),

    // q21 — global LIKE count
    "click_like_count" -> sql("""
      |SELECT count(*) AS c FROM events WHERE props LIKE '%9%'"""),

    // q22 — LIKE filter + grouped min/count ranking
    "click_like_group" -> sql("""
      |SELECT event_type, min(props) AS first_props, count(*) AS c
      |FROM events WHERE props LIKE '%7%'
      |GROUP BY event_type ORDER BY c DESC, event_type LIMIT 10"""),

    // q23 — the LIKE + NOT LIKE chain with a mixed aggregate list
    "click_like_chain" -> sql("""
      |SELECT event_type, min(props) AS first_props,
      |       min(CAST(ts AS DATE)) AS first_day, count(*) AS c,
      |       count(DISTINCT user_id) AS u
      |FROM events
      |WHERE props LIKE '%1%' AND props NOT LIKE '%9%'
      |GROUP BY event_type ORDER BY c DESC, event_type LIMIT 10"""),

    // q24 — wide row fetch: filter + order by time, all columns out
    "click_select_wide" -> sql(
      """
      |SELECT event_id, user_id, event_type, value, props,
      |       CAST(unix_timestamp(ts) AS BIGINT) AS t
      |FROM events WHERE props LIKE '%5%'
      |ORDER BY t, event_id LIMIT 10""",
      """
      |SELECT event_id, user_id, event_type, value, props,
      |       epoch_us(ts) // 1000000 AS t
      |FROM events WHERE props LIKE '%5%'
      |ORDER BY t, event_id LIMIT 10"""),

    // q26/q27 — order by a string column, first rows
    "click_order_by_string" -> sql("""
      |SELECT props FROM events WHERE props <> ''
      |ORDER BY props, event_id LIMIT 10"""),

    // q30 — regex-REPLACE key extraction + HAVING (Spark replaces all
    // matches by default; DuckDB needs the 'g' flag). Spark side is the
    // two-level shape (r10): min(props) has an immutable string buffer,
    // so the single-level plan falls back to SortAggregate — TWO full
    // sorts of every raw row by the regex key. Pre-aggregating by
    // (k, props) first runs as a mutable-buffer HashAggregate with
    // map-side partials (shuffle ∝ distinct pairs, regex still once per
    // row), leaving the string-min SortAggregate only the distinct
    // (k, props) pairs. avg(length) is recomposed exactly from the
    // partials: lengths and counts are small integers, so the double
    // sums are exact on both engines. At 100 TB the sorted bytes drop
    // from the full fact to the pair cardinality.
    "click_regex_replace" -> Q(
      """
      |SELECT regexp_replace(props, '[^0-9]', '', 'g') AS k,
      |       round(avg(length(props)) + 1e-9, 4) AS l, count(*) AS c,
      |       min(props) AS first_props
      |FROM events GROUP BY regexp_replace(props, '[^0-9]', '', 'g')
      |HAVING count(*) > 5 ORDER BY l DESC, k LIMIT 25""") { (s, d) =>
      Engine.table(s, d, "events")
        .groupBy(regexp_replace(col("props"), "[^0-9]", "").as("k"),
          col("props"))
        .agg(count(lit(1)).as("c2"))
        .groupBy(col("k"))
        .agg(
          round((sum(length(col("props")) * col("c2")) / sum(col("c2")))
            + 1e-9, 4).as("l"),
          sum(col("c2")).as("c"),
          min(col("props")).as("first_props"))
        .filter(col("c") > 5)
        .orderBy(col("l").desc, col("k"))
        .limit(25)
        .select(col("k"), col("l"), col("c"), col("first_props"))
    },

    // q32-q34 — high-cardinality pair grouping with count+sum+avg
    "click_pair_heavy" -> sql("""
      |SELECT user_id, CAST(event_id % 100 AS BIGINT) AS b, count(*) AS c,
      |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |            AS BIGINT) AS clicks,
      |       round(avg(value) + 1e-9, 4) AS w
      |FROM events GROUP BY user_id, event_id % 100
      |ORDER BY c DESC, user_id, b LIMIT 10"""),

    // q36 — constant select item alongside a grouped key
    "click_const_group" -> sql("""
      |SELECT 1 AS one, event_type, count(*) AS c FROM events
      |GROUP BY event_type ORDER BY c DESC, event_type LIMIT 10"""),

    // q37 — derived-arithmetic group keys (ClientIP, ClientIP-1, ...)
    "click_arith_groups" -> sql("""
      |SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2, count(*) AS c
      |FROM events GROUP BY user_id, user_id - 1, user_id - 2
      |ORDER BY c DESC, user_id LIMIT 10"""),

    // q38/q39 — date-window pageview ranking
    "click_date_window" -> sql("""
      |SELECT props, count(*) AS pv FROM events
      |WHERE event_type = 'view'
      |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
      |  AND props <> ''
      |GROUP BY props ORDER BY pv DESC, props LIMIT 10"""),

    // q40 — CASE-derived src/dst traffic matrix, paged
    "click_case_src_dst" -> sql("""
      |SELECT event_type AS dst,
      |       CASE WHEN user_id % 2 = 0 THEN props ELSE '' END AS src,
      |       count(*) AS pv
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
      |GROUP BY event_type,
      |         CASE WHEN user_id % 2 = 0 THEN props ELSE '' END
      |ORDER BY pv DESC, dst, src LIMIT 10 OFFSET 20"""),

    // q41/q42 — hashed-key × date grouping, deep OFFSET page
    "click_pair_offset" -> sql("""
      |SELECT CAST(user_id % 50 AS BIGINT) AS uh, CAST(ts AS DATE) AS d,
      |       count(*) AS pv
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
      |GROUP BY user_id % 50, CAST(ts AS DATE)
      |ORDER BY pv DESC, uh, d LIMIT 10 OFFSET 100"""),

    // ── round-5 completion: the 11 remaining queries.sql shapes ──────────

    // q10 — one group key, MIXED aggregate list incl. count(DISTINCT):
    // sum+count+avg are two-phase partials, the distinct adds an expand
    "click_mixed_aggs" -> sql("""
      |SELECT user_id, CAST(sum(event_id % 100) AS BIGINT) AS s,
      |       count(*) AS c, round(avg(value) + 1e-9, 4) AS a,
      |       count(DISTINCT event_type) AS t
      |FROM events GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10"""),

    // q11 — count(DISTINCT) by a model-like key with an <>'' guard
    "click_model_users" -> sql("""
      |SELECT lang, count(DISTINCT source) AS u FROM documents
      |WHERE lang <> '' GROUP BY lang ORDER BY u DESC, lang LIMIT 10"""),

    // q12 — TWO-key group + count(DISTINCT) ranking
    "click_pair_distinct" -> sql("""
      |SELECT event_type, props, count(DISTINCT user_id) AS u
      |FROM events WHERE props <> ''
      |GROUP BY event_type, props
      |ORDER BY u DESC, event_type, props LIMIT 10"""),

    // q13 — string-key frequency ranking with an <>'' guard
    "click_phrase_counts" -> sql("""
      |SELECT props, count(*) AS c FROM events WHERE props <> ''
      |GROUP BY props ORDER BY c DESC, props LIMIT 10"""),

    // q14 — string-key count(DISTINCT user) ranking
    "click_phrase_users" -> sql("""
      |SELECT props, count(DISTINCT user_id) AS u
      |FROM events WHERE props <> ''
      |GROUP BY props ORDER BY u DESC, props LIMIT 10"""),

    // q15 — (engine, phrase) pair count ranking
    "click_engine_phrase" -> sql("""
      |SELECT CAST(user_id % 10 AS BIGINT) AS engine, props, count(*) AS c
      |FROM events WHERE props <> ''
      |GROUP BY user_id % 10, props
      |ORDER BY c DESC, engine, props LIMIT 10"""),

    // q18 — GROUP BY ... LIMIT with NO ORDER BY: the plan under test is
    // a limit straight over the final HashAggregate (no sort). WHICH
    // groups survive is engine-dependent, so the oracled value is the
    // row COUNT of the limited set, not the rows themselves.
    "click_group_limit_unordered" -> sql("""
      |SELECT count(*) AS n FROM (
      |  SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY user_id, event_type LIMIT 10)"""),

    // q27 — ORDER BY (time, phrase) composite, first rows
    "click_sort_two_keys" -> sql(
      """
      |SELECT props, CAST(unix_timestamp(ts) AS BIGINT) AS t
      |FROM events WHERE props <> ''
      |ORDER BY t, props LIMIT 10""",
      """
      |SELECT props, epoch_us(ts) // 1000000 AS t
      |FROM events WHERE props <> ''
      |ORDER BY t, props LIMIT 10"""),

    // q28 — avg(length) + HAVING count threshold, top-25 (the
    // non-regex half of the q28/q30 pair)
    "click_len_having" -> sql("""
      |SELECT user_id, round(avg(length(props)) + 1e-9, 4) AS l,
      |       count(*) AS c
      |FROM events WHERE props <> ''
      |GROUP BY user_id HAVING count(*) > 50
      |ORDER BY l DESC, user_id LIMIT 25"""),

    // q29 — regex key via capture-group BACKREFERENCE replacement
    // (Spark spells it $1, DuckDB \1)
    // Rewrite (r11, the click_regex_replace precedent taken one step
    // further): group by the RAW props first — the backtracking-heavy
    // '^.*"k": ...' regex then runs once per DISTINCT props (~100 at
    // any SF) instead of once per row (100k at sf0.1), and the second
    // aggregate reads the tiny distinct set. avg(length) becomes the
    // count-weighted mean over distinct values: lengths and counts are
    // small integers, so the double sums are exact on both engines
    // (same argument as click_regex_replace). Non-matching props pass
    // through regexp_replace unchanged on both engines, so grouping by
    // the distinct value first is semantics-preserving.
    "click_referer_domain" -> Q(
      """
      |SELECT regexp_replace(props, '^.*"k": ([0-9]+).*$', '\1') AS k,
      |       round(avg(length(props)) + 1e-9, 4) AS l, count(*) AS c,
      |       min(props) AS first_props
      |FROM events WHERE props <> ''
      |GROUP BY regexp_replace(props, '^.*"k": ([0-9]+).*$', '\1')
      |HAVING count(*) > 50 ORDER BY l DESC, k LIMIT 25""") { (s, d) =>
      Engine.table(s, d, "events")
        .filter(col("props") =!= "")
        .groupBy(col("props"))
        .agg(count(lit(1)).as("c2"))
        .select(
          regexp_replace(col("props"), "^.*\"k\": ([0-9]+).*$", "$1")
            .as("k"),
          col("props"), col("c2"))
        .groupBy(col("k"))
        .agg(
          round((sum(length(col("props")) * col("c2")) / sum(col("c2")))
            + 1e-9, 4).as("l"),
          sum(col("c2")).as("c"),
          min(col("props")).as("first_props"))
        .filter(col("c") > 50)
        .orderBy(col("l").desc, col("k"))
        .limit(25)
        .select(col("k"), col("l"), col("c"), col("first_props"))
    },

    // q32 — selective filter + high-cardinality pair + count/sum/avg
    // (click_pair_heavy is the unfiltered q33/q34 twin)
    "click_pair_filtered" -> sql("""
      |SELECT user_id, CAST(event_id % 100 AS BIGINT) AS b, count(*) AS c,
      |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |            AS BIGINT) AS clicks,
      |       round(avg(value) + 1e-9, 4) AS w
      |FROM events WHERE event_type <> 'view'
      |GROUP BY user_id, event_id % 100
      |ORDER BY c DESC, user_id, b LIMIT 10"""),

    // ── ClickBench extended.sql (3 queries beyond the main 43): global
    //    triple count(DISTINCT) and a per-group four-distinct matrix
    //    ORDERED BY one of the distinct counts ──────────────────────────
    "click_ext_triple_distinct" -> sql("""
      |SELECT count(DISTINCT lang) AS dl, count(DISTINCT source) AS ds,
      |       count(DISTINCT n_chars) AS dn
      |FROM documents"""),

    "click_ext_distinct_matrix" -> sql("""
      |SELECT lang, count(DISTINCT source) AS ds,
      |       count(DISTINCT doc_id % 10) AS dd,
      |       count(DISTINCT n_chars % 7) AS dc,
      |       count(DISTINCT length(text) % 5) AS dt
      |FROM documents GROUP BY lang
      |ORDER BY ds DESC, lang LIMIT 10"""),

    // ── h2o join suite (reference: benchmarks/src/bin/h2o.rs join mode;
    //    db-benchmark join questions q1-q5: probe x against dims of
    //    small/medium/big cardinality, inner and left). x = events; the
    //    dim tables are derived from events via CTEs so Spark and DuckDB
    //    build identical inputs. Output is aggregated + totally ordered
    //    for the hash compare. Plan audit (Explain, sf0.1): ALL five
    //    broadcast the dim today — even j5's two-column self-join
    //    projection fits under the 10 MB autoBroadcast threshold at
    //    this SF. That is size-estimate-driven, not hinted: at cluster
    //    scale the same statistics push j2/j3 to shuffled joins and j5
    //    to SMJ on event_id, so the plans degrade to exactly the
    //    benchmark's intended shapes without any code change ──────────
    "h2o_j1" -> sql("""
      |WITH small AS (
      |  SELECT event_type, round(avg(value) + 1e-9, 4) AS v2
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, count(*) AS c, round(sum(e.value), 2) AS v1,
      |       round(sum(s.v2), 2) AS v2
      |FROM events e JOIN small s ON e.event_type = s.event_type
      |GROUP BY e.event_type ORDER BY e.event_type"""),

    "h2o_j2" -> sql("""
      |WITH medium AS (
      |  SELECT user_id, round(avg(value) + 1e-9, 4) AS v2
      |  FROM events GROUP BY user_id)
      |SELECT e.user_id % 10 AS ub, count(*) AS c,
      |       round(sum(e.value), 2) AS v1, round(sum(m.v2), 2) AS v2
      |FROM events e JOIN medium m ON e.user_id = m.user_id
      |GROUP BY e.user_id % 10 ORDER BY ub"""),

    "h2o_j3" -> sql("""
      |WITH medium AS (
      |  SELECT user_id, round(avg(value) + 1e-9, 4) AS v2
      |  FROM events WHERE user_id % 2 = 0 GROUP BY user_id)
      |SELECT e.user_id % 10 AS ub, count(*) AS c,
      |       count(m.user_id) AS matched,
      |       round(sum(e.value), 2) AS v1,
      |       round(sum(coalesce(m.v2, 0)), 2) AS v2
      |FROM events e LEFT JOIN medium m ON e.user_id = m.user_id
      |GROUP BY e.user_id % 10 ORDER BY ub"""),

    "h2o_j4" -> sql("""
      |WITH dim AS (
      |  SELECT event_type, user_id % 100 AS ub,
      |         round(avg(value) + 1e-9, 4) AS v2
      |  FROM events GROUP BY event_type, user_id % 100)
      |SELECT e.event_type, count(*) AS c, round(sum(e.value), 2) AS v1,
      |       round(sum(d.v2), 2) AS v2
      |FROM events e JOIN dim d
      |  ON e.event_type = d.event_type AND e.user_id % 100 = d.ub
      |GROUP BY e.event_type ORDER BY e.event_type"""),

    "h2o_j5" -> sql("""
      |WITH big AS (SELECT event_id, value AS v2 FROM events)
      |SELECT e.event_id % 10 AS b, count(*) AS c,
      |       round(sum(e.value), 2) AS v1, round(sum(bg.v2), 2) AS v2
      |FROM events e JOIN big bg ON e.event_id = bg.event_id
      |GROUP BY e.event_id % 10 ORDER BY b""")
  )
}
