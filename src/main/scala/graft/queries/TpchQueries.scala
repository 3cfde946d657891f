package graft.queries

import graft.{Engine, Q}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-derived workload, adapted to the driver testdata schema (no
  * partsupp table; no commit/receipt dates, ship modes, comments, phones —
  * predicates are re-targeted at columns that exist; values re-targeted at
  * the synthetic domains, e.g. nations are NATION_0..24, p_type is a single
  * word). Reference query corpus:
  * datafusion/sqllogictest/test_files/tpch/q1..q22.slt.part and
  * benchmarks/queries/.
  *
  * All plans are declarative DataFrame API → Catalyst gets predicate
  * pushdown, column pruning, join reordering and (with AQE) runtime
  * broadcast decisions for free. Broadcast policy (the 100 TB rule):
  * `broadcast()` hints are reserved for relations whose size is
  * SCALE-CONSTANT — nation/region (fixed 25/5 rows at any SF) and 1-row
  * aggregate sides (q15's max, q22's avg). Everything that grows with SF
  * (customer, part, supplier, orders slices) carries NO hint: at small SF
  * AQE broadcasts them anyway (they're under
  * spark.sql.autoBroadcastJoinThreshold), and at 100× the same plan
  * degrades gracefully to a shuffled join instead of dying on the 8 GB
  * broadcast limit / driver OOM that a *forced* hint would cause.
  * BroadcastPolicySpec pins both halves of this contract.
  */
object TpchQueries {
  private def ts(s: String) = lit(s).cast("timestamp")

  val defs: Map[String, Q] = Map(
    // ── Q1: scan → filter → partial/final hash aggregate → sort ──────────
    "tpch_q1" -> Q("""
      |SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2)       AS sum_qty,
      |       round(sum(l_extendedprice), 2)  AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 4)       AS avg_qty,
      |       round(avg(l_extendedprice), 4)  AS avg_price,
      |       round(avg(l_discount), 4)       AS avg_disc,
      |       count(*)                        AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ── Q3: 3-way join, group, top-k (TakeOrderedAndProject) ─────────────
    "tpch_q3" -> Q("""
      |SELECT l_orderkey,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       CAST(o_orderdate AS DATE) AS o_orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate  > TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""") { (s, d) =>
      val c = Engine.table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Engine.table(s, d, "orders")
        .filter(col("o_orderdate") < ts("1997-01-01"))
      val l = Engine.table(s, d, "lineitem")
        .filter(col("l_shipdate") > ts("1997-01-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ── Q4: correlated EXISTS → left-semi join ───────────────────────────
    "tpch_q4" -> Q("""
      |SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate <  TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      val o = Engine.table(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
      val l = Engine.table(s, d, "lineitem")
      // EXISTS as inner-join + distinct-count rather than a bare left-semi:
      // a left-semi makes Catalyst build a HashedRelation of the
      // column-pruned FACT table (BuildRight is the only broadcast-semi
      // shape), which is the wrong side at any scale. With the inner join
      // AQE is free to pick the build side by measured size: at bench SF
      // the 3-month orders slice broadcasts (lineitem streams through it);
      // past the threshold the same plan becomes a shuffled join on
      // orderkey instead of a forced over-limit broadcast. o_orderkey is
      // unique in orders so countDistinct ≡ semi + count.
      l.join(o, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(o("o_orderkey")).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // ── Q5: 6-way star join with broadcast dims ──────────────────────────
    "tpch_q5" -> Q("""
      |SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""") { (s, d) =>
      val c = Engine.table(s, d, "customer")
      val o = Engine.table(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      val l = Engine.table(s, d, "lineitem")
      val su = Engine.table(s, d, "supplier")
      val n = Engine.table(s, d, "nation")
      val r = Engine.table(s, d, "region").filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ── Q6: selective scan + global aggregate (pushdown showcase) ────────
    "tpch_q6" -> Q("""
      |SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24""") { (s, d) =>
      Engine.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.03, 0.05) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    },

    // ── Q7: self-joined dimension (nation × 2), year extraction ──────────
    "tpch_q7" -> Q("""
      |SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |             CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |             l_extendedprice * (1 - l_discount) AS volume
      |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |        AND c_nationkey = n2.n_nationkey
      |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""") { (s, d) =>
      val n1 = Engine.table(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Engine.table(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val l = Engine.table(s, d, "lineitem")
        .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31")))
      val o = Engine.table(s, d, "orders")
      val c = Engine.table(s, d, "customer")
      val su = Engine.table(s, d, "supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), c("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // ── Q8: market share — conditional aggregation over an 8-way join ────
    "tpch_q8" -> Q("""
      |SELECT o_year,
      |       round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
      |             / sum(volume), 4) AS mkt_share
      |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |             l_extendedprice * (1 - l_discount) AS volume,
      |             n2.n_name AS nation
      |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
      |        AND p_type = 'PROMO')
      |GROUP BY o_year ORDER BY o_year""") { (s, d) =>
      val p = Engine.table(s, d, "part").filter(col("p_type") === "PROMO")
      val su = Engine.table(s, d, "supplier")
      val l = Engine.table(s, d, "lineitem")
      val o = Engine.table(s, d, "orders")
      val c = Engine.table(s, d, "customer")
      val n1 = Engine.table(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_rk"))
      val n2 = Engine.table(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
      val r = Engine.table(s, d, "region").filter(col("r_name") === "AMERICA")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), c("c_nationkey") === col("n1_key"))
        .join(broadcast(r), col("n1_rk") === r("r_regionkey"))
        .join(broadcast(n2), su("s_nationkey") === col("n2_key"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
          col("nation"))
        .groupBy(col("o_year"))
        .agg(round(
          sum(when(col("nation") === "NATION_5", col("volume")).otherwise(0.0))
            / sum(col("volume")), 4).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // ── Q9: LIKE filter + multi-join profit rollup ───────────────────────
    "tpch_q9" -> Q("""
      |SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
      |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |             l_extendedprice * (1 - l_discount) AS amount
      |      FROM part, supplier, lineitem, orders, nation
      |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |        AND p_name LIKE '%red%')
      |GROUP BY nation, o_year ORDER BY nation, o_year DESC""") { (s, d) =>
      val p = Engine.table(s, d, "part").filter(col("p_name").like("%red%"))
      val l = Engine.table(s, d, "lineitem")
      val o = Engine.table(s, d, "orders")
      val su = Engine.table(s, d, "supplier")
      val n = Engine.table(s, d, "nation")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // ── Q10: returned items, group over wide key, top 20 ─────────────────
    "tpch_q10" -> Q("""
      |SELECT c_custkey, c_name,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""") { (s, d) =>
      val c = Engine.table(s, d, "customer")
      val o = Engine.table(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-10-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      val l = Engine.table(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val n = Engine.table(s, d, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ── Q12 (adapted): conditional counts by line status ─────────────────
    "tpch_q12" -> Q("""
      |SELECT l_linestatus,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus ORDER BY l_linestatus""") { (s, d) =>
      val o = Engine.table(s, d, "orders")
      val l = Engine.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // ── Q13: left outer join + double aggregation (count distribution) ───
    "tpch_q13" -> Q("""
      |SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""") { (s, d) =>
      val c = Engine.table(s, d, "customer")
      val o = Engine.table(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ── Q14: promo revenue percentage ────────────────────────────────────
    "tpch_q14" -> Q("""
      |SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |                              THEN l_extendedprice * (1 - l_discount)
      |                              ELSE 0 END)
      |             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate <  TIMESTAMP '1996-10-01'""") { (s, d) =>
      val l = Engine.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-09-01") &&
          col("l_shipdate") < ts("1996-10-01"))
      val p = Engine.table(s, d, "part")
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", vol).otherwise(0.0)) / sum(vol), 4)
          .as("promo_revenue"))
    },

    // ── Q15: CTE + scalar-subquery max (top supplier) ────────────────────
    "tpch_q15" -> Q("""
      |WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""") { (s, d) =>
      val rev = Engine.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
      val su = Engine.table(s, d, "supplier")
      su.join(rev, su("s_suppkey") === rev("supplier_no"))
        .join(broadcast(mx), col("total_revenue") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // ── Q16: suppliers per part attrs over DERIVED partsupp ─────────────
    // The spec query reads partsupp (4 rows per part — 80k at sf0.1).
    // Testdata has no partsupp parquet, and a materialized one can't be
    // oracle-referenced (the oracle SQL is static while sfDir varies),
    // so BOTH engines derive it inline with pure integer arithmetic
    // from the SAME part/supplier parquet: ps_suppkey =
    // (p_partkey·7 + j·13) mod |supplier| for j in 0..3 — portable,
    // hash-free, spec cardinality at every SF. This retires the r6-r10
    // lineitem adaptation whose 7.5× input volume (6M lineitem rows vs
    // 800k partsupp at SF1) kept the floor-adjusted ratio pinned as an
    // artifact (2.33 on the r10 driver). Spec literals adapted to the
    // testdata domains: Brand#3 (no Brand#45), p_type NOT LIKE
    // 'MEDIUM%' (types are single words), exclusion subquery on
    // s_acctbal < -500 (no s_comment column — same small-anti-set
    // shape as '%Customer%Complaints%').
    // Plan: the derived ps (fact) streams; the filtered part dimension
    // and the tiny exclusion set broadcast; countDistinct plans as two
    // codegen'd HashAggregates (partial dedup then count — no Expand;
    // the size(collect_set) alternative A/B'd at parity r6 but falls
    // out of whole-stage codegen). Final orderBy keeps the range
    // exchange — coalesce(1) A/B'd 1.6× worse r7.
    "tpch_q16" -> Q("""
      |WITH ps AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey * 7 + j.j * 13)
      |           % (SELECT count(*) FROM supplier) AS ps_suppkey
      |  FROM part, generate_series(0, 3) j(j))
      |SELECT p_brand, p_type, p_size,
      |       count(DISTINCT ps_suppkey) AS supplier_cnt
      |FROM ps, part
      |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#3'
      |  AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND ps_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < -500)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""") { (s, d) =>
      val scnt = Engine.table(s, d, "supplier").agg(count(lit(1)).as("scnt"))
      val ps = Engine.table(s, d, "part")
        .select(col("p_partkey").as("ps_partkey"))
        .crossJoin(broadcast(scnt))
        .select(col("ps_partkey"),
          explode(sequence(lit(0L), lit(3L))).as("j"), col("scnt"))
        .select(col("ps_partkey"),
          pmod(col("ps_partkey") * 7 + col("j") * 13, col("scnt"))
            .as("ps_suppkey"))
      val p = Engine.table(s, d, "part")
        .filter(col("p_brand") =!= "Brand#3" &&
          !col("p_type").like("MEDIUM%") &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      // no broadcast HINT on excl: supplier is SF-scaled, so the
      // size-conditional policy decides (BroadcastPolicySpec) — at any
      // real SF the acctbal filter keeps it under the auto threshold
      val excl = Engine.table(s, d, "supplier")
        .filter(col("s_acctbal") < -500)
        .select(col("s_suppkey"))
      ps.join(p, ps("ps_partkey") === p("p_partkey"))
        .join(excl, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // ── Q17: correlated scalar subquery (avg per part) ───────────────────
    "tpch_q17" -> Q("""
      |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#11'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""") { (s, d) =>
      val l = Engine.table(s, d, "lineitem")
      val p = Engine.table(s, d, "part").filter(col("p_brand") === "Brand#11")
      val avgQ = l.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_threshold"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(avgQ, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    },

    // ── Q18: HAVING over big aggregation + join back, top 100 ────────────
    "tpch_q18" -> Q("""
      |SELECT c_name, c_custkey, o_orderkey,
      |       CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, sum_qty
      |FROM customer, orders,
      |     (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(l_quantity) > 150) big
      |WHERE o_orderkey = big.l_orderkey AND c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""") { (s, d) =>
      val big = Engine.table(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("raw_qty"))
        .filter(col("raw_qty") > 150)
        .select(col("l_orderkey"), round(col("raw_qty"), 2).as("sum_qty"))
      val o = Engine.table(s, d, "orders")
      val c = Engine.table(s, d, "customer")
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ── Q19: disjunctive multi-attribute predicate ───────────────────────
    "tpch_q19" -> Q("""
      |SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND (
      |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |        AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |        AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 20 AND 30))""") { (s, d) =>
      val l = Engine.table(s, d, "lineitem")
      val p = Engine.table(s, d, "part")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    },

    // ── Q20 (adapted): IN subquery with HAVING → semi join ───────────────
    "tpch_q20" -> Q("""
      |SELECT s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem, part
      |  WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
      |ORDER BY s_name""") { (s, d) =>
      val p = Engine.table(s, d, "part").filter(col("p_name").like("red%"))
      val l = Engine.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
      val qualified = l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("tot_qty"))
        .filter(col("tot_qty") > 50)
        .select(col("l_suppkey"))
      Engine.table(s, d, "supplier")
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },

    // ── Q21 (adapted): EXISTS + NOT EXISTS (semi + anti joins) ───────────
    "tpch_q21" -> Q("""
      |SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""") { (s, d) =>
      // One-pass rewrite (r9): the textbook plan shuffles the FULL
      // lineitem three times (join + EXISTS semi + NOT-EXISTS anti, each
      // hashed on l_orderkey). Both correlated predicates are per-order
      // set facts, so compute them with window aggregates over ONE
      // lineitem⨝orders pass instead:
      //   EXISTS other-supplier        ⟺ |distinct suppliers of order| ≥ 2
      //   NOT EXISTS other LATE suppl. ⟺ late-supplier set = {own} (size 1
      //                                   on rows that are themselves late)
      // The window's partitionBy(l_orderkey) matches the join's hash
      // partitioning, so Catalyst plans zero extra exchanges for it —
      // lineitem crosses the wire once instead of three times (targeted
      // A/B at sf0.1: 1.05s → 0.82s median; the win compounds with SF
      // since the removed shuffles carried the fact table). collect_set
      // per order is bounded by suppliers-per-order (≤7), not row count.
      val su = Engine.table(s, d, "supplier")
      val o = Engine.table(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("l_orderkey"))
      Engine.table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL '90' DAY"))
        .withColumn("nsupp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("nlate", size(collect_set(
          when(col("is_late"), col("l_suppkey"))).over(w)))
        .filter(col("is_late") && col("nsupp") >= 2 && col("nlate") === 1)
        .join(su, col("l_suppkey") === su("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // ── Q22 (adapted): scalar subquery threshold + NOT EXISTS ────────────
    "tpch_q22" -> Q("""
      |SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      |FROM (SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode, c_acctbal
      |      FROM customer
      |      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                         WHERE c_acctbal > 0.0)
      |        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                        AND o_orderdate >= TIMESTAMP '2000-01-01'))
      |GROUP BY cntrycode ORDER BY cntrycode""") { (s, d) =>
      val c = Engine.table(s, d, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val o = Engine.table(s, d, "orders")
        .filter(col("o_orderdate") >= ts("2000-01-01")).select(col("o_custkey"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy((col("c_custkey") % 7).cast("long").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("cntrycode"))
    }
  )
}
