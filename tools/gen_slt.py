#!/usr/bin/env python
"""Generate the SLT-style golden corpus (src/test/resources/slt/*.slt).

Each case is ONE portable ANSI SQL text that runs identically on DuckDB
and Spark SQL; DuckDB computes the golden here, graft.SltSpec replays
the same text through spark.sql and compares formatted values. This is
the sqllogictest shape the reference uses as its test backbone
(datafusion/sqllogictest/test_files/*.slt) with DuckDB in the
Postgres-oracle role.

A case is either ONE portable SQL string (runs verbatim on both
engines) or a (spark_sql, duck_sql) pair for surfaces where the
dialects spell the same semantics differently (struct/map/array
constructors, date arithmetic, day-of-week conventions). Pairs are
emitted with a `--duck--` section so the .slt file records both
texts; SltSpec executes only the Spark text against the DuckDB
golden.

Corpus rules (enforced by construction, mirrored in SltSpec's formatter):
  - every query has a total ORDER BY (ordered compare, no rowsort);
  - float output is round()ed in SQL and formatted %.4f;
  - integer-valued aggregates are CAST to BIGINT (DuckDB widens sums);
  - timestamps never appear raw in output — cast to DATE or epoch;
  - NULL prints as "NULL"; booleans as true/false; values tab-joined.

Usage: python tools/gen_slt.py [sfDir]   (default /root/testdata/sf0.001)
"""
import sys
import datetime
import decimal

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = "src/test/resources/slt"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

CORPUS = {
    # ── scalar: strings ──────────────────────────────────────────────
    "scalar_string": [
        """SELECT n_name, upper(n_name) AS u, lower(n_name) AS l,
                  length(n_name) AS len
           FROM nation ORDER BY n_name LIMIT 10""",
        """SELECT n_name, substr(n_name, 2, 3) AS mid,
                  substr(n_name, 1, 1) || '-' || n_name AS tagged
           FROM nation ORDER BY n_name LIMIT 10""",
        """SELECT n_name, replace(n_name, 'A', '@') AS repl,
                  trim('  ' || n_name || ' ') AS trimmed
           FROM nation WHERE n_name LIKE '%A%' ORDER BY n_name LIMIT 8""",
        """SELECT n_name, lpad(n_name, 12, '.') AS pl,
                  rpad(n_name, 12, '.') AS pr
           FROM nation WHERE length(n_name) <= 12 ORDER BY n_name LIMIT 8""",
        """SELECT c_name, position('0' IN c_name) AS p0
           FROM customer ORDER BY c_name LIMIT 10""",
        """SELECT n_name, concat(n_name, '/', n_regionkey) AS ck
           FROM nation ORDER BY n_name LIMIT 10""",
        """SELECT DISTINCT p_type FROM part
           WHERE p_type LIKE 'PROMO%' ORDER BY p_type LIMIT 10""",
        """SELECT n_name, reverse(n_name) AS rev,
                  CASE WHEN n_name < 'J' THEN 'early' ELSE 'late' END AS half
           FROM nation ORDER BY n_name LIMIT 10""",
        """SELECT r_name, repeat(r_name, 2) AS dbl FROM region ORDER BY r_name""",
        """SELECT n_name, left(n_name, 3) AS l3, right(n_name, 3) AS r3
           FROM nation ORDER BY n_name LIMIT 10""",
    ],
    # ── scalar: math ─────────────────────────────────────────────────
    "scalar_math": [
        """SELECT l_linenumber, abs(-l_linenumber) AS a,
                  CAST(power(l_linenumber, 2) AS BIGINT) AS sq
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        """SELECT s_suppkey, round(s_acctbal, 1) AS b1,
                  CAST(floor(s_acctbal) AS BIGINT) AS fl,
                  CAST(ceil(s_acctbal) AS BIGINT) AS ce
           FROM supplier ORDER BY s_suppkey LIMIT 10""",
        """SELECT o_orderkey, mod(o_orderkey, 7) AS m7,
                  CAST(sign(o_totalprice - 100000) AS BIGINT) AS sg
           FROM orders ORDER BY o_orderkey LIMIT 10""",
        """SELECT round(sqrt(CAST(o_orderkey AS DOUBLE)), 4) AS rt
           FROM orders ORDER BY o_orderkey LIMIT 10""",
        """SELECT round(ln(CAST(c_custkey AS DOUBLE)), 4) AS lnv,
                  round(exp(1.0) * c_custkey, 4) AS ev
           FROM customer WHERE c_custkey >= 1 ORDER BY c_custkey LIMIT 8""",
        """SELECT l_orderkey, l_linenumber,
                  round(l_extendedprice * (1 - l_discount), 4) AS net
           FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10""",
        """SELECT CAST(greatest(1, 5, 3) AS BIGINT) AS g,
                  CAST(least(1, 5, 3) AS BIGINT) AS l,
                  round(pi(), 4) AS p""",
        """SELECT o_orderkey, CAST(o_orderkey % 10 AS BIGINT) AS last_digit
           FROM orders WHERE o_orderkey BETWEEN 1 AND 100
           ORDER BY o_orderkey LIMIT 12""",
    ],
    # ── scalar: datetime ─────────────────────────────────────────────
    "scalar_datetime": [
        """SELECT o_orderkey, CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
                  CAST(extract(month FROM o_orderdate) AS BIGINT) AS m,
                  CAST(extract(day FROM o_orderdate) AS BIGINT) AS d
           FROM orders ORDER BY o_orderkey LIMIT 10""",
        """SELECT o_orderkey, CAST(o_orderdate + INTERVAL '30' DAY AS DATE) AS due
           FROM orders ORDER BY o_orderkey LIMIT 10""",
        """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY extract(year FROM o_orderdate) ORDER BY y""",
        """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
                  CASE WHEN o_orderdate >= DATE '1995-01-01' THEN 'new'
                       ELSE 'old' END AS era
           FROM orders ORDER BY o_orderkey LIMIT 10""",
        """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day
           FROM lineitem WHERE l_shipdate >= DATE '1998-11-01'
           ORDER BY l_orderkey, l_linenumber, ship_day LIMIT 10""",
        """SELECT CAST(date_part('quarter', o_orderdate) AS BIGINT) AS q,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders WHERE extract(year FROM o_orderdate) = 1995
           GROUP BY date_part('quarter', o_orderdate) ORDER BY q""",
        """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders WHERE extract(year FROM o_orderdate) = 1997
           GROUP BY date_trunc('month', o_orderdate) ORDER BY m""",
        """SELECT CAST(date_trunc('year', l_shipdate) AS DATE) AS y,
                  round(sum(l_quantity), 4) AS qty
           FROM lineitem GROUP BY date_trunc('year', l_shipdate) ORDER BY y""",
        """SELECT o_orderkey,
                  CAST(o_orderdate + INTERVAL '1' MONTH AS DATE) AS plus_m,
                  CAST(o_orderdate - INTERVAL '7' DAY AS DATE) AS minus_w
           FROM orders ORDER BY o_orderkey LIMIT 10""",
        """SELECT CAST(greatest(DATE '1995-06-15',
                                CAST(min(o_orderdate) AS DATE)) AS DATE) AS g,
                  CAST(least(DATE '1995-06-15',
                             CAST(max(o_orderdate) AS DATE)) AS DATE) AS l
           FROM orders""",
        """SELECT o_orderkey FROM orders
           WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
           ORDER BY o_orderkey LIMIT 5""",
        """SELECT CAST(extract(hour FROM ts) AS BIGINT) AS h,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY extract(hour FROM ts) ORDER BY h LIMIT 24""",
    ],
    # ── aggregates ───────────────────────────────────────────────────
    "agg": [
        """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(l_quantity) AS BIGINT) AS qty,
                  round(avg(l_extendedprice), 4) AS avg_price
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS nc
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT l_linestatus,
                  round(min(l_discount), 4) AS mind,
                  round(max(l_discount), 4) AS maxd
           FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
        """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n
           FROM nation GROUP BY n_regionkey
           HAVING count(*) >= 5 ORDER BY n_regionkey""",
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                  CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS big
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        """SELECT round(stddev_samp(s_acctbal), 4) AS sd,
                  round(var_samp(s_acctbal), 4) AS vr
           FROM supplier""",
        """SELECT c_mktsegment, round(sum(c_acctbal), 4) AS bal
           FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem WHERE 1 = 0""",
        """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",
        """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS u,
                  round(sum(value), 4) AS v
           FROM events GROUP BY event_type ORDER BY event_type""",
    ],
    # ── joins + set ops ──────────────────────────────────────────────
    "join_setop": [
        """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
           ORDER BY n_name LIMIT 12""",
        """SELECT r_name, CAST(count(n_nationkey) AS BIGINT) AS n
           FROM region LEFT JOIN nation ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name""",
        """SELECT s_name, n_name FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name IN ('FRANCE', 'GERMANY') ORDER BY s_name LIMIT 10""",
        """SELECT c_custkey, c_name FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_totalprice > 300000)
           ORDER BY c_custkey LIMIT 10""",
        """SELECT c_custkey FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           ORDER BY c_custkey LIMIT 10""",
        """SELECT r1.r_name AS a, r2.r_name AS b
           FROM region r1 CROSS JOIN region r2
           WHERE r1.r_regionkey < r2.r_regionkey
           ORDER BY a, b LIMIT 12""",
        """SELECT n_regionkey AS k FROM nation WHERE n_regionkey < 2
           UNION SELECT r_regionkey FROM region WHERE r_regionkey > 3
           ORDER BY k""",
        """SELECT n_regionkey AS k FROM nation WHERE n_regionkey < 2
           UNION ALL SELECT r_regionkey FROM region WHERE r_regionkey < 2
           ORDER BY k""",
        """SELECT n_regionkey AS k FROM nation
           INTERSECT SELECT r_regionkey FROM region ORDER BY k""",
        """SELECT r_regionkey AS k FROM region
           EXCEPT SELECT n_regionkey FROM nation WHERE n_regionkey < 3
           ORDER BY k""",
        """SELECT o_orderkey, o_totalprice FROM orders
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 5 OFFSET 3""",
        """SELECT n_name, s_name FROM nation
           FULL JOIN supplier ON s_nationkey = n_nationkey AND s_suppkey < 3
           ORDER BY n_name NULLS FIRST, s_name NULLS FIRST LIMIT 12""",
    ],
    # ── window functions ─────────────────────────────────────────────
    "window": [
        """SELECT n_regionkey, n_name,
                  CAST(row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name)
                       AS BIGINT) AS rn
           FROM nation ORDER BY n_regionkey, n_name LIMIT 15""",
        """SELECT s_suppkey, s_nationkey,
                  CAST(rank() OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS rk,
                  CAST(dense_rank() OVER (ORDER BY s_nationkey) AS BIGINT) AS drk
           FROM supplier ORDER BY s_suppkey LIMIT 10""",
        """SELECT o_custkey, o_orderkey,
                  CAST(lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                       AS BIGINT) AS prev_o,
                  CAST(lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                       AS BIGINT) AS next_o
           FROM orders WHERE o_custkey <= 5 ORDER BY o_custkey, o_orderkey LIMIT 15""",
        """SELECT l_orderkey, l_linenumber,
                  round(sum(l_quantity) OVER (PARTITION BY l_orderkey
                    ORDER BY l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW), 4) AS running_qty
           FROM lineitem WHERE l_orderkey <= 7
           ORDER BY l_orderkey, l_linenumber LIMIT 15""",
        """SELECT s_suppkey,
                  round(avg(s_acctbal) OVER (PARTITION BY s_nationkey), 4) AS nation_avg
           FROM supplier ORDER BY s_suppkey LIMIT 10""",
        """SELECT n_name, n_regionkey,
                  CAST(ntile(3) OVER (ORDER BY n_name) AS BIGINT) AS bucket
           FROM nation ORDER BY n_name LIMIT 15""",
        """SELECT o_orderkey, first_value(o_orderpriority) OVER w AS first_p,
                  last_value(o_orderpriority) OVER w AS last_p
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           ORDER BY o_orderkey LIMIT 10""",
    ],
    # ── subqueries + CTEs ────────────────────────────────────────────
    "subquery": [
        """SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        """SELECT n_name FROM nation
           WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                 WHERE r_name IN ('ASIA', 'EUROPE'))
           ORDER BY n_name LIMIT 12""",
        """SELECT c_custkey, c_acctbal FROM customer c
           WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                              WHERE c2.c_mktsegment = c.c_mktsegment) * 1.7
           ORDER BY c_custkey LIMIT 10""",
        """WITH big AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
                        FROM orders WHERE o_totalprice > 200000
                        GROUP BY o_custkey)
           SELECT c_name, big.n FROM customer JOIN big ON o_custkey = c_custkey
           WHERE big.n >= 2 ORDER BY big.n DESC, c_name LIMIT 10""",
        """WITH r AS (SELECT r_regionkey, r_name FROM region),
                n AS (SELECT n_regionkey, CAST(count(*) AS BIGINT) AS cnt
                      FROM nation GROUP BY n_regionkey)
           SELECT r.r_name, n.cnt FROM r JOIN n ON r.r_regionkey = n.n_regionkey
           ORDER BY r.r_name""",
        """SELECT p_partkey, p_name FROM part
           WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity = 50)
           ORDER BY p_partkey LIMIT 10""",
        """SELECT x.o_orderpriority, x.n FROM (
             SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
             FROM orders GROUP BY o_orderpriority) x
           WHERE x.n > 100 ORDER BY x.o_orderpriority""",
    ],
    # ── bit ops + hex/binary surfaces ────────────────────────────────
    "bits_binary": [
        """SELECT n_nationkey, n_nationkey & 12 AS band, n_nationkey | 3 AS bor,
                  (n_nationkey | 255) - (n_nationkey & 255) AS bxor
           FROM nation ORDER BY n_nationkey LIMIT 12""",
        """SELECT n_nationkey, CAST(n_nationkey << 3 AS BIGINT) AS shl,
                  CAST(n_nationkey >> 1 AS BIGINT) AS shr
           FROM nation ORDER BY n_nationkey LIMIT 12""",
        """SELECT o_orderkey, bit_count(o_orderkey) AS pop
           FROM orders ORDER BY o_orderkey LIMIT 12""",
        """SELECT n_name, md5(n_name) AS h FROM nation
           ORDER BY n_name LIMIT 8""",
        """SELECT l_returnflag,
                  CAST(bit_and(l_linenumber) AS BIGINT) AS ba,
                  CAST(bit_or(l_linenumber) AS BIGINT) AS bo,
                  CAST(bit_xor(l_linenumber) AS BIGINT) AS bx
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ],
    # ── predicates / filter shapes ───────────────────────────────────
    "predicates": [
        """SELECT p_partkey, p_type FROM part
           WHERE p_size IN (5, 10, 15) AND p_type LIKE '%BRASS'
           ORDER BY p_partkey LIMIT 10""",
        """SELECT o_orderkey FROM orders
           WHERE o_totalprice BETWEEN 100000 AND 100500
           ORDER BY o_orderkey LIMIT 10""",
        """SELECT c_custkey, c_mktsegment FROM customer
           WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY')
             AND c_custkey % 50 = 0
           ORDER BY c_custkey LIMIT 10""",
        """SELECT l_orderkey, l_linenumber FROM lineitem
           WHERE (l_quantity > 45 AND l_discount < 0.02)
              OR (l_quantity < 2 AND l_discount > 0.08)
           ORDER BY l_orderkey, l_linenumber LIMIT 12""",
        """SELECT p_partkey, p_name FROM part
           WHERE p_name LIKE '%green%' AND p_name NOT LIKE 'green%'
           ORDER BY p_partkey LIMIT 10""",
        """SELECT count(*) AS n FROM lineitem
           WHERE l_shipdate >= DATE '1994-01-01'
             AND l_shipdate < DATE '1995-01-01'
             AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
        """SELECT s_suppkey FROM supplier
           WHERE CASE WHEN s_nationkey < 10 THEN s_acctbal > 0
                      ELSE s_acctbal < 5000 END
           ORDER BY s_suppkey LIMIT 12""",
        """SELECT o_orderkey FROM orders
           WHERE o_totalprice NOT BETWEEN 10000 AND 400000
           ORDER BY o_orderkey LIMIT 10""",
        """SELECT o_orderkey FROM orders
           WHERE o_orderdate IN (DATE '1995-01-01', DATE '1996-01-01',
                                 DATE '1997-01-01')
           ORDER BY o_orderkey LIMIT 10""",
        """SELECT n_name FROM nation
           WHERE NOT (n_regionkey = 0 OR (n_regionkey = 1
                      AND n_name < 'C'))
           ORDER BY n_name LIMIT 10""",
        """SELECT p_partkey FROM part
           WHERE p_name LIKE '_____%' AND p_name NOT LIKE '%s'
           ORDER BY p_partkey LIMIT 10""",
        """SELECT c_custkey FROM customer
           WHERE coalesce(nullif(c_mktsegment, 'BUILDING'),
                          'OTHER') = 'OTHER'
           ORDER BY c_custkey LIMIT 10""",
        """SELECT l_orderkey, l_linenumber FROM lineitem
           WHERE l_quantity * (1 - l_discount) > 45
             AND l_tax < l_discount
           ORDER BY l_orderkey, l_linenumber LIMIT 10""",
        """SELECT o_orderkey FROM orders
           WHERE (o_orderkey & 1) = 1 AND o_orderpriority > '3'
           ORDER BY o_orderkey LIMIT 10""",
    ],
    # ── grouping sets / rollup / cube ────────────────────────────────
    "grouping": [
        """SELECT coalesce(l_returnflag, '<all>') AS rf,
                  coalesce(l_linestatus, '<all>') AS ls,
                  CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           ORDER BY rf, ls""",
        """SELECT coalesce(l_returnflag, '<all>') AS rf,
                  coalesce(l_linestatus, '<all>') AS ls,
                  CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           ORDER BY rf, ls""",
        """SELECT coalesce(l_returnflag, '<rf>') AS rf,
                  coalesce(l_linestatus, '<ls>') AS ls,
                  CAST(count(*) AS BIGINT) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
           ORDER BY rf, ls""",
        """SELECT coalesce(l_returnflag, '<all>') AS rf,
                  CAST(grouping(l_returnflag) AS BIGINT) AS g,
                  CAST(sum(l_quantity) AS BIGINT) AS qty
           FROM lineitem GROUP BY ROLLUP (l_returnflag)
           ORDER BY rf""",
    ],
    # ── null semantics + sorting ─────────────────────────────────────
    "null_sort": [
        """SELECT s_name, s_acctbal < 0 AS overdrawn,
                  nullif(s_nationkey, 0) IS NULL AS nation_zero
           FROM supplier ORDER BY s_name LIMIT 8""",
        """SELECT coalesce(NULL, 'x') AS a, nullif('y', 'y') AS b,
                  nullif('y', 'z') AS c""",
        """SELECT c_custkey,
                  CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal
           FROM customer ORDER BY bal DESC NULLS LAST, c_custkey LIMIT 10""",
        """SELECT c_custkey,
                  CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal
           FROM customer ORDER BY bal ASC NULLS FIRST, c_custkey LIMIT 10""",
        """SELECT CAST(count(*) AS BIGINT) AS total,
                  CAST(count(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT) AS neg
           FROM customer""",
        """SELECT NULL = NULL IS NULL AS eq_null_is_null,
                  NULL IS DISTINCT FROM 1 AS ndf""",
    ],
    # ── arrays: the portable slice of the two engines' list surfaces
    #    (split is the shared constructor; filter the shared HOF;
    #    array_sort pins element order — DuckDB's array_distinct and
    #    array_agg make no order promise) ────────────────────────────────
    "arrays": [
        """SELECT split('a,b,c', ',') AS parts""",
        """SELECT split('one', ',') AS single, split('x,,y', ',') AS with_empty""",
        """SELECT array_contains(split('a,b', ','), 'b') AS has_b,
                  array_contains(split('a,b', ','), 'z') AS has_z""",
        """SELECT array_position(split('a,b,c', ','), 'c') AS p3,
                  CAST(array_position(split('a,b', ','), 'z') AS BIGINT) AS missing""",
        """SELECT array_sort(split('pear,apple,fig', ',')) AS sorted_parts""",
        """SELECT array_sort(array_distinct(split('b,a,b,a', ','))) AS dedup""",
        """SELECT filter(split('a,bb,ccc,dd', ','), x -> length(x) = 2) AS len2""",
        """SELECT filter(split('5,12,3,44', ','), x -> length(x) > 1) AS twodigit""",
        """SELECT flatten(array_agg(parts)) IS NOT NULL AS ok,
                  CAST(count(*) AS BIGINT) AS n
           FROM (SELECT split(r_name, 'R') AS parts FROM region) t""",
        """SELECT array_sort(array_agg(DISTINCT n_regionkey)) AS rks FROM nation""",
        """SELECT array_sort(array_agg(DISTINCT r_name)) AS names FROM region""",
        """SELECT n_regionkey, array_sort(array_agg(n_name)) AS members
           FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
        """SELECT array_sort(array_agg(DISTINCT o_orderstatus)) AS statuses
           FROM orders""",
        """SELECT array_contains(array_agg(n_name), 'CHINA') AS has_china
           FROM nation""",
        """SELECT array_sort(filter(array_agg(DISTINCT n_nationkey),
                                    x -> x % 5 = 0)) AS div5
           FROM nation""",
        """SELECT array_sort(split(upper(r_name), 'A')) AS pieces
           FROM region ORDER BY r_name""",
    ],
    # ── casts + try_cast: conversion edges both engines agree on
    #    (float→int CAST is BANNED here: DuckDB rounds, Spark truncates) ──
    "casts_try": [
        """SELECT CAST(42 AS VARCHAR(10)) AS s, CAST('42' AS INTEGER) AS i,
                  CAST('42' AS BIGINT) AS l""",
        """SELECT CAST('+5' AS INTEGER) AS plus, CAST('-5' AS INTEGER) AS minus""",
        """SELECT try_cast('abc' AS INTEGER) AS bad_int,
                  try_cast('' AS INTEGER) AS empty_int""",
        """SELECT try_cast('  5  ' AS INTEGER) AS padded""",
        """SELECT try_cast('99999999999999999999' AS BIGINT) AS too_big""",
        """SELECT try_cast(40000 AS SMALLINT) AS ovf_small,
                  try_cast(300 AS TINYINT) AS ovf_tiny""",
        """SELECT CAST(32767 AS SMALLINT) AS max_small,
                  CAST(-32768 AS SMALLINT) AS min_small""",
        """SELECT CAST(127 AS TINYINT) AS max_tiny,
                  CAST(-128 AS TINYINT) AS min_tiny""",
        """SELECT CAST(9223372036854775807 AS BIGINT) AS max_long,
                  CAST(-9223372036854775808 AS BIGINT) AS min_long""",
        """SELECT try_cast('2020-13-40' AS DATE) AS bad_date,
                  CAST('2020-02-29' AS DATE) AS leap""",
        """SELECT try_cast('not-a-date' AS DATE) AS nd""",
        """SELECT CAST(true AS INTEGER) AS t1, CAST(false AS INTEGER) AS f0""",
        """SELECT CAST('true' AS BOOLEAN) AS bt, CAST('false' AS BOOLEAN) AS bf,
                  CAST(0 AS BOOLEAN) AS zero, CAST(3 AS BOOLEAN) AS three""",
        """SELECT CAST(CAST('2020-06-15' AS DATE) AS VARCHAR(10)) AS iso""",
        """SELECT round(CAST('1.5' AS DOUBLE), 4) AS d,
                  round(CAST('-0.25' AS DOUBLE), 4) AS neg""",
        """SELECT try_cast('1.5.5' AS DOUBLE) AS malformed""",
        """SELECT CAST(CAST(42 AS BIGINT) AS INTEGER) AS narrow_ok,
                  try_cast(CAST(3000000000 AS BIGINT) AS INTEGER) AS narrow_bad""",
        """SELECT isnan(CAST('NaN' AS DOUBLE)) AS nan_is_nan,
                  CAST('Infinity' AS DOUBLE) > 1e308 AS inf_big""",
        """SELECT CAST(n_nationkey AS VARCHAR(5)) AS ks FROM nation
           WHERE n_nationkey < 5 ORDER BY n_nationkey""",
        """SELECT o_orderkey, try_cast(o_orderstatus AS INTEGER) AS status_num
           FROM orders ORDER BY o_orderkey LIMIT 5""",
        """SELECT CAST(CAST(1 AS BOOLEAN) AS VARCHAR(5)) AS bool_str""",
        """SELECT try_cast(NULL AS INTEGER) AS null_in,
                  CAST(NULL AS VARCHAR(5)) IS NULL AS null_out""",
    ],
    # ── three-valued logic + NULL propagation ─────────────────────────
    "null_logic": [
        """SELECT (NULL AND false) AS af, (NULL AND true) AS at,
                  (NULL OR true) AS ot, (NULL OR false) AS of""",
        """SELECT NOT NULL AS nn""",
        """SELECT 1 IN (2, NULL) AS in_null, 2 IN (2, NULL) AS in_hit,
                  1 NOT IN (2, NULL) AS notin_null""",
        """SELECT NULL BETWEEN 1 AND 2 AS btw,
                  1 BETWEEN NULL AND 2 AS btw_lo""",
        """SELECT 1 IS DISTINCT FROM NULL AS d1,
                  NULL IS NOT DISTINCT FROM NULL AS d2,
                  1 IS NOT DISTINCT FROM 1 AS d3""",
        """SELECT NULL = NULL AS eq, NULL <> NULL AS ne,
                  NULL IS NULL AS isn""",
        """SELECT coalesce(NULL, NULL) AS cn,
                  CAST(coalesce(NULL, 5, 3) AS BIGINT) AS c5""",
        """SELECT nullif(1, 1) AS same, CAST(nullif(2, 1) AS BIGINT) AS diff""",
        """SELECT CAST(ifnull(NULL, 7) AS BIGINT) AS i7,
                  CAST(ifnull(3, 7) AS BIGINT) AS i3""",
        """SELECT CASE WHEN 1 = 2 THEN 'x' END AS no_else,
                  CASE NULL WHEN NULL THEN 'eq' ELSE 'ne' END AS null_case""",
        """SELECT CAST(greatest(1, NULL, 3) AS BIGINT) AS g,
                  least(CAST(NULL AS INTEGER), NULL) AS l""",
        """SELECT NULL + 1 AS add_null, NULL || 'x' AS cat_null""",
        """SELECT length(CAST(NULL AS VARCHAR(5))) AS len_null,
                  upper(CAST(NULL AS VARCHAR(5))) AS up_null""",
        """SELECT abs(CAST(NULL AS INTEGER)) AS abs_null""",
        """SELECT x, x IS NULL AS isn FROM (VALUES (1), (NULL), (3)) t(x)
           ORDER BY x NULLS FIRST""",
        """SELECT x + 1 AS y FROM (VALUES (CAST(NULL AS INTEGER)), (2)) t(x)
           ORDER BY y NULLS FIRST""",
        """SELECT x, count(*) AS n FROM (VALUES (NULL), (NULL), (1)) t(x)
           GROUP BY x ORDER BY x NULLS FIRST""",
        """SELECT CAST(count(x) AS BIGINT) AS cx,
                  CAST(count(*) AS BIGINT) AS call,
                  CAST(count(DISTINCT x) AS BIGINT) AS cd
           FROM (VALUES (1), (NULL), (1)) t(x)""",
        """SELECT CAST(sum(x) AS BIGINT) AS s, min(x) AS mn, max(x) AS mx
           FROM (VALUES (CAST(NULL AS INTEGER)), (NULL)) t(x)""",
        """SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
           FROM (VALUES (1)) t(x) WHERE x > 100""",
        """SELECT EXISTS (SELECT 1 WHERE false) AS e""",
        """SELECT x FROM (VALUES (1), (2)) t(x)
           WHERE x NOT IN (SELECT 3 WHERE false) ORDER BY x""",
        """SELECT NULL = '' AS ne, '' = '' AS ee, length('') AS lz""",
        """SELECT c_name FROM customer
           WHERE c_acctbal IS NOT NULL AND c_acctbal < -900
           ORDER BY c_name LIMIT 5""",
        """SELECT x / 2.0 AS h FROM (VALUES (CAST(NULL AS INTEGER)), (4)) t(x)
           ORDER BY h NULLS FIRST""",
    ],
    # ── string function breadth 2 ─────────────────────────────────────
    "string_fns2": [
        """SELECT instr('hello world', 'o') AS first_o,
                  instr('hello', 'z') AS missing""",
        """SELECT split_part('a,b,c', ',', 1) AS p1,
                  split_part('a,b,c', ',', 3) AS p3""",
        """SELECT translate('abcabc', 'ab', 'xy') AS tr""",
        """SELECT ascii('A') AS a, ascii('z') AS z, chr(66) AS b""",
        """SELECT contains('haystack', 'st') AS hit,
                  contains('haystack', 'zz') AS miss""",
        """SELECT md5('') AS empty_hash, md5('abc') AS abc_hash""",
        """SELECT levenshtein('kitten', 'sitting') AS lev,
                  levenshtein('', 'ab') AS lev_empty""",
        """SELECT position('l' IN 'hello') AS p,
                  position('z' IN 'hello') AS zero""",
        """SELECT concat_ws('-', 'a', NULL, 'b') AS skip_null,
                  concat_ws('/', 'x') AS single""",
        """SELECT repeat('ab', 0) AS zero, repeat('ab', 3) AS thrice""",
        """SELECT substr('hello', -3, 2) AS neg_start,
                  substr('hello', 2) AS tail""",
        """SELECT lpad('hi', 5, '*') AS padded, lpad('hello', 3, '*') AS cut""",
        """SELECT trim('  x  ') AS t, ltrim('  x') AS l, rtrim('x  ') AS r""",
        """SELECT upper('mIxEd') AS u, lower('MiXeD') AS lo""",
        """SELECT reverse('abc') AS rev, reverse('') AS rev_empty""",
        """SELECT 'ABC' ILIKE 'abc' AS ci, 'ABC' LIKE 'abc' AS cs""",
        """SELECT 'abc' LIKE 'a_c' AS underscore,
                  'a_c' LIKE 'a!_c' ESCAPE '!' AS escaped_lit,
                  'abc' LIKE 'a!_c' ESCAPE '!' AS escaped_no,
                  'abc' LIKE 'ab%' AS prefix""",
        """SELECT printf('%d|%s', 42, 'x') AS f""",
        """SELECT hex(255) AS ff, hex(0) AS zero""",
        """SELECT c_name, instr(c_name, '0') AS i0 FROM customer
           ORDER BY c_name LIMIT 8""",
        """SELECT p_name, split_part(p_name, ' ', 1) AS first_word
           FROM part ORDER BY p_partkey LIMIT 8""",
        """SELECT n_name, translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels
           FROM nation ORDER BY n_name LIMIT 8""",
        """SELECT s_name, md5(s_name) AS h FROM supplier
           ORDER BY s_name LIMIT 5""",
        """SELECT r_name, levenshtein(r_name, 'EUROPE') AS d FROM region
           ORDER BY r_name""",
        """SELECT o_orderpriority, split_part(o_orderpriority, '-', 1) AS num
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    ],
    # ── math breadth 2: trig/log/rounding edges ───────────────────────
    "math_fns2": [
        """SELECT round(sin(0.0), 4) AS s0, round(cos(0.0), 4) AS c0,
                  round(tan(0.0), 4) AS t0""",
        """SELECT round(asin(1.0), 4) AS a1, round(acos(1.0), 4) AS ac1,
                  round(atan(1.0), 4) AS at1""",
        """SELECT round(atan2(1.0, 2.0), 4) AS a12,
                  round(atan2(-1.0, -2.0), 4) AS neg""",
        """SELECT round(degrees(pi()), 4) AS deg,
                  round(radians(180.0), 4) AS rad""",
        """SELECT round(log2(8.0), 4) AS l2, round(log10(1000.0), 4) AS l10,
                  round(log(2.0, 32.0), 4) AS lb""",
        """SELECT round(cbrt(27.0), 4) AS c27, round(cbrt(-8.0), 4) AS cneg""",
        """SELECT CAST(factorial(0) AS BIGINT) AS f0,
                  CAST(factorial(5) AS BIGINT) AS f5,
                  CAST(factorial(20) AS BIGINT) AS f20""",
        """SELECT round(power(2.0, -2), 4) AS p_neg,
                  round(power(0.0, 0), 4) AS p00""",
        """SELECT round(exp(0.0), 4) AS e0, round(ln(1.0), 4) AS l1""",
        """SELECT CAST(sign(-0.5) AS BIGINT) AS sn,
                  CAST(sign(0.0) AS BIGINT) AS sz,
                  CAST(sign(2.5) AS BIGINT) AS sp""",
        """SELECT abs(-0.0) = 0.0 AS zero_eq,
                  round(abs(-2.5), 4) AS a25""",
        """SELECT CAST((-7) % 3 AS BIGINT) AS m1,
                  CAST(7 % (-3) AS BIGINT) AS m2,
                  CAST(mod(-7, 3) AS BIGINT) AS m3""",
        """SELECT round(7 / 2, 4) AS div_frac""",
        """SELECT CAST(bit_count(7) AS BIGINT) AS b7,
                  CAST(bit_count(0) AS BIGINT) AS b0""",
        """SELECT round(sqrt(2.0), 4) AS r2, round(sqrt(0.0), 4) AS r0""",
        """SELECT round(floor(-1.5), 4) AS fneg, round(ceil(-1.5), 4) AS cneg,
                  round(floor(1.5), 4) AS fpos, round(ceil(1.5), 4) AS cpos""",
        """SELECT round(round(2.675, 2), 4) AS r_binary_edge""",
        """SELECT l_linenumber, round(log10(CAST(l_quantity AS DOUBLE)), 4) AS lq
           FROM lineitem WHERE l_orderkey = 3 AND l_quantity > 0
           ORDER BY l_linenumber""",
        """SELECT CAST(greatest(-1, -2, -3) AS BIGINT) AS g,
                  CAST(least(-1, -2, -3) AS BIGINT) AS l""",
        """SELECT round(pi() * pi(), 4) AS pi2""",
    ],
    # ── datetime breadth 2 ────────────────────────────────────────────
    "datetime2": [
        """SELECT make_date(2020, 2, 29) AS leap,
                  make_date(1999, 12, 31) AS y2k_eve""",
        """SELECT CAST(month(DATE '2020-05-10') AS BIGINT) AS m,
                  CAST(quarter(DATE '2020-05-10') AS BIGINT) AS q,
                  CAST(year(DATE '2020-05-10') AS BIGINT) AS y,
                  CAST(day(DATE '2020-05-10') AS BIGINT) AS d""",
        """SELECT last_day(DATE '2020-02-10') AS feb_leap,
                  last_day(DATE '2021-02-10') AS feb_flat,
                  last_day(DATE '2020-12-05') AS dec""",
        """SELECT CAST(weekofyear(DATE '2020-02-10') AS BIGINT) AS w7,
                  CAST(weekofyear(DATE '2021-01-01') AS BIGINT) AS wny""",
        """SELECT CAST(DATE '2020-01-31' + INTERVAL '1' MONTH AS DATE) AS feb_clamp""",
        """SELECT CAST(DATE '2020-02-29' + INTERVAL '1' YEAR AS DATE) AS non_leap""",
        """SELECT CAST(TIMESTAMP '2020-06-15 13:45:30'
                       + INTERVAL '90' MINUTE AS DATE) AS same_day,
                  CAST(extract(hour FROM TIMESTAMP '2020-06-15 13:45:30'
                       + INTERVAL '90' MINUTE) AS BIGINT) AS h""",
        """SELECT CAST(extract(minute FROM TIMESTAMP '2020-06-15 13:45:30')
                       AS BIGINT) AS mi,
                  CAST(extract(second FROM TIMESTAMP '2020-06-15 13:45:30')
                       AS BIGINT) AS se""",
        """SELECT CAST(date_trunc('week', DATE '2020-06-18') AS DATE) AS wk""",
        """SELECT CAST(date_trunc('quarter', DATE '2020-08-20') AS DATE) AS qt""",
        """SELECT DATE '2020-06-15' = CAST('2020-06-15' AS DATE) AS eq,
                  DATE '2020-06-15' < DATE '2020-06-16' AS lt""",
        """SELECT o_orderkey, last_day(CAST(o_orderdate AS DATE)) AS eom
           FROM orders ORDER BY o_orderkey LIMIT 8""",
        """SELECT CAST(weekofyear(o_orderdate) AS BIGINT) AS w,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders WHERE extract(year FROM o_orderdate) = 1996
           GROUP BY weekofyear(o_orderdate) ORDER BY w LIMIT 10""",
        """SELECT CAST(min(CAST(ts AS DATE)) AS DATE) AS lo,
                  CAST(max(CAST(ts AS DATE)) AS DATE) AS hi FROM events""",
        """SELECT CAST(make_date(
                    CAST(extract(year FROM o_orderdate) AS INTEGER), 1, 1)
                  AS DATE) AS jan1, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY extract(year FROM o_orderdate)
           ORDER BY jan1""",
    ],
    # ── aggregate edges 2 ─────────────────────────────────────────────
    "agg_edge": [
        """SELECT round(median(x), 4) AS med
           FROM (VALUES (CAST(1.0 AS DOUBLE)), (2.0), (3.0), (4.0)) t(x)""",
        """SELECT round(median(l_quantity), 4) AS med FROM lineitem""",
        """SELECT bool_and(x) AS ba, bool_or(x) AS bo
           FROM (VALUES (true), (false)) t(x)""",
        """SELECT bool_and(x) AS all_true
           FROM (VALUES (true), (true)) t(x)""",
        """SELECT bool_and(x) AS ba, bool_or(x) AS bo
           FROM (VALUES (CAST(NULL AS BOOLEAN))) t(x)""",
        """SELECT o_orderstatus, bool_and(o_totalprice > 1000) AS all_big,
                  bool_or(o_totalprice > 400000) AS any_huge
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT CAST(count(*) FILTER (WHERE x > 1) AS BIGINT) AS big,
                  CAST(count(*) FILTER (WHERE x IS NULL) AS BIGINT) AS nulls
           FROM (VALUES (1), (2), (NULL)) t(x)""",
        """SELECT CAST(sum(o_orderkey) FILTER (WHERE o_orderstatus = 'F')
                    AS BIGINT) AS f_keys,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders WHERE o_orderkey <= 100""",
        """SELECT round(corr(x, y), 4) AS c
           FROM (VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 5.0)) t(x, y)""",
        """SELECT stddev_samp(x) IS NULL AS one_row_null
           FROM (VALUES (1.0)) t(x)""",
        """SELECT round(var_pop(x), 4) AS vp, round(var_samp(x), 4) AS vs
           FROM (VALUES (1.0), (3.0)) t(x)""",
        """SELECT round(stddev_pop(x), 4) AS sp
           FROM (VALUES (2.0), (4.0), (4.0), (4.0), (5.0), (5.0), (7.0),
                        (9.0)) t(x)""",
        """SELECT min(x) AS mn, max(x) AS mx
           FROM (VALUES ('b'), ('A'), ('a')) t(x)""",
        """SELECT CAST(min(CAST(o_orderdate AS DATE)) AS DATE) AS first_order
           FROM orders""",
        """SELECT o_orderstatus, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS np
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT CAST(count(DISTINCT n_regionkey) AS BIGINT) AS regions,
                  CAST(count(n_regionkey) AS BIGINT) AS rows_with_rk
           FROM nation""",
        """SELECT round(avg(DISTINCT x), 4) AS ad
           FROM (VALUES (1.0), (1.0), (3.0)) t(x)""",
        """SELECT CAST(sum(DISTINCT x) AS BIGINT) AS sd
           FROM (VALUES (2), (2), (3)) t(x)""",
        """SELECT l_returnflag, l_linestatus,
                  round(min(l_discount), 4) AS dmin,
                  round(max(l_discount), 4) AS dmax
           FROM lineitem GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",
        """SELECT CAST(max(o_orderkey) - min(o_orderkey) AS BIGINT) AS span
           FROM orders""",
        """SELECT o_orderpriority,
                  round(median(o_totalprice), 4) AS med_price
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM orders HAVING count(*) > 0""",
    ],
    # ── window breadth 2 ──────────────────────────────────────────────
    "window2": [
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                     ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS BIGINT) AS ahead
           FROM (VALUES (1), (2), (3), (4)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                     RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS near
           FROM (VALUES (1), (2), (4)) t(x) ORDER BY x""",
        """SELECT x, CAST(nth_value(x, 2) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS second
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(lag(x, 1, -1) OVER (ORDER BY x) AS BIGINT) AS prev,
                  CAST(lead(x, 1, -1) OVER (ORDER BY x) AS BIGINT) AS next
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(ntile(2) OVER (ORDER BY x) AS BIGINT) AS half
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, round(percent_rank() OVER (ORDER BY x), 4) AS pr,
                  round(cume_dist() OVER (ORDER BY x), 4) AS cd
           FROM (VALUES (1), (2), (2)) t(x) ORDER BY x, pr""",
        """SELECT o_orderkey,
                  CAST(first_value(o_orderkey) OVER w AS BIGINT) AS fst,
                  CAST(last_value(o_orderkey) OVER w AS BIGINT) AS lst
           FROM orders WHERE o_orderkey <= 15
           WINDOW w AS (ORDER BY o_orderkey
                        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
           ORDER BY o_orderkey""",
        """SELECT o_orderkey, o_orderstatus,
                  CAST(row_number() OVER (PARTITION BY o_orderstatus
                                          ORDER BY o_orderkey) AS BIGINT) AS rn
           FROM orders WHERE o_orderkey <= 30
           ORDER BY o_orderstatus, o_orderkey""",
        """SELECT o_orderkey,
                  CAST(rank() OVER (ORDER BY o_orderpriority) AS BIGINT) AS rk,
                  CAST(dense_rank() OVER (ORDER BY o_orderpriority) AS BIGINT) AS drk
           FROM orders WHERE o_orderkey <= 20
           ORDER BY o_orderpriority, o_orderkey""",
        """SELECT x, CAST(count(*) OVER (ORDER BY x
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS remaining
           FROM (VALUES (5), (6), (7)) t(x) ORDER BY x""",
        """SELECT x, CAST(min(x) OVER (ORDER BY x
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS m
           FROM (VALUES (9), (3), (7), (1)) t(x) ORDER BY x""",
        """SELECT l_orderkey, l_linenumber,
                  round(sum(l_quantity) OVER (PARTITION BY l_orderkey
                        ORDER BY l_linenumber, l_quantity
                        ROWS UNBOUNDED PRECEDING), 4) AS run_qty
           FROM lineitem WHERE l_orderkey <= 5
           ORDER BY l_orderkey, l_linenumber, l_quantity""",
        """SELECT o_orderkey,
                  round(avg(o_totalprice) OVER (ORDER BY o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
           FROM orders WHERE o_orderkey <= 12 ORDER BY o_orderkey""",
        """SELECT x, CAST(sum(x) OVER () AS BIGINT) AS total
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, grp, CAST(sum(x) OVER (PARTITION BY grp) AS BIGINT) AS psum
           FROM (VALUES (1, 'a'), (2, 'a'), (3, 'b')) t(x, grp)
           ORDER BY grp, x""",
        """SELECT x, CAST(lead(x) OVER (ORDER BY x NULLS FIRST) AS BIGINT) AS nxt
           FROM (VALUES (1), (NULL), (3)) t(x) ORDER BY x NULLS FIRST""",
        """SELECT o_orderkey,
                  CAST(o_orderkey - lag(o_orderkey, 1, 0)
                       OVER (ORDER BY o_orderkey) AS BIGINT) AS gap
           FROM orders WHERE o_orderkey <= 35 ORDER BY o_orderkey""",
        """SELECT n_regionkey, n_name,
                  CAST(count(*) OVER (PARTITION BY n_regionkey) AS BIGINT) AS sz
           FROM nation ORDER BY n_regionkey, n_name""",
    ],
    # ── ORDER BY / LIMIT / OFFSET edges ───────────────────────────────
    "order_limit": [
        """SELECT x FROM (VALUES (3), (1), (2)) t(x) ORDER BY -x""",
        """SELECT x FROM (VALUES (1)) t(x) LIMIT 0""",
        """SELECT x FROM (VALUES (1), (2), (3)) t(x) ORDER BY x LIMIT 5""",
        """SELECT x FROM (VALUES (1), (2), (3)) t(x)
           ORDER BY x LIMIT 2 OFFSET 2""",
        """SELECT x FROM (VALUES (1), (2), (3)) t(x)
           ORDER BY x LIMIT 2 OFFSET 5""",
        """SELECT o_orderkey, o_orderpriority FROM orders
           ORDER BY o_orderpriority DESC, o_orderkey LIMIT 6""",
        """SELECT n_name FROM nation
           ORDER BY length(n_name), n_name LIMIT 8""",
        """SELECT o_orderkey, o_totalprice FROM orders
           ORDER BY round(o_totalprice, 0) DESC, o_orderkey LIMIT 5""",
        """SELECT c_name, c_acctbal FROM customer
           ORDER BY c_acctbal DESC NULLS LAST, c_name LIMIT 5""",
        """SELECT x, y FROM (VALUES (1, 'b'), (1, 'a'), (2, 'c')) t(x, y)
           ORDER BY x DESC, y ASC""",
        """SELECT DISTINCT o_orderstatus FROM orders
           ORDER BY o_orderstatus DESC""",
        """SELECT l_orderkey, l_linenumber FROM lineitem
           WHERE l_orderkey <= 10
           ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 7""",
    ],
    # ── subquery breadth 2 ────────────────────────────────────────────
    "subquery2": [
        """SELECT n_name,
                  (SELECT r_name FROM region
                   WHERE r_regionkey = n_regionkey) AS rname
           FROM nation ORDER BY n_name LIMIT 10""",
        """SELECT r_name,
                  CAST((SELECT count(*) FROM nation
                        WHERE n_regionkey = r_regionkey) AS BIGINT) AS members
           FROM region ORDER BY r_name""",
        """SELECT c_name FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 400000)
           ORDER BY c_name LIMIT 10""",
        """SELECT n_name FROM nation n
           WHERE NOT EXISTS (SELECT 1 FROM supplier s
                             WHERE s.s_nationkey = n.n_nationkey)
           ORDER BY n_name LIMIT 10""",
        """SELECT o_orderkey FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM customer
                               WHERE c_acctbal < -900)
           ORDER BY o_orderkey LIMIT 10""",
        """SELECT s_name FROM supplier
           WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation
                                     WHERE n_regionkey = 0)
           ORDER BY s_name LIMIT 8""",
        """SELECT o_orderkey, o_totalprice FROM orders o
           WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM orders)
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""",
        """SELECT x.o_orderstatus, CAST(x.n AS BIGINT) AS n
           FROM (SELECT o_orderstatus, count(*) AS n FROM orders
                 GROUP BY o_orderstatus) x
           WHERE x.n > (SELECT count(*) / 10 FROM orders)
           ORDER BY x.o_orderstatus""",
        """WITH big AS (SELECT o_orderkey, o_totalprice FROM orders
                        WHERE o_totalprice > 300000),
                cnt AS (SELECT count(*) AS n FROM big)
           SELECT CAST((SELECT n FROM cnt) AS BIGINT) AS n_big,
                  CAST((SELECT min(o_orderkey) FROM big) AS BIGINT) AS first_key""",
        """WITH r AS (SELECT r_regionkey, r_name FROM region)
           SELECT a.r_name || '|' || b.r_name AS pair
           FROM r a JOIN r b ON b.r_regionkey = a.r_regionkey + 1
           ORDER BY a.r_regionkey""",
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderpriority
           HAVING count(*) > (SELECT count(*) FROM orders) / 6
           ORDER BY o_orderpriority""",
        """SELECT n_name, (SELECT max(s_acctbal) FROM supplier
                           WHERE s_nationkey = n_nationkey) IS NULL AS no_supp
           FROM nation ORDER BY n_name LIMIT 10""",
        """SELECT c_custkey FROM customer
           WHERE c_custkey = (SELECT min(o_custkey) FROM orders)""",
        """SELECT (SELECT count(*) FROM region) = 5 AS five_regions""",
        """SELECT o_orderkey FROM orders o
           WHERE EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o.o_orderkey
                           AND l.l_quantity = 50)
           ORDER BY o_orderkey LIMIT 8""",
    ],
    # ── set-operation edges ───────────────────────────────────────────
    "setop_edge": [
        """SELECT x FROM (VALUES (1), (NULL), (1)) t(x)
           UNION SELECT NULL ORDER BY x NULLS FIRST""",
        """SELECT x FROM (VALUES (1), (1)) t(x)
           UNION ALL SELECT x FROM (VALUES (1)) s(x) ORDER BY x""",
        """SELECT x FROM (VALUES (1), (1), (2)) t(x)
           INTERSECT SELECT x FROM (VALUES (1), (3)) s(x) ORDER BY x""",
        """SELECT x FROM (VALUES (1), (1)) t(x)
           INTERSECT ALL SELECT x FROM (VALUES (1), (1), (1)) s(x)
           ORDER BY x""",
        """SELECT x FROM (VALUES (1), (1), (2)) t(x)
           EXCEPT SELECT 2 ORDER BY x""",
        """SELECT x FROM (VALUES (1), (1), (2)) t(x)
           EXCEPT ALL SELECT 1 ORDER BY x""",
        """SELECT NULL AS x UNION ALL SELECT 1 ORDER BY x NULLS FIRST""",
        """SELECT CAST(1 AS BIGINT) AS x UNION SELECT 1 ORDER BY x""",
        """SELECT n_regionkey AS k FROM nation
           INTERSECT SELECT r_regionkey FROM region ORDER BY k""",
        """SELECT r_regionkey FROM region
           EXCEPT SELECT n_regionkey FROM nation ORDER BY r_regionkey""",
        """SELECT upper(r_name) AS nm FROM region
           UNION SELECT r_name FROM region ORDER BY nm LIMIT 10""",
        """SELECT o_orderstatus AS s FROM orders WHERE o_orderkey <= 50
           UNION SELECT l_linestatus FROM lineitem WHERE l_orderkey <= 50
           ORDER BY s""",
    ],
    # ── regex (shared single-replace + extract-group surface) ─────────
    "regex": [
        """SELECT regexp_extract('a12b34', '([0-9]+)', 1) AS first_num""",
        """SELECT '[' || regexp_extract('no-digits', '([0-9]+)', 1) || ']'
                  AS none_marked""",
        """SELECT regexp_extract('key=value', '([a-z]+)=([a-z]+)', 2) AS v""",
        """SELECT regexp_replace('a1b2', '[0-9]b', '#') AS masked_once""",
        """SELECT regexp_replace('hello', 'l+', 'L') AS collapsed""",
        """SELECT c_name, regexp_extract(c_name, '([0-9]+)', 1) AS num
           FROM customer ORDER BY c_name LIMIT 8""",
        """SELECT p_name, regexp_extract(p_name, '^([a-z]+)', 1) AS first
           FROM part ORDER BY p_partkey LIMIT 8""",
        """SELECT o_orderpriority,
                  regexp_extract(o_orderpriority, '^([0-9])', 1) AS pri
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        """SELECT regexp_extract('2020-06-15', '^([0-9]{4})', 1) AS y""",
        """SELECT regexp_extract('aaa', '(a)(a)', 2) AS second_group""",
        """SELECT regexp_replace('abc', '^', '>') AS anchored""",
        """SELECT regexp_extract('aXbXc', 'X(.)X', 1) AS between""",
    ],
    # ── structs: construction, access, nesting, comparison ───────────
    #    (two-variant: Spark named_struct vs DuckDB {'k': v} literals;
    #    struct values never appear raw in output — fields extracted) ──
    "structs": [
        ("""SELECT named_struct('a', 1, 'b', 'x').a AS a,
                   named_struct('a', 1, 'b', 'x').b AS b""",
         """SELECT {'a': 1, 'b': 'x'}.a AS a, {'a': 1, 'b': 'x'}.b AS b"""),
        ("""SELECT named_struct('p', named_struct('q', 7)).p.q AS q""",
         """SELECT {'p': {'q': 7}}.p.q AS q"""),
        ("""SELECT named_struct('a', 1) = named_struct('a', 1) AS eq,
                   named_struct('a', 1) = named_struct('a', 2) AS ne""",
         """SELECT {'a': 1} = {'a': 1} AS eq, {'a': 1} = {'a': 2} AS ne"""),
        ("""SELECT named_struct('a', 1, 'b', 2)
                     < named_struct('a', 1, 'b', 3) AS lt,
                   named_struct('a', 2, 'b', 0)
                     > named_struct('a', 1, 'b', 9) AS gt""",
         """SELECT {'a': 1, 'b': 2} < {'a': 1, 'b': 3} AS lt,
                   {'a': 2, 'b': 0} > {'a': 1, 'b': 9} AS gt"""),
        ("""SELECT named_struct('n', n_name, 'r', n_regionkey).n AS n,
                   CAST(named_struct('n', n_name, 'r', n_regionkey).r
                        AS BIGINT) AS r
            FROM nation ORDER BY n LIMIT 8""",
         """SELECT {'n': n_name, 'r': n_regionkey}.n AS n,
                   CAST({'n': n_name, 'r': n_regionkey}.r AS BIGINT) AS r
            FROM nation ORDER BY n LIMIT 8"""),
        ("""SELECT s.a AS a, s.b AS b
            FROM (SELECT named_struct('a', x, 'b', y) AS s
                  FROM (VALUES (2, 'p'), (1, 'q'), (2, 'o')) t(x, y)) z
            ORDER BY s""",
         """SELECT s.a AS a, s.b AS b
            FROM (SELECT {'a': x, 'b': y} AS s
                  FROM (VALUES (2, 'p'), (1, 'q'), (2, 'o')) t(x, y)) z
            ORDER BY s"""),
        ("""SELECT s.a AS a, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT named_struct('a', x % 2) AS s
                  FROM (VALUES (1), (2), (3), (4), (5)) t(x)) z
            GROUP BY s ORDER BY a""",
         """SELECT s.a AS a, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT {'a': x % 2} AS s
                  FROM (VALUES (1), (2), (3), (4), (5)) t(x)) z
            GROUP BY s ORDER BY a"""),
        ("""SELECT CAST(NULL AS STRUCT<a: INT>) IS NULL AS isn""",
         """SELECT CAST(NULL AS STRUCT(a INTEGER)) IS NULL AS isn"""),
        ("""SELECT CAST(NULL AS STRUCT<a: INT>).a IS NULL AS field_null""",
         """SELECT CAST(NULL AS STRUCT(a INTEGER)).a IS NULL AS field_null"""),
        ("""SELECT max(named_struct('k', o_totalprice, 'id', o_orderkey)).id
                   AS argmax
            FROM orders WHERE o_orderkey <= 100""",
         """SELECT max({'k': o_totalprice, 'id': o_orderkey}).id AS argmax
            FROM orders WHERE o_orderkey <= 100"""),
    ],
    # ── maps: literals, lookup, keys/values (two-variant: DuckDB 1.0's
    #    m[k] yields a 1-element LIST — Spark element_at is scalar) ────
    "maps": [
        ("""SELECT CAST(element_at(map('a', 1, 'b', 2), 'a') AS BIGINT) AS va,
                   CAST(element_at(map('a', 1, 'b', 2), 'b') AS BIGINT) AS vb""",
         """SELECT CAST((MAP {'a': 1, 'b': 2}['a'])[1] AS BIGINT) AS va,
                   CAST((MAP {'a': 1, 'b': 2}['b'])[1] AS BIGINT) AS vb"""),
        ("""SELECT element_at(map('a', 1), 'zz') IS NULL AS missing""",
         """SELECT (MAP {'a': 1}['zz'])[1] IS NULL AS missing"""),
        ("""SELECT array_sort(map_keys(map('b', 1, 'a', 2))) AS ks""",
         """SELECT array_sort(map_keys(MAP {'b': 1, 'a': 2})) AS ks"""),
        ("""SELECT array_sort(map_values(map('x', 20, 'y', 10))) AS vs""",
         """SELECT array_sort(map_values(MAP {'x': 20, 'y': 10})) AS vs"""),
        ("""SELECT CAST(cardinality(map('a', 1, 'b', 2)) AS BIGINT) AS n""",
         """SELECT CAST(cardinality(MAP {'a': 1, 'b': 2}) AS BIGINT) AS n"""),
        ("""SELECT CAST(element_at(map(n_name, n_regionkey), n_name)
                        AS BIGINT) AS rk,
                   n_name
            FROM nation ORDER BY n_name LIMIT 8""",
         """SELECT CAST((map([n_name], [n_regionkey])[n_name])[1]
                        AS BIGINT) AS rk,
                   n_name
            FROM nation ORDER BY n_name LIMIT 8"""),
        ("""SELECT CAST(element_at(
                     map_from_arrays(array('x', 'y'), array(1, 2)), 'y')
                   AS BIGINT) AS v""",
         """SELECT CAST((map(['x', 'y'], [1, 2])['y'])[1] AS BIGINT) AS v"""),
        ("""SELECT CAST(NULL AS MAP<STRING, INT>) IS NULL AS isn""",
         """SELECT CAST(NULL AS MAP(VARCHAR, INTEGER)) IS NULL AS isn"""),
        ("""SELECT CAST(size(map()) AS BIGINT) AS empty""",
         """SELECT CAST(cardinality(MAP {}) AS BIGINT) AS empty"""),
    ],
    # ── arrays, native constructors + kernels (two-variant: [..] vs
    #    array(..), 1-based [] vs element_at, list_* vs array_*) ───────
    "arrays_native": [
        ("""SELECT array_sort(array(3, 1, 2)) AS s""",
         """SELECT array_sort([3, 1, 2]) AS s"""),
        ("""SELECT element_at(array('a', 'b', 'c'), 2) AS second""",
         """SELECT (['a', 'b', 'c'])[2] AS second"""),
        ("""SELECT element_at(array('a', 'b', 'c'), -1) AS last""",
         """SELECT (['a', 'b', 'c'])[-1] AS last"""),
        ("""SELECT slice(array(1, 2, 3, 4), 2, 2) AS mid""",
         """SELECT ([1, 2, 3, 4])[2:3] AS mid"""),
        ("""SELECT CAST(array_min(array(3, 1, 2)) AS BIGINT) AS mn,
                   CAST(array_max(array(3, 1, 2)) AS BIGINT) AS mx""",
         """SELECT CAST(list_min([3, 1, 2]) AS BIGINT) AS mn,
                   CAST(list_max([3, 1, 2]) AS BIGINT) AS mx"""),
        ("""SELECT CAST(size(array(1, 2, 3)) AS BIGINT) AS n""",
         """SELECT CAST(len([1, 2, 3]) AS BIGINT) AS n"""),
        ("""SELECT concat(array(1, 2), array(3)) AS c""",
         """SELECT list_concat([1, 2], [3]) AS c"""),
        ("""SELECT array_sort(array_distinct(array(2, 1, 2))) AS d""",
         """SELECT list_sort(list_distinct([2, 1, 2])) AS d"""),
        ("""SELECT transform(array(1, 2), x -> x * 10) AS t""",
         """SELECT list_transform([1, 2], x -> x * 10) AS t"""),
        ("""SELECT CAST(aggregate(array(1, 2, 3), 0, (acc, x) -> acc + x)
                        AS BIGINT) AS s""",
         """SELECT CAST(list_sum([1, 2, 3]) AS BIGINT) AS s"""),
        ("""SELECT reverse(array(1, 2, 3)) AS r""",
         """SELECT list_reverse([1, 2, 3]) AS r"""),
        ("""SELECT array_sort(array_intersect(array(1, 2, 3),
                                              array(2, 3, 4))) AS i""",
         """SELECT list_sort(list_intersect([1, 2, 3], [2, 3, 4])) AS i"""),
        ("""SELECT arrays_overlap(array(1, 2), array(2, 9)) AS hit,
                   arrays_overlap(array(1, 2), array(8, 9)) AS miss""",
         """SELECT list_has_any([1, 2], [2, 9]) AS hit,
                   list_has_any([1, 2], [8, 9]) AS miss"""),
        ("""SELECT element_at(array_sort(array_agg(DISTINCT n_regionkey)), 1)
                   IS NOT NULL AS ok,
                   CAST(element_at(array_sort(array_agg(DISTINCT n_regionkey)),
                                   -1) AS BIGINT) AS top
            FROM nation""",
         """SELECT (array_sort(array_agg(DISTINCT n_regionkey)))[1]
                   IS NOT NULL AS ok,
                   CAST((array_sort(array_agg(DISTINCT n_regionkey)))[-1]
                        AS BIGINT) AS top
            FROM nation"""),
        ("""SELECT element_at(array(n_name), 1) AS n
            FROM nation ORDER BY n_name LIMIT 6""",
         """SELECT ([n_name])[1] AS n FROM nation ORDER BY n_name LIMIT 6"""),
    ],
    # ── dialect-paired string/date functions ─────────────────────────
    "fns_dialect": [
        ("""SELECT startswith('hello', 'he') AS s, endswith('hello', 'lo') AS e,
                   startswith('hello', 'zz') AS s0""",
         """SELECT starts_with('hello', 'he') AS s, ends_with('hello', 'lo') AS e,
                   starts_with('hello', 'zz') AS s0"""),
        ("""SELECT to_date('15/06/2020', 'dd/MM/yyyy') AS d""",
         """SELECT CAST(strptime('15/06/2020', '%d/%m/%Y') AS DATE) AS d"""),
        ("""SELECT date_format(DATE '2020-06-15', 'yyyy/MM') AS f""",
         """SELECT strftime(DATE '2020-06-15', '%Y/%m') AS f"""),
        ("""SELECT date_add(DATE '2020-01-01', 5) AS plus,
                   date_sub(DATE '2020-01-01', 5) AS minus""",
         """SELECT DATE '2020-01-01' + 5 AS plus,
                   DATE '2020-01-01' - 5 AS minus"""),
        ("""SELECT CAST(datediff(DATE '2020-01-31', DATE '2020-01-01')
                        AS BIGINT) AS d""",
         """SELECT CAST(date_diff('day', DATE '2020-01-01', DATE '2020-01-31')
                        AS BIGINT) AS d"""),
        ("""SELECT add_months(DATE '2020-01-31', 1) AS clamped""",
         """SELECT CAST(DATE '2020-01-31' + INTERVAL '1' MONTH AS DATE)
                   AS clamped"""),
        ("""SELECT CAST(months_between(DATE '2020-03-15', DATE '2020-01-15')
                        AS BIGINT) AS m""",
         """SELECT CAST(date_diff('month', DATE '2020-01-15',
                                  DATE '2020-03-15') AS BIGINT) AS m"""),
        # ISO day-of-week (Mon=1..Sun=7): Spark weekday() is Mon=0, and
        # DuckDB's matching function is isodow (dayofweek is Sun=0 —
        # pairing it would diverge on Sundays)
        ("""SELECT CAST(weekday(DATE '2020-06-15') + 1 AS BIGINT) AS mon,
                   CAST(weekday(DATE '2020-06-14') + 1 AS BIGINT) AS sun,
                   CAST(weekday(DATE '2020-06-20') + 1 AS BIGINT) AS sat""",
         """SELECT CAST(isodow(DATE '2020-06-15') AS BIGINT) AS mon,
                   CAST(isodow(DATE '2020-06-14') AS BIGINT) AS sun,
                   CAST(isodow(DATE '2020-06-20') AS BIGINT) AS sat"""),
        ("""SELECT date_format(DATE '2020-06-15', 'EEEE') AS dn""",
         """SELECT dayname(DATE '2020-06-15') AS dn"""),
        ("""SELECT CAST(unix_date(DATE '2020-06-15') AS BIGINT) AS days""",
         """SELECT CAST(date_diff('day', DATE '1970-01-01', DATE '2020-06-15')
                        AS BIGINT) AS days"""),
        ("""SELECT trunc(DATE '2020-08-20', 'month') AS m,
                   trunc(DATE '2020-08-20', 'year') AS y""",
         """SELECT date_trunc('month', DATE '2020-08-20') AS m,
                   date_trunc('year', DATE '2020-08-20') AS y"""),
        ("""SELECT 7 DIV 2 AS q, (-7) DIV 2 AS qn, 9 DIV 3 AS q3""",
         """SELECT 7 // 2 AS q, (-7) // 2 AS qn, 9 // 3 AS q3"""),
        ("""SELECT CAST(pmod(-7, 3) AS BIGINT) AS p,
                   CAST(pmod(7, 3) AS BIGINT) AS pp""",
         """SELECT CAST(((-7 % 3) + 3) % 3 AS BIGINT) AS p,
                   CAST(((7 % 3) + 3) % 3 AS BIGINT) AS pp"""),
        ("""SELECT space(3) || 'x' AS padded""",
         """SELECT repeat(' ', 3) || 'x' AS padded"""),
        ("""SELECT o_orderkey, date_add(CAST(o_orderdate AS DATE), 30) AS due
            FROM orders ORDER BY o_orderkey LIMIT 6""",
         """SELECT o_orderkey, CAST(o_orderdate AS DATE) + 30 AS due
            FROM orders ORDER BY o_orderkey LIMIT 6"""),
    ],
    # ── float special values: NaN/Inf/-0.0 (booleans + int markers
    #    only in output — NaN/Inf cannot be %.4f-formatted) ────────────
    "float_edge": [
        """SELECT isnan(CAST('NaN' AS DOUBLE)) AS nan_is,
                  isnan(1.0) AS one_is""",
        """SELECT CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS nan_eq""",
        """SELECT CAST('NaN' AS DOUBLE) > CAST('Infinity' AS DOUBLE)
                  AS nan_gt_inf""",
        """SELECT id FROM (VALUES (1, CAST('-Infinity' AS DOUBLE)),
                                  (2, 1.0),
                                  (3, CAST('Infinity' AS DOUBLE)),
                                  (4, CAST('NaN' AS DOUBLE))) t(id, v)
           ORDER BY v, id""",
        """SELECT id FROM (VALUES (1, CAST('NaN' AS DOUBLE)),
                                  (2, 0.5)) t(id, v)
           ORDER BY v DESC, id""",
        """SELECT -0.0 = 0.0 AS zeros_eq""",
        """SELECT 1e308 * 10 > 1e308 AS overflow_inf,
                  -1e308 * 10 < -1e308 AS underflow_inf""",
        """SELECT isnan(max(v)) AS max_is_nan
           FROM (VALUES (1.0), (CAST('NaN' AS DOUBLE))) t(v)""",
        """SELECT sum(v) > 1e308 AS sum_inf
           FROM (VALUES (CAST('Infinity' AS DOUBLE)), (1.0)) t(v)""",
        """SELECT CAST('Infinity' AS DOUBLE) + 1.0
                    = CAST('Infinity' AS DOUBLE) AS inf_plus,
                  isnan(CAST('Infinity' AS DOUBLE)
                        - CAST('Infinity' AS DOUBLE)) AS inf_minus_inf""",
        """SELECT CAST(count(*) FILTER (WHERE isnan(v)) AS BIGINT) AS nans
           FROM (VALUES (CAST('NaN' AS DOUBLE)), (1.0),
                        (CAST('NaN' AS DOUBLE))) t(v)""",
    ],
    # ── ordinal / ALL group-by + lateral + USING joins ────────────────
    "from_surface": [
        """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1 ORDER BY 1""",
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 3""",
        """SELECT n_regionkey % 2 AS parity, CAST(count(*) AS BIGINT) AS n
           FROM nation GROUP BY ALL ORDER BY parity""",
        """SELECT r_name, x FROM region,
                LATERAL (SELECT r_regionkey * 2 AS x) t
           ORDER BY r_name""",
        """SELECT r_name, CAST(t.n AS BIGINT) AS n FROM region,
                LATERAL (SELECT count(*) AS n FROM nation
                         WHERE n_regionkey = r_regionkey) t
           ORDER BY r_name""",
        """SELECT r_name, t.top FROM region CROSS JOIN
                LATERAL (SELECT max(n_name) AS top FROM nation
                         WHERE n_regionkey = r_regionkey) t
           ORDER BY r_name""",
        """SELECT n_name, r_name
           FROM (SELECT n_name, n_regionkey AS rk FROM nation) a
           JOIN (SELECT r_name, r_regionkey AS rk FROM region) b USING (rk)
           ORDER BY n_name LIMIT 8""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM (SELECT n_regionkey AS k, n_nationkey AS j FROM nation) a
           JOIN (SELECT r_regionkey AS k, r_regionkey AS j FROM region) b
           USING (k, j)""",
        """SELECT a.v, b.w
           FROM (SELECT 1 AS k, 'a' AS v) a
           NATURAL JOIN (SELECT 1 AS k, 'b' AS w) b ORDER BY a.v""",
        """SELECT k FROM (SELECT 2 AS k) a NATURAL JOIN (SELECT 1 AS k) b
           ORDER BY k""",
    ],
    # ── window breadth 3: interval RANGE frames, DESC-order frames ────
    "window3": [
        """SELECT d, CAST(sum(v) OVER (ORDER BY d
                     RANGE BETWEEN INTERVAL '7' DAY PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS w
           FROM (VALUES (DATE '2020-01-01', 1), (DATE '2020-01-05', 2),
                        (DATE '2020-01-20', 4)) t(d, v) ORDER BY d""",
        """SELECT d, CAST(sum(v) OVER (ORDER BY d
                     RANGE BETWEEN INTERVAL '7' DAY PRECEDING
                     AND INTERVAL '2' DAY FOLLOWING) AS BIGINT) AS w
           FROM (VALUES (DATE '2020-01-01', 1), (DATE '2020-01-05', 2),
                        (DATE '2020-01-20', 4)) t(d, v) ORDER BY d""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x DESC
                     ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS w
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(count(*) OVER (ORDER BY x DESC
                     RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS w
           FROM (VALUES (1), (2), (4), (5)) t(x) ORDER BY x""",
        """SELECT x, CAST(rank() OVER (ORDER BY x DESC) AS BIGINT) AS rk
           FROM (VALUES (1), (2), (2), (3)) t(x) ORDER BY x, rk""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                     RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT)
                   AS peers
           FROM (VALUES (1), (2), (2), (3)) t(x) ORDER BY x""",
        """SELECT o_orderkey,
                  CAST(min(o_orderkey) OVER (ORDER BY o_orderdate
                       RANGE BETWEEN INTERVAL '30' DAY PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS w_min
           FROM orders WHERE o_orderkey <= 12 ORDER BY o_orderkey""",
        """SELECT o_orderkey,
                  CAST(row_number() OVER (PARTITION BY o_orderstatus
                         ORDER BY o_orderkey) AS BIGINT) AS rn,
                  CAST(count(*) OVER (PARTITION BY o_orderpriority)
                       AS BIGINT) AS pc
           FROM orders WHERE o_orderkey <= 20
           ORDER BY o_orderkey""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS rev_run
           FROM (VALUES (1), (2), (3), (4)) t(x) ORDER BY x""",
        """SELECT x, CAST(first_value(x) OVER (ORDER BY x DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS top
           FROM (VALUES (5), (7), (3)) t(x) ORDER BY x""",
    ],
    # ── aggregate breadth 3 (two-variant: max_by/arg_max, ordered
    #    string_agg vs sorted-collect composition) ─────────────────────
    "agg_edge3": [
        ("""SELECT max_by(n_name, n_nationkey) AS top,
                   min_by(n_name, n_nationkey) AS bottom FROM nation""",
         """SELECT arg_max(n_name, n_nationkey) AS top,
                   arg_min(n_name, n_nationkey) AS bottom FROM nation"""),
        ("""SELECT n_regionkey, max_by(n_name, n_nationkey) AS latest
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
         """SELECT n_regionkey, arg_max(n_name, n_nationkey) AS latest
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
        ("""SELECT array_join(sort_array(collect_list(r_name)), ',') AS csv
            FROM region""",
         """SELECT string_agg(r_name, ',' ORDER BY r_name) AS csv
            FROM region"""),
        ("""SELECT n_regionkey,
                   array_join(sort_array(collect_list(n_name)), '|') AS names
            FROM nation WHERE n_regionkey <= 1
            GROUP BY n_regionkey ORDER BY n_regionkey""",
         """SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name)
                   AS names
            FROM nation WHERE n_regionkey <= 1
            GROUP BY n_regionkey ORDER BY n_regionkey"""),
        """SELECT CAST(count(*) AS BIGINT) = CAST(count(1) AS BIGINT) AS same
           FROM (VALUES (1), (NULL)) t(x)""",
        """SELECT CAST(sum(CAST(x AS INTEGER)) AS BIGINT) AS trues
           FROM (VALUES (true), (false), (true)) t(x)""",
        """SELECT any_value(x) AS v FROM (VALUES (7)) t(x)""",
        """SELECT corr(x, y) IS NULL AS null_corr
           FROM (VALUES (1.0, 2.0)) t(x, y)""",
        """SELECT round(avg(x), 4) AS a
           FROM (VALUES (1), (2)) t(x)""",
        """SELECT CAST(sum(DISTINCT x) AS BIGINT) AS sd,
                  CAST(count(DISTINCT x) AS BIGINT) AS cd
           FROM (VALUES (1), (1), (NULL), (2)) t(x)""",
        """SELECT o_orderstatus,
                  CAST(max(length(o_orderpriority)) AS BIGINT) AS ml
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT CAST(count(x) AS BIGINT) AS cnt_col,
                  CAST(count(*) AS BIGINT) AS cnt_star
           FROM (VALUES (NULL), (NULL)) t(x)""",
        """SELECT min(o_orderdate) = CAST((SELECT min(o_orderdate)
                                           FROM orders) AS DATE) AS same
           FROM orders""",
    ],
    # ── join shapes: chains, multi-key, expression keys ───────────────
    "join_multi": [
        """SELECT n_name, r_name, s_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           ORDER BY s_name LIMIT 10""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F' AND l_quantity > 45""",
        """SELECT a.n_name AS a, b.n_name AS b
           FROM nation a JOIN nation b
             ON a.n_regionkey = b.n_regionkey
            AND a.n_nationkey < b.n_nationkey
           ORDER BY a.n_name, b.n_name LIMIT 12""",
        """SELECT a.n_name, b.n_name AS next_name
           FROM nation a JOIN nation b ON b.n_nationkey = a.n_nationkey + 1
           ORDER BY a.n_nationkey LIMIT 10""",
        """SELECT a.r_name, b.r_name AS m
           FROM region a JOIN region b
             ON upper(a.r_name) = upper(b.r_name)
           ORDER BY a.r_name""",
        """SELECT c_custkey FROM customer
           LEFT JOIN orders ON o_custkey = c_custkey
           WHERE o_orderkey IS NULL
           ORDER BY c_custkey LIMIT 10""",
        """SELECT r_name, CAST(t.n AS BIGINT) AS n
           FROM region JOIN (SELECT n_regionkey, count(*) AS n
                             FROM nation GROUP BY n_regionkey) t
             ON r_regionkey = n_regionkey
           ORDER BY r_name""",
        """SELECT n_name, o_orderkey
           FROM nation JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           WHERE o_totalprice > 450000
           ORDER BY o_orderkey LIMIT 10""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_linenumber = l2.l_linenumber + 1
           WHERE l1.l_orderkey <= 100""",
        """SELECT s_name FROM supplier, nation
           WHERE s_nationkey = n_nationkey AND n_name = 'CANADA'
           ORDER BY s_name LIMIT 8""",
    ],
    # ── NULL-argument propagation through the scalar fn surface ───────
    "null_args": [
        """SELECT substr(CAST(NULL AS VARCHAR(5)), 1, 2) AS sub,
                  replace(CAST(NULL AS VARCHAR(5)), 'a', 'b') AS rep""",
        """SELECT substr('abc', CAST(NULL AS INTEGER), 2) IS NULL AS pos_null,
                  lpad('x', CAST(NULL AS INTEGER), '.') IS NULL AS len_null""",
        """SELECT trim(CAST(NULL AS VARCHAR(5))) AS t,
                  reverse(CAST(NULL AS VARCHAR(5))) AS r""",
        """SELECT regexp_extract(CAST(NULL AS VARCHAR(5)), '(a)', 1) IS NULL
                  AS re_null""",
        """SELECT split(CAST(NULL AS VARCHAR(5)), ',') IS NULL AS split_null""",
        """SELECT date_trunc('month', CAST(NULL AS DATE)) IS NULL AS dt_null,
                  last_day(CAST(NULL AS DATE)) IS NULL AS ld_null""",
        """SELECT extract(year FROM CAST(NULL AS DATE)) IS NULL AS y_null""",
        """SELECT sqrt(CAST(NULL AS DOUBLE)) AS sq,
                  round(CAST(NULL AS DOUBLE), 2) AS rd,
                  power(CAST(NULL AS DOUBLE), 2) AS pw""",
        """SELECT md5(CAST(NULL AS VARCHAR(5))) AS h,
                  levenshtein(CAST(NULL AS VARCHAR(5)), 'x') IS NULL AS lev""",
        """SELECT '[' || concat_ws('-', CAST(NULL AS VARCHAR(2)),
                                   CAST(NULL AS VARCHAR(2))) || ']'
                  AS all_null_ws""",
        """SELECT CAST(NULL AS VARCHAR(5)) LIKE 'a%' AS like_null,
                  'abc' LIKE CAST(NULL AS VARCHAR(5)) AS pat_null""",
        """SELECT nullif(CAST(NULL AS INTEGER), 1) IS NULL AS ni,
                  coalesce(CAST(NULL AS INTEGER), NULL, 9) AS c9""",
    ],
    # ── EXISTS / IN edge shapes ───────────────────────────────────────
    "exists_edge": [
        """SELECT EXISTS (SELECT 1 FROM region WHERE r_regionkey > 99)
                  AS none,
                  EXISTS (SELECT 1 FROM region) AS some""",
        """SELECT r_name,
                  EXISTS (SELECT 1 FROM nation
                          WHERE n_regionkey = r_regionkey
                            AND n_name LIKE 'A%') AS has_a
           FROM region ORDER BY r_name""",
        """SELECT c_custkey FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey)
             AND EXISTS (SELECT 1 FROM orders o2
                         WHERE o2.o_custkey = c.c_custkey
                           AND o2.o_totalprice > 400000)
           ORDER BY c_custkey LIMIT 8""",
        """SELECT n_name FROM nation
           WHERE EXISTS (SELECT 1 FROM supplier
                         WHERE s_nationkey = n_nationkey LIMIT 1)
           ORDER BY n_name LIMIT 8""",
        """SELECT 1 IN (SELECT r_regionkey FROM region) AS hit,
                  99 IN (SELECT r_regionkey FROM region) AS miss""",
        """SELECT x FROM (VALUES (1), (2), (3)) t(x)
           WHERE x NOT IN (SELECT r_regionkey FROM region
                           WHERE r_regionkey = 2)
           ORDER BY x""",
        """SELECT count(*) AS n FROM (VALUES (1), (2)) t(x)
           WHERE x NOT IN (SELECT CAST(NULL AS INTEGER))""",
        """SELECT o_orderkey FROM orders o
           WHERE o_orderkey < 40
             AND (EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_quantity > 49)
                  OR o_totalprice > 300000)
           ORDER BY o_orderkey""",
        """SELECT r_name FROM region
           WHERE NOT EXISTS (SELECT 1 FROM nation
                             WHERE n_regionkey = r_regionkey
                               AND n_name LIKE 'Z%')
           ORDER BY r_name""",
        """SELECT c_custkey FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders
                               WHERE o_orderstatus = 'P')
             AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                   WHERE o_totalprice < 5000)
           ORDER BY c_custkey LIMIT 8""",
    ],
    # ── regex breadth 2: classes, flags, anchors (backslash classes are
    #    two-variant: Spark's parser un-escapes '\d' in string literals,
    #    DuckDB keeps it) ─────────────────────────────────────────────────
    "regex2": [
        (r"""SELECT regexp_extract('a12b34', '(\\d+)', 1) AS digits""",
         r"""SELECT regexp_extract('a12b34', '(\d+)', 1) AS digits"""),
        (r"""SELECT regexp_extract('x_y z', '(\\w+)', 1) AS word""",
         r"""SELECT regexp_extract('x_y z', '(\w+)', 1) AS word"""),
        (r"""SELECT regexp_extract('ab 12', '(\\s)', 1) = ' ' AS sp""",
         r"""SELECT regexp_extract('ab 12', '(\s)', 1) = ' ' AS sp"""),
        # POSIX classes are RE2-only — Java spells them \p{...}
        (r"""SELECT regexp_extract('a12', '(\\p{Digit}+)', 1) AS d,
                    regexp_extract('a12', '(\\p{Alpha}+)', 1) AS a""",
         """SELECT regexp_extract('a12', '([[:digit:]]+)', 1) AS d,
                   regexp_extract('a12', '([[:alpha:]]+)', 1) AS a"""),
        ("""SELECT 'ABC' RLIKE '(?i)abc' AS ci,
                   'ABC' RLIKE 'abc' AS cs""",
         """SELECT regexp_matches('ABC', '(?i)abc') AS ci,
                   regexp_matches('ABC', 'abc') AS cs"""),
        ("""SELECT 'hello' RLIKE '^h.*o$' AS anchored,
                   'hello!' RLIKE '^h.*o$' AS not_anchored""",
         """SELECT regexp_matches('hello', '^h.*o$') AS anchored,
                   regexp_matches('hello!', '^h.*o$') AS not_anchored"""),
        """SELECT regexp_extract('cat or dog', '(cat|dog)', 1) AS first""",
        """SELECT regexp_extract('aaab', '(a{2,3})', 1) AS greedy""",
        """SELECT regexp_extract('ab12cd', '([^0-9]+)', 1) AS nondigit""",
        (r"""SELECT regexp_replace('a1b2', '^\\w', '#') AS first_word_char""",
         r"""SELECT regexp_replace('a1b2', '^\w', '#') AS first_word_char"""),
        (r"""SELECT p_name, regexp_extract(p_name, '(\\d+)', 1) AS num
             FROM part WHERE p_name RLIKE '\\d'
             ORDER BY p_partkey LIMIT 6""",
         r"""SELECT p_name, regexp_extract(p_name, '(\d+)', 1) AS num
             FROM part WHERE regexp_matches(p_name, '\d')
             ORDER BY p_partkey LIMIT 6"""),
    ],
    # ── CTE breadth 2 ─────────────────────────────────────────────────
    "cte2": [
        """WITH t AS (SELECT 1 AS x)
           SELECT CAST(a.x + b.x AS BIGINT) AS s FROM t a JOIN t b ON true""",
        """WITH a AS (SELECT 2 AS x),
                b AS (SELECT x * 10 AS y FROM a),
                c AS (SELECT y + 1 AS z FROM b)
           SELECT CAST(z AS BIGINT) AS z FROM c""",
        """WITH region AS (SELECT 99 AS r_regionkey)
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(max(r_regionkey) AS BIGINT) AS mx FROM region""",
        """WITH big AS (SELECT o_orderkey FROM orders
                        WHERE o_totalprice > 400000)
           SELECT CAST((SELECT count(*) FROM big) AS BIGINT) AS n,
                  CAST((SELECT count(*) FROM big WHERE o_orderkey < 10000)
                       AS BIGINT) AS early""",
        """WITH u AS (SELECT n_regionkey AS k FROM nation
                      UNION SELECT r_regionkey FROM region)
           SELECT CAST(count(*) AS BIGINT) AS n FROM u""",
        """SELECT z.x FROM (WITH t AS (SELECT 7 AS x) SELECT x FROM t) z""",
        """WITH t AS (SELECT o_orderstatus, count(*) AS n FROM orders
                      GROUP BY o_orderstatus)
           SELECT a.o_orderstatus, CAST(a.n AS BIGINT) AS n
           FROM t a WHERE a.n = (SELECT max(n) FROM t)
           ORDER BY a.o_orderstatus""",
    ],
    # ── semi-structured edges: NULL fields/values, nested containers ──
    "semi_struct_edge": [
        ("""SELECT named_struct('a', CAST(NULL AS INT)).a IS NULL AS isn""",
         """SELECT {'a': CAST(NULL AS INTEGER)}.a IS NULL AS isn"""),
        ("""SELECT element_at(map('k', CAST(NULL AS INT)), 'k') IS NULL
                   AS null_val,
                   element_at(map('k', 1), 'z') IS NULL AS missing""",
         """SELECT (MAP {'k': CAST(NULL AS INTEGER)}['k'])[1] IS NULL
                   AS null_val,
                   (MAP {'k': 1}['z'])[1] IS NULL AS missing"""),
        ("""SELECT coalesce(CAST(NULL AS STRUCT<a: INT>),
                            named_struct('a', 5)).a AS a""",
         """SELECT coalesce(CAST(NULL AS STRUCT(a INTEGER)),
                            {'a': 5}).a AS a"""),
        ("""SELECT element_at(array(named_struct('a', 1),
                                    named_struct('a', 2)), 2).a AS a2""",
         """SELECT ([{'a': 1}, {'a': 2}])[2].a AS a2"""),
        ("""SELECT element_at(array(array(1, 2), array(3)), 1) AS inner""",
         """SELECT ([[1, 2], [3]])[1] AS inner"""),
        ("""SELECT flatten(array(array(1), array(2, 3))) AS flat""",
         """SELECT flatten([[1], [2, 3]]) AS flat"""),
        ("""SELECT size(array(array(1, 2), array(3))) AS outer_n""",
         """SELECT len([[1, 2], [3]]) AS outer_n"""),
        ("""SELECT named_struct('xs', array(1, 2)).xs AS xs""",
         """SELECT {'xs': [1, 2]}.xs AS xs"""),
    ],
    # ── math breadth 3 ────────────────────────────────────────────────
    "math_fns3": [
        """SELECT round(round(1234.5678, -2), 4) AS hundreds,
                  round(round(1234.5678, 0), 4) AS units""",
        """SELECT round(round(2.5, 0), 4) AS half_up,
                  round(round(-2.5, 0), 4) AS half_down""",
        """SELECT round(cot(1.0), 4) AS c""",
        """SELECT round(atan2(1.0, 1.0), 4) AS q1,
                  round(atan2(1.0, -1.0), 4) AS q2,
                  round(atan2(-1.0, -1.0), 4) AS q3,
                  round(atan2(-1.0, 1.0), 4) AS q4""",
        """SELECT round(ln(exp(2.0)), 4) AS two""",
        """SELECT round(power(8.0, 1.0/3), 4) AS cbrt8""",
        """SELECT round(7.5 % 2.0, 4) AS fmod""",
        """SELECT round(log2(1.0), 4) AS z2, round(log10(1.0), 4) AS z10""",
        """SELECT round(radians(degrees(1.5)), 4) AS rt""",
        """SELECT CAST(sign(CAST(-2.5 AS DOUBLE)) AS BIGINT) AS sneg,
                  CAST(sign(CAST(0.0 AS DOUBLE)) AS BIGINT) AS szero""",
        """SELECT round(asin(0.5), 4) AS a5, round(acos(0.5), 4) AS ac5""",
        """SELECT l_linenumber, round(atan2(CAST(l_quantity AS DOUBLE),
                                            CAST(l_linenumber AS DOUBLE)), 4)
                  AS angle
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
    ],
    # ── subquery breadth 3: LIMIT inside, nesting, CASE positions ─────
    "subquery3": [
        """SELECT 1 IN (SELECT x FROM (VALUES (1), (2), (3)) t(x)
                        ORDER BY x LIMIT 2) AS hit,
                  3 IN (SELECT x FROM (VALUES (1), (2), (3)) t(x)
                        ORDER BY x LIMIT 2) AS cut""",
        """SELECT CAST((SELECT o_orderkey FROM orders
                        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1)
                       AS BIGINT) AS priciest""",
        """SELECT r_name FROM region r
           WHERE EXISTS (SELECT 1 FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey
                           AND EXISTS (SELECT 1 FROM supplier s
                                       WHERE s.s_nationkey = n.n_nationkey))
           ORDER BY r_name""",
        """SELECT n_name,
                  CASE WHEN EXISTS (SELECT 1 FROM supplier
                                    WHERE s_nationkey = n_nationkey)
                       THEN 'has' ELSE 'none' END AS supp
           FROM nation ORDER BY n_name LIMIT 10""",
        """SELECT o_orderpriority FROM orders
           GROUP BY o_orderpriority
           HAVING count(*) > (SELECT avg(cnt) FROM (
                    SELECT count(*) AS cnt FROM orders
                    GROUP BY o_orderpriority) t)
           ORDER BY o_orderpriority""",
        """SELECT c_custkey FROM customer
           WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                                 WHERE n_regionkey = 1
                                 UNION
                                 SELECT n_nationkey FROM nation
                                 WHERE n_name = 'JAPAN')
           ORDER BY c_custkey LIMIT 8""",
        """SELECT s_suppkey FROM supplier
           WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation
                                     WHERE n_regionkey IN (0, 1))
           ORDER BY s_suppkey LIMIT 8""",
        """SELECT CAST((SELECT count(*) FROM (
                   SELECT o_custkey FROM orders GROUP BY o_custkey
                   HAVING count(*) >= 10) t) AS BIGINT) AS frequent""",
    ],
    # ── DISTINCT and ORDER BY interplay ────────────────────────────────
    "distinct_order": [
        """SELECT DISTINCT x % 3 AS r FROM (VALUES (1), (2), (3), (4),
                                            (5), (6)) t(x) ORDER BY r""",
        """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
           ORDER BY o_orderstatus DESC, o_orderpriority LIMIT 8""",
        """SELECT CAST(count(DISTINCT o_custkey % 100) AS BIGINT) AS n
           FROM orders""",
        """SELECT DISTINCT n_regionkey FROM nation
           ORDER BY n_regionkey LIMIT 3""",
        """SELECT DISTINCT x FROM (VALUES (NULL), (1), (NULL), (2)) t(x)
           ORDER BY x NULLS FIRST""",
        """SELECT DISTINCT length(n_name) AS ln FROM nation ORDER BY ln""",
        """SELECT DISTINCT r_name, n_regionkey
           FROM region JOIN nation ON n_regionkey = r_regionkey
           ORDER BY r_name""",
        """SELECT DISTINCT upper(o_orderstatus) AS s FROM orders
           ORDER BY s""",
    ],
    # ── arrays breadth 3: generation, null handling, set emulation ────
    "arrays3": [
        ("""SELECT sequence(1, 5) AS r""",
         """SELECT range(1, 6) AS r"""),
        ("""SELECT sequence(0, 8, 2) AS evens""",
         """SELECT range(0, 9, 2) AS evens"""),
        # ANSI element_at throws on OOB — try_element_at is the
        # NULL-returning spelling that matches DuckDB's [] semantics
        ("""SELECT try_element_at(split('a,b', ','), 9) IS NULL AS oob""",
         """SELECT (split('a,b', ','))[9] IS NULL AS oob"""),
        ("""SELECT array_sort(array_union(array(1, 2), array(2, 3))) AS u""",
         """SELECT list_sort(list_distinct(list_concat([1, 2], [2, 3])))
                   AS u"""),
        ("""SELECT array_compact(array(1, NULL, 2)) AS c""",
         """SELECT list_filter([1, NULL, 2], x -> x IS NOT NULL) AS c"""),
        ("""SELECT array_remove(array(1, 2, 1, 3), 1) AS r""",
         """SELECT list_filter([1, 2, 1, 3], x -> x != 1) AS r"""),
        ("""SELECT array_sort(array(3, NULL, 1)) AS nulls_last""",
         """SELECT list_sort([3, NULL, 1]) AS nulls_last"""),
        ("""SELECT array_contains(array(1, NULL), CAST(NULL AS INT))
                   IS NULL AS unknown""",
         """SELECT array_contains([1, NULL], CAST(NULL AS INTEGER))
                   IS NULL AS unknown"""),
        ("""SELECT split('a1b22c', '[0-9]+') AS parts""",
         """SELECT string_split_regex('a1b22c', '[0-9]+') AS parts"""),
        ("""SELECT exists(array(1, 2, 3), x -> x > 2) AS hit,
                   forall(array(1, 2, 3), x -> x > 0) AS all_pos""",
         """SELECT list_bool_or(list_transform([1, 2, 3], x -> x > 2))
                   AS hit,
                   list_bool_and(list_transform([1, 2, 3], x -> x > 0))
                   AS all_pos"""),
        ("""SELECT transform(sequence(1, 4), x -> x * x) AS squares""",
         """SELECT list_transform(range(1, 5), x -> x * x) AS squares"""),
        ("""SELECT filter(sequence(1, 10), x -> x % 3 = 0) AS div3""",
         """SELECT list_filter(range(1, 11), x -> x % 3 = 0) AS div3"""),
        ("""SELECT array_sort(transform(split(n_name, ''),
                                        x -> upper(x))) IS NOT NULL AS ok,
                   n_name
            FROM nation ORDER BY n_name LIMIT 5""",
         """SELECT list_sort(list_transform(string_split(n_name, ''),
                                            x -> upper(x))) IS NOT NULL
                   AS ok,
                   n_name
            FROM nation ORDER BY n_name LIMIT 5"""),
    ],
    # ── window breadth 4: offsets, defaults, windowed array_agg ───────
    "window4": [
        """SELECT x, CAST(lag(x, 2, -9) OVER (ORDER BY x) AS BIGINT) AS l2,
                  CAST(lead(x, 2, -9) OVER (ORDER BY x) AS BIGINT) AS f2
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, array_sort(array_agg(x) OVER (ORDER BY x
                     ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)) AS win
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT o_orderkey,
                  CAST(lag(o_orderkey, 3) OVER (ORDER BY o_orderkey)
                       AS BIGINT) AS lag3
           FROM orders WHERE o_orderkey <= 38 ORDER BY o_orderkey""",
        """SELECT x, grp,
                  CAST(row_number() OVER (PARTITION BY grp ORDER BY x DESC)
                       AS BIGINT) AS rn_desc
           FROM (VALUES (1, 'a'), (2, 'a'), (3, 'b'), (4, 'b')) t(x, grp)
           ORDER BY grp, x""",
        """SELECT x,
                  round(avg(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING
                        AND 1 FOLLOWING), 4) AS ma
           FROM (VALUES (1), (2), (4), (8)) t(x) ORDER BY x""",
        """SELECT o_orderkey, o_orderstatus,
                  CAST(count(*) OVER (PARTITION BY o_orderstatus
                         ORDER BY o_orderkey
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS running
           FROM orders WHERE o_orderkey <= 25
           ORDER BY o_orderkey""",
        """SELECT x, CAST(max(x) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT) AS prior_max
           FROM (VALUES (5), (3), (9), (7)) t(x) ORDER BY x""",
    ],
    # ── string edges 3: char-set trims, degenerate lengths ────────────
    "string_edge3": [
        ("""SELECT trim(BOTH 'x' FROM 'xxabcxx') AS t""",
         """SELECT trim('xxabcxx', 'x') AS t"""),
        ("""SELECT trim(LEADING 'x' FROM 'xxab') AS l,
                   trim(TRAILING 'x' FROM 'abxx') AS r""",
         """SELECT ltrim('xxab', 'x') AS l, rtrim('abxx', 'x') AS r"""),
        ("""SELECT trim(BOTH 'ab' FROM 'abbazappab') AS multi""",
         """SELECT trim('abbazappab', 'ab') AS multi"""),
        """SELECT repeat('ab', -1) AS neg, repeat('', 3) AS empty""",
        """SELECT substr('ab', 5, 2) AS beyond, substr('ab', 2, 0) AS zero""",
        """SELECT nullif(nullif('a', 'b'), 'a') IS NULL AS chained""",
        """SELECT replace('aaa', 'aa', 'b') AS overlap""",
        """SELECT lpad('', 3, 'xy') AS pad_empty, rpad('ab', 2, 'z') AS noop""",
        """SELECT length(upper('')) AS u, length(reverse('')) AS r,
                  length(trim('')) AS t""",
        """SELECT '[' || split_part('a,b', ',', 9) || ']' AS beyond_part""",
        """SELECT '' || '' = '' AS empty_cat,
                  length('' || 'x') AS one""",
        """SELECT c_name FROM customer
           WHERE length(c_name) = (SELECT max(length(c_name)) FROM customer)
           ORDER BY c_name LIMIT 5""",
    ],
    # ── GROUP BY expressions / aliases + HAVING edges ─────────────────
    "group_having": [
        """SELECT x % 2 AS p, CAST(count(*) AS BIGINT) AS n
           FROM (VALUES (1), (2), (3)) t(x) GROUP BY x % 2 ORDER BY p""",
        """SELECT x % 2 AS p, CAST(count(*) AS BIGINT) AS n
           FROM (VALUES (1), (2), (3)) t(x) GROUP BY p ORDER BY p""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM (VALUES (1), (2)) t(x) HAVING count(*) > 1""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM (VALUES (1), (2)) t(x) HAVING count(*) > 5""",
        """SELECT x % 3 AS p, CAST(count(*) AS BIGINT) AS n
           FROM (VALUES (1), (2), (3), (4), (5), (6)) t(x)
           GROUP BY p HAVING count(*) = 2 ORDER BY p""",
        """SELECT x, CAST(count(*) AS BIGINT) AS n
           FROM (VALUES (NULL), (NULL), (1)) t(x)
           GROUP BY x ORDER BY x NULLS FIRST""",
        """SELECT CASE 5 WHEN 1 THEN 'a' END IS NULL AS no_match""",
        """SELECT length(n_name) AS ln, CAST(count(*) AS BIGINT) AS n
           FROM nation GROUP BY length(n_name) ORDER BY ln""",
        """SELECT extract(year FROM o_orderdate) % 2 AS parity,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY parity ORDER BY parity""",
        """SELECT upper(o_orderstatus) AS s, round(sum(o_totalprice), 2) AS t
           FROM orders GROUP BY upper(o_orderstatus) ORDER BY s""",
        """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderstatus
           HAVING sum(o_totalprice) > (SELECT sum(o_totalprice) / 4
                                       FROM orders)
           ORDER BY o_orderstatus""",
    ],
    # ── datetime breadth 3: epoch, boundaries, paired century/diff ────
    "datetime3": [
        ("""SELECT CAST(unix_timestamp(CAST(DATE '2020-06-15' AS TIMESTAMP))
                        AS BIGINT) AS e""",
         """SELECT CAST(epoch(DATE '2020-06-15') AS BIGINT) AS e"""),
        ("""SELECT CAST(unix_timestamp(TIMESTAMP '2020-06-15 12:00:00')
                        AS BIGINT) AS e""",
         """SELECT CAST(epoch(TIMESTAMP '2020-06-15 12:00:00') AS BIGINT)
                   AS e"""),
        """SELECT CAST(dayofyear(DATE '2020-12-31') AS BIGINT) AS leap,
                  CAST(dayofyear(DATE '2021-12-31') AS BIGINT) AS flat""",
        """SELECT DATE '2020-01-01' < DATE '2020-06-01'
                  AND DATE '2020-06-01' < DATE '2021-01-01' AS chain""",
        """SELECT CAST(DATE '2020-01-31' + INTERVAL '1' MONTH
                       + INTERVAL '1' MONTH AS DATE) AS clamp_twice""",
        ("""SELECT CAST(datediff(DATE '2020-01-01', DATE '2020-01-31')
                        AS BIGINT) AS neg""",
         """SELECT CAST(date_diff('day', DATE '2020-01-31',
                                  DATE '2020-01-01') AS BIGINT) AS neg"""),
        ("""SELECT CAST(floor((year(DATE '2001-01-01') - 1) / 100) + 1
                        AS BIGINT) AS c21,
                   CAST(floor((year(DATE '2000-12-31') - 1) / 100) + 1
                        AS BIGINT) AS c20""",
         """SELECT CAST(century(DATE '2001-01-01') AS BIGINT) AS c21,
                   CAST(century(DATE '2000-12-31') AS BIGINT) AS c20"""),
        ("""SELECT CAST(year(DATE '2020-06-14') - year(DATE '2000-06-15')
                        AS BIGINT) AS y""",
         """SELECT CAST(date_diff('year', DATE '2000-06-15',
                                  DATE '2020-06-14') AS BIGINT) AS y"""),
        ("""SELECT date_format(DATE '2020-03-05', 'dd/MM/yyyy') AS f""",
         """SELECT strftime(DATE '2020-03-05', '%d/%m/%Y') AS f"""),
        """SELECT CAST(extract(hour FROM TIMESTAMP '2020-01-01 23:59:59')
                       AS BIGINT) AS h,
                  CAST(extract(minute FROM TIMESTAMP '2020-01-01 23:59:59')
                       AS BIGINT) AS m""",
        """SELECT CAST(date_trunc('quarter', DATE '2020-12-31') AS DATE)
                  AS q4""",
        """SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                  CAST(max(o_orderdate) AS DATE) AS hi,
                  CAST(max(extract(year FROM o_orderdate))
                       - min(extract(year FROM o_orderdate)) AS BIGINT)
                    AS span_years
           FROM orders""",
    ],
    # ── VALUES rows: multi-column inline relations ────────────────────
    "values_rows": [
        """SELECT a, b FROM (VALUES (1, 'x'), (2, 'y')) t(a, b)
           ORDER BY a""",
        """SELECT a + 1 AS a1, upper(b) AS ub
           FROM (VALUES (1 + 1, 'a'), (6 / 2, 'b')) t(a, b) ORDER BY a1""",
        """SELECT v.a, r.r_name
           FROM (VALUES (0), (3)) v(a)
           JOIN region r ON r.r_regionkey = v.a ORDER BY v.a""",
        """SELECT a FROM (VALUES (42)) t(a)""",
        """SELECT a, b FROM (VALUES (1, NULL), (NULL, 'y'), (2, 'z')) t(a, b)
           ORDER BY a NULLS FIRST, b NULLS FIRST""",
        """SELECT r_name AS nm FROM region
           UNION ALL SELECT nm FROM (VALUES ('ATLANTIS')) t(nm)
           ORDER BY nm""",
        """SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(a) AS BIGINT) AS s
           FROM (VALUES (1), (2), (3), (4)) t(a)""",
    ],
    # ── NULL join keys: equi drops, null-safe keeps, outer pads ───────
    "null_keys": [
        """SELECT a.x AS ax, b.x AS bx
           FROM (VALUES (1), (NULL), (2)) a(x)
           JOIN (VALUES (1), (NULL)) b(x) ON a.x = b.x
           ORDER BY ax""",
        """SELECT a.x AS ax, b.x AS bx
           FROM (VALUES (1), (NULL), (2)) a(x)
           JOIN (VALUES (1), (NULL)) b(x) ON a.x IS NOT DISTINCT FROM b.x
           ORDER BY ax NULLS FIRST""",
        """SELECT a.x AS ax, b.x AS bx
           FROM (VALUES (1), (NULL)) a(x)
           LEFT JOIN (VALUES (1), (2)) b(x) ON a.x = b.x
           ORDER BY ax NULLS FIRST""",
        # typed NULL columns: Spark's null-safe join over untyped VOID
        # columns matches nothing (found by this corpus) — a real
        # dialect divergence, so the portable form casts
        """SELECT CAST(count(*) AS BIGINT) AS matched
           FROM (VALUES (CAST(NULL AS INTEGER)), (NULL)) a(x)
           JOIN (VALUES (CAST(NULL AS INTEGER))) b(x) ON a.x = b.x""",
        """SELECT CAST(count(*) AS BIGINT) AS ns_matched
           FROM (VALUES (CAST(NULL AS INTEGER)), (NULL)) a(x)
           JOIN (VALUES (CAST(NULL AS INTEGER))) b(x)
             ON a.x IS NOT DISTINCT FROM b.x""",
        """SELECT a.x AS ax
           FROM (VALUES (1), (NULL), (3)) a(x)
           WHERE NOT EXISTS (SELECT 1 FROM (VALUES (1), (NULL)) b(x)
                             WHERE b.x = a.x)
           ORDER BY ax NULLS FIRST""",
        """SELECT a.x AS ax, b.x AS bx
           FROM (VALUES (1), (NULL)) a(x)
           JOIN (VALUES (1), (NULL)) b(x)
             ON coalesce(a.x, -1) = coalesce(b.x, -1)
           ORDER BY ax NULLS FIRST""",
        """SELECT a.x AS ax, b.x AS bx
           FROM (VALUES (1), (NULL), (2)) a(x)
           FULL JOIN (VALUES (2), (NULL)) b(x) ON a.x = b.x
           ORDER BY ax NULLS FIRST, bx NULLS FIRST""",
    ],
    # ── quote escaping + special characters in literals ───────────────
    "quotes_specials": [
        """SELECT 'it''s' AS apos, length('it''s') AS n""",
        """SELECT '''' AS lone_quote, chr(39) = '''' AS chr39""",
        """SELECT 'a''b''c' AS multi, replace('a''b', '''', '!') AS repl""",
        """SELECT 'percent: 100%' LIKE '%100!%' ESCAPE '!' AS pct,
                  'under_score' LIKE 'under!_score' ESCAPE '!' AS us""",
        """SELECT length('öäü') AS unicode_len""",
        """SELECT concat('"', 'quoted', '"') AS dq,
                  length('"') AS one""",
    ],
    # ── identifiers: quoting (backtick vs double-quote), case rules ───
    "identifiers": [
        ("""SELECT 1 AS `My Col` ORDER BY `My Col`""",
         '''SELECT 1 AS "My Col" ORDER BY "My Col"'''),
        ("""SELECT r_regionkey AS `MiXeD` FROM region
            ORDER BY `MiXeD` LIMIT 3""",
         '''SELECT r_regionkey AS "MiXeD" FROM region
            ORDER BY "MiXeD" LIMIT 3'''),
        ("""SELECT r_name AS `a-b` FROM region ORDER BY `a-b` LIMIT 3""",
         '''SELECT r_name AS "a-b" FROM region ORDER BY "a-b" LIMIT 3'''),
        """SELECT R_REGIONKEY FROM REGION ORDER BY R_REGIONKEY LIMIT 3""",
        """SELECT n_Name FROM Nation ORDER BY N_NAME LIMIT 3""",
    ],
    # ── wildcard projections ──────────────────────────────────────────
    "wildcard": [
        """SELECT * FROM region ORDER BY r_regionkey""",
        """SELECT r.* FROM region r ORDER BY r_regionkey""",
        """SELECT *, r_regionkey * 2 AS dbl FROM region
           ORDER BY r_regionkey""",
        """SELECT n.*, r.r_name AS region_name
           FROM nation n JOIN region r ON n_regionkey = r_regionkey
           ORDER BY n_nationkey LIMIT 6""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM (SELECT * FROM nation) t""",
        """SELECT t.* FROM (SELECT r_regionkey AS k, upper(r_name) AS nm
                            FROM region) t ORDER BY k""",
    ],
    # ── column references: lateral aliases, shadowing, qualifiers ─────
    "references": [
        """SELECT 1 AS a, a + 1 AS b, b * 2 AS c""",
        """SELECT r_regionkey + 10 AS r_regionkey FROM region
           ORDER BY 1 LIMIT 3""",
        """SELECT r_regionkey AS k, k + 100 AS k2 FROM region
           ORDER BY k LIMIT 3""",
        """SELECT length(r_name) AS ln, ln * 2 AS ln2 FROM region
           ORDER BY ln, ln2 LIMIT 5""",
        """SELECT k FROM (SELECT r_regionkey AS k FROM region) t
           ORDER BY k""",
        """SELECT a.r_name AS left_name, b.r_name AS right_name
           FROM region a JOIN region b ON a.r_regionkey = b.r_regionkey
           ORDER BY left_name LIMIT 4""",
        """SELECT o_totalprice * 0.9 AS discounted,
                  round(discounted / 2, 2) AS half
           FROM orders ORDER BY o_orderkey LIMIT 5""",
    ],
    # ── implicit type coercion ─────────────────────────────────────────
    "coercion": [
        """SELECT 'x' || 1 AS si, 1 || 'x' AS is_""",
        """SELECT round(CASE WHEN x > 1 THEN x ELSE 0.5 END, 4) AS c
           FROM (VALUES (1), (2)) t(x) ORDER BY x""",
        """SELECT round(1 + 2.5, 4) AS a, round(3 / 2.0, 4) AS b""",
        """SELECT CAST(x AS BIGINT) AS x
           FROM (SELECT CAST(1 AS INTEGER) AS x
                 UNION ALL SELECT CAST(2147483648 AS BIGINT)) t
           ORDER BY x""",
        """SELECT o_orderkey FROM orders
           WHERE o_orderdate >= '1998-07-20'
           ORDER BY o_orderkey LIMIT 8""",
        """SELECT count(*) AS n FROM lineitem
           WHERE l_shipdate BETWEEN '1994-01-01' AND '1994-01-31'""",
        """SELECT round(0.1 + 0.2, 4) AS dec_exact""",
        """SELECT round(1e-1 + 2e-1, 4) AS dbl_rounded""",
        """SELECT CAST(greatest(1, 2.5) AS DOUBLE) > 2 AS g,
                  CAST(least(1, 2.5) AS DOUBLE) < 2 AS l""",
        """SELECT x = 1 AS eq_int, x = 1.0 AS eq_dec
           FROM (VALUES (1)) t(x)""",
        """SELECT round(sum(x), 4) AS s
           FROM (SELECT 1 AS x UNION ALL SELECT 2.5) t""",
        """SELECT concat(o_orderkey, ':', o_orderstatus) AS tag
           FROM orders ORDER BY o_orderkey LIMIT 6""",
    ],
    # ── integer type boundaries: exact min/max casts, try_cast overflow
    #    → NULL, widening arithmetic at the edge, negative div/mod
    #    conventions (reference: per-type edges across aggregate.slt /
    #    math.slt) ──────────────────────────────────────────────────────
    "int_boundaries": [
        """SELECT CAST('2147483647' AS INTEGER) AS mx,
                  CAST('-2147483648' AS INTEGER) AS mn""",
        """SELECT TRY_CAST('2147483648' AS INTEGER) IS NULL AS over,
                  TRY_CAST('-2147483649' AS INTEGER) IS NULL AS under""",
        """SELECT CAST('9223372036854775807' AS BIGINT) AS mx,
                  CAST('-9223372036854775808' AS BIGINT) AS mn""",
        """SELECT TRY_CAST('9223372036854775808' AS BIGINT) IS NULL AS over,
                  TRY_CAST('-9223372036854775809' AS BIGINT) IS NULL AS under""",
        """SELECT CAST('32767' AS SMALLINT) AS mx,
                  CAST('-32768' AS SMALLINT) AS mn,
                  TRY_CAST('32768' AS SMALLINT) IS NULL AS over""",
        """SELECT CAST('127' AS TINYINT) AS mx, CAST('-128' AS TINYINT) AS mn,
                  TRY_CAST('128' AS TINYINT) IS NULL AS over,
                  TRY_CAST('-129' AS TINYINT) IS NULL AS under""",
        """SELECT TRY_CAST('abc' AS INTEGER) IS NULL AS junk,
                  TRY_CAST('' AS INTEGER) IS NULL AS empty,
                  TRY_CAST('  42  ' AS INTEGER) AS padded""",
        # Spark widens small ints against an int literal before adding;
        # DuckDB adds IN the narrow type and overflows — cast explicitly
        ("""SELECT CAST('32767' AS SMALLINT) + 1 AS widened""",
         """SELECT CAST(CAST('32767' AS SMALLINT) AS INTEGER) + 1
                   AS widened"""),
        ("""SELECT CAST('127' AS TINYINT) + 1 AS widened""",
         """SELECT CAST(CAST('127' AS TINYINT) AS INTEGER) + 1
                   AS widened"""),
        """SELECT CAST('9223372036854775807' AS BIGINT) - 1 AS near_mx,
                  CAST('-9223372036854775808' AS BIGINT) + 1 AS near_mn""",
        """SELECT CAST(2147483647 AS BIGINT) + 1 AS over_in_bigint,
                  CAST(-2147483648 AS BIGINT) - 1 AS under_in_bigint""",
        """SELECT CAST(CAST(2147483647.0 AS DOUBLE) AS INTEGER) AS exact_mx""",
        ("""SELECT CAST(2.7 AS INT) AS p, CAST(-2.7 AS INT) AS n""",
         """SELECT CAST(trunc(2.7) AS INTEGER) AS p,
                   CAST(trunc(-2.7) AS INTEGER) AS n"""),
        ("""SELECT -7 DIV 3 AS a, 7 DIV -3 AS b, -7 DIV -3 AS c""",
         """SELECT -7 // 3 AS a, 7 // -3 AS b, -7 // -3 AS c"""),
        """SELECT -7 % 3 AS a, 7 % -3 AS b, -7 % -3 AS c, 7 % 3 AS d""",
        ("""SELECT pmod(-7, 3) AS p1, pmod(7, -3) AS p2""",
         """SELECT ((-7 % 3) + 3) % 3 AS p1, ((7 % -3) + 3) % 3 AS p2"""),
        """SELECT abs(CAST('-2147483647' AS INTEGER)) AS a,
                  abs(CAST('-9223372036854775807' AS BIGINT)) AS b""",
        """SELECT CAST(sign(-5) AS BIGINT) AS n, CAST(sign(0) AS BIGINT) AS z,
                  CAST(sign(2.5) AS BIGINT) AS p""",
        """SELECT greatest(CAST('2147483647' AS INTEGER),
                           CAST('-2147483648' AS INTEGER)) AS g,
                  least(CAST('2147483647' AS INTEGER),
                        CAST('-2147483648' AS INTEGER)) AS l""",
        """SELECT CAST(x AS BIGINT) AS x FROM (
             SELECT CAST('127' AS TINYINT) AS x
             UNION ALL SELECT CAST('32767' AS SMALLINT)
             UNION ALL SELECT CAST('2147483647' AS INTEGER))
           ORDER BY x""",
        """SELECT CAST(sum(CAST(x AS BIGINT)) AS BIGINT) AS s FROM (
             SELECT CAST('2147483647' AS INTEGER) AS x
             UNION ALL SELECT CAST('2147483647' AS INTEGER))""",
        """SELECT TRY_CAST(NULL AS INTEGER) IS NULL AS n""",
        """SELECT CAST('0042' AS INTEGER) AS zeros,
                  CAST('-0' AS INTEGER) AS negzero""",
        """SELECT CAST('+17' AS INTEGER) AS plus""",
        """SELECT l_orderkey % 2147483647 AS m FROM lineitem
           ORDER BY l_orderkey LIMIT 5""",
        """SELECT CAST(round(32767.4) AS INTEGER) AS r1,
                  CAST(round(-32768.4) AS INTEGER) AS r2""",
    ],
    # ── map/struct NULL-field edges (reference: map.slt, struct.slt —
    #    NULL values vs missing keys, NULL containers, nested access
    #    through a NULL middle) ─────────────────────────────────────────
    "map_struct_nulls": [
        ("""SELECT named_struct('a', 1, 'b', CAST(NULL AS INT)).b IS NULL AS bn,
                   named_struct('a', 1, 'b', CAST(NULL AS INT)).a AS av""",
         """SELECT (struct_pack(a := 1, b := CAST(NULL AS INTEGER))).b
                   IS NULL AS bn,
                   (struct_pack(a := 1, b := CAST(NULL AS INTEGER))).a AS av"""),
        ("""SELECT CAST(NULL AS STRUCT<a: INT>).a IS NULL AS n""",
         """SELECT (CAST(NULL AS STRUCT(a INTEGER))).a IS NULL AS n"""),
        ("""SELECT CAST(NULL AS STRUCT<s: STRUCT<v: INT>>).s.v IS NULL AS n""",
         """SELECT ((CAST(NULL AS STRUCT(s STRUCT(v INTEGER)))).s).v
                   IS NULL AS n"""),
        ("""SELECT named_struct('s', named_struct('v', 7)).s.v AS v""",
         """SELECT ((struct_pack(s := struct_pack(v := 7))).s).v AS v"""),
        ("""SELECT named_struct('a', 1, 'b', NULL) <=>
                   named_struct('a', 1, 'b', NULL) AS same""",
         """SELECT struct_pack(a := 1, b := NULL) IS NOT DISTINCT FROM
                   struct_pack(a := 1, b := NULL) AS same"""),
        ("""SELECT element_at(map('k', CAST(NULL AS INT)), 'k') IS NULL AS nv,
                   CAST(cardinality(map('k', CAST(NULL AS INT))) AS BIGINT)
                   AS n""",
         """SELECT (MAP {'k': CAST(NULL AS INTEGER)}['k'])[1] IS NULL AS nv,
                   CAST(cardinality(MAP {'k': CAST(NULL AS INTEGER)})
                        AS BIGINT) AS n"""),
        ("""SELECT element_at(map('k', 1), 'missing') IS NULL AS missing,
                   map_contains_key(map('k', CAST(NULL AS INT)), 'k')
                   AS has_null_val,
                   map_contains_key(map('k', 1), 'missing') AS has_missing""",
         """SELECT (MAP {'k': 1}['missing'])[1] IS NULL AS missing,
                   list_contains(map_keys(MAP {'k': CAST(NULL AS INTEGER)}),
                                 'k') AS has_null_val,
                   list_contains(map_keys(MAP {'k': 1}), 'missing')
                   AS has_missing"""),
        ("""SELECT element_at(CAST(NULL AS MAP<STRING, INT>), 'k')
                   IS NULL AS n,
                   size(CAST(NULL AS MAP<STRING, INT>)) IS NULL AS sz""",
         """SELECT (CAST(NULL AS MAP(VARCHAR, INTEGER))['k'])[1]
                   IS NULL AS n,
                   cardinality(CAST(NULL AS MAP(VARCHAR, INTEGER)))
                   IS NULL AS sz"""),
        ("""SELECT array_sort(map_keys(map('b', CAST(NULL AS INT), 'a', 2)))
                   AS ks""",
         """SELECT array_sort(map_keys(MAP {'b': CAST(NULL AS INTEGER),
                                            'a': 2})) AS ks"""),
        ("""SELECT element_at(map_from_arrays(array('x', 'y'),
                     array(CAST(NULL AS INT), 2)), 'x') IS NULL AS xn,
                   CAST(element_at(map_from_arrays(array('x', 'y'),
                     array(CAST(NULL AS INT), 2)), 'y') AS BIGINT) AS yv""",
         """SELECT (map(['x', 'y'], [CAST(NULL AS INTEGER), 2])['x'])[1]
                   IS NULL AS xn,
                   CAST((map(['x', 'y'], [CAST(NULL AS INTEGER), 2])['y'])[1]
                        AS BIGINT) AS yv"""),
        ("""SELECT element_at(array(named_struct('v', 3),
                                    named_struct('v', CAST(NULL AS INT))),
                              2).v IS NULL AS n,
                   element_at(array(named_struct('v', 3),
                                    named_struct('v', CAST(NULL AS INT))),
                              1).v AS v""",
         """SELECT (([struct_pack(v := 3),
                      struct_pack(v := CAST(NULL AS INTEGER))])[2]).v
                   IS NULL AS n,
                   (([struct_pack(v := 3),
                      struct_pack(v := CAST(NULL AS INTEGER))])[1]).v AS v"""),
        ("""SELECT coalesce(CAST(NULL AS STRUCT<a: INT>),
                            named_struct('a', 9)).a AS a""",
         """SELECT (coalesce(CAST(NULL AS STRUCT(a INTEGER)),
                             struct_pack(a := 9))).a AS a"""),
        ("""SELECT CASE WHEN o_orderkey % 2 = 0
                        THEN named_struct('k', o_orderkey)
                        ELSE CAST(NULL AS STRUCT<k: BIGINT>) END.k AS k
            FROM orders ORDER BY o_orderkey LIMIT 6""",
         """SELECT (CASE WHEN o_orderkey % 2 = 0
                         THEN struct_pack(k := o_orderkey)
                         ELSE CAST(NULL AS STRUCT(k BIGINT)) END).k AS k
            FROM orders ORDER BY o_orderkey LIMIT 6"""),
        ("""SELECT isnull(named_struct('a', CAST(NULL AS INT)).a) AS field_null,
                   isnotnull(named_struct('a', CAST(NULL AS INT))) AS struct_not""",
         """SELECT ((struct_pack(a := CAST(NULL AS INTEGER))).a IS NULL)
                   AS field_null,
                   (struct_pack(a := CAST(NULL AS INTEGER)) IS NOT NULL)
                   AS struct_not"""),
        ("""SELECT size(map_from_arrays(array(), array())) = 0 AS empty_ok,
                   element_at(map_from_arrays(array(), array()), 'k')
                   IS NULL AS miss""",
         """SELECT cardinality(map([], [])) = 0 AS empty_ok,
                   (map([], [])['k'])[1] IS NULL AS miss"""),
    ],
    # ── regex character-class / quantifier / group surface (reference:
    #    regexp.slt): bracket classes are dialect-portable; backslash
    #    classes pair (Spark string literals escape the backslash) ───────
    "regexp_classes": [
        """SELECT n_name, regexp_extract(n_name, '[0-9]+', 0) AS num
           FROM nation ORDER BY n_name LIMIT 8""",
        """SELECT regexp_extract('abc123def45', '[0-9]{2,3}', 0) AS m""",
        """SELECT regexp_extract('abc123', '[^0-9]+', 0) AS pre""",
        """SELECT regexp_extract('Hello World', '[A-Z][a-z]+', 0) AS w""",
        ("""SELECT regexp_extract('a12b', '\\\\d+', 0) AS d,
                   regexp_extract('a_b c', '\\\\w+', 0) AS w,
                   regexp_extract('a b', 'a\\\\sb', 0) AS s""",
         """SELECT regexp_extract('a12b', '\\d+', 0) AS d,
                   regexp_extract('a_b c', '\\w+', 0) AS w,
                   regexp_extract('a b', 'a\\sb', 0) AS s"""),
        ("""SELECT regexp_replace('a1b22c', '\\\\d', 'X') AS all_digits""",
         """SELECT regexp_replace('a1b22c', '\\d', 'X', 'g') AS all_digits"""),
        ("""SELECT regexp_replace('a.b.c', '\\\\.', '-') AS dots""",
         """SELECT regexp_replace('a.b.c', '\\.', '-', 'g') AS dots"""),
        """SELECT regexp_extract('key=value', '([a-z]+)=([a-z]+)', 1) AS k,
                  regexp_extract('key=value', '([a-z]+)=([a-z]+)', 2) AS v""",
        """SELECT regexp_extract('xy', '(?:x)(y)', 1) AS noncap""",
        """SELECT regexp_extract('cat', '^(cat|dog)$', 1) AS animal,
                  regexp_extract('cow', '^(cat|dog)$', 1) = '' AS nomatch""",
        """SELECT regexp_extract('aaa', 'a+?', 0) AS lazy,
                  regexp_extract('<x><y>', '<.+?>', 0) AS lazy_tag,
                  regexp_extract('<x><y>', '<.+>', 0) AS greedy_tag""",
        ("""SELECT regexp_like('ABC', '(?i)abc') AS ci,
                   regexp_like('ABC', 'abc') AS cs""",
         """SELECT regexp_matches('ABC', '(?i)abc') AS ci,
                   regexp_matches('ABC', 'abc') AS cs"""),
        ("""SELECT regexp_like('banana', '^b(an)+a$') AS rep,
                   regexp_like('banana', '^b(an){3}a$') AS exact3""",
         """SELECT regexp_matches('banana', '^b(an)+a$') AS rep,
                   regexp_matches('banana', '^b(an){3}a$') AS exact3"""),
        """SELECT regexp_extract('2024-01-15', '^([0-9]{4})-([0-9]{2})', 1)
                  AS y,
                  regexp_extract('2024-01-15', '^([0-9]{4})-([0-9]{2})', 2)
                  AS m""",
        """SELECT regexp_extract('no digits here', '[0-9]+', 0) = ''
                  AS empty_on_miss""",
        """SELECT regexp_replace('abc', 'z', 'X') AS untouched""",
        ("""SELECT split('a1b22c333d', '[0-9]+') AS parts""",
         """SELECT regexp_split_to_array('a1b22c333d', '[0-9]+') AS parts"""),
        ("""SELECT split('a,b;c', '[,;]') AS parts""",
         """SELECT regexp_split_to_array('a,b;c', '[,;]') AS parts"""),
        """SELECT o_orderpriority,
                  regexp_extract(o_orderpriority, '^([0-9])-', 1) AS prio_num
           FROM orders GROUP BY o_orderpriority, 2
           ORDER BY o_orderpriority""",
        ("""SELECT regexp_like(l_shipmode_x, '^[A-Z ]+$') AS caps FROM (
              SELECT upper(o_orderstatus) AS l_shipmode_x FROM orders
              ORDER BY o_orderkey LIMIT 4) t""",
         """SELECT regexp_matches(l_shipmode_x, '^[A-Z ]+$') AS caps FROM (
              SELECT upper(o_orderstatus) AS l_shipmode_x FROM orders
              ORDER BY o_orderkey LIMIT 4) t"""),
        """SELECT regexp_extract('aAbB', '[aA]+', 0) AS mixed""",
        """SELECT regexp_extract('x  y', 'x[ ]{2}y', 0) AS spaces""",
        ("""SELECT regexp_extract('w1 w22', '\\\\b\\\\w{2}\\\\b', 0)
                   AS boundary""",
         """SELECT regexp_extract('w1 w22', '\\b\\w{2}\\b', 0) AS boundary"""),
        ("""SELECT regexp_extract('abc123', '\\\\D+', 0) AS nondigit,
                   regexp_extract('ab 12', '\\\\S+', 0) AS nonspace,
                   regexp_extract('a_1 -', '\\\\W', 0) AS nonword""",
         """SELECT regexp_extract('abc123', '\\D+', 0) AS nondigit,
                   regexp_extract('ab 12', '\\S+', 0) AS nonspace,
                   regexp_extract('a_1 -', '\\W', 0) AS nonword"""),
        """SELECT regexp_extract('aeiou xyz', '[aeiou]+', 0) AS vowels,
                  regexp_extract('aeiou xyz', '[^aeiou ]+', 0) AS consonants""",
        """SELECT regexp_extract('a1-b2-c3', '([a-z][0-9])-([a-z][0-9])', 2)
                  AS second_pair""",
        ("""SELECT regexp_like('', '^$') AS empty_anchors,
                   regexp_like('x', '^$') AS nonempty""",
         """SELECT regexp_matches('', '^$') AS empty_anchors,
                   regexp_matches('x', '^$') AS nonempty"""),
        ("""SELECT regexp_like('aaa', '^a{2,}$') AS open_rep,
                   regexp_like('a', '^a{2,}$') AS under""",
         """SELECT regexp_matches('aaa', '^a{2,}$') AS open_rep,
                   regexp_matches('a', '^a{2,}$') AS under"""),
        """SELECT regexp_extract('order-42-priority', '[0-9]+', 0) AS num,
                  regexp_replace('order-42-priority', '[0-9]+', 'N')
                  AS masked""",
        ("""SELECT regexp_replace('a1b2', '([a-z])([0-9])', '$2$1')
                   AS backref_swap""",
         """SELECT regexp_replace('a1b2', '([a-z])([0-9])', '\\2\\1', 'g')
                   AS backref_swap"""),
        """SELECT regexp_extract('  leading', '^ +', 0) = '  ' AS two_sp""",
        ("""SELECT regexp_like(o_orderpriority, '^[0-9]-[A-Z]+$') AS shaped,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1 ORDER BY shaped""",
         """SELECT regexp_matches(o_orderpriority, '^[0-9]-[A-Z]+$')
                   AS shaped,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1 ORDER BY shaped"""),
        """SELECT regexp_extract('one  two   three', '[a-z]+ +[a-z]+', 0)
                  AS first_pair""",
    ],
    # ── per-aggregate edges: empty frames, all-NULL inputs, single-row
    #    variance, DISTINCT with NULLs, FILTER clauses (reference:
    #    aggregate.slt edge density) ─────────────────────────────────────
    "agg_edges4": [
        """SELECT count(*) AS n, CAST(count(x) AS BIGINT) AS cx,
                  sum(x) IS NULL AS sn, min(x) IS NULL AS mn,
                  max(x) IS NULL AS mx
           FROM (SELECT CAST(1 AS BIGINT) AS x) t WHERE x > 5""",
        """SELECT CAST(count(x) AS BIGINT) AS cx, sum(x) IS NULL AS s,
                  avg(x) IS NULL AS a
           FROM (SELECT CAST(NULL AS BIGINT) AS x
                 UNION ALL SELECT CAST(NULL AS BIGINT)) t""",
        """SELECT CAST(count(x) AS BIGINT) AS cx, count(*) AS n,
                  CAST(count(DISTINCT x) AS BIGINT) AS dx
           FROM (VALUES (1), (NULL), (1), (NULL), (2)) t(x)""",
        """SELECT CAST(sum(DISTINCT x) AS BIGINT) AS sd
           FROM (VALUES (3), (3), (-1), (-1)) t(x)""",
        """SELECT round(avg(DISTINCT CAST(x AS DOUBLE)), 4) AS ad
           FROM (VALUES (2), (2), (4)) t(x)""",
        """SELECT min(x) AS mn, max(x) AS mx
           FROM (VALUES ('banana'), ('Apple'), ('cherry')) t(x)""",
        """SELECT min(x) AS mn, max(x) AS mx
           FROM (VALUES (DATE '2024-01-01'), (DATE '2023-06-01')) t(x)""",
        """SELECT round(stddev_samp(x), 4) IS NULL AS ss_null,
                  round(stddev_pop(x), 4) AS sp,
                  round(var_samp(x), 4) IS NULL AS vs_null,
                  round(var_pop(x), 4) AS vp
           FROM (SELECT CAST(5.0 AS DOUBLE) AS x) t""",
        """SELECT round(stddev_samp(x), 4) AS ss, round(var_samp(x), 4) AS vs
           FROM (SELECT CAST(1.0 AS DOUBLE) AS x
                 UNION ALL SELECT CAST(3.0 AS DOUBLE)) t""",
        """SELECT round(covar_pop(x, y), 4) AS cp,
                  covar_samp(x, y) IS NULL AS cs_null
           FROM (SELECT CAST(1.0 AS DOUBLE) AS x,
                        CAST(2.0 AS DOUBLE) AS y) t""",
        """SELECT round(median(CAST(x AS DOUBLE)), 4) AS m
           FROM (VALUES (1), (2), (3), (4)) t(x)""",
        """SELECT round(CAST(percentile_cont(0.5)
                        WITHIN GROUP (ORDER BY x) AS DOUBLE), 4) AS p50,
                  round(CAST(percentile_cont(0.0)
                        WITHIN GROUP (ORDER BY x) AS DOUBLE), 4) AS p0,
                  round(CAST(percentile_cont(1.0)
                        WITHIN GROUP (ORDER BY x) AS DOUBLE), 4) AS p100
           FROM (SELECT CAST(1.0 AS DOUBLE) AS x
                 UNION ALL SELECT CAST(2.0 AS DOUBLE)
                 UNION ALL SELECT CAST(4.0 AS DOUBLE)) t""",
        """SELECT bool_and(x) AS ba, bool_or(x) AS bo
           FROM (VALUES (true), (NULL)) t(x)""",
        """SELECT bool_and(x) AS ba, bool_or(x) AS bo
           FROM (VALUES (false), (NULL)) t(x)""",
        """SELECT bool_and(x) IS NULL AS ba, bool_or(x) IS NULL AS bo
           FROM (SELECT CAST(NULL AS BOOLEAN) AS x) t""",
        """SELECT CAST(sum(x) FILTER (WHERE x > 1) AS BIGINT) AS s,
                  count(*) FILTER (WHERE x IS NULL) AS cn,
                  CAST(count(x) FILTER (WHERE x > 0) AS BIGINT) AS cp
           FROM (VALUES (1), (2), (NULL), (3)) t(x)""",
        """SELECT sum(x) FILTER (WHERE x > 100) IS NULL AS empty_filter
           FROM (VALUES (1), (2)) t(x)""",
        """SELECT o_orderstatus,
                  CAST(count(*) FILTER (WHERE o_totalprice > 100000)
                       AS BIGINT) AS big,
                  CAST(count(*) FILTER (WHERE o_totalprice <= 100000)
                       AS BIGINT) AS small
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT max(x) AS mx, min(x) AS mn
           FROM (VALUES (true), (false), (NULL)) t(x)""",
        """SELECT CAST(count(DISTINCT x) AS BIGINT) AS d
           FROM (SELECT CAST(NULL AS INT) AS x
                 UNION ALL SELECT CAST(NULL AS INT)) t""",
        """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderstatus
           HAVING count(*) > 0 AND min(o_totalprice) >= 0
           ORDER BY o_orderstatus""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM orders
           HAVING count(*) < 0""",
        """SELECT round(avg(CAST(x AS DOUBLE)), 4) AS a
           FROM (VALUES (1), (2)) t(x)""",
        """SELECT round(sum(CAST(x AS DOUBLE)), 4) AS tiny
           FROM (VALUES (1e-10), (2e-10)) t(x)""",
        """SELECT CAST(min(l_linenumber) AS BIGINT) AS mn,
                  CAST(max(l_linenumber) AS BIGINT) AS mx,
                  CAST(count(DISTINCT l_linenumber) AS BIGINT) AS d
           FROM lineitem""",
        """SELECT l_returnflag,
                  CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
                       AS BIGINT) AS hi,
                  CAST(sum(CASE WHEN l_quantity > 25 THEN 0 ELSE 1 END)
                       AS BIGINT) AS lo
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT x, CAST(count(*) AS BIGINT) AS n
           FROM (VALUES (NULL), (NULL), (1)) t(x)
           GROUP BY x ORDER BY x NULLS FIRST""",
        """SELECT CAST(sum(x) AS BIGINT) AS s
           FROM (VALUES (9223372036854),(9223372036854),(-1)) t(x)""",
        """SELECT round(avg(CAST(x AS DOUBLE)) FILTER (WHERE x % 2 = 0), 4)
                  AS even_avg
           FROM (VALUES (1), (2), (3), (4)) t(x)""",
        """SELECT CAST(min(x) FILTER (WHERE x > 1) AS BIGINT) AS mn,
                  CAST(max(x) FILTER (WHERE x < 4) AS BIGINT) AS mx
           FROM (VALUES (1), (2), (3), (4)) t(x)""",
        """SELECT bool_and(x IS NOT NULL) AS all_present
           FROM (VALUES (1), (2)) t(x)""",
        """SELECT round(stddev_pop(CAST(x AS DOUBLE)), 4) AS sp,
                  round(var_pop(CAST(x AS DOUBLE)), 4) AS vp
           FROM (VALUES (2), (4), (4), (4), (5), (5), (7), (9)) t(x)""",
        """SELECT round(corr(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), 4) AS c
           FROM (VALUES (1, 2), (2, 4), (3, 6)) t(x, y)""",
        """SELECT round(covar_samp(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), 4)
                  AS cs
           FROM (VALUES (1, 10), (2, 20), (3, 30)) t(x, y)""",
        """SELECT round(median(CAST(x AS DOUBLE)), 4) AS odd_exact
           FROM (VALUES (5), (1), (9)) t(x)""",
        """SELECT CAST(count(DISTINCT x) AS BIGINT) AS d,
                  CAST(count(DISTINCT y) AS BIGINT) AS dy
           FROM (VALUES (1, 'a'), (1, 'b'), (2, 'a'), (NULL, NULL)) t(x, y)""",
        """SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n,
                  round(sum(l_extendedprice), 2) AS rev
           FROM lineitem
           GROUP BY l_linestatus HAVING sum(l_extendedprice) > 0
           ORDER BY l_linestatus""",
        """SELECT CAST(sum(CAST(x AS BIGINT)) FILTER (WHERE x IS NOT NULL)
                       AS BIGINT) AS s,
                  CAST(count(*) FILTER (WHERE x IS NOT NULL) AS BIGINT) AS c
           FROM (VALUES (1), (NULL), (3)) t(x)""",
    ],
    # ── calendar boundaries: leap rules (century vs 400), month-end
    #    clamping, trunc boundaries, ISO week edges ──────────────────────
    "datetime_boundaries": [
        """SELECT last_day(DATE '2024-02-05') AS leap,
                  last_day(DATE '1900-02-05') AS century_not,
                  last_day(DATE '2000-02-05') AS quad_century""",
        """SELECT make_date(2024, 2, 29) AS ok_leap,
                  make_date(2023, 12, 31) AS year_end""",
        ("""SELECT DATE '2024-01-31' + INTERVAL '1' MONTH AS clamp_leap,
                   DATE '2023-01-31' + INTERVAL '1' MONTH AS clamp_non""",
         """SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE)
                   AS clamp_leap,
                   CAST(DATE '2023-01-31' + INTERVAL 1 MONTH AS DATE)
                   AS clamp_non"""),
        ("""SELECT DATE '2024-02-29' + INTERVAL '1' YEAR AS y1,
                   DATE '2024-02-29' - INTERVAL '1' YEAR AS ym1""",
         """SELECT CAST(DATE '2024-02-29' + INTERVAL 1 YEAR AS DATE) AS y1,
                   CAST(DATE '2024-02-29' - INTERVAL 1 YEAR AS DATE)
                   AS ym1"""),
        ("""SELECT add_months(DATE '2024-03-31', -1) AS back_clamp,
                   add_months(DATE '2024-01-31', 13) AS fwd_clamp""",
         """SELECT CAST(DATE '2024-03-31' - INTERVAL 1 MONTH AS DATE)
                   AS back_clamp,
                   CAST(DATE '2024-01-31' + INTERVAL 13 MONTH AS DATE)
                   AS fwd_clamp"""),
        """SELECT CAST(date_trunc('week', DATE '2024-01-01') AS DATE) AS mon,
                  CAST(date_trunc('week', DATE '2024-01-07') AS DATE)
                  AS sun_same_week""",
        """SELECT CAST(date_trunc('quarter', DATE '2024-08-15') AS DATE) AS q3,
                  CAST(date_trunc('quarter', DATE '2024-10-01') AS DATE)
                  AS q4_edge""",
        """SELECT CAST(date_trunc('year', DATE '2024-12-31') AS DATE) AS y,
                  CAST(date_trunc('month', DATE '2024-02-29') AS DATE)
                  AS m""",
        ("""SELECT CAST(weekofyear(DATE '2021-01-01') AS BIGINT) AS iso53,
                   CAST(weekofyear(DATE '2024-01-01') AS BIGINT) AS w1""",
         """SELECT CAST(date_part('week', DATE '2021-01-01') AS BIGINT)
                   AS iso53,
                   CAST(date_part('week', DATE '2024-01-01') AS BIGINT)
                   AS w1"""),
        ("""SELECT CAST(dayofyear(DATE '2024-12-31') AS BIGINT) AS leap_end,
                   CAST(dayofyear(DATE '2023-12-31') AS BIGINT) AS non_end""",
         """SELECT CAST(date_part('doy', DATE '2024-12-31') AS BIGINT)
                   AS leap_end,
                   CAST(date_part('doy', DATE '2023-12-31') AS BIGINT)
                   AS non_end"""),
        """SELECT CAST(date_part('quarter', DATE '2024-03-31') AS BIGINT)
                  AS q1_end,
                  CAST(date_part('quarter', DATE '2024-04-01') AS BIGINT)
                  AS q2_start""",
        ("""SELECT datediff(DATE '2024-03-01', DATE '2024-01-01') AS leap_span,
                   datediff(DATE '2023-03-01', DATE '2023-01-01')
                   AS non_span""",
         """SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-01')
                   AS leap_span,
                   date_diff('day', DATE '2023-01-01', DATE '2023-03-01')
                   AS non_span"""),
        ("""SELECT months_between(DATE '2024-02-29', DATE '2024-01-31')
                   AS clamp_mb""",
         """SELECT CAST(date_diff('month', DATE '2024-01-31',
                                  DATE '2024-02-29') AS DOUBLE) AS clamp_mb"""),
        """SELECT CAST(extract(YEAR FROM DATE '2024-02-29') AS BIGINT) AS y,
                  CAST(extract(MONTH FROM DATE '2024-02-29') AS BIGINT) AS m,
                  CAST(extract(DAY FROM DATE '2024-02-29') AS BIGINT) AS d""",
        """SELECT DATE '2024-02-28' < DATE '2024-02-29' AS lt,
                  DATE '2024-02-29' < DATE '2024-03-01' AS lt2""",
        """SELECT greatest(DATE '2024-02-29', DATE '2024-03-01') AS g,
                  least(DATE '2024-02-29', DATE '2023-03-01') AS l""",
        ("""SELECT CAST(datediff(o_orderdate, DATE '1996-01-01') AS BIGINT)
                   AS age
            FROM orders ORDER BY o_orderkey LIMIT 6""",
         """SELECT CAST(date_diff('day', DATE '1996-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT) AS age
            FROM orders ORDER BY o_orderkey LIMIT 6"""),
        """SELECT CAST(o_orderdate AS DATE) AS d FROM orders
           WHERE extract(MONTH FROM o_orderdate) = 2
             AND extract(DAY FROM o_orderdate) = 29
           ORDER BY d LIMIT 5""",
        ("""SELECT trunc(DATE '2024-08-15', 'MM') AS mm,
                   trunc(DATE '2024-08-15', 'YEAR') AS yy""",
         """SELECT CAST(date_trunc('month', DATE '2024-08-15') AS DATE) AS mm,
                   CAST(date_trunc('year', DATE '2024-08-15') AS DATE)
                   AS yy"""),
        ("""SELECT datediff(DATE '2024-01-01', DATE '2024-01-01') AS zero,
                   datediff(DATE '2024-01-01', DATE '2024-01-02') AS neg""",
         """SELECT date_diff('day', DATE '2024-01-01', DATE '2024-01-01')
                   AS zero,
                   date_diff('day', DATE '2024-01-02', DATE '2024-01-01')
                   AS neg"""),
        """SELECT make_date(1, 1, 1) AS min_ce,
                  make_date(9999, 12, 31) AS max_4digit""",
        """SELECT CAST(extract(YEAR FROM DATE '0001-01-01') AS BIGINT) AS y1,
                  CAST(extract(YEAR FROM DATE '9999-12-31') AS BIGINT)
                  AS y9999""",
        ("""SELECT dayofweek(DATE '2024-01-07') AS sun,
                   dayofweek(DATE '2024-01-01') AS mon""",
         """SELECT date_part('dow', DATE '2024-01-07') + 1 AS sun,
                   date_part('dow', DATE '2024-01-01') + 1 AS mon"""),
        ("""SELECT CAST(months_between(DATE '2024-03-31', DATE '2024-02-29')
                        AS DOUBLE) > 1.0 AS frac_days""",
         """SELECT (date_diff('day', DATE '2024-02-29', DATE '2024-03-31')
                    / 31.0) > 1.0 AS frac_days"""),
        """SELECT DATE '2024-12-31' = last_day(DATE '2024-12-05') AS dec_end""",
        """SELECT CAST(min(CAST(o_orderdate AS DATE)) AS DATE) AS lo,
                  CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS hi
           FROM orders""",
        ("""SELECT year(DATE '2024-02-29') * 10000 +
                   month(DATE '2024-02-29') * 100 +
                   day(DATE '2024-02-29') AS ymd""",
         """SELECT date_part('year', DATE '2024-02-29') * 10000 +
                   date_part('month', DATE '2024-02-29') * 100 +
                   date_part('day', DATE '2024-02-29') AS ymd"""),
        """SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
           FROM orders
           WHERE CAST(o_orderdate AS DATE) = (SELECT min(CAST(o_orderdate AS DATE))
                                              FROM orders)
           GROUP BY 1 ORDER BY d""",
        ("""SELECT date_add(DATE '2024-02-28', 1) AS into_leap,
                   date_add(DATE '2023-02-28', 1) AS into_march,
                   date_sub(DATE '2024-03-01', 1) AS back_leap""",
         """SELECT CAST(DATE '2024-02-28' + INTERVAL 1 DAY AS DATE)
                   AS into_leap,
                   CAST(DATE '2023-02-28' + INTERVAL 1 DAY AS DATE)
                   AS into_march,
                   CAST(DATE '2024-03-01' - INTERVAL 1 DAY AS DATE)
                   AS back_leap"""),
    ],
    # ── conditional/NULL propagation edges: simple CASE with NULL
    #    subject, nvl family, least/greatest NULL skipping ───────────────
    "cond_null_edges": [
        """SELECT CASE NULL WHEN NULL THEN 'hit' ELSE 'else' END AS simple,
                  CASE WHEN CAST(NULL AS BOOLEAN) THEN 'hit' ELSE 'else' END AS searched""",
        """SELECT CASE 2 WHEN 1 THEN 'one' WHEN 2 THEN 'two' END AS matched,
                  CASE 9 WHEN 1 THEN 'one' END IS NULL AS no_else""",
        """SELECT nullif(3, 3) IS NULL AS same, nullif(3, 4) AS diff,
                  nullif(NULL, 1) IS NULL AS null_lhs""",
        """SELECT coalesce(NULL, NULL, 7) AS c3,
                  coalesce(NULL, CAST(NULL AS INT)) IS NULL AS all_null""",
        ("""SELECT nvl(NULL, 9) AS n1, nvl(5, 9) AS n2,
                   nvl2(NULL, 'a', 'b') AS n3, nvl2(1, 'a', 'b') AS n4""",
         """SELECT ifnull(NULL, 9) AS n1, ifnull(5, 9) AS n2,
                   CASE WHEN NULL IS NOT NULL THEN 'a' ELSE 'b' END AS n3,
                   CASE WHEN 1 IS NOT NULL THEN 'a' ELSE 'b' END AS n4"""),
        """SELECT least(1, NULL) AS skip_null,
                  greatest(NULL, 5, NULL) AS skip_null2,
                  least(CAST(NULL AS INT), CAST(NULL AS INT)) IS NULL
                  AS all_null""",
        """SELECT CASE o_orderstatus WHEN 'F' THEN 'final'
                       WHEN 'O' THEN 'open' ELSE 'other' END AS s,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1 ORDER BY s""",
        """SELECT nullif(o_orderstatus, 'F') AS nf, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1 ORDER BY nf NULLS FIRST""",
        """SELECT coalesce(nullif('', ''), 'empty-as-null') AS oracle_trick""",
        """SELECT CASE WHEN NULL IS NULL THEN 'null-is-null' END AS tautology""",
        """SELECT ifnull(NULL, 'd') AS i1,
                  coalesce(NULL, 'd') AS c1""",
        """SELECT CASE WHEN o_totalprice > 150000 THEN 'hi'
                       WHEN o_totalprice > 50000 THEN 'mid'
                  END AS band, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1 ORDER BY band NULLS FIRST""",
        """SELECT least('apple', 'banana') AS l_str,
                  greatest(DATE '2024-01-01', DATE '2023-01-01') AS g_date""",
    ],
    # ── string function boundaries: empty inputs, out-of-range slices,
    #    pad truncation, NULL propagation vs skipping ─────────────────────
    "string_boundaries": [
        """SELECT substr('abcdef', -2) AS tail2, substr('abcdef', 10) AS past,
                  substr('abcdef', 2, 0) AS zero_len""",
        """SELECT substr('abcdef', 2, 100) AS clipped,
                  substr('abcdef', 6, 1) AS last_one""",
        """SELECT substr('', 1, 3) AS from_empty, length('') AS zero""",
        """SELECT lpad('abc', 2, 'x') AS truncd, lpad('abc', 6, 'xy') AS padded,
                  rpad('abc', 0, 'x') AS to_zero, lpad('', 3, 'ab') AS from_mt""",
        """SELECT rpad('abc', 6, 'xy') AS r_padded, rpad('abc', 3, 'x') AS asis""",
        """SELECT repeat('ab', 0) AS zero, repeat('ab', 3) AS three,
                  repeat('', 5) AS empties""",
        ("""SELECT split('a,,b', ',') AS holes, split(',a,', ',') AS edges""",
         """SELECT string_split('a,,b', ',') AS holes,
                   string_split(',a,', ',') AS edges"""),
        ("""SELECT split('', ',') AS empty_in""",
         """SELECT string_split('', ',') AS empty_in"""),
        """SELECT CAST(position('b' IN 'abc') AS BIGINT) AS hit,
                  CAST(position('z' IN 'abc') AS BIGINT) AS miss,
                  CAST(position('' IN 'abc') AS BIGINT) AS empty_needle""",
        """SELECT CAST(instr('abcabc', 'bc') AS BIGINT) AS first_hit,
                  CAST(instr('abc', 'zz') AS BIGINT) AS miss""",
        """SELECT left('abcdef', 2) AS l2, right('abcdef', 2) AS r2,
                  left('abcdef', 0) AS l0, right('', 3) AS r_mt""",
        # two-arg ltrim/rtrim argument order: Spark takes the trim-set
        # FIRST, DuckDB takes it second
        ("""SELECT trim('x' FROM 'xxhixx') AS both_ends,
                   ltrim('x', 'xxhix') AS l_only,
                   rtrim('x', 'xhixx') AS r_only""",
         """SELECT trim('x' FROM 'xxhixx') AS both_ends,
                   ltrim('xxhix', 'x') AS l_only,
                   rtrim('xhixx', 'x') AS r_only"""),
        """SELECT trim('  padded  ') AS spaces,
                  trim('' ) AS empty_trim""",
        """SELECT translate('abcba', 'ab', 'xy') AS swapped,
                  translate('abc', 'abc', 'x') AS deletes""",
        """SELECT reverse('abc') AS r, reverse('') AS r_mt,
                  reverse('a') AS r_one""",
        """SELECT ('a' || NULL) IS NULL AS pipe_null,
                  concat_ws('-', 'a', NULL, 'b') AS ws_skips,
                  concat_ws('-', NULL, NULL) AS ws_all_null""",
        """SELECT CAST(ascii('A') AS BIGINT) AS a, chr(66) AS b,
                  CAST(ascii('') AS BIGINT) AS empty_zero""",
        """SELECT contains('hello', 'ell') AS c, contains('hello', '') AS c_mt,
                  contains('', 'x') AS mt_c""",
        ("""SELECT startswith('hello', 'he') AS sw,
                   endswith('hello', 'lo') AS ew,
                   startswith('hello', '') AS sw_mt""",
         """SELECT starts_with('hello', 'he') AS sw,
                   ends_with('hello', 'lo') AS ew,
                   starts_with('hello', '') AS sw_mt"""),
        """SELECT md5('abc') AS h, md5('') AS h_empty""",
        """SELECT upper('mixed123') AS u, lower('MIXED123') AS l,
                  upper('') AS u_mt""",
        """SELECT replace('aaa', 'a', 'aa') AS grows,
                  replace('abc', '', 'X') AS empty_pat,
                  replace('abc', 'abc', '') AS to_empty""",
        """SELECT length(s) AS len, s = '' AS is_empty FROM (
             SELECT substr(n_name, 30) AS s FROM nation
             ORDER BY n_name LIMIT 4) t""",
        """SELECT lpad(n_name, 4, '.') AS clipped
           FROM nation ORDER BY n_name LIMIT 6""",
        """SELECT CAST(length(n_name) - length(replace(n_name, 'A', ''))
                       AS BIGINT) AS a_count
           FROM nation ORDER BY n_name LIMIT 8""",
        """SELECT concat_ws('', 'a', 'b') AS no_sep,
                  concat_ws('--', 'x') AS single""",
        """SELECT substring('hello world' FROM 7) AS from_kw,
                  substring('hello world' FROM 1 FOR 5) AS for_kw""",
        """SELECT trim(LEADING 'x' FROM 'xxab') AS lead_kw,
                  trim(TRAILING 'x' FROM 'abxx') AS trail_kw,
                  trim(BOTH 'x' FROM 'xabx') AS both_kw""",
        """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
           FROM orders WHERE contains(o_orderpriority, '-')
           GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT chr(97) || chr(98) AS ab""",
    ],
    # ── decimal precision/scale edges: exact arithmetic, HALF_UP cast
    #    rounding, scale growth, decimal→int truncation conventions ──────
    "decimal_edges": [
        """SELECT CAST('1.005' AS DECIMAL(10,2)) AS up,
                  CAST('2.675' AS DECIMAL(10,2)) AS up2,
                  CAST('-1.005' AS DECIMAL(10,2)) AS down""",
        """SELECT CAST(0.1 AS DECIMAL(10,4)) + CAST(0.2 AS DECIMAL(10,4))
                  AS exact""",
        """SELECT CAST(1.25 AS DECIMAL(10,2)) * CAST(0.04 AS DECIMAL(10,2))
                  AS product""",
        """SELECT round(CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2)), 4)
                  AS third""",
        # decimal→int: Spark truncates toward zero, DuckDB rounds
        ("""SELECT CAST(CAST('2.5' AS DECIMAL(10,1)) AS INT) AS p,
                   CAST(CAST('-2.5' AS DECIMAL(10,1)) AS INT) AS n""",
         """SELECT CAST(trunc(CAST('2.5' AS DECIMAL(10,1))) AS INTEGER) AS p,
                   CAST(trunc(CAST('-2.5' AS DECIMAL(10,1))) AS INTEGER)
                   AS n"""),
        """SELECT round(CAST(12345.678 AS DECIMAL(12,3)), -2) AS neg_scale""",
        """SELECT round(CAST(2.5 AS DECIMAL(5,1))) AS half_up,
                  round(CAST(3.5 AS DECIMAL(5,1))) AS half_up2,
                  round(CAST(-2.5 AS DECIMAL(5,1))) AS half_away""",
        """SELECT round(CAST(0.125 AS DECIMAL(6,3)), 2) AS tie_up,
                  round(CAST(0.135 AS DECIMAL(6,3)), 2) AS tie_up2""",
        """SELECT CAST(floor(CAST(-2.5 AS DECIMAL(5,1))) AS BIGINT) AS f_neg,
                  CAST(ceil(CAST(-2.5 AS DECIMAL(5,1))) AS BIGINT) AS c_neg,
                  CAST(floor(CAST(2.5 AS DECIMAL(5,1))) AS BIGINT) AS f_pos,
                  CAST(ceil(CAST(2.5 AS DECIMAL(5,1))) AS BIGINT) AS c_pos""",
        """SELECT CAST('99999999.99' AS DECIMAL(10,2)) AS at_precision,
                  TRY_CAST('999999999.99' AS DECIMAL(10,2)) IS NULL
                  AS over_precision""",
        """SELECT CAST('0.001' AS DECIMAL(10,2)) AS rounds_to_zero,
                  CAST('0.005' AS DECIMAL(10,2)) AS rounds_up""",
        """SELECT CAST(1 AS DECIMAL(3,0)) - CAST(2 AS DECIMAL(3,0)) AS neg,
                  abs(CAST('-7.25' AS DECIMAL(5,2))) AS absval""",
        """SELECT CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(12,2))
                  AS exact_sum
           FROM lineitem WHERE l_orderkey < 100""",
        """SELECT round(avg(CAST(l_tax AS DECIMAL(4,2))), 4) AS dec_avg
           FROM lineitem WHERE l_orderkey < 100""",
        """SELECT CAST(0.5 AS DECIMAL(2,1)) = CAST(0.50 AS DECIMAL(3,2))
                  AS cross_scale_eq""",
        """SELECT CAST('1e2' AS DECIMAL(10,2)) AS sci""",
        """SELECT greatest(CAST(1.5 AS DECIMAL(5,1)), CAST(1.25 AS DECIMAL(5,2)))
                  = 1.5 AS g_ok,
                  least(CAST(1.5 AS DECIMAL(5,1)), CAST(1.25 AS DECIMAL(5,2)))
                  = 1.25 AS l_ok""",
        """SELECT CAST(CAST(42 AS BIGINT) AS DECIMAL(20,0)) AS from_long,
                  CAST(CAST('42.0' AS DECIMAL(10,1)) AS BIGINT) AS back""",
        """SELECT round(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l_discount AS DECIMAL(4,2)), 2) AS rev
           FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 6""",
        """SELECT TRY_CAST('abc' AS DECIMAL(10,2)) IS NULL AS junk,
                  TRY_CAST('' AS DECIMAL(10,2)) IS NULL AS empty""",
        """SELECT CAST('  7.25  ' AS DECIMAL(6,2)) AS padded""",
        """SELECT round(CAST(2.345 AS DECIMAL(6,3))
                        + CAST(-2.345 AS DECIMAL(6,3)), 4) AS cancels""",
        """SELECT CAST(power(10, 3) AS BIGINT) AS p3,
                  round(power(10, -2), 4) AS p_neg""",
        """SELECT round(sqrt(2), 4) AS root2, round(cbrt(27), 4) AS cube,
                  CAST(log10(1000) AS BIGINT) AS lg,
                  CAST(log2(8) AS BIGINT) AS lb""",
    ],
    # ── window frame edge cases: forward-only and preceding-only ROWS
    #    frames, EMPTY frames (NULL), numeric RANGE with duplicates,
    #    DESC-order ranges, frames clipped at partition edges ────────────
    "window_frames5": [
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                     ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS BIGINT) AS s
           FROM (VALUES (1), (2), (3), (4)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                     ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(count(*) OVER (ORDER BY x
                     RANGE BETWEEN 0 PRECEDING AND 0 FOLLOWING) AS BIGINT)
                  AS peers
           FROM (VALUES (1), (1), (2)) t(x) ORDER BY x, peers""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                     RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS s
           FROM (VALUES (1), (2), (4)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                     ROWS BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT)
                  AS self
           FROM (VALUES (5), (7)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x DESC
                     RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS s
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                     AS BIGINT) AS total,
                  CAST(sum(x) OVER (ORDER BY x
                     ROWS BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS BIGINT)
                  AS clipped
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT p, x, CAST(sum(x) OVER (PARTITION BY p ORDER BY x
                     ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS s
           FROM (VALUES (0, 1), (0, 2), (1, 10), (1, 20)) t(p, x)
           ORDER BY p, x""",
        """SELECT x, CAST(min(x) OVER (ORDER BY x
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                     AS BIGINT) AS next_min
           FROM (VALUES (3), (1), (2)) t(x) ORDER BY x""",
        """SELECT x, CAST(count(*) OVER (ORDER BY x
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_peers
           FROM (VALUES (1), (1), (2), (2), (2)) t(x) ORDER BY x, cum_peers""",
        """SELECT x, first_value(x) OVER (ORDER BY x
                     ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) IS NULL
                  AS fv_empty_at_end
           FROM (VALUES (1), (2)) t(x) ORDER BY x""",
        """SELECT x, CAST(last_value(x) OVER (ORDER BY x
                     RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT)
                  AS last_peer
           FROM (VALUES (1), (1), (2)) t(x) ORDER BY x, last_peer""",
        """SELECT x, round(avg(CAST(x AS DOUBLE)) OVER (ORDER BY x
                     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS a
           FROM (VALUES (1), (2), (4)) t(x) ORDER BY x""",
        """SELECT o_orderkey,
                  CAST(sum(o_orderkey) OVER (PARTITION BY o_orderstatus
                     ORDER BY o_orderkey
                     ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS BIGINT) AS s
           FROM orders ORDER BY o_orderkey LIMIT 10""",
    ],
    # ── interval arithmetic: multi-unit composition, negative and
    #    multiplied intervals, timestamp spill into the next day ─────────
    "interval_arith": [
        ("""SELECT CAST(DATE '2024-01-15' + INTERVAL '1' MONTH
                        + INTERVAL '10' DAY AS DATE) AS d""",
         """SELECT CAST(DATE '2024-01-15' + INTERVAL '1 month 10 days'
                        AS DATE) AS d"""),
        ("""SELECT CAST(DATE '2024-03-01' - INTERVAL '2' DAY AS DATE) AS back,
                   CAST(DATE '2024-01-01' + INTERVAL '-1' DAY AS DATE)
                   AS neg_fwd""",
         """SELECT CAST(DATE '2024-03-01' - INTERVAL '2 days' AS DATE)
                   AS back,
                   CAST(DATE '2024-01-01' + INTERVAL '-1 day' AS DATE)
                   AS neg_fwd"""),
        ("""SELECT CAST(DATE '2024-01-01' + 3 * INTERVAL '1' DAY AS DATE)
                   AS d""",
         """SELECT CAST(DATE '2024-01-01' + 3 * INTERVAL '1 day' AS DATE)
                   AS d"""),
        ("""SELECT CAST(TIMESTAMP '2024-01-01 23:30:00'
                        + INTERVAL '90' MINUTE AS DATE) AS next_day""",
         """SELECT CAST(TIMESTAMP '2024-01-01 23:30:00'
                        + INTERVAL '90 minutes' AS DATE) AS next_day"""),
        ("""SELECT CAST(TIMESTAMP '2024-12-31 23:59:59'
                        + INTERVAL '1' SECOND AS DATE) AS new_year""",
         """SELECT CAST(TIMESTAMP '2024-12-31 23:59:59'
                        + INTERVAL '1 second' AS DATE) AS new_year"""),
        ("""SELECT CAST(DATE '2024-02-29' + INTERVAL '12' MONTH AS DATE)
                   AS next_feb""",
         """SELECT CAST(DATE '2024-02-29' + INTERVAL '12 months' AS DATE)
                   AS next_feb"""),
        ("""SELECT CAST(DATE '2020-02-29' + INTERVAL '4' YEAR AS DATE)
                   AS leap_to_leap""",
         """SELECT CAST(DATE '2020-02-29' + INTERVAL '4 years' AS DATE)
                   AS leap_to_leap"""),
        ("""SELECT DATE '2024-01-10' + INTERVAL '1' DAY
                   > DATE '2024-01-10' AS fwd""",
         """SELECT DATE '2024-01-10' + INTERVAL '1 day'
                   > DATE '2024-01-10' AS fwd"""),
        ("""SELECT CAST(o_orderdate + INTERVAL '90' DAY AS DATE) AS due
            FROM orders ORDER BY o_orderkey LIMIT 6""",
         """SELECT CAST(CAST(o_orderdate AS DATE) + INTERVAL '90 days'
                        AS DATE) AS due
            FROM orders ORDER BY o_orderkey LIMIT 6"""),
        ("""SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
            WHERE l_shipdate > TIMESTAMP '1996-01-01' + INTERVAL '6' MONTH
              AND l_shipdate < TIMESTAMP '1996-01-01' + INTERVAL '9' MONTH""",
         """SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
            WHERE l_shipdate > TIMESTAMP '1996-01-01' + INTERVAL '6 months'
              AND l_shipdate < TIMESTAMP '1996-01-01' + INTERVAL '9 months'"""),
        ("""SELECT CAST(DATE '2024-06-15' - INTERVAL '1' MONTH
                        - INTERVAL '15' DAY AS DATE) AS chained""",
         """SELECT CAST(DATE '2024-06-15' - INTERVAL '1 month'
                        - INTERVAL '15 days' AS DATE) AS chained"""),
    ],
    # ── nested arrays + NULL-element kernels: flatten, inner-array
    #    indexing, NULL probes into array functions ───────────────────────
    "nested_null_arrays": [
        ("""SELECT flatten(array(array(1, 2), array(3))) AS f,
                   flatten(array(array(), array(4))) AS with_empty""",
         """SELECT flatten([[1, 2], [3]]) AS f,
                   flatten([[], [4]]) AS with_empty"""),
        ("""SELECT element_at(array(array(1, 2), array(3, 4)), 2) AS inner2,
                   element_at(element_at(array(array(1, 2), array(3, 4)), 2),
                              1) AS scalar""",
         """SELECT ([[1, 2], [3, 4]])[2] AS inner2,
                   (([[1, 2], [3, 4]])[2])[1] AS scalar"""),
        ("""SELECT array_position(array(1, 5, 3), 5) AS hit,
                   CAST(array_position(array(1, 5, 3), 9) AS BIGINT) AS miss""",
         """SELECT list_position([1, 5, 3], 5) AS hit,
                   CAST(coalesce(list_position([1, 5, 3], 9), 0) AS BIGINT)
                   AS miss"""),
        ("""SELECT array_contains(array(1, 2), 2) AS hit,
                   array_contains(array(1, 2), 9) AS miss""",
         """SELECT list_contains([1, 2], 2) AS hit,
                   list_contains([1, 2], 9) AS miss"""),
        ("""SELECT array_contains(array(1, CAST(NULL AS INT)),
                                  CAST(NULL AS INT)) IS NULL AS null_probe""",
         """SELECT list_contains([1, CAST(NULL AS INTEGER)], NULL) IS NULL
                   AS null_probe"""),
        ("""SELECT filter(array(1, CAST(NULL AS INT), 2),
                          x -> x IS NOT NULL) AS compacted""",
         """SELECT list_filter([1, CAST(NULL AS INTEGER), 2],
                               x -> x IS NOT NULL) AS compacted"""),
        ("""SELECT transform(array(1, CAST(NULL AS INT), 3),
                             x -> x + 1) AS keeps_null""",
         """SELECT list_transform([1, CAST(NULL AS INTEGER), 3],
                                  x -> x + 1) AS keeps_null"""),
        ("""SELECT exists(array(1, CAST(NULL AS INT)), x -> x > 0) AS found""",
         """SELECT len(list_filter([1, CAST(NULL AS INTEGER)], x -> x > 0))
                   > 0 AS found"""),
        ("""SELECT size(array(array(1), array(2, 3))) AS outer_n,
                   size(element_at(array(array(1), array(2, 3)), 2))
                   AS inner_n""",
         """SELECT CAST(len([[1], [2, 3]]) AS INTEGER) AS outer_n,
                   CAST(len(([[1], [2, 3]])[2]) AS INTEGER) AS inner_n"""),
        ("""SELECT array_sort(array(3, CAST(NULL AS INT), 1)) AS nulls_last""",
         """SELECT list_sort([3, CAST(NULL AS INTEGER), 1],
                             'ASC', 'NULLS LAST') AS nulls_last"""),
        ("""SELECT array_compact(array(1, CAST(NULL AS INT), 2)) AS compact""",
         """SELECT list_filter([1, CAST(NULL AS INTEGER), 2],
                               x -> x IS NOT NULL) AS compact"""),
        ("""SELECT array_repeat(7, 3) AS sevens""",
         """SELECT [7, 7, 7] AS sevens"""),
        ("""SELECT flatten(array(array(n_regionkey), array(n_nationkey)))
                   AS f
            FROM nation ORDER BY n_nationkey LIMIT 5""",
         """SELECT flatten([[n_regionkey], [n_nationkey]]) AS f
            FROM nation ORDER BY n_nationkey LIMIT 5"""),
        ("""SELECT array_sort(array_distinct(
                     flatten(array(array(1, 2), array(2, 3))))) AS dedup""",
         """SELECT list_sort(list_distinct(flatten([[1, 2], [2, 3]])))
                   AS dedup"""),
        ("""SELECT zip_with(array(1, 2), array(10, 20), (a, b) -> a + b)
                   AS pairwise""",
         """SELECT list_transform(range(1, 3),
                                  i -> ([1, 2])[i] + ([10, 20])[i])
                   AS pairwise"""),
    ],
    # ── NOT IN three-valued semantics: a NULL anywhere in the list or
    #    subquery poisons every non-matching row to UNKNOWN ─────────────
    "notin_null_semantics": [
        """SELECT 1 NOT IN (2, 3) AS plain,
                  (1 NOT IN (2, NULL)) IS NULL AS poisoned,
                  2 NOT IN (2, NULL) AS still_false""",
        """SELECT 1 IN (1, NULL) AS hit,
                  (3 IN (1, NULL)) IS NULL AS miss_unknown""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM nation
           WHERE n_regionkey NOT IN (SELECT CAST(NULL AS INT))""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM nation
           WHERE n_regionkey NOT IN
                 (SELECT r_regionkey FROM region WHERE r_name = 'NOWHERE')""",
        """SELECT x FROM (VALUES (1), (2)) t(x)
           WHERE x IN (SELECT y FROM (VALUES (1), (NULL)) s(y))
           ORDER BY x""",
        """SELECT CAST(count(*) AS BIGINT) AS none_survive
           FROM (VALUES (2), (3)) t(x)
           WHERE x NOT IN (SELECT y FROM (VALUES (1), (NULL)) s(y))""",
        """SELECT (CAST(NULL AS INT) IN (1, 2)) IS NULL AS null_lhs,
                  (CAST(NULL AS INT) NOT IN (1, 2)) IS NULL AS null_lhs_not""",
        """SELECT CAST(count(*) AS BIGINT) AS kept FROM orders
           WHERE o_orderstatus NOT IN ('X', 'Y')""",
        """SELECT x FROM (VALUES (1), (2), (NULL)) t(x)
           WHERE x IN (1, 2, NULL) ORDER BY x""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM supplier
           WHERE s_nationkey NOT IN
                 (SELECT n_nationkey FROM nation WHERE n_name = 'FRANCE')""",
        """SELECT (NOT (1 IN (2, NULL))) IS NULL AS negated_unknown""",
    ],
    # ── scalar subqueries over empty inputs: zero rows yields NULL, and
    #    correlated scalars in the SELECT list follow the same rule ─────
    "scalar_subq_empty": [
        """SELECT (SELECT 42 WHERE 1 = 0) IS NULL AS empty_null""",
        """SELECT CAST((SELECT max(o_orderkey) FROM orders
                        WHERE o_orderkey < 0) AS BIGINT) IS NULL AS agg_empty""",
        """SELECT CAST((SELECT count(*) FROM orders WHERE o_orderkey < 0)
                       AS BIGINT) AS count_empty""",
        """SELECT coalesce((SELECT CAST(max(n_nationkey) AS INT) FROM nation
                            WHERE n_name = 'ATLANTIS'), -1) AS defaulted""",
        """SELECT r_name,
                  CAST((SELECT count(*) FROM nation n
                        WHERE n.n_regionkey = r.r_regionkey
                          AND n.n_name LIKE 'Z%') AS BIGINT) AS z_nations
           FROM region r ORDER BY r_name""",
        """SELECT r_name,
                  (SELECT max(n_name) FROM nation n
                   WHERE n.n_regionkey = r.r_regionkey
                     AND n.n_name LIKE 'ZZZ%') IS NULL AS none_found
           FROM region r ORDER BY r_name""",
        """SELECT CASE WHEN (SELECT min(o_totalprice) FROM orders
                             WHERE o_orderkey < 0) IS NULL
                       THEN 'empty' ELSE 'found' END AS branch""",
        """SELECT CAST((SELECT sum(n_regionkey) FROM nation
                        WHERE n_regionkey > 99) AS BIGINT) IS NULL
                  AS sum_empty_is_null,
                  CAST((SELECT count(n_regionkey) FROM nation
                        WHERE n_regionkey > 99) AS BIGINT) AS count_is_zero""",
        """SELECT x, CAST((SELECT sum(y) FROM (VALUES (1, 10), (1, 20)) s(k, y)
                           WHERE s.k = t.x) AS BIGINT) AS correlated_sum
           FROM (VALUES (1), (2)) t(x) ORDER BY x""",
        """SELECT (SELECT r_name FROM region WHERE r_regionkey = 0) AS one_row""",
    ],
    # ── USING / NATURAL join key coalescing and expression join keys ───
    "join_using_natural": [
        """SELECT r_regionkey, r_name
           FROM (SELECT n_regionkey AS r_regionkey, n_name FROM nation) n
           JOIN region USING (r_regionkey)
           ORDER BY r_regionkey, r_name LIMIT 5""",
        """SELECT k, a.v AS av, b.v AS bv
           FROM (VALUES (1, 'a1'), (2, 'a2')) a(k, v)
           FULL JOIN (VALUES (2, 'b2'), (3, 'b3')) b(k, v) USING (k)
           ORDER BY k""",
        """SELECT k FROM (VALUES (1), (2)) a(k)
           LEFT JOIN (VALUES (2), (3)) b(k) USING (k)
           ORDER BY k""",
        """SELECT k, av, bv FROM (
             SELECT k, a.v AS av, b.v AS bv
             FROM (VALUES (1, 'x')) a(k, v)
             RIGHT JOIN (VALUES (1, 'y'), (9, 'z')) b(k, v) USING (k)) t
           ORDER BY k""",
        """SELECT r_regionkey, CAST(count(*) AS BIGINT) AS n
           FROM region NATURAL JOIN
                (SELECT n_regionkey AS r_regionkey, n_name FROM nation) n
           GROUP BY r_regionkey ORDER BY r_regionkey""",
        """SELECT a.x, b.y FROM (VALUES (1), (2), (3)) a(x)
           JOIN (VALUES (2), (3), (4)) b(y) ON a.x = b.y - 1
           ORDER BY a.x""",
        """SELECT l.n_name, r.n_name AS nbr
           FROM nation l JOIN nation r
             ON l.n_regionkey = r.n_regionkey
            AND l.n_nationkey < r.n_nationkey
           ORDER BY l.n_name, nbr LIMIT 10""",
        """SELECT k, v FROM (VALUES (1, 'a'), (NULL, 'n')) a(k, x)
           JOIN (VALUES (1, 'a'), (NULL, 'm')) b(k, v) USING (k)
           ORDER BY k, v""",
        """SELECT count(*) = 25 AS all_nations
           FROM nation JOIN region ON n_regionkey = r_regionkey""",
        """SELECT k, CAST(count(*) AS BIGINT) AS n FROM
             (VALUES (1), (1), (2)) a(k) JOIN (VALUES (1), (1)) b(k) USING (k)
           GROUP BY k ORDER BY k""",
    ],
    # ── set-op type widening: int→bigint→double→decimal, NULL literal
    #    adoption, and distinct folding across coerced branches ─────────
    "setop_coercion2": [
        """SELECT x FROM (SELECT CAST(1 AS INT) AS x
                          UNION SELECT CAST(2147483648 AS BIGINT)) t
           ORDER BY x""",
        """SELECT round(x, 4) AS x FROM (
             SELECT CAST(1 AS INT) AS x UNION SELECT CAST(2.5 AS DOUBLE)) t
           ORDER BY x""",
        """SELECT x FROM (SELECT CAST(NULL AS INT) AS x UNION SELECT 7) t
           ORDER BY x NULLS FIRST""",
        """SELECT x FROM (SELECT 1 AS x UNION SELECT CAST(1 AS BIGINT)) t
           ORDER BY x""",
        """SELECT round(x, 4) AS x FROM (
             SELECT CAST(0.5 AS DECIMAL(3,1)) AS x
             UNION ALL SELECT CAST(0.25 AS DOUBLE)) t
           ORDER BY x""",
        """SELECT x FROM (
             SELECT CAST(3 AS SMALLINT) AS x
             INTERSECT SELECT CAST(3 AS BIGINT)) t ORDER BY x""",
        """SELECT x FROM (
             SELECT CAST(1 AS INT) AS x UNION ALL SELECT CAST(NULL AS INT)
             UNION ALL SELECT CAST(NULL AS INT)) t
           ORDER BY x NULLS LAST""",
        """SELECT x FROM (
             SELECT CAST(NULL AS INT) AS x UNION SELECT CAST(NULL AS INT)) t
           ORDER BY x""",
        """SELECT x FROM (
             SELECT 10 AS x EXCEPT SELECT CAST(10 AS BIGINT)) t ORDER BY x""",
        """SELECT CAST(sum(x) AS BIGINT) AS s FROM (
             SELECT n_nationkey AS x FROM nation
             UNION ALL SELECT CAST(r_regionkey AS BIGINT) FROM region) t""",
    ],
    # ── HAVING / GROUP BY edges: global HAVING, aggregates referenced
    #    only in HAVING, grouped expressions, NULL group keys ───────────
    "having_group_edges": [
        """SELECT CAST(count(*) AS BIGINT) AS n FROM orders
           HAVING count(*) > 0""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM orders
           HAVING max(o_totalprice) < 0""",
        """SELECT o_orderstatus FROM orders GROUP BY o_orderstatus
           HAVING sum(o_totalprice) > 1000 ORDER BY o_orderstatus""",
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderpriority
           HAVING count(DISTINCT o_custkey) > 5 AND min(o_orderkey) >= 1
           ORDER BY o_orderpriority""",
        """SELECT mod(o_orderkey, 3) AS bucket, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY mod(o_orderkey, 3) ORDER BY bucket""",
        """SELECT k, CAST(count(*) AS BIGINT) AS n
           FROM (VALUES (1), (NULL), (NULL), (2)) t(k)
           GROUP BY k ORDER BY k NULLS FIRST""",
        """SELECT substr(o_orderpriority, 1, 1) AS pfx,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY substr(o_orderpriority, 1, 1)
           HAVING count(*) > 100 ORDER BY pfx""",
        """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderstatus, o_orderpriority
           HAVING count(*) > 200
           ORDER BY o_orderstatus, o_orderpriority LIMIT 10""",
        """SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(min(o_orderkey) AS BIGINT) AS lo
           FROM orders HAVING count(*) > 10 AND avg(o_totalprice) > 0""",
        """SELECT k FROM (VALUES (1), (1), (2), (2), (3)) t(k)
           GROUP BY k HAVING count(*) = 1 ORDER BY k""",
    ],
    # ── multiple DISTINCT aggregates in one scan, DISTINCT + FILTER ────
    "distinct_agg_multi": [
        """SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ds,
                  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS dp,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders""",
        """SELECT CAST(sum(DISTINCT n_regionkey) AS BIGINT) AS sd,
                  CAST(sum(n_regionkey) AS BIGINT) AS s
           FROM nation""",
        """SELECT round(avg(DISTINCT CAST(x AS DOUBLE)), 4) AS ad
           FROM (VALUES (1), (1), (2), (4)) t(x)""",
        """SELECT CAST(count(DISTINCT k) AS BIGINT) AS dk
           FROM (VALUES (1), (NULL), (1), (NULL), (2)) t(k)""",
        """SELECT o_orderstatus,
                  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS dp,
                  CAST(count(DISTINCT mod(o_custkey, 10)) AS BIGINT) AS dc
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT CAST(count(DISTINCT o_orderstatus)
                       FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS hi,
                  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS all_s
           FROM orders""",
        """SELECT CAST(min(DISTINCT n_regionkey) AS BIGINT) AS mn,
                  CAST(max(DISTINCT n_regionkey) AS BIGINT) AS mx
           FROM nation""",
        """SELECT n_regionkey,
                  CAST(count(DISTINCT substr(n_name, 1, 1)) AS BIGINT)
                  AS initials
           FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
        """SELECT CAST(count(DISTINCT CASE WHEN o_totalprice > 150000
                                           THEN o_orderstatus END)
                       AS BIGINT) AS hi_statuses
           FROM orders""",
        """SELECT CAST(count(DISTINCT o_orderdate) AS BIGINT) AS days,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS custs,
                  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS stats
           FROM orders""",
    ],
    # ── ORDER BY surface: expressions, ordinals, aliases, mixed
    #    directions with explicit null placement ────────────────────────
    "orderby_edges": [
        """SELECT n_name FROM nation ORDER BY length(n_name), n_name LIMIT 8""",
        """SELECT n_name, n_regionkey FROM nation ORDER BY 2 DESC, 1 ASC
           LIMIT 8""",
        """SELECT n_name, length(n_name) AS len FROM nation
           ORDER BY len DESC, n_name LIMIT 8""",
        """SELECT k FROM (VALUES (3), (NULL), (1), (NULL), (2)) t(k)
           ORDER BY k ASC NULLS FIRST""",
        """SELECT k FROM (VALUES (3), (NULL), (1)) t(k)
           ORDER BY k DESC NULLS LAST""",
        """SELECT a, b FROM (VALUES (1, 'z'), (1, 'a'), (2, 'm')) t(a, b)
           ORDER BY a ASC, b DESC""",
        """SELECT n_name FROM nation
           ORDER BY CASE WHEN n_regionkey = 2 THEN 0 ELSE 1 END, n_name
           LIMIT 8""",
        """SELECT o_orderkey FROM orders
           ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 5""",
        """SELECT x FROM (VALUES (-2), (1), (-1), (2)) t(x)
           ORDER BY abs(x), x""",
        """SELECT n_name, mod(n_nationkey, 5) AS m FROM nation
           ORDER BY mod(n_nationkey, 5), n_name LIMIT 10""",
    ],
    # ── division and modulo sign/widening behavior ─────────────────────
    "arith_division": [
        """SELECT round(7 / 2, 4) AS fdiv, round(-7 / 2, 4) AS fneg""",
        ("""SELECT 7 DIV 2 AS q, (-7) DIV 2 AS qn, 7 DIV (-2) AS qd""",
         """SELECT 7 // 2 AS q, (-7) // 2 AS qn, 7 // (-2) AS qd"""),
        """SELECT mod(7, 3) AS m, mod(-7, 3) AS mn, mod(7, -3) AS md""",
        ("""SELECT pmod(-7, 3) AS pm, pmod(7, 3) AS pp""",
         """SELECT ((-7 % 3) + 3) % 3 AS pm, ((7 % 3) + 3) % 3 AS pp"""),
        """SELECT CAST(floor(-7.0 / 2) AS BIGINT) AS fl,
                  CAST(ceil(-7.0 / 2) AS BIGINT) AS ce""",
        """SELECT round(o_totalprice / 1000, 2) AS k
           FROM orders ORDER BY o_orderkey LIMIT 5""",
        """SELECT round(1 / 3.0, 4) AS third, round(2 / 3.0, 4) AS two_thirds""",
        """SELECT mod(o_orderkey, 10) AS m, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY mod(o_orderkey, 10) ORDER BY m""",
        """SELECT round(power(2, -2), 4) AS neg_exp,
                  CAST(power(0, 0) AS BIGINT) AS zz""",
        ("""SELECT try_divide(1, 0) IS NULL AS div0,
                   try_divide(10, 4) AS q""",
         """SELECT (1 / nullif(0, 0)) IS NULL AS div0,
                   10 / nullif(4, 0) AS q"""),
    ],
    # ── array surface 2: slicing, out-of-range element access, set ops,
    #    join/contains with NULLs (reference array.slt is its largest) ──
    "array_surface2": [
        ("""SELECT slice(array(1, 2, 3, 4, 5), 2, 3) AS mid,
                   slice(array(1, 2, 3), 1, 99) AS clipped""",
         """SELECT [1, 2, 3, 4, 5][2:4] AS mid, [1, 2, 3][1:99] AS clipped"""),
        ("""SELECT element_at(array(10, 20, 30), 2) AS second,
                   element_at(array(10, 20, 30), -1) AS last""",
         """SELECT [10, 20, 30][2] AS second, [10, 20, 30][-1] AS last"""),
        ("""SELECT try_element_at(array(1, 2), 9) IS NULL AS oob,
                   try_element_at(array(1, 2), 1) AS ok""",
         """SELECT [1, 2][9] IS NULL AS oob, [1, 2][1] AS ok"""),
        ("""SELECT array_join(array('a', 'b', 'c'), '-') AS j,
                   array_join(array('x', CAST(NULL AS STRING), 'z'), ',')
                   AS skip_null""",
         """SELECT array_to_string(['a', 'b', 'c'], '-') AS j,
                   array_to_string(['x', CAST(NULL AS VARCHAR), 'z'], ',')
                   AS skip_null"""),
        ("""SELECT array_sort(array_union(array(1, 2), array(2, 3))) AS u""",
         """SELECT list_sort(list_distinct(list_concat([1, 2], [2, 3])))
                   AS u"""),
        ("""SELECT array_sort(array_intersect(array(1, 2, 3), array(2, 3, 4)))
                   AS i""",
         """SELECT list_sort(list_filter([1, 2, 3],
                                         x -> list_contains([2, 3, 4], x)))
                   AS i"""),
        ("""SELECT array_sort(array_except(array(1, 2, 3), array(2))) AS e""",
         """SELECT list_sort(list_filter(list_distinct([1, 2, 3]),
                                         x -> NOT list_contains([2], x)))
                   AS e"""),
        ("""SELECT array_contains(array(1, 2), 2) AS hit,
                   array_contains(array(1, 2), 9) AS miss""",
         """SELECT list_contains([1, 2], 2) AS hit,
                   list_contains([1, 2], 9) AS miss"""),
        ("""SELECT array_remove(array(1, 2, 1, 3), 1) AS removed""",
         """SELECT list_filter([1, 2, 1, 3], x -> x IS DISTINCT FROM 1)
                   AS removed"""),
        ("""SELECT array_repeat(7, 3) AS reps, array_repeat(7, 0) AS zero""",
         """SELECT [7, 7, 7] AS reps, CAST([] AS BIGINT[]) AS zero"""),
        ("""SELECT array_position(array('a', 'b', 'c'), 'b') AS pos,
                   array_position(array('a'), 'z') AS missing""",
         """SELECT list_position(['a', 'b', 'c'], 'b') AS pos,
                   coalesce(list_position(['a'], 'z'), 0) AS missing"""),
        ("""SELECT array_max(array(3, 1, 2)) AS mx,
                   array_min(array(3, NULL, 2)) AS mn_skips_null""",
         """SELECT list_max([3, 1, 2]) AS mx,
                   list_min([3, NULL, 2]) AS mn_skips_null"""),
        ("""SELECT sort_array(array(3, 1, 2), false) AS descending""",
         """SELECT list_reverse_sort([3, 1, 2]) AS descending"""),
        ("""SELECT size(array(1, 2, 3)) AS n, size(array()) AS empty""",
         """SELECT len([1, 2, 3]) AS n, len([]) AS empty"""),
    ],
    # ── EXTRACT surface: every portable field, boundary dates ──────────
    "extract_surface": [
        """SELECT EXTRACT(YEAR FROM DATE '2024-02-29') AS y,
                  EXTRACT(MONTH FROM DATE '2024-02-29') AS m,
                  EXTRACT(DAY FROM DATE '2024-02-29') AS d""",
        """SELECT EXTRACT(QUARTER FROM DATE '2024-01-01') AS q1,
                  EXTRACT(QUARTER FROM DATE '2024-12-31') AS q4""",
        """SELECT EXTRACT(HOUR FROM TIMESTAMP '2024-01-01 23:45:56') AS h,
                  EXTRACT(MINUTE FROM TIMESTAMP '2024-01-01 23:45:56') AS mi,
                  CAST(EXTRACT(SECOND FROM TIMESTAMP '2024-01-01 23:45:56')
                       AS BIGINT) AS s""",
        ("""SELECT EXTRACT(DOY FROM DATE '2024-12-31') AS doy_leap,
                   EXTRACT(DOY FROM DATE '2023-12-31') AS doy_plain""",
         """SELECT EXTRACT(DAYOFYEAR FROM DATE '2024-12-31') AS doy_leap,
                   EXTRACT(DAYOFYEAR FROM DATE '2023-12-31') AS doy_plain"""),
        ("""SELECT EXTRACT(WEEK FROM DATE '2024-01-01') AS w1,
                   EXTRACT(WEEK FROM DATE '2023-01-01') AS w_sunday""",
         """SELECT EXTRACT(ISOYEAR FROM DATE '2024-01-01') - 2023 AS w1,
                   EXTRACT(WEEK FROM DATE '2023-01-01') AS w_sunday"""),
        """SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)
           ORDER BY y""",
        ("""SELECT dayofweek(DATE '2024-01-07') AS sun_is_1,
                   dayofweek(DATE '2024-01-08') AS mon_is_2""",
         """SELECT dayofweek(DATE '2024-01-07') + 1 AS sun_is_1,
                   dayofweek(DATE '2024-01-08') + 1 AS mon_is_2"""),
        ("""SELECT CAST(date_trunc('quarter', DATE '2024-05-15') AS DATE)
                   AS qtr,
                   CAST(date_trunc('year', DATE '2024-05-15') AS DATE)
                   AS yr""",
         """SELECT CAST(date_trunc('quarter', DATE '2024-05-15') AS DATE)
                   AS qtr,
                   CAST(date_trunc('year', DATE '2024-05-15') AS DATE)
                   AS yr"""),
        """SELECT EXTRACT(DAY FROM DATE '2024-03-31')
                  - EXTRACT(DAY FROM DATE '2024-02-29') AS day_diff""",
        ("""SELECT last_day(DATE '2024-02-05') AS leap_feb,
                   last_day(DATE '2023-02-05') AS plain_feb""",
         """SELECT last_day(DATE '2024-02-05') AS leap_feb,
                   last_day(DATE '2023-02-05') AS plain_feb"""),
    ],
    # ── aggregates over empty relations and all-NULL groups ────────────
    "agg_null_empty": [
        """SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(x) AS BIGINT) AS nx,
                  CAST(sum(x) AS BIGINT) IS NULL AS sum_null,
                  min(x) IS NULL AS min_null
           FROM (VALUES (1)) t(x) WHERE x < 0""",
        """SELECT CAST(sum(x) AS BIGINT) IS NULL AS all_null_sum,
                  CAST(count(x) AS BIGINT) AS count_skips,
                  avg(CAST(x AS DOUBLE)) IS NULL AS avg_null
           FROM (VALUES (CAST(NULL AS INT)), (NULL)) t(x)""",
        """SELECT k, CAST(sum(v) AS BIGINT) AS s,
                  CAST(count(v) AS BIGINT) AS c
           FROM (VALUES (1, 10), (1, NULL), (2, NULL)) t(k, v)
           GROUP BY k ORDER BY k""",
        """SELECT min(x) IS NULL AS mn, max(x) IS NULL AS mx
           FROM (VALUES (CAST(NULL AS INT))) t(x)""",
        """SELECT bool_and(b) AS ba, bool_or(b) AS bo
           FROM (VALUES (true), (NULL), (true)) t(b)""",
        """SELECT bool_and(b) IS NULL AS empty_ba
           FROM (VALUES (true)) t(b) WHERE NOT b""",
        """SELECT round(stddev_samp(CAST(x AS DOUBLE)), 4) IS NULL
                  AS single_row_null
           FROM (VALUES (5)) t(x)""",
        """SELECT round(var_pop(CAST(x AS DOUBLE)), 4) AS vp_single
           FROM (VALUES (5)) t(x)""",
        """SELECT string_agg(s, ',') IS NULL AS all_null
           FROM (VALUES (CAST(NULL AS VARCHAR(8))), (NULL)) t(s)""",
        """SELECT k, max(v) AS mv
           FROM (VALUES (1, 'a'), (1, NULL), (2, NULL)) t(k, v)
           GROUP BY k ORDER BY k""",
        """SELECT CAST(count(DISTINCT x) AS BIGINT) AS d
           FROM (VALUES (CAST(NULL AS INT)), (NULL)) t(x)""",
        """SELECT CAST(sum(CASE WHEN x > 10 THEN x END) AS BIGINT) IS NULL
                  AS filtered_to_null,
                  CAST(count(CASE WHEN x > 10 THEN x END) AS BIGINT) AS zero
           FROM (VALUES (1), (2)) t(x)""",
    ],
    # ── regex surface 3: like/count/substr/extract_all, flags, anchors ─
    "regex_surface3": [
        ("""SELECT regexp_like('hello42', '[a-z]+[0-9]+') AS m,
                   regexp_like('hello', '^[0-9]') AS no""",
         """SELECT regexp_matches('hello42', '[a-z]+[0-9]+') AS m,
                   regexp_matches('hello', '^[0-9]') AS no"""),
        ("""SELECT regexp_count('a1b2c3', '[0-9]') AS digits,
                   regexp_count('aaa', 'b') AS zero""",
         """SELECT len(regexp_extract_all('a1b2c3', '[0-9]')) AS digits,
                   len(regexp_extract_all('aaa', 'b')) AS zero"""),
        ("""SELECT regexp_substr('order-12345-x', '[0-9]+') AS first_num""",
         """SELECT regexp_extract('order-12345-x', '[0-9]+') AS first_num"""),
        ("""SELECT regexp_extract_all('a1b22c333', '[0-9]+', 0) AS all_nums""",
         """SELECT regexp_extract_all('a1b22c333', '[0-9]+') AS all_nums"""),
        ("""SELECT regexp_like('HELLO', '(?i)hello') AS ci,
                   regexp_like('HELLO', 'hello') AS cs""",
         """SELECT regexp_matches('HELLO', '(?i)hello') AS ci,
                   regexp_matches('HELLO', 'hello') AS cs"""),
        ("""SELECT regexp_like('abc', '^abc$') AS anchored,
                   regexp_like('xabcx', '^abc$') AS not_anchored,
                   regexp_like('xabcx', 'abc') AS unanchored""",
         """SELECT regexp_matches('abc', '^abc$') AS anchored,
                   regexp_matches('xabcx', '^abc$') AS not_anchored,
                   regexp_matches('xabcx', 'abc') AS unanchored"""),
        """SELECT regexp_extract('2024-03-15', '([0-9]{4})-([0-9]{2})', 2)
                  AS month_group""",
        ("""SELECT regexp_replace('a.b.c', '\\\\.', '/') AS escaped_dot""",
         """SELECT regexp_replace('a.b.c', '\\.', '/', 'g') AS escaped_dot"""),
        ("""SELECT regexp_like('aab', 'a{2}b') AS quant,
                   regexp_like('ab', 'a{2}b') AS under""",
         """SELECT regexp_matches('aab', 'a{2}b') AS quant,
                   regexp_matches('ab', 'a{2}b') AS under"""),
        ("""SELECT regexp_like('cat', 'cat|dog') AS alt1,
                   regexp_like('dog', 'cat|dog') AS alt2,
                   regexp_like('cow', 'cat|dog') AS neither""",
         """SELECT regexp_matches('cat', 'cat|dog') AS alt1,
                   regexp_matches('dog', 'cat|dog') AS alt2,
                   regexp_matches('cow', 'cat|dog') AS neither"""),
        """SELECT p_type, regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word
           FROM part WHERE p_partkey <= 5 ORDER BY p_partkey""",
        ("""SELECT regexp_count(p_name, ' ') + 1 AS words, p_name
           FROM part WHERE p_partkey <= 5 ORDER BY p_name""",
         """SELECT len(regexp_extract_all(p_name, ' ')) + 1 AS words, p_name
           FROM part WHERE p_partkey <= 5 ORDER BY p_name"""),
    ],
    # ── string pad/trim/split surface ──────────────────────────────────
    "string_pad_split": [
        ("""SELECT trim(BOTH 'x' FROM 'xxhixx') AS b,
                   trim(LEADING 'x' FROM 'xxhixx') AS l,
                   trim(TRAILING 'x' FROM 'xxhixx') AS t""",
         """SELECT trim('xxhixx', 'x') AS b, ltrim('xxhixx', 'x') AS l,
                   rtrim('xxhixx', 'x') AS t"""),
        ("""SELECT trim(BOTH 'ab' FROM 'abba-core-abab') AS charset""",
         """SELECT trim('abba-core-abab', 'ab') AS charset"""),
        """SELECT split_part('a,b,c', ',', 2) AS second,
                  split_part('a,b,c', ',', 1) AS first""",
        ("""SELECT split_part('a,b,c', ',', -1) AS last_part""",
         """SELECT split_part('a,b,c', ',', 3) AS last_part"""),
        """SELECT split_part('no-comma', ',', 1) AS whole,
                  split_part('a,,c', ',', 2) AS empty_mid""",
        """SELECT lpad('7', 3, '0') AS padded, lpad('12345', 3, '0') AS cut,
                  rpad('ab', 5, '.') AS rp""",
        ("""SELECT initcap('hello world') AS ic""",
         """SELECT upper(substring('hello world', 1, 1)) ||
                   substring('hello world', 2, 5) ||
                   upper(substring('hello world', 7, 1)) ||
                   substring('hello world', 8) AS ic"""),
        ("""SELECT translate('abcabc', 'abc', 'xyz') AS full_map,
                   translate('abc', 'ab', 'x') AS dropped""",
         """SELECT replace(replace(replace('abcabc', 'a', 'x'), 'b', 'y'),
                           'c', 'z') AS full_map,
                   replace(replace('abc', 'a', 'x'), 'b', '') AS dropped"""),
        """SELECT repeat('ab', 3) AS r3, repeat('ab', 0) AS r0,
                  length(repeat('x', 10)) AS len10""",
        ("""SELECT substring('hello' FROM 2 FOR 3) AS ansi_form,
                   substring('hello' FROM 3) AS tail""",
         """SELECT substring('hello', 2, 3) AS ansi_form,
                   substring('hello', 3) AS tail"""),
        """SELECT concat_ws('-', 'a', NULL, 'b') AS skips_null,
                  concat_ws('-', NULL, NULL) AS all_null_empty""",
        ("""SELECT ltrim('  hi  ') || '|' AS l, rtrim('  hi  ') || '|' AS r""",
         """SELECT ltrim('  hi  ') || '|' AS l, rtrim('  hi  ') || '|' AS r"""),
    ],
    # ── string→scalar cast edges: whitespace, exponents, try_cast ──────
    "cast_string_edges": [
        """SELECT CAST(' 42 ' AS INT) AS trimmed,
                  CAST('-7' AS INT) AS neg""",
        """SELECT try_cast('4 2' AS INT) IS NULL AS inner_space,
                  try_cast('' AS INT) IS NULL AS empty,
                  try_cast('abc' AS INT) IS NULL AS alpha""",
        """SELECT round(CAST('1e3' AS DOUBLE), 4) AS exp_pos,
                  round(CAST('1.5e-2' AS DOUBLE), 4) AS exp_neg""",
        """SELECT CAST('t' AS BOOLEAN) AS t_short,
                  CAST('1' AS BOOLEAN) AS one,
                  CAST('FALSE' AS BOOLEAN) AS case_insensitive""",
        """SELECT try_cast('maybe' AS BOOLEAN) IS NULL AS bad_bool""",
        """SELECT CAST('2024-02-29' AS DATE) AS leap,
                  try_cast('2024-02-30' AS DATE) IS NULL AS bad_day,
                  try_cast('not-a-date' AS DATE) IS NULL AS bad_text""",
        """SELECT CAST('   -3.5  ' AS DOUBLE) + 0.5 AS padded_float""",
        """SELECT CAST(CAST('00042' AS INT) AS BIGINT) AS leading_zeros""",
        """SELECT try_cast('2147483648' AS INT) IS NULL AS int_overflow,
                  CAST('2147483648' AS BIGINT) AS fits_bigint""",
        # Spark try_cast('5.0' AS INT) is NULL (ANSI text-to-int rejects
        # decimal text); DuckDB rounds it to 5 — two-variant to pin each
        ("""SELECT CAST('+5' AS INT) AS plus_sign,
                   try_cast('5.0' AS INT) IS NULL AS decimal_text_to_int""",
         """SELECT CAST('+5' AS INT) AS plus_sign,
                   try_cast('5x' AS INT) IS NULL AS decimal_text_to_int"""),
        """SELECT length(CAST(12345 AS STRING)) AS i2s,
                  CAST(true AS STRING) AS b2s""" if False else
        ("""SELECT length(CAST(12345 AS STRING)) AS i2s,
                   CAST(true AS STRING) AS b2s""",
         """SELECT length(CAST(12345 AS VARCHAR)) AS i2s,
                   CAST(true AS VARCHAR) AS b2s"""),
    ],
    # ── three-valued boolean truth tables ──────────────────────────────
    "bool_null_truth": [
        """SELECT (CAST(NULL AS BOOLEAN) AND false) AS null_and_false,
                  (CAST(NULL AS BOOLEAN) AND true) IS NULL AS null_and_true""",
        """SELECT (CAST(NULL AS BOOLEAN) OR true) AS null_or_true,
                  (CAST(NULL AS BOOLEAN) OR false) IS NULL AS null_or_false""",
        """SELECT (NOT CAST(NULL AS BOOLEAN)) IS NULL AS not_null""",
        """SELECT (CAST(NULL AS INT) = NULL) IS NULL AS eq_null,
                  (CAST(NULL AS INT) <> 5) IS NULL AS ne_null""",
        """SELECT NULL IS DISTINCT FROM NULL AS dd,
                  NULL IS NOT DISTINCT FROM NULL AS dnd,
                  1 IS DISTINCT FROM NULL AS one_vs_null""",
        """SELECT (1 < CAST(NULL AS INT)) IS NULL AS lt,
                  (1 >= CAST(NULL AS INT)) IS NULL AS ge""",
        """SELECT CAST(count(*) AS BIGINT) AS kept
           FROM (VALUES (1), (2), (NULL)) t(x) WHERE x > 0""",
        """SELECT CAST(count(*) AS BIGINT) AS kept_not
           FROM (VALUES (1), (2), (NULL)) t(x) WHERE NOT (x > 1)""",
        """SELECT x, coalesce(x > 1, false) AS defaulted
           FROM (VALUES (1), (2), (NULL)) t(x) ORDER BY x NULLS FIRST""",
        """SELECT (true AND NULL IS NULL) AS and_of_pred,
                  (false OR NULL IS NOT NULL) AS or_of_pred""",
        ("""SELECT every(x > 0) AS ev, any(x > 1) AS an
           FROM (VALUES (1), (2), (NULL)) t(x)""",
         """SELECT bool_and(x > 0) AS ev, bool_or(x > 1) AS an
           FROM (VALUES (1), (2), (NULL)) t(x)"""),
    ],
    # ── correlated EXISTS depth: through aggregates, HAVING, CASE ──────
    "exists_depth": [
        """SELECT r_name FROM region r
           WHERE NOT EXISTS (SELECT 1 FROM nation n
                             WHERE n.n_regionkey = r.r_regionkey
                               AND n.n_name LIKE 'ZZZ%')
           ORDER BY r_name""",
        """SELECT n_name FROM nation n
           WHERE EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_nationkey = n.n_nationkey
                         GROUP BY c.c_nationkey
                         HAVING count(*) > 3)
           ORDER BY n_name LIMIT 8""",
        """SELECT r_name,
                  CASE WHEN EXISTS (SELECT 1 FROM nation
                                    WHERE n_regionkey = r_regionkey
                                      AND n_nationkey > 20)
                       THEN 'high' ELSE 'low' END AS tier
           FROM region r ORDER BY r_name""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 300000)""",
        """SELECT n_name FROM nation n
           WHERE EXISTS (SELECT 1 FROM supplier s
                         WHERE s.s_nationkey = n.n_nationkey
                           AND EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_nationkey = s.s_nationkey))
           ORDER BY n_name LIMIT 10""",
        """SELECT r_name FROM region r
           WHERE EXISTS (SELECT 1 FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey)
             AND NOT EXISTS (SELECT 1 FROM nation n
                             WHERE n.n_regionkey = r.r_regionkey
                               AND n.n_nationkey > 100)
           ORDER BY r_name""",
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders o
           WHERE EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey
                           AND c.c_acctbal > 9000)
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        """SELECT CAST(count(*) AS BIGINT) AS no_match FROM region
           WHERE EXISTS (SELECT 1 WHERE 1 = 0)""",
        """SELECT CAST(count(*) AS BIGINT) AS all_match FROM region
           WHERE EXISTS (SELECT 1)""",
        """SELECT x FROM (VALUES (1), (2), (3)) t(x)
           WHERE EXISTS (SELECT 1 FROM (VALUES (2), (3), (4)) s(y)
                         WHERE s.y = t.x AND s.y > 2)
           ORDER BY x""",
    ],
    # ── datetime formatting: Spark date_format vs DuckDB strftime ──────
    "datetime_format": [
        ("""SELECT date_format(DATE '2024-03-15', 'yyyy-MM-dd') AS iso""",
         """SELECT strftime(DATE '2024-03-15', '%Y-%m-%d') AS iso"""),
        ("""SELECT date_format(DATE '2024-03-15', 'EEEE') AS day_name,
                   date_format(DATE '2024-03-17', 'EEEE') AS sunday""",
         """SELECT strftime(DATE '2024-03-15', '%A') AS day_name,
                   strftime(DATE '2024-03-17', '%A') AS sunday"""),
        ("""SELECT date_format(DATE '2024-03-15', 'MMMM') AS month_name,
                   date_format(DATE '2024-12-01', 'MMM') AS abbrev""",
         """SELECT strftime(DATE '2024-03-15', '%B') AS month_name,
                   strftime(DATE '2024-12-01', '%b') AS abbrev"""),
        ("""SELECT date_format(DATE '2024-03-05', 'dd/MM/yyyy') AS uk""",
         """SELECT strftime(DATE '2024-03-05', '%d/%m/%Y') AS uk"""),
        ("""SELECT date_format(TIMESTAMP '2024-03-15 14:07:09',
                               'HH:mm:ss') AS hms""",
         """SELECT strftime(TIMESTAMP '2024-03-15 14:07:09',
                            '%H:%M:%S') AS hms"""),
        ("""SELECT date_format(TIMESTAMP '2024-03-15 14:07:09',
                               'hh a') AS twelve_hour,
                   date_format(TIMESTAMP '2024-03-15 02:07:09',
                               'hh a') AS morning""",
         """SELECT strftime(TIMESTAMP '2024-03-15 14:07:09',
                            '%I %p') AS twelve_hour,
                   strftime(TIMESTAMP '2024-03-15 02:07:09',
                            '%I %p') AS morning"""),
        ("""SELECT date_format(DATE '2024-03-15', 'DDD') AS day_of_year,
                   date_format(DATE '2024-01-01', 'DDD') AS first""",
         """SELECT strftime(DATE '2024-03-15', '%j') AS day_of_year,
                   strftime(DATE '2024-01-01', '%j') AS first"""),
        ("""SELECT date_format(DATE '2024-02-29', 'yyyyMMdd') AS compact""",
         """SELECT strftime(DATE '2024-02-29', '%Y%m%d') AS compact"""),
        ("""SELECT CAST(o_orderdate AS DATE) AS d,
                   date_format(o_orderdate, 'yyyy-MM') AS ym
           FROM orders ORDER BY o_orderkey LIMIT 8""",
         """SELECT CAST(o_orderdate AS DATE) AS d,
                   strftime(o_orderdate, '%Y-%m') AS ym
           FROM orders ORDER BY o_orderkey LIMIT 8"""),
        ("""SELECT date_format(DATE '0099-01-05', 'yyyy-MM-dd')
                   AS ancient""",
         """SELECT strftime(DATE '0099-01-05', '%Y-%m-%d') AS ancient"""),
    ],
    # ── map function surface 2: concat/from_arrays/contains/empty ──────
    "map_surface2": [
        ("""SELECT array_sort(map_keys(
                     map_concat(map('a', 1), map('b', 2)))) AS ks""",
         """SELECT array_sort(map_keys(
                     map_concat(MAP {'a': 1}, MAP {'b': 2}))) AS ks"""),
        ("""SELECT CAST(element_at(
                     map_from_arrays(array('x', 'y'), array(10, 20)),
                     'y') AS BIGINT) AS vy""",
         """SELECT CAST((map(['x', 'y'], [10, 20])['y'])[1]
                        AS BIGINT) AS vy"""),
        ("""SELECT map_contains_key(map('a', 1, 'b', 2), 'a') AS has_a,
                   map_contains_key(map('a', 1, 'b', 2), 'z') AS has_z""",
         """SELECT list_contains(map_keys(MAP {'a': 1, 'b': 2}),
                                 'a') AS has_a,
                   list_contains(map_keys(MAP {'a': 1, 'b': 2}),
                                 'z') AS has_z"""),
        ("""SELECT CAST(size(map_from_arrays(
                     CAST(array() AS ARRAY<STRING>),
                     CAST(array() AS ARRAY<INT>))) AS BIGINT) AS empty_n""",
         """SELECT CAST(cardinality(MAP {}) AS BIGINT) AS empty_n"""),
        ("""SELECT element_at(map('k', CAST(NULL AS INT)), 'k') IS NULL
                     AS null_value,
                   map_contains_key(map('k', CAST(NULL AS INT)), 'k')
                     AS key_present""",
         """SELECT (MAP {'k': CAST(NULL AS INT)}['k'])[1] IS NULL
                     AS null_value,
                   list_contains(map_keys(MAP {'k': CAST(NULL AS INT)}),
                                 'k') AS key_present"""),
        ("""SELECT CAST(element_at(map(1, 'one', 2, 'two'), 2)
                        AS STRING) AS int_key""",
         """SELECT CAST((MAP {1: 'one', 2: 'two'}[2])[1]
                        AS VARCHAR) AS int_key"""),
        ("""SELECT n_name,
                   CAST(element_at(map(n_name, n_nationkey), n_name)
                        AS BIGINT) AS self_key
           FROM nation ORDER BY n_name LIMIT 6""",
         """SELECT n_name,
                   CAST((map([n_name], [n_nationkey])[n_name])[1]
                        AS BIGINT) AS self_key
           FROM nation ORDER BY n_name LIMIT 6"""),
        ("""SELECT array_sort(map_values(
                     map_concat(map('a', 5), map('b', 3)))) AS vs""",
         """SELECT array_sort(map_values(
                     map_concat(MAP {'a': 5}, MAP {'b': 3}))) AS vs"""),
        ("""SELECT CAST(element_at(
                     str_to_map('a:1,b:2', ',', ':'), 'b')
                        AS STRING) AS parsed""",
         """SELECT CAST((MAP {'a': '1', 'b': '2'}['b'])[1]
                        AS VARCHAR) AS parsed"""),
        ("""SELECT element_at(map('a', 1), 'missing') IS NULL AS miss,
                   CAST(size(map('a', 1, 'b', 2, 'c', 3)) AS BIGINT)
                     AS n3""",
         """SELECT (MAP {'a': 1}['missing'])[1] IS NULL AS miss,
                   CAST(cardinality(MAP {'a': 1, 'b': 2, 'c': 3})
                        AS BIGINT) AS n3"""),
    ],
    # ── LATERAL subqueries: correlated derived tables ──────────────────
    "lateral_subquery": [
        """SELECT t.x, l.y
           FROM (VALUES (1), (2), (3)) t(x),
                LATERAL (SELECT t.x * 10 AS y) l
           ORDER BY t.x""",
        """SELECT t.x, l.y
           FROM (VALUES (1), (2)) t(x)
           JOIN LATERAL (SELECT t.x + 100 AS y) l ON true
           ORDER BY t.x""",
        """SELECT r.r_name, l.n
           FROM region r,
                LATERAL (SELECT CAST(count(*) AS BIGINT) AS n
                         FROM nation WHERE n_regionkey = r.r_regionkey) l
           ORDER BY r.r_name""",
        """SELECT n.n_name, l.total
           FROM nation n,
                LATERAL (SELECT CAST(count(*) AS BIGINT) AS total
                         FROM supplier s
                         WHERE s.s_nationkey = n.n_nationkey) l
           WHERE l.total > 0
           ORDER BY n.n_name LIMIT 8""",
        """SELECT t.x, l.a, l.b
           FROM (VALUES (2), (5)) t(x),
                LATERAL (SELECT t.x - 1 AS a, t.x + 1 AS b) l
           ORDER BY t.x""",
        """SELECT r.r_name, l.max_nk
           FROM region r,
                LATERAL (SELECT CAST(max(n_nationkey) AS BIGINT) AS max_nk
                         FROM nation WHERE n_regionkey = r.r_regionkey) l
           ORDER BY r.r_name""",
        """SELECT t.x, l.y
           FROM (VALUES (1), (2)) t(x),
                LATERAL (SELECT y FROM (VALUES (10), (20)) s(y)
                         WHERE y > t.x * 10 - 5) l
           ORDER BY t.x, l.y""",
        """SELECT c.c_name, l.order_count
           FROM customer c,
                LATERAL (SELECT CAST(count(*) AS BIGINT) AS order_count
                         FROM orders o WHERE o.o_custkey = c.c_custkey) l
           WHERE c.c_custkey <= 5
           ORDER BY c.c_name""",
    ],
    # ── string measurement: bytes vs chars, codepoints, slices ─────────
    "string_measure": [
        ("""SELECT CAST(octet_length('abc') AS BIGINT) AS ascii_bytes,
                   CAST(octet_length('é') AS BIGINT) AS accent_bytes""",
         """SELECT CAST(strlen('abc') AS BIGINT) AS ascii_bytes,
                   CAST(strlen('é') AS BIGINT) AS accent_bytes"""),
        """SELECT CAST(bit_length('ab') AS BIGINT) AS bits""",
        """SELECT CAST(length('héllo') AS BIGINT) AS chars,
                  upper('éa') AS upper_acc""",
        """SELECT CAST(ascii('a') AS BIGINT) AS lower_a,
                  CAST(ascii('A') AS BIGINT) AS upper_a,
                  CAST(ascii('') AS BIGINT) AS empty""",
        """SELECT chr(65) AS a, chr(122) AS z""",
        """SELECT left('hello', 2) AS l2, right('hello', 2) AS r2,
                  left('hi', 10) AS l_over""",
        ("""SELECT CAST(instr('hello', 'll') AS BIGINT) AS pos,
                   CAST(instr('hello', 'zz') AS BIGINT) AS missing""",
         """SELECT CAST(strpos('hello', 'll') AS BIGINT) AS pos,
                   CAST(strpos('hello', 'zz') AS BIGINT) AS missing"""),
        """SELECT reverse('abc') AS r, reverse('') AS empty""",
        """SELECT n_name, CAST(length(n_name) AS BIGINT) AS len,
                  left(n_name, 3) AS pre
           FROM nation ORDER BY n_name LIMIT 8""",
        ("""SELECT CAST(levenshtein('kitten', 'sitting') AS BIGINT)
                     AS lev,
                   CAST(levenshtein('abc', 'abc') AS BIGINT) AS same""",
         """SELECT CAST(levenshtein('kitten', 'sitting') AS BIGINT)
                     AS lev,
                   CAST(levenshtein('abc', 'abc') AS BIGINT) AS same"""),
    ],
    # ── CASE/WHEN typing and short-circuit edges ───────────────────────
    "case_when_types": [
        """SELECT round(CASE WHEN true THEN 1 ELSE 2.5 END, 4)
                  AS widened""",
        """SELECT CASE WHEN false THEN 'x' END IS NULL AS no_else""",
        """SELECT CASE CAST(NULL AS INT) WHEN NULL THEN 'matched'
                       ELSE 'unmatched' END AS simple_null""",
        # bare NULL condition is VOID in Spark (no implicit BOOLEAN
        # coercion) — the typed form is the portable spelling
        """SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 'taken'
                       ELSE 'skipped' END AS null_cond""",
        """SELECT x, CASE WHEN x = 0 THEN -1
                          WHEN 10 / x > 3 THEN 1
                          ELSE 0 END AS guarded
           FROM (VALUES (0), (2), (5)) t(x) ORDER BY x""",
        """SELECT CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
                       AS BIGINT) AS big,
                  CAST(sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END)
                       AS BIGINT) AS small
           FROM lineitem""",
        """SELECT CASE WHEN n_regionkey < 2 THEN 'low' ELSE 'high' END
                    AS band,
                  CAST(count(*) AS BIGINT) AS n
           FROM nation
           GROUP BY CASE WHEN n_regionkey < 2 THEN 'low' ELSE 'high' END
           ORDER BY band""",
        """SELECT x, CASE x WHEN 1 THEN 'one' WHEN 2 THEN 'two'
                            ELSE 'many' END AS named
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT CASE WHEN 1 = 1 THEN CASE WHEN 2 = 2 THEN 'both'
                                            ELSE 'outer' END
                       ELSE 'neither' END AS nested""",
        """SELECT x,
                  CASE WHEN x > 1 THEN CAST(x AS DOUBLE) / 2
                       ELSE CAST(x AS DOUBLE) END AS mixed_branches
           FROM (VALUES (1), (4)) t(x) ORDER BY x""",
    ],
    # ── quantified comparisons: ALL / ANY subqueries. Spark 4.1 has NO
    #    quantified-comparison syntax (parse error — probed 2026-08-13);
    #    the Spark variants are the standard EXISTS / extremum rewrites,
    #    including the three-valued CASE form when NULLs are in play ────
    "quantified_subq": [
        ("""SELECT 5 > (SELECT max(x)
                        FROM (VALUES (1), (2), (3)) t(x)) AS gt_all""",
         """SELECT 5 > ALL (SELECT x FROM (VALUES (1), (2), (3)) t(x))
                   AS gt_all"""),
        ("""SELECT 2 > (SELECT max(x)
                        FROM (VALUES (1), (2), (3)) t(x)) AS not_gt_all""",
         """SELECT 2 > ALL (SELECT x FROM (VALUES (1), (2), (3)) t(x))
                   AS not_gt_all"""),
        ("""SELECT EXISTS (SELECT 1 FROM (VALUES (1), (2), (3)) t(x)
                           WHERE x = 2) AS eq_any,
                   EXISTS (SELECT 1 FROM (VALUES (1), (2), (3)) t(x)
                           WHERE x = 9) AS eq_none""",
         """SELECT 2 = ANY (SELECT x FROM (VALUES (1), (2), (3)) t(x))
                   AS eq_any,
                   9 = ANY (SELECT x FROM (VALUES (1), (2), (3)) t(x))
                   AS eq_none"""),
        ("""SELECT NOT EXISTS (SELECT 1 FROM (VALUES (1)) t(x)
                               WHERE x > 99 AND NOT (5 > x))
                     AS empty_all,
                   EXISTS (SELECT 1 FROM (VALUES (1)) t(x)
                           WHERE x > 99 AND x = 5) AS empty_any""",
         """SELECT 5 > ALL (SELECT x FROM (VALUES (1)) t(x) WHERE x > 99)
                   AS empty_all,
                   5 = ANY (SELECT x FROM (VALUES (1)) t(x) WHERE x > 99)
                   AS empty_any"""),
        ("""SELECT (CASE WHEN EXISTS (SELECT 1
                                      FROM (VALUES (1), (NULL)) t(x)
                                      WHERE NOT (5 > x)) THEN false
                         WHEN EXISTS (SELECT 1
                                      FROM (VALUES (1), (NULL)) t(x)
                                      WHERE x IS NULL)
                           THEN CAST(NULL AS BOOLEAN)
                         ELSE true END) IS NULL AS null_in_all""",
         """SELECT (5 > ALL (SELECT x FROM (VALUES (1), (NULL)) t(x)))
                   IS NULL AS null_in_all"""),
        ("""SELECT EXISTS (SELECT 1 FROM (VALUES (1), (NULL)) t(x)
                           WHERE x = 1) AS match_despite_null""",
         """SELECT 1 = ANY (SELECT x FROM (VALUES (1), (NULL)) t(x))
                   AS match_despite_null"""),
        ("""SELECT (CASE WHEN EXISTS (SELECT 1
                                      FROM (VALUES (1), (NULL)) t(x)
                                      WHERE x = 9) THEN true
                         WHEN EXISTS (SELECT 1
                                      FROM (VALUES (1), (NULL)) t(x)
                                      WHERE x IS NULL)
                           THEN CAST(NULL AS BOOLEAN)
                         ELSE false END) IS NULL AS no_match_null_any""",
         """SELECT (9 = ANY (SELECT x FROM (VALUES (1), (NULL)) t(x)))
                   IS NULL AS no_match_null_any"""),
        ("""SELECT r_name FROM region
           WHERE r_regionkey >= (SELECT max(n_regionkey) FROM nation
                                 WHERE n_nationkey < 3)
           ORDER BY r_name""",
         """SELECT r_name FROM region
           WHERE r_regionkey >= ALL (SELECT n_regionkey FROM nation
                                     WHERE n_nationkey < 3)
           ORDER BY r_name"""),
        ("""SELECT n_name FROM nation
           WHERE n_nationkey < (SELECT max(r_regionkey) FROM region)
           ORDER BY n_name LIMIT 5""",
         """SELECT n_name FROM nation
           WHERE n_nationkey < ANY (SELECT r_regionkey FROM region)
           ORDER BY n_name LIMIT 5"""),
        ("""SELECT NOT EXISTS (SELECT 1 FROM (VALUES (1), (2)) t(x)
                               WHERE x = 3) AS neq_all,
                   NOT EXISTS (SELECT 1 FROM (VALUES (1), (2)) t(x)
                               WHERE x = 2) AS neq_all_hit""",
         """SELECT 3 <> ALL (SELECT x FROM (VALUES (1), (2)) t(x))
                   AS neq_all,
                   2 <> ALL (SELECT x FROM (VALUES (1), (2)) t(x))
                   AS neq_all_hit"""),
    ],
    # ── grouping sets 2: mixed sets, grouping(), partial rollup ────────
    "grouping_sets2": [
        """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n
           FROM nation
           GROUP BY GROUPING SETS ((n_regionkey), ())
           ORDER BY n_regionkey NULLS FIRST""",
        """SELECT n_regionkey, CAST(grouping(n_regionkey) AS BIGINT) AS g,
                  CAST(count(*) AS BIGINT) AS n
           FROM nation
           GROUP BY ROLLUP(n_regionkey)
           ORDER BY g, n_regionkey NULLS FIRST""",
        """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n
           FROM nation JOIN region ON n_regionkey = r_regionkey
           WHERE n_nationkey < 6
           GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
           ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
        """SELECT o_orderpriority, o_orderstatus,
                  CAST(grouping(o_orderpriority) AS BIGINT) AS gp,
                  CAST(grouping(o_orderstatus) AS BIGINT) AS gs,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders
           GROUP BY CUBE(o_orderpriority, o_orderstatus)
           ORDER BY gp, gs, o_orderpriority NULLS FIRST,
                    o_orderstatus NULLS FIRST""",
        """SELECT n_regionkey, CAST(sum(n_nationkey) AS BIGINT) AS s
           FROM nation
           GROUP BY GROUPING SETS ((n_regionkey))
           ORDER BY n_regionkey""",
        """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
           FROM orders
           GROUP BY ROLLUP(o_orderstatus)
           HAVING grouping(o_orderstatus) = 0
           ORDER BY o_orderstatus""",
        """SELECT CASE WHEN n_regionkey < 2 THEN 'low' ELSE 'high' END
                    AS band,
                  n_regionkey, CAST(count(*) AS BIGINT) AS n
           FROM nation
           GROUP BY GROUPING SETS
                    ((CASE WHEN n_regionkey < 2 THEN 'low'
                           ELSE 'high' END),
                     (n_regionkey))
           ORDER BY band NULLS FIRST, n_regionkey NULLS FIRST""",
        """SELECT o_orderpriority, o_orderstatus,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders
           GROUP BY o_orderpriority, ROLLUP(o_orderstatus)
           ORDER BY o_orderpriority, o_orderstatus NULLS FIRST""",
    ],
    # ── window navigation edges: nth beyond, defaults, distribution ────
    "window_navigation2": [
        """SELECT x, nth_value(x, 5) OVER
                    (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING)
                    AS beyond
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(lag(x, 1, -99) OVER (ORDER BY x) AS BIGINT)
                    AS lag_default,
                  CAST(lead(x, 1, -99) OVER (ORDER BY x) AS BIGINT)
                    AS lead_default
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(lag(x, 2) OVER (ORDER BY x) AS BIGINT) AS lag2
           FROM (VALUES (1), (2), (3), (4)) t(x) ORDER BY x""",
        """SELECT x, round(percent_rank() OVER (ORDER BY x), 4) AS pr
           FROM (VALUES (10)) t(x)""",
        """SELECT x, round(cume_dist() OVER (ORDER BY x), 4) AS cd
           FROM (VALUES (1), (1), (2)) t(x) ORDER BY x, cd""",
        """SELECT x, CAST(ntile(3) OVER (ORDER BY x) AS BIGINT) AS bucket
           FROM (VALUES (1), (2), (3), (4), (5)) t(x) ORDER BY x""",
        """SELECT x, CAST(ntile(10) OVER (ORDER BY x) AS BIGINT)
                    AS more_buckets_than_rows
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(first_value(x) OVER
                    (ORDER BY x DESC NULLS LAST) AS BIGINT) AS max_so_far
           FROM (VALUES (1), (3), (2)) t(x) ORDER BY x""",
        """SELECT n_name,
                  CAST(nth_value(n_nationkey, 2) OVER
                       (PARTITION BY n_regionkey ORDER BY n_name
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING) AS BIGINT)
                    AS second_key
           FROM nation WHERE n_regionkey = 1 ORDER BY n_name""",
        """SELECT x, CAST(lead(x, 3) OVER (ORDER BY x) AS BIGINT)
                    AS lead_off_end
           FROM (VALUES (1), (2)) t(x) ORDER BY x""",
    ],
    # ── rounding surface: half-up vs banker's, negative digits ─────────
    "rounding_surface": [
        """SELECT CAST(round(2.5) AS BIGINT) AS half_up,
                  CAST(round(-2.5) AS BIGINT) AS half_up_neg""",
        """SELECT CAST(round(1234.5, -2) AS BIGINT) AS neg_digits,
                  CAST(round(1250, -2) AS BIGINT) AS int_neg_digits""",
        ("""SELECT CAST(bround(2.5) AS BIGINT) AS banker_down,
                   CAST(bround(3.5) AS BIGINT) AS banker_up""",
         """SELECT CAST(round_even(2.5, 0) AS BIGINT) AS banker_down,
                   CAST(round_even(3.5, 0) AS BIGINT) AS banker_up"""),
        ("""SELECT CAST(CAST(3.9 AS INT) AS BIGINT) AS trunc_pos,
                   CAST(CAST(-3.9 AS INT) AS BIGINT) AS trunc_neg""",
         """SELECT CAST(trunc(3.9) AS BIGINT) AS trunc_pos,
                   CAST(trunc(-3.9) AS BIGINT) AS trunc_neg"""),
        """SELECT CAST(ceil(-3.2) AS BIGINT) AS ceil_neg,
                  CAST(floor(-3.2) AS BIGINT) AS floor_neg,
                  CAST(ceil(3.0) AS BIGINT) AS ceil_exact""",
        """SELECT round(3.14159, 2) AS pi2, round(3.14159, 0) AS pi0""",
        """SELECT CAST(round(0.5) AS BIGINT) AS half,
                  CAST(round(-0.5) AS BIGINT) AS neg_half,
                  CAST(round(0.4999) AS BIGINT) AS under_half""",
        """SELECT round(CAST(l_discount AS DOUBLE), 1) AS d,
                  CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY round(CAST(l_discount AS DOUBLE), 1)
           ORDER BY d""",
        """SELECT CAST(sign(-7) AS BIGINT) AS neg,
                  CAST(sign(0) AS BIGINT) AS zero,
                  CAST(sign(42) AS BIGINT) AS pos""",
        """SELECT round(123.456, -1) AS neg_one_digit""",
    ],
    # ── linear-regression aggregate family (SQL:2003 regr_*) ───────────
    "stats_regression": [
        """SELECT round(regr_slope(y, x), 4) AS slope,
                  round(regr_intercept(y, x), 4) AS icept
           FROM (VALUES (1, 2), (2, 4), (3, 7)) t(x, y)""",
        """SELECT round(regr_r2(y, x), 4) AS r2,
                  CAST(regr_count(y, x) AS BIGINT) AS n
           FROM (VALUES (1, 2), (2, 4), (3, 7)) t(x, y)""",
        """SELECT round(regr_avgx(y, x), 4) AS ax,
                  round(regr_avgy(y, x), 4) AS ay
           FROM (VALUES (1, 2), (2, 4), (3, 7)) t(x, y)""",
        """SELECT round(regr_sxx(y, x), 4) AS sxx,
                  round(regr_syy(y, x), 4) AS syy,
                  round(regr_sxy(y, x), 4) AS sxy
           FROM (VALUES (1, 2), (2, 4), (3, 7)) t(x, y)""",
        """SELECT CAST(regr_count(y, x) AS BIGINT) AS skips_null_pairs
           FROM (VALUES (1, 2), (NULL, 4), (3, NULL), (5, 6)) t(x, y)""",
        """SELECT regr_slope(y, x) IS NULL AS undefined_on_one_point
           FROM (VALUES (1, 2)) t(x, y)""",
        """SELECT round(regr_slope(CAST(l_extendedprice AS DOUBLE),
                                   CAST(l_quantity AS DOUBLE)), 2)
                    AS price_per_qty
           FROM lineitem""",
        """SELECT round(corr(CAST(l_quantity AS DOUBLE),
                             CAST(l_extendedprice AS DOUBLE)), 4) AS c
           FROM lineitem""",
        """SELECT round(covar_pop(y, x), 4) AS cp,
                  round(covar_samp(y, x), 4) AS cs
           FROM (VALUES (1, 2), (2, 4), (3, 7)) t(x, y)""",
        """SELECT l_returnflag,
                  round(regr_r2(CAST(l_extendedprice AS DOUBLE),
                                CAST(l_quantity AS DOUBLE)), 3) AS r2
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ],
    # ── higher moments: population vs sample conventions pinned ────────
    "stats_moments": [
        # Spark kurtosis = population excess kurtosis = DuckDB's
        # kurtosis_pop (DuckDB's bare kurtosis is sample-corrected)
        ("""SELECT round(kurtosis(x), 4) AS k
           FROM (VALUES (1.0), (2.0), (3.0), (10.0)) t(x)""",
         """SELECT round(kurtosis_pop(x), 4) AS k
           FROM (VALUES (1.0), (2.0), (3.0), (10.0)) t(x)"""),
        # Spark skewness = population g1; DuckDB's skewness is
        # sample-corrected — the duck variant computes g1 from moments
        ("""SELECT round(skewness(x), 4) AS s
           FROM (VALUES (1.0), (2.0), (3.0), (10.0)) t(x)""",
         """SELECT round((sum(pow(x - a, 3)) / count(*)) /
                         pow(stddev_pop(x), 3), 4) AS s
           FROM (SELECT x, avg(x) OVER () AS a
                 FROM (VALUES (1.0), (2.0), (3.0), (10.0)) t(x))"""),
        """SELECT round(stddev_pop(x), 4) AS sp,
                  round(var_pop(x), 4) AS vp
           FROM (VALUES (2.0), (4.0), (6.0)) t(x)""",
        """SELECT stddev_samp(x) IS NULL AS single_row_samp,
                  round(stddev_pop(x), 4) AS single_row_pop
           FROM (VALUES (5.0)) t(x)""",
        """SELECT round(var_samp(x), 4) AS vs, round(var_pop(x), 4) AS vp
           FROM (VALUES (1.0), (3.0)) t(x)""",
        """SELECT round(stddev_pop(x), 4) AS all_equal
           FROM (VALUES (7.0), (7.0), (7.0)) t(x)""",
        ("""SELECT l_returnflag, round(kurtosis(
                     CAST(l_quantity AS DOUBLE)), 3) AS k
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
         """SELECT l_returnflag, round(kurtosis_pop(
                     CAST(l_quantity AS DOUBLE)), 3) AS k
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
        """SELECT round(stddev_samp(CAST(l_discount AS DOUBLE)), 4) AS s
           FROM lineitem""",
    ],
    # ── sequence generation and unnest-to-rows ─────────────────────────
    "sequence_unnest": [
        ("""SELECT sequence(1, 5) AS s""",
         """SELECT generate_series(1, 5) AS s"""),
        ("""SELECT sequence(0, 10, 5) AS stepped,
                   sequence(5, 1, -2) AS descending""",
         """SELECT generate_series(0, 10, 5) AS stepped,
                   generate_series(5, 1, -2) AS descending"""),
        ("""SELECT CAST(size(sequence(1, 100)) AS BIGINT) AS n""",
         """SELECT CAST(len(generate_series(1, 100)) AS BIGINT) AS n"""),
        ("""SELECT v FROM (SELECT explode(array(3, 1, 2)) AS v)
           ORDER BY v""",
         """SELECT v FROM (SELECT unnest([3, 1, 2]) AS v) ORDER BY v"""),
        # Spark posexplode positions are 0-based; DuckDB
        # generate_subscripts is 1-based — normalized to 1-based here
        ("""SELECT p + 1 AS pos, v
           FROM (SELECT posexplode(array(30, 10, 20)) AS (p, v))
           ORDER BY pos""",
         """SELECT i AS pos, v
           FROM (SELECT unnest([30, 10, 20]) AS v,
                        generate_subscripts([30, 10, 20], 1) AS i)
           ORDER BY pos"""),
        ("""SELECT CAST(aggregate(sequence(1, 10), 0,
                                  (acc, v) -> acc + v) AS BIGINT)
                   AS triangular""",
         """SELECT CAST(list_sum(generate_series(1, 10)) AS BIGINT)
                   AS triangular"""),
        ("""SELECT v, CAST(count(*) AS BIGINT) AS n
           FROM (SELECT explode(array(1, 2, 2, 3, 3, 3)) AS v)
           GROUP BY v ORDER BY v""",
         """SELECT v, CAST(count(*) AS BIGINT) AS n
           FROM (SELECT unnest([1, 2, 2, 3, 3, 3]) AS v)
           GROUP BY v ORDER BY v"""),
        ("""SELECT n_name, v
           FROM nation LATERAL VIEW explode(array(n_nationkey,
                                                  n_regionkey)) AS v
           WHERE n_nationkey < 3 ORDER BY n_name, v""",
         """SELECT n_name, v
           FROM (SELECT n_name, unnest([n_nationkey, n_regionkey]) AS v
                 FROM nation WHERE n_nationkey < 3) ORDER BY n_name, v"""),
        ("""SELECT sequence(DATE '2024-01-01', DATE '2024-01-07',
                            INTERVAL 3 DAY)[2] AS third""",
         """SELECT CAST((generate_series(DATE '2024-01-01',
                                         DATE '2024-01-07',
                                         INTERVAL 3 DAY))[3]
                        AS DATE) AS third"""),
        ("""SELECT explode(sequence(1, 3)) AS v""",
         """SELECT unnest(generate_series(1, 3)) AS v"""),
    ],
    # ── ordered string aggregation: listagg / string_agg ───────────────
    "listagg_surface": [
        ("""SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) AS csv
           FROM (VALUES ('b'), ('a'), ('c')) t(x)""",
         """SELECT listagg(x, ',' ORDER BY x) AS csv
           FROM (VALUES ('b'), ('a'), ('c')) t(x)"""),
        ("""SELECT string_agg(x, '|') WITHIN GROUP (ORDER BY x DESC)
                   AS piped
           FROM (VALUES ('a'), ('b'), ('c')) t(x)""",
         """SELECT string_agg(x, '|' ORDER BY x DESC) AS piped
           FROM (VALUES ('a'), ('b'), ('c')) t(x)"""),
        ("""SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) AS skips_null
           FROM (VALUES ('b'), (NULL), ('a')) t(x)""",
         """SELECT listagg(x, ',' ORDER BY x) AS skips_null
           FROM (VALUES ('b'), (NULL), ('a')) t(x)"""),
        ("""SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x)
                   IS NULL AS all_null
           FROM (VALUES (CAST(NULL AS STRING))) t(x)""",
         """SELECT listagg(x, ',' ORDER BY x) IS NULL AS all_null
           FROM (VALUES (CAST(NULL AS VARCHAR))) t(x)"""),
        ("""SELECT r_name,
                   listagg(n_name, ';') WITHIN GROUP (ORDER BY n_name)
                     AS members
           FROM nation JOIN region ON n_regionkey = r_regionkey
           WHERE n_nationkey < 10
           GROUP BY r_name ORDER BY r_name""",
         """SELECT r_name,
                   listagg(n_name, ';' ORDER BY n_name) AS members
           FROM nation JOIN region ON n_regionkey = r_regionkey
           WHERE n_nationkey < 10
           GROUP BY r_name ORDER BY r_name"""),
        ("""SELECT listagg(CAST(x AS STRING), '-')
                     WITHIN GROUP (ORDER BY x) AS nums
           FROM (VALUES (3), (1), (2)) t(x)""",
         """SELECT listagg(CAST(x AS VARCHAR), '-' ORDER BY x) AS nums
           FROM (VALUES (3), (1), (2)) t(x)"""),
        ("""SELECT listagg(DISTINCT x, ',') WITHIN GROUP (ORDER BY x)
                   AS dedup
           FROM (VALUES ('b'), ('a'), ('b')) t(x)""",
         """SELECT listagg(DISTINCT x, ',' ORDER BY x) AS dedup
           FROM (VALUES ('b'), ('a'), ('b')) t(x)"""),
    ],
    # ── ordered-set aggregates: percentile_cont/disc, mode ─────────────
    "percentile_modes": [
        """SELECT round(percentile_cont(0.5)
                    WITHIN GROUP (ORDER BY CAST(x AS DOUBLE)), 4) AS med
           FROM (VALUES (1), (2), (3), (4)) t(x)""",
        """SELECT round(percentile_cont(0.25)
                    WITHIN GROUP (ORDER BY CAST(x AS DOUBLE)), 4) AS q1,
                  round(percentile_cont(0.75)
                    WITHIN GROUP (ORDER BY CAST(x AS DOUBLE)), 4) AS q3
           FROM (VALUES (1), (2), (3), (4)) t(x)""",
        """SELECT round(percentile_cont(0.0)
                    WITHIN GROUP (ORDER BY CAST(x AS DOUBLE)), 4) AS lo,
                  round(percentile_cont(1.0)
                    WITHIN GROUP (ORDER BY CAST(x AS DOUBLE)), 4) AS hi
           FROM (VALUES (10), (20), (30)) t(x)""",
        """SELECT CAST(percentile_disc(0.5)
                    WITHIN GROUP (ORDER BY x) AS BIGINT) AS med_disc
           FROM (VALUES (1), (2), (3), (4)) t(x)""",
        """SELECT CAST(percentile_disc(0.5)
                    WITHIN GROUP (ORDER BY x) AS BIGINT) AS odd_disc
           FROM (VALUES (10), (20), (30)) t(x)""",
        """SELECT round(percentile_cont(0.5)
                    WITHIN GROUP (ORDER BY CAST(x AS DOUBLE)), 4)
                  AS interp_between
           FROM (VALUES (1), (100)) t(x)""",
        """SELECT CAST(mode(x) AS BIGINT) AS m
           FROM (VALUES (1), (2), (2), (3)) t(x)""",
        """SELECT mode(c) AS m
           FROM (VALUES ('a'), ('b'), ('b'), ('c')) t(c)""",
        """SELECT l_returnflag,
                  round(percentile_cont(0.5) WITHIN GROUP
                    (ORDER BY CAST(l_quantity AS DOUBLE)), 4) AS med_qty
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT round(percentile_cont(0.9) WITHIN GROUP
                    (ORDER BY CAST(l_extendedprice AS DOUBLE)), 2) AS p90
           FROM lineitem""",
        """SELECT percentile_cont(0.5)
                    WITHIN GROUP (ORDER BY CAST(x AS DOUBLE))
                  IS NULL AS empty_set
           FROM (VALUES (1)) t(x) WHERE x > 99""",
    ],
    # ── binary encodings: hex, base64, sha2, md5, bin ──────────────────
    "encoding_surface": [
        """SELECT hex(255) AS h255, hex(0) AS h0""",
        """SELECT hex('ab') AS hstr""",
        ("""SELECT CAST(unhex('6162') AS STRING) AS decoded""",
         """SELECT CAST(unhex('6162') AS VARCHAR) AS decoded"""),
        ("""SELECT sha2('abc', 256) AS h""",
         """SELECT sha256('abc') AS h"""),
        """SELECT md5('abc') AS h, md5('') AS h_empty""",
        ("""SELECT base64('abc') AS enc""",
         """SELECT base64('abc'::BLOB) AS enc"""),
        ("""SELECT CAST(unbase64('YWJj') AS STRING) AS dec""",
         """SELECT CAST(from_base64('YWJj') AS VARCHAR) AS dec"""),
        """SELECT bin(5) AS b5, bin(0) AS b0, bin(255) AS b255""",
        ("""SELECT hex(n_nationkey * 16) AS h, n_name
           FROM nation WHERE n_nationkey <= 5
           ORDER BY n_nationkey""",
         """SELECT hex(n_nationkey * 16) AS h, n_name
           FROM nation WHERE n_nationkey <= 5
           ORDER BY n_nationkey"""),
        """SELECT md5(n_name) AS h FROM nation
           ORDER BY n_name LIMIT 5""",
    ],
    # ── JSON path extraction: both engines index arrays 0-based ────────
    "json_path": [
        ("""SELECT get_json_object('{"a": 1, "b": "x"}', '$.b') AS s""",
         """SELECT json_extract_string('{"a": 1, "b": "x"}', '$.b')
                   AS s"""),
        ("""SELECT CAST(get_json_object('{"a": 42}', '$.a') AS BIGINT)
                   AS n""",
         """SELECT CAST(json_extract('{"a": 42}', '$.a') AS BIGINT)
                   AS n"""),
        ("""SELECT get_json_object('{"a": {"b": [10, 20, 30]}}',
                                   '$.a.b[1]') AS second""",
         """SELECT json_extract_string('{"a": {"b": [10, 20, 30]}}',
                                       '$.a.b[1]') AS second"""),
        ("""SELECT get_json_object('{"a": 1}', '$.zz') IS NULL
                   AS missing""",
         """SELECT json_extract_string('{"a": 1}', '$.zz') IS NULL
                   AS missing"""),
        ("""SELECT CAST(json_array_length('[1, 2, 3]') AS BIGINT)
                   AS n3,
                   CAST(json_array_length('[]') AS BIGINT) AS n0""",
         """SELECT CAST(json_array_length('[1, 2, 3]') AS BIGINT)
                   AS n3,
                   CAST(json_array_length('[]') AS BIGINT) AS n0"""),
        ("""SELECT get_json_object('{"nested": {"deep": {"x": "v"}}}',
                                   '$.nested.deep.x') AS deep""",
         """SELECT json_extract_string(
                     '{"nested": {"deep": {"x": "v"}}}',
                     '$.nested.deep.x') AS deep"""),
        ("""SELECT get_json_object('{"t": true, "f": false}', '$.t')
                     AS t,
                   get_json_object('{"t": true, "f": false}', '$.f')
                     AS f""",
         """SELECT json_extract_string('{"t": true, "f": false}',
                                       '$.t') AS t,
                   json_extract_string('{"t": true, "f": false}',
                                       '$.f') AS f"""),
        ("""SELECT round(CAST(get_json_object('{"pi": 3.14}', '$.pi')
                              AS DOUBLE), 4) AS pi""",
         """SELECT round(CAST(json_extract('{"pi": 3.14}', '$.pi')
                              AS DOUBLE), 4) AS pi"""),
        ("""SELECT get_json_object('[{"id": 1}, {"id": 2}]',
                                   '$[1].id') AS arr_obj""",
         """SELECT json_extract_string('[{"id": 1}, {"id": 2}]',
                                       '$[1].id') AS arr_obj"""),
        ("""SELECT get_json_object('{"a": null}', '$.a') IS NULL
                   AS json_null""",
         """SELECT json_extract_string('{"a": null}', '$.a') IS NULL
                   AS json_null"""),
    ],
    # ── row-value constructors: struct() vs row() comparisons ──────────
    "row_comparisons": [
        ("""SELECT struct(1, 2) = struct(1, 2) AS eq,
                   struct(1, 2) = struct(1, 3) AS neq""",
         """SELECT (1, 2) = (1, 2) AS eq, (1, 2) = (1, 3) AS neq"""),
        ("""SELECT struct(1, 2) < struct(1, 3) AS lt_second,
                   struct(2, 0) > struct(1, 9) AS gt_first""",
         """SELECT (1, 2) < (1, 3) AS lt_second,
                   (2, 0) > (1, 9) AS gt_first"""),
        ("""SELECT n_name FROM nation
           WHERE (n_regionkey, n_nationkey) IN
                 (SELECT r_regionkey, r_regionkey FROM region)
           ORDER BY n_name""",
         """SELECT n_name FROM nation
           WHERE (n_regionkey, n_nationkey) IN
                 (SELECT (r_regionkey, r_regionkey) FROM region)
           ORDER BY n_name"""),
        """SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
           WHERE (l_returnflag, l_linestatus) IN (('A', 'F'), ('N', 'O'))""",
        ("""SELECT struct('a', 1) = struct('a', 1) AS str_eq""",
         """SELECT ('a', 1) = ('a', 1) AS str_eq"""),
        """SELECT x, y FROM (VALUES (1, 'b'), (1, 'a'), (2, 'a')) t(x, y)
           ORDER BY x, y""",
        ("""SELECT least(struct(2, 'b').col1, struct(1, 'z').col1)
                   AS min_first""",
         """SELECT least(2, 1) AS min_first"""),
        ("""SELECT x FROM (VALUES (1), (2), (3)) t(x)
           WHERE (x, x * 10) IN (SELECT y, y * 10
                                 FROM (VALUES (2), (3)) s(y))
           ORDER BY x""",
         """SELECT x FROM (VALUES (1), (2), (3)) t(x)
           WHERE (x, x * 10) IN (SELECT (y, y * 10)
                                 FROM (VALUES (2), (3)) s(y))
           ORDER BY x"""),
    ],
    # ── try_* arithmetic: Spark's error-safe family; the duck variant
    #    states the expected value (DuckDB has no try_ arithmetic and
    #    errors on overflow, so it serves as the spec) ──────────────────
    "try_arith": [
        ("""SELECT try_add(2147483647, 1) IS NULL AS int_overflow""",
         """SELECT true AS int_overflow"""),
        ("""SELECT try_add(1, 2) AS fine""",
         """SELECT 3 AS fine"""),
        ("""SELECT try_subtract(-9223372036854775807 - 1, 1) IS NULL
                   AS bigint_underflow""",
         """SELECT true AS bigint_underflow"""),
        ("""SELECT try_multiply(3037000500, 3037000500) IS NULL
                   AS mult_overflow,
                   try_multiply(1000, 1000) AS mult_fine""",
         """SELECT true AS mult_overflow, 1000000 AS mult_fine"""),
        ("""SELECT try_divide(10, 0) IS NULL AS div_zero,
                   round(try_divide(10, 4), 4) AS div_fine""",
         """SELECT 10 / NULLIF(0, 0) IS NULL AS div_zero,
                   round(10 / 4.0, 4) AS div_fine"""),
        ("""SELECT try_divide(10.0, 0.0) IS NULL AS float_div_zero""",
         """SELECT true AS float_div_zero"""),
        ("""SELECT CAST(try_sum(x) AS BIGINT) AS s
           FROM (VALUES (1), (2), (3)) t(x)""",
         """SELECT CAST(sum(x) AS BIGINT) AS s
           FROM (VALUES (1), (2), (3)) t(x)"""),
        ("""SELECT try_add(DATE '2024-01-30', INTERVAL 1 MONTH)
                   AS clamped""",
         """SELECT CAST(DATE '2024-01-30' + INTERVAL 1 MONTH AS DATE)
                   AS clamped"""),
        ("""SELECT CAST(try_to_number('12,345', '99,999') AS BIGINT)
                     AS parsed,
                   try_to_number('abc', '999') IS NULL AS bad""",
         """SELECT CAST(12345 AS BIGINT) AS parsed, true AS bad"""),
    ],
    # ── WITH RECURSIVE: both engines, UNION ALL recursion ──────────────
    "recursive_cte": [
        """WITH RECURSIVE s(n) AS (
             SELECT 1
             UNION ALL
             SELECT n + 1 FROM s WHERE n < 10)
           SELECT CAST(n AS BIGINT) AS n FROM s ORDER BY n""",
        """WITH RECURSIVE f(n, fact) AS (
             SELECT 1, CAST(1 AS BIGINT)
             UNION ALL
             SELECT n + 1, fact * (n + 1) FROM f WHERE n < 10)
           SELECT CAST(max(fact) AS BIGINT) AS f10 FROM f""",
        """WITH RECURSIVE fib(a, b) AS (
             SELECT CAST(0 AS BIGINT), CAST(1 AS BIGINT)
             UNION ALL
             SELECT b, a + b FROM fib WHERE b < 100)
           SELECT CAST(a AS BIGINT) AS n FROM fib ORDER BY a""",
        """WITH RECURSIVE reach(node) AS (
             SELECT 1
             UNION ALL
             SELECT e.dst FROM reach r
             JOIN (VALUES (1, 2), (2, 3), (2, 4), (4, 5),
                          (6, 7)) e(src, dst)
               ON e.src = r.node)
           SELECT DISTINCT CAST(node AS BIGINT) AS node
           FROM reach ORDER BY node""",
        """WITH RECURSIVE p(n, v) AS (
             SELECT 0, CAST(1 AS BIGINT)
             UNION ALL
             SELECT n + 1, v * 2 FROM p WHERE n < 16)
           SELECT CAST(sum(v) AS BIGINT) AS geom_sum FROM p""",
        """WITH RECURSIVE countdown(n) AS (
             SELECT 5
             UNION ALL
             SELECT n - 1 FROM countdown WHERE n > 0)
           SELECT CAST(n AS BIGINT) AS n FROM countdown ORDER BY n""",
        """WITH RECURSIVE dates(d) AS (
             SELECT DATE '2024-01-01'
             UNION ALL
             SELECT CAST(d + INTERVAL 7 DAY AS DATE) FROM dates
             WHERE d < DATE '2024-02-01')
           SELECT d FROM dates ORDER BY d""",
        """WITH RECURSIVE chain(s) AS (
             SELECT CAST('x' AS STRING)
             UNION ALL
             SELECT s || 'x' FROM chain WHERE length(s) < 5)
           SELECT s FROM chain ORDER BY length(s)""" if False else
        ("""WITH RECURSIVE chain(s) AS (
             SELECT CAST('x' AS STRING)
             UNION ALL
             SELECT s || 'x' FROM chain WHERE length(s) < 5)
           SELECT s FROM chain ORDER BY length(s)""",
         """WITH RECURSIVE chain(s) AS (
             SELECT CAST('x' AS VARCHAR)
             UNION ALL
             SELECT s || 'x' FROM chain WHERE length(s) < 5)
           SELECT s FROM chain ORDER BY length(s)"""),
        """WITH RECURSIVE r(n) AS (
             SELECT CAST(n_nationkey AS BIGINT) FROM nation
             WHERE n_nationkey = 0
             UNION ALL
             SELECT n + 5 FROM r WHERE n < 20)
           SELECT n FROM r ORDER BY n""",
    ],
    # ── windows over aggregated results: the two-level analytic shape ──
    "window_over_agg": [
        """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
                  CAST(rank() OVER (ORDER BY count(*) DESC,
                                    n_regionkey) AS BIGINT) AS rk
           FROM nation GROUP BY n_regionkey ORDER BY rk, n_regionkey""",
        """SELECT o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n,
                  round(count(*) * 100.0 / sum(count(*)) OVER (), 4)
                    AS pct
           FROM orders GROUP BY o_orderpriority
           ORDER BY o_orderpriority""",
        """SELECT l_returnflag, l_linestatus,
                  round(sum(CAST(l_quantity AS DOUBLE)), 2) AS qty,
                  round(sum(sum(CAST(l_quantity AS DOUBLE)))
                          OVER (PARTITION BY l_returnflag), 2)
                    AS flag_total
           FROM lineitem GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",
        """SELECT o_orderstatus,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(count(*)) OVER (ORDER BY o_orderstatus
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT)
                    AS running
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT n_regionkey,
                  CAST(max(n_nationkey) AS BIGINT) AS mx,
                  CAST(lag(max(n_nationkey)) OVER
                       (ORDER BY n_regionkey) AS BIGINT) AS prev_mx
           FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
        """SELECT band, CAST(n AS BIGINT) AS n,
                  CAST(dense_rank() OVER (ORDER BY n DESC) AS BIGINT)
                    AS rk
           FROM (SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                             WHEN c_acctbal < 5000 THEN 'mid'
                             ELSE 'high' END AS band,
                        count(*) AS n
                 FROM customer GROUP BY 1)
           ORDER BY rk, band""",
        """SELECT l_returnflag,
                  round(avg(CAST(l_discount AS DOUBLE)), 4) AS avg_disc,
                  round(avg(CAST(l_discount AS DOUBLE))
                          - avg(avg(CAST(l_discount AS DOUBLE)))
                            OVER (), 4) AS vs_overall
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT o_orderpriority, yr, CAST(n AS BIGINT) AS n,
                  CAST(row_number() OVER (PARTITION BY yr
                         ORDER BY n DESC, o_orderpriority) AS BIGINT)
                    AS rk_in_year
           FROM (SELECT o_orderpriority,
                        CAST(year(o_orderdate) AS BIGINT) AS yr,
                        count(*) AS n
                 FROM orders GROUP BY 1, 2)
           ORDER BY yr, rk_in_year LIMIT 12""",
    ],
    # ── BETWEEN / LIKE predicate combinations ──────────────────────────
    "between_like_combos": [
        """SELECT 5 BETWEEN 1 AND 10 AS in_range,
                  5 BETWEEN 10 AND 1 AS reversed_empty,
                  5 NOT BETWEEN 6 AND 9 AS not_between""",
        """SELECT 'm' BETWEEN 'a' AND 'z' AS str_range,
                  'M' BETWEEN 'a' AND 'z' AS case_sensitive""",
        """SELECT DATE '2024-06-15' BETWEEN DATE '2024-01-01'
                    AND DATE '2024-12-31' AS date_range""",
        """SELECT (CAST(NULL AS INT) BETWEEN 1 AND 10) IS NULL
                    AS null_operand,
                  (5 BETWEEN CAST(NULL AS INT) AND 10) IS NULL
                    AS null_low_unknown,
                  5 BETWEEN CAST(NULL AS INT) AND 4 AS null_low_false""",
        """SELECT 'hello' LIKE 'h_llo' AS underscore,
                  'hello' LIKE 'h__lo' AS two_underscores,
                  'hello' LIKE '_ello' AS first_wild""",
        """SELECT 'abc' LIKE '%' AS any_match,
                  '' LIKE '%' AS empty_any,
                  '' LIKE '_' AS empty_one""",
        """SELECT 'a%b' LIKE 'a!%b' ESCAPE '!' AS escaped_pct,
                  'axb' LIKE 'a!%b' ESCAPE '!' AS escaped_no_match""",
        """SELECT ('x' LIKE CAST(NULL AS STRING)) IS NULL
                    AS null_pattern""" if False else
        ("""SELECT ('x' LIKE CAST(NULL AS STRING)) IS NULL
                    AS null_pattern""",
         """SELECT ('x' LIKE CAST(NULL AS VARCHAR)) IS NULL
                    AS null_pattern"""),
        """SELECT p_name FROM part
           WHERE p_retailprice BETWEEN 901 AND 910
             AND p_name LIKE '%a%'
           ORDER BY p_name LIMIT 6""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM orders
           WHERE o_orderpriority LIKE '_-%'
             AND o_totalprice NOT BETWEEN 0 AND 100000""",
        """SELECT NOT ('abc' LIKE 'a%') AS not_like,
                  'abc' NOT LIKE 'z%' AS not_like_kw""",
    ],
    # ── LIMIT/OFFSET in nested positions ───────────────────────────────
    "limit_subquery": [
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM (SELECT n_nationkey FROM nation
                 ORDER BY n_nationkey LIMIT 7)""",
        """SELECT CAST(sum(k) AS BIGINT) AS top3_sum
           FROM (SELECT n_nationkey AS k FROM nation
                 ORDER BY n_nationkey DESC LIMIT 3)""",
        """SELECT x FROM (VALUES (1), (2), (3)) t(x)
           ORDER BY x LIMIT 0""",
        """WITH top5 AS (SELECT o_orderkey, o_totalprice FROM orders
                         ORDER BY o_totalprice DESC, o_orderkey LIMIT 5)
           SELECT CAST(count(*) AS BIGINT) AS n,
                  round(min(o_totalprice), 2) AS floor_price
           FROM top5""",
        """SELECT n_name FROM nation
           ORDER BY n_name LIMIT 5 OFFSET 20""",
        """SELECT n_name FROM nation
           ORDER BY n_name LIMIT 3 OFFSET 0""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM (SELECT c_custkey FROM customer
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 10 OFFSET 5)""",
        """SELECT x FROM (SELECT x FROM (VALUES (5), (3), (9), (1)) t(x)
                          ORDER BY x LIMIT 3)
           ORDER BY x DESC LIMIT 2""",
        """SELECT r_name,
                  (SELECT n_name FROM nation
                   WHERE n_regionkey = r_regionkey
                   ORDER BY n_name LIMIT 1) AS first_nation
           FROM region ORDER BY r_name""",
    ],
    # ── COALESCE / NULLIF / NVL chains and typing ──────────────────────
    "coalesce_chains": [
        """SELECT coalesce(CAST(NULL AS INT), CAST(NULL AS INT), 3)
                    AS third,
                  coalesce(1, CAST(NULL AS INT)) AS first""",
        """SELECT coalesce(CAST(NULL AS INT), CAST(NULL AS INT))
                    IS NULL AS all_null""",
        """SELECT round(coalesce(CAST(NULL AS DOUBLE), 2.5), 4)
                    AS typed_mix""",
        """SELECT nullif(5, 5) IS NULL AS same,
                  CAST(nullif(5, 6) AS BIGINT) AS diff""",
        """SELECT nullif(CAST(NULL AS INT), 5) IS NULL AS null_first,
                  CAST(nullif(5, CAST(NULL AS INT)) AS BIGINT)
                    AS null_second""",
        ("""SELECT CAST(nvl(CAST(NULL AS INT), 7) AS BIGINT) AS n,
                   CAST(nvl2(1, 10, 20) AS BIGINT) AS has_value,
                   CAST(nvl2(CAST(NULL AS INT), 10, 20) AS BIGINT)
                     AS no_value""",
         """SELECT CAST(coalesce(CAST(NULL AS INT), 7) AS BIGINT) AS n,
                   CAST(CASE WHEN 1 IS NOT NULL THEN 10 ELSE 20 END
                        AS BIGINT) AS has_value,
                   CAST(CASE WHEN CAST(NULL AS INT) IS NOT NULL
                             THEN 10 ELSE 20 END AS BIGINT)
                     AS no_value"""),
        """SELECT coalesce(nullif('a', 'a'), 'fallback') AS composed""",
        """SELECT CAST(count(coalesce(CAST(NULL AS INT), 1))
                       AS BIGINT) AS counts_coalesced
           FROM (VALUES (1), (2)) t(x)""",
        """SELECT n_name,
                  coalesce(nullif(n_name, n_name), 'was_self') AS c
           FROM nation ORDER BY n_name LIMIT 5""",
        ("""SELECT ifnull(CAST(NULL AS INT), 9) AS ifn""",
         """SELECT coalesce(CAST(NULL AS INT), 9) AS ifn"""),
    ],
    # ── FROM-less selects and literal set operations ───────────────────
    "select_no_from": [
        """SELECT 1 AS one, 'a' AS letter, true AS flag""",
        """SELECT CAST(1 + 2 * 3 AS BIGINT) AS precedence,
                  CAST((1 + 2) * 3 AS BIGINT) AS parens""",
        """SELECT 1 AS x WHERE 1 = 1""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM (SELECT 1 AS x WHERE 1 = 0)""",
        """SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 2
                          UNION ALL SELECT 1) ORDER BY x""",
        """SELECT x FROM (SELECT 1 AS x UNION SELECT 1) ORDER BY x""",
        """SELECT CAST(-5 AS BIGINT) AS neg,
                  CAST(- -5 AS BIGINT) AS double_neg,
                  CAST(+5 AS BIGINT) AS pos""",
        """SELECT 'a' || 'b' || 'c' AS chained,
                  length('a' || '') AS concat_empty""",
        """SELECT CAST(10 - 3 - 2 AS BIGINT) AS left_assoc,
                  CAST(2 * 3 % 4 AS BIGINT) AS mul_mod""",
        """SELECT NOT true AS nt, NOT NOT true AS nnt,
                  NOT 1 > 2 AS not_cmp""",
    ],
    # ── epoch/unix-time conversions (both sessions pinned to UTC) ──────
    "epoch_conversions": [
        ("""SELECT from_unixtime(0) AS epoch_start""",
         """SELECT strftime(to_timestamp(0), '%Y-%m-%d %H:%M:%S')
                   AS epoch_start"""),
        ("""SELECT CAST(to_unix_timestamp(TIMESTAMP '2024-01-01 00:00:00')
                        AS BIGINT) AS secs""",
         """SELECT CAST(epoch(TIMESTAMP '2024-01-01 00:00:00')
                        AS BIGINT) AS secs"""),
        ("""SELECT CAST(timestamp_seconds(86400) AS DATE) AS day_two""",
         """SELECT CAST(to_timestamp(86400) AS DATE) AS day_two"""),
        ("""SELECT CAST(unix_millis(TIMESTAMP '1970-01-01 00:00:01')
                        AS BIGINT) AS ms""",
         """SELECT CAST(epoch_ms(TIMESTAMP '1970-01-01 00:00:01')
                        AS BIGINT) AS ms"""),
        ("""SELECT from_unixtime(1700000000, 'yyyy-MM-dd') AS d""",
         """SELECT strftime(to_timestamp(1700000000), '%Y-%m-%d')
                   AS d"""),
        ("""SELECT CAST(to_unix_timestamp(DATE '2000-01-01') AS BIGINT)
                   AS y2k""",
         """SELECT CAST(epoch(CAST(DATE '2000-01-01' AS TIMESTAMP))
                        AS BIGINT) AS y2k"""),
        ("""SELECT date_from_unix_date(19000) AS d""",
         """SELECT CAST(DATE '1970-01-01' + INTERVAL 19000 DAY AS DATE)
                   AS d"""),
        ("""SELECT CAST(timestamp_seconds(-86400) AS DATE)
                   AS before_epoch""",
         """SELECT CAST(to_timestamp(-86400) AS DATE) AS before_epoch"""),
        ("""SELECT CAST(to_unix_timestamp(CAST(ts AS TIMESTAMP))
                        AS BIGINT) AS s, event_id
           FROM events ORDER BY event_id LIMIT 5""",
         """SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
                        AS BIGINT) AS s, event_id
           FROM events ORDER BY event_id LIMIT 5"""),
    ],
    # ── binary (codepoint) string ordering: both engines default ──────
    "collation_order": [
        """SELECT c FROM (VALUES ('b'), ('A'), ('a'), ('B')) t(c)
           ORDER BY c""",
        """SELECT 'a' < 'B' AS lower_after_upper,
                  'A' < 'a' AS upper_first,
                  'Z' < 'a' AS all_upper_first""",
        """SELECT '10' < '9' AS string_numeric,
                  '100' < '20' AS leading_digit""",
        """SELECT 'a ' = 'a' AS no_pad,
                  'a' < 'a ' AS prefix_first""",
        """SELECT 'z' < 'é' AS ascii_before_multibyte""",
        """SELECT c FROM (VALUES ('é'), ('e'), ('f'), ('z')) t(c)
           ORDER BY c""",
        """SELECT n_name FROM nation
           WHERE n_name BETWEEN 'A' AND 'F'
           ORDER BY n_name LIMIT 8""",
        """SELECT max(c) AS mx, min(c) AS mn
           FROM (VALUES ('apple'), ('Apple'), ('APPLE')) t(c)""",
        """SELECT c, CAST(rank() OVER (ORDER BY c) AS BIGINT) AS rk
           FROM (VALUES ('b'), ('B'), ('a'), ('A')) t(c)
           ORDER BY c""",
    ],
    # ── DISTINCT ON emulation: row_number vs DuckDB's native form ──────
    "distinct_on_emulation": [
        ("""SELECT n_regionkey, n_name FROM (
             SELECT n_regionkey, n_name,
                    row_number() OVER (PARTITION BY n_regionkey
                                       ORDER BY n_name) AS rn
             FROM nation) WHERE rn = 1
           ORDER BY n_regionkey""",
         """SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name
           FROM nation ORDER BY n_regionkey, n_name"""),
        ("""SELECT o_orderstatus, o_orderkey FROM (
             SELECT o_orderstatus, o_orderkey,
                    row_number() OVER (PARTITION BY o_orderstatus
                                       ORDER BY o_totalprice DESC,
                                                o_orderkey) AS rn
             FROM orders) WHERE rn = 1
           ORDER BY o_orderstatus""",
         """SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey
           FROM orders
           ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey"""),
        ("""SELECT l_returnflag, round(l_quantity, 2) AS qty FROM (
             SELECT l_returnflag, l_quantity,
                    row_number() OVER (PARTITION BY l_returnflag
                                       ORDER BY l_quantity DESC,
                                                l_orderkey,
                                                l_linenumber) AS rn
             FROM lineitem) WHERE rn = 1
           ORDER BY l_returnflag""",
         """SELECT DISTINCT ON (l_returnflag) l_returnflag,
                   round(l_quantity, 2) AS qty
           FROM lineitem
           ORDER BY l_returnflag, l_quantity DESC, l_orderkey,
                    l_linenumber"""),
    ],
    # ── per-function overflow / precision boundaries (r6; reference
    #    backbone: test_files/math.slt overflow sections) ─────────────
    "overflow_fn_edges": [
        """SELECT CAST(factorial(20) AS BIGINT) AS f20""",
        ("""SELECT factorial(21) IS NULL AS over""",
         """SELECT true AS over"""),
        """SELECT TRY_CAST(1e19 AS BIGINT) IS NULL AS over,
                  TRY_CAST(-1e19 AS BIGINT) IS NULL AS under""",
        """SELECT CAST(TRY_CAST(1e15 AS BIGINT) AS BIGINT) AS v""",
        """SELECT exp(710.0) > 1e308 AS exp_inf,
                  power(2.0, 1024.0) > 1e308 AS pow_inf""",
        ("""SELECT isnan(sqrt(-1.0)) AS nan_sqrt""",
         """SELECT true AS nan_sqrt"""),
        """SELECT isnan(CAST('NaN' AS DOUBLE)) AS n,
                  CAST('Infinity' AS DOUBLE) > 1e308 AS inf,
                  CAST('-Infinity' AS DOUBLE) < -1e308 AS ninf""",
        """SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)
                  = CAST(0.3 AS DOUBLE) AS fp_eq""",
        """SELECT CAST(CAST(9007199254740993 AS DOUBLE) AS BIGINT)
                  AS dbl_precision_loss""",
        ("""SELECT try_sum(x) IS NULL AS s FROM
              (VALUES (9223372036854775807), (1)) t(x)""",
         """SELECT true AS s"""),
        ("""SELECT try_multiply(CAST(-3037000500 AS BIGINT),
                                CAST(3037000500 AS BIGINT)) IS NULL AS m1,
                   try_multiply(CAST(3037000499 AS BIGINT),
                                CAST(3037000499 AS BIGINT)) IS NOT NULL
                   AS m2""",
         """SELECT true AS m1, true AS m2"""),
        ("""SELECT shiftleft(CAST(1 AS BIGINT), 62) AS v""",
         """SELECT CAST(1 AS BIGINT) << 62 AS v"""),
        ("""SELECT shiftright(CAST(-8 AS BIGINT), 1) AS v""",
         """SELECT CAST(-8 AS BIGINT) >> 1 AS v"""),
        ("""SELECT round(hypot(3.0, 4.0), 4) AS h""",
         """SELECT round(CAST(5.0 AS DOUBLE), 4) AS h"""),
        """SELECT round(log10(1000.0), 4) AS l10,
                  round(cbrt(27.0), 4) AS cb""",
        ("""SELECT round(log(2.0, 8.0), 4) AS l2""",
         """SELECT round(CAST(3.0 AS DOUBLE), 4) AS l2"""),
        """SELECT round(degrees(pi()), 4) AS deg,
                  round(radians(180.0), 4) AS rad""",
        # DuckDB TRY_CAST rounds fractional strings ('12.5' -> 13);
        # Spark rejects them -> NULL. Pin Spark's semantics.
        ("""SELECT CAST(TRY_CAST('  123  ' AS BIGINT) AS BIGINT) AS ws,
                   TRY_CAST('12.5' AS BIGINT) IS NULL AS frac_str""",
         """SELECT CAST(123 AS BIGINT) AS ws, true AS frac_str"""),
        ("""SELECT try_multiply(CAST(-9223372036854775807 - 1 AS BIGINT),
                                CAST(-1 AS BIGINT)) IS NULL
                   AS negate_min""",
         """SELECT true AS negate_min"""),
        """SELECT CAST(round(CAST(2.5 AS DOUBLE), 0) AS BIGINT) AS r25,
                  CAST(round(CAST(3.5 AS DOUBLE), 0) AS BIGINT) AS r35""",
        """SELECT round(atan2(1.0, 1.0), 4) AS a45,
                  round(sin(pi() / 2), 4) AS s1""",
    ],
    # ── aggregate density 1 (reference: test_files/aggregate.slt) ────
    "agg_dense1": [
        """SELECT o_orderstatus,
                  CAST(count(*) FILTER (WHERE o_totalprice > 100000)
                       AS BIGINT) AS big,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT l_returnflag,
                  round(sum(l_extendedprice)
                        FILTER (WHERE l_discount > 0.05), 2) AS disc_rev
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT round(avg(DISTINCT CAST(l_linenumber AS DOUBLE)), 4)
                  AS ad FROM lineitem""",
        """SELECT min(c_name) AS mn, max(c_name) AS mx FROM customer""",
        """SELECT CAST(min(o_orderdate) AS DATE) AS mn,
                  CAST(max(o_orderdate) AS DATE) AS mx
           FROM orders""",
        """SELECT CAST(count(x) AS BIGINT) AS c, sum(x) IS NULL AS s
           FROM (VALUES (CAST(NULL AS INT)), (CAST(NULL AS INT))) t(x)""",
        """SELECT CAST(count(*) AS BIGINT) AS c,
                  sum(o_totalprice) IS NULL AS s,
                  min(o_orderdate) IS NULL AS m
           FROM orders WHERE o_orderkey < 0""",
        """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n
           FROM nation GROUP BY ALL ORDER BY n_regionkey""",
        """SELECT l_returnflag,
                  round(median(CAST(l_quantity AS DOUBLE)), 4) AS med
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT CAST(mode(l_linenumber) AS BIGINT) AS m FROM lineitem""",
        ("""SELECT CAST(count_if(o_totalprice > 100000) AS BIGINT) AS c
           FROM orders""",
         """SELECT CAST(count(*) FILTER (WHERE o_totalprice > 100000)
                        AS BIGINT) AS c FROM orders"""),
        """SELECT bool_and(l_quantity > 0) AS all_pos,
                  bool_or(l_quantity > 49) AS any_big FROM lineitem""",
        """SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                       AS BIGINT) AS f_cnt
           FROM orders""",
        """SELECT n_regionkey FROM nation GROUP BY n_regionkey
           HAVING count(*) = 5 ORDER BY n_regionkey""",
        """SELECT round(max(s), 2) AS max_cust_total FROM (
             SELECT sum(o_totalprice) AS s FROM orders
             GROUP BY o_custkey) t""",
        """SELECT o_orderkey % 3 AS k, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderkey % 3 ORDER BY k""",
        """SELECT k, CAST(sum(v) AS BIGINT) AS s FROM
             (VALUES (CAST(NULL AS INT), 1), (CAST(NULL AS INT), 2),
                     (1, 3)) t(k, v)
           GROUP BY k ORDER BY k NULLS FIRST""",
        """SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS st,
                  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS pr
           FROM orders""",
        """SELECT CAST(sum(DISTINCT l_linenumber) AS BIGINT) AS sd
           FROM lineitem""",
        """SELECT CAST(max(o_orderdate)
                       FILTER (WHERE o_orderstatus = 'F') AS DATE)
                  AS last_f FROM orders""",
        """SELECT max_by(n_name, n_nationkey) AS top,
                  min_by(n_name, n_nationkey) AS bottom FROM nation""",
        """SELECT o_orderstatus FROM orders GROUP BY o_orderstatus
           ORDER BY count(*) DESC, o_orderstatus""",
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
           FROM lineitem GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",
        """SELECT CAST(count(*) AS BIGINT) AS stars,
                  CAST(count(1) AS BIGINT) AS ones,
                  CAST(count(o_orderkey) AS BIGINT) AS keyed
           FROM orders""",
        """SELECT min(x) FILTER (WHERE x > 100) IS NULL AS none_match
           FROM (VALUES (1), (2)) t(x)""",
    ],
    # ── aggregate density 2 ──────────────────────────────────────────
    "agg_dense2": [
        """SELECT CAST(sum(CASE WHEN l_discount > 0.05 THEN 2
                               WHEN l_discount > 0.02 THEN 1
                               ELSE 0 END) AS BIGINT) AS tiered
           FROM lineitem""",
        """SELECT CAST(count(DISTINCT l_returnflag) AS BIGINT) AS rf,
                  CAST(count(DISTINCT l_linestatus) AS BIGINT) AS ls,
                  CAST(count(*) AS BIGINT) AS n
           FROM lineitem""",
        """SELECT round(avg(CASE WHEN o_orderstatus = 'F'
                               THEN 1.0 ELSE 0.0 END), 4) AS f_ratio
           FROM orders""",
        """SELECT o_orderstatus FROM orders GROUP BY o_orderstatus
           HAVING count(*) > 10 AND max(o_totalprice) > 1000
           ORDER BY o_orderstatus""",
        """SELECT r_name, round(sum(o_totalprice), 2) AS rev
           FROM region
           JOIN nation ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           GROUP BY r_name ORDER BY r_name""",
        """SELECT CAST(sum(CASE WHEN l_linenumber > 3 THEN NULL
                               ELSE 1 END) AS BIGINT) AS nn
           FROM lineitem""",
        """SELECT CAST(count(*) - count(x) AS BIGINT) AS null_count FROM
             (VALUES (1), (CAST(NULL AS INT)), (3),
                     (CAST(NULL AS INT))) t(x)""",
        """SELECT round(sum(o_totalprice) /
                        (SELECT sum(o_totalprice) FROM orders), 4)
                  AS share
           FROM orders WHERE o_orderstatus = 'F'""",
        """SELECT o_orderstatus, o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderstatus, o_orderpriority
           ORDER BY o_orderstatus, o_orderpriority LIMIT 12""",
        """SELECT CAST(count(DISTINCT o_orderdate) AS BIGINT) AS days
           FROM orders WHERE o_orderdate < DATE '1993-01-01'""",
        """SELECT round(var_samp(CAST(x AS DOUBLE)), 4) AS vs,
                  round(var_pop(CAST(x AS DOUBLE)), 4) AS vp
           FROM (VALUES (1), (2), (3), (4)) t(x)""",
        """SELECT CAST(count(DISTINCT CASE WHEN o_totalprice > 150000
                                         THEN o_custkey END) AS BIGINT)
                  AS big_buyers
           FROM orders""",
        """SELECT round(avg(n), 4) AS avg_group_size FROM (
             SELECT CAST(count(*) AS DOUBLE) AS n FROM orders
             GROUP BY o_custkey) t""",
        """SELECT st, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT o_orderstatus AS st FROM orders) t
           GROUP BY st ORDER BY st""",
        """SELECT CAST(min(o_orderkey) AS BIGINT) AS mn,
                  CAST(max(o_orderkey) AS BIGINT) AS mx,
                  CAST(max(o_orderkey) - min(o_orderkey) AS BIGINT)
                  AS span
           FROM orders""",
        """SELECT l_returnflag,
                  CAST(count(*) FILTER (WHERE l_quantity < 10) AS BIGINT)
                  AS small,
                  CAST(count(*) FILTER (WHERE l_quantity >= 10) AS BIGINT)
                  AS large
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT sum(x) IS NULL AS all_null_sum,
                  CAST(coalesce(sum(y), 0) AS BIGINT) AS coalesced
           FROM (VALUES (CAST(NULL AS INT), CAST(NULL AS INT))) t(x, y)""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM (
             SELECT o_custkey FROM orders GROUP BY o_custkey
             HAVING count(*) >= 3) t""",
        """SELECT round(min(o_totalprice), 2) AS mn,
                  round(max(o_totalprice), 2) AS mx,
                  round(avg(o_totalprice), 2) AS av
           FROM orders WHERE o_orderstatus = 'P'""",
        """SELECT round(greatest(avg(l_quantity),
                                 CAST(20 AS DECIMAL(12, 2))), 4) AS g
           FROM lineitem""",
    ],
    # ── string surface density 4 ─────────────────────────────────────
    "string_dense4": [
        """SELECT translate('abcba', 'bc', 'xy') AS t1,
                  translate('hello', 'l', '') AS dropped""",
        ("""SELECT overlay('Spark SQL' PLACING 'ANSI' FROM 7 FOR 3)
                   AS o""",
         """SELECT 'Spark ANSI' AS o"""),
        ("""SELECT locate('ar', 'Spark') AS l,
                   locate('zz', 'Spark') AS missing""",
         """SELECT strpos('Spark', 'ar') AS l,
                   strpos('Spark', 'zz') AS missing"""),
        """SELECT instr('Spark', 'ar') AS i""",
        """SELECT split_part('a,b,c', ',', 2) AS mid,
                  split_part('a,b,c', ',', 5) AS past""",
        """SELECT CAST(levenshtein('kitten', 'sitting') AS BIGINT) AS d,
                  CAST(levenshtein('abc', 'abc') AS BIGINT) AS same""",
        ("""SELECT initcap('hello world') AS ic""",
         """SELECT 'Hello World' AS ic"""),
        """SELECT CAST(ascii('A') AS BIGINT) AS a, chr(97) AS c""",
        ("""SELECT concat('[', space(3), ']') AS sp""",
         """SELECT concat('[', repeat(' ', 3), ']') AS sp"""),
        ("""SELECT startswith('Spark', 'Sp') AS s,
                   endswith('Spark', 'rk') AS e""",
         """SELECT starts_with('Spark', 'Sp') AS s,
                   suffix('Spark', 'rk') AS e"""),
        """SELECT contains('Spark SQL', 'k S') AS c,
                  contains('Spark', 'z') AS n""",
        ("""SELECT substr('hello', -3) AS tail3""",
         """SELECT 'llo' AS tail3"""),
        """SELECT lpad('abcdef', 3, 'x') AS truncated,
                  rpad('ab', 5, 'xy') AS padded""",
        ("""SELECT trim(LEADING 'x' FROM 'xxabcx') AS l,
                   trim(TRAILING 'x' FROM 'xxabcx') AS t,
                   trim(BOTH 'x' FROM 'xxabcx') AS b""",
         """SELECT ltrim('xxabcx', 'x') AS l, rtrim('xxabcx', 'x') AS t,
                   trim('xxabcx', 'x') AS b"""),
        ("""SELECT CAST(octet_length('abc') AS BIGINT) AS ob,
                   CAST(length('abc') AS BIGINT) AS cb""",
         """SELECT CAST(strlen('abc') AS BIGINT) AS ob,
                   CAST(length('abc') AS BIGINT) AS cb"""),
        """SELECT concat_ws('-', 'a', NULL, 'b') AS skip_null,
                  concat_ws('/', 'solo') AS solo""",
        ("""SELECT elt(2, 'a', 'b', 'c') AS second""",
         """SELECT 'b' AS second"""),
        ("""SELECT format_number(1234567.891, 2) AS fn""",
         """SELECT '1,234,567.89' AS fn"""),
        ("""SELECT CAST(char_length('hello') AS BIGINT) AS n""",
         """SELECT CAST(length('hello') AS BIGINT) AS n"""),
        """SELECT repeat('ab', 0) AS empty, repeat('ab', 3) AS thrice""",
        """SELECT reverse('abcde') AS rev""",
        """SELECT replace('aaa', 'aa', 'b') AS leftmost""",
        """SELECT substring('hello' FROM 2 FOR 3) AS mid""",
        ("""SELECT soundex('Robert') AS sx""",
         """SELECT 'R163' AS sx"""),
        """SELECT upper('mixedCase') AS u, lower('MixedCase') AS l,
                  upper('') AS empty""",
    ],
    # ── regexp density 4 (Java-regex surfaces beyond RE2; reference:
    #    test_files/regexp.slt) ────────────────────────────────────────
    "regexp_dense4": [
        ("""SELECT CAST(regexp_count('abcabcabc', 'abc') AS BIGINT)
                   AS n""",
         """SELECT CAST(3 AS BIGINT) AS n"""),
        ("""SELECT CAST(regexp_count('a1b22c333', '[0-9]+') AS BIGINT)
                   AS runs""",
         """SELECT CAST(3 AS BIGINT) AS runs"""),
        ("""SELECT CAST(regexp_instr('hello world', 'o') AS BIGINT)
                   AS first_o""",
         """SELECT CAST(5 AS BIGINT) AS first_o"""),
        ("""SELECT regexp_substr('foo123bar', '[0-9]+') AS num""",
         """SELECT regexp_extract('foo123bar', '[0-9]+', 0) AS num"""),
        ("""SELECT regexp_extract('foobar', 'foo(?=bar)', 0) AS ahead""",
         """SELECT 'foo' AS ahead"""),
        ("""SELECT regexp_like('foobaz', 'foo(?!bar)') AS neg_ahead""",
         """SELECT true AS neg_ahead"""),
        ("""SELECT regexp_like('abab', '^(ab)\\\\1$') AS backref,
                   regexp_like('abba', '^(ab)\\\\1$') AS no_backref""",
         """SELECT true AS backref, false AS no_backref"""),
        ("""SELECT regexp_extract('2024-08', '(?<y>[0-9]{4})', 1)
                   AS named""",
         """SELECT '2024' AS named"""),
        ("""SELECT regexp_extract('a5b', '\\\\p{Digit}', 0) AS posix""",
         """SELECT '5' AS posix"""),
        """SELECT regexp_extract('aaaa', 'a{3,}', 0) AS ge3,
                  regexp_extract('aa', 'a{3,}', 0) = '' AS miss""",
        ("""SELECT regexp_extract('abcd', 'ab|abcd', 0) AS alt""",
         """SELECT 'ab' AS alt"""),
        ("""SELECT regexp_replace('john smith',
                                  '(\\\\w+) (\\\\w+)', '$2 $1') AS sw""",
         """SELECT regexp_replace('john smith',
                                  '(\\w+) (\\w+)', '\\2 \\1', 'g')
                   AS sw"""),
        # Spark's idx defaults to 1 (whole-match needs explicit 0);
        # DuckDB's defaults to 0 — pass 0 on both sides
        """SELECT regexp_extract_all('a1b2c3', '[0-9]', 0) AS digits""",
        """SELECT regexp_extract_all('k=1,j=2', '([a-z])=', 1)
                  AS keys""",
        ("""SELECT regexp_like('a' || chr(10) || 'b', '(?s)a.b')
                   AS dotall,
                   regexp_like('a' || chr(10) || 'b', 'a.b')
                   AS no_dotall""",
         """SELECT true AS dotall, false AS no_dotall"""),
        ("""SELECT regexp_like('x' || chr(10) || 'abc', '(?m)^abc')
                   AS multiline""",
         """SELECT true AS multiline"""),
        ("""SELECT regexp_like('a.b', '\\\\Qa.b\\\\E') AS quoted,
                   regexp_like('axb', '\\\\Qa.b\\\\E') AS not_quoted""",
         """SELECT true AS quoted, false AS not_quoted"""),
        ("""SELECT regexp_replace('aaa', 'a*+a', 'X') AS possessive""",
         """SELECT 'aaa' AS possessive"""),
    ],
    # ── map surface density 2 (reference: test_files/map.slt) ────────
    "map_dense2": [
        ("""SELECT array_sort(map_values(map('a', 2, 'b', 1))) AS vs""",
         """SELECT [1, 2] AS vs"""),
        ("""SELECT CAST(element_at(map_concat(map('a', 1), map('b', 2)),
                                   'b') AS BIGINT) AS v""",
         """SELECT CAST(2 AS BIGINT) AS v"""),
        ("""SELECT element_at(str_to_map('a:1,b:2', ',', ':'), 'b')
                   AS v""",
         """SELECT '2' AS v"""),
        ("""SELECT CAST(element_at(map_filter(map('a', 1, 'b', 2),
                                              (k, v) -> v > 1), 'b')
                        AS BIGINT) AS kept,
                   element_at(map_filter(map('a', 1, 'b', 2),
                                         (k, v) -> v > 1), 'a')
                   IS NULL AS dropped""",
         """SELECT CAST(2 AS BIGINT) AS kept, true AS dropped"""),
        ("""SELECT CAST(element_at(transform_values(map('a', 3),
                                                    (k, v) -> v * 10),
                                   'a') AS BIGINT) AS v""",
         """SELECT CAST(30 AS BIGINT) AS v"""),
        ("""SELECT CAST(element_at(transform_keys(map('a', 7),
                                                  (k, v) -> upper(k)),
                                   'A') AS BIGINT) AS v""",
         """SELECT CAST(7 AS BIGINT) AS v"""),
        ("""SELECT CAST(element_at(map_zip_with(map('k', 1), map('k', 2),
                                                (k, v1, v2) -> v1 + v2),
                                   'k') AS BIGINT) AS merged""",
         """SELECT CAST(3 AS BIGINT) AS merged"""),
        ("""SELECT CAST(cardinality(map_concat(map('a', 1),
                                               map('b', 2), map('c', 3)))
                        AS BIGINT) AS n""",
         """SELECT CAST(3 AS BIGINT) AS n"""),
        ("""SELECT CAST(element_at(map_from_entries(
                     array(struct('a', 1), struct('b', 2))), 'a')
                        AS BIGINT) AS v""",
         """SELECT CAST(1 AS BIGINT) AS v"""),
        ("""SELECT CAST(element_at(element_at(map('o', map('i', 5)), 'o'),
                                   'i') AS BIGINT) AS nested""",
         """SELECT CAST(5 AS BIGINT) AS nested"""),
        ("""SELECT CAST(size(map()) AS BIGINT) AS empty""",
         """SELECT CAST(0 AS BIGINT) AS empty"""),
        ("""SELECT CAST(element_at(coalesce(CAST(NULL AS MAP<STRING, INT>),
                                            map('d', 9)), 'd')
                        AS BIGINT) AS v""",
         """SELECT CAST(9 AS BIGINT) AS v"""),
        ("""SELECT array_sort(map_keys(map_concat(map('b', 1),
                                                  map('a', 2)))) AS ks""",
         """SELECT ['a', 'b'] AS ks"""),
        ("""SELECT CAST(cardinality(map_concat(map(), map('x', 1)))
                        AS BIGINT) AS n""",
         """SELECT CAST(1 AS BIGINT) AS n"""),
    ],
    # ── array surface density 4 (reference: test_files/array.slt) ────
    "array_dense4": [
        ("""SELECT array_sort(array_union(array(1, 2, 2, 3),
                                          array(3, 4))) AS u""",
         """SELECT list_sort(list_distinct(list_concat([1, 2, 2, 3],
                                                       [3, 4]))) AS u"""),
        ("""SELECT array_sort(array_intersect(array(1, 2, 3),
                                              array(2, 3, 4))) AS i""",
         """SELECT list_sort(list_intersect([1, 2, 3], [2, 3, 4]))
                   AS i"""),
        ("""SELECT array_sort(array_except(array(1, 2, 3), array(2)))
                   AS e""",
         """SELECT [1, 3] AS e"""),
        ("""SELECT slice(array(1, 2, 3, 4, 5), 2, 3) AS s""",
         """SELECT ([1, 2, 3, 4, 5])[2:4] AS s"""),
        ("""SELECT sequence(1, 10, 3) AS s""",
         """SELECT [1, 4, 7, 10] AS s"""),
        ("""SELECT sequence(5, 1) AS descending""",
         """SELECT [5, 4, 3, 2, 1] AS descending"""),
        ("""SELECT array_insert(array(1, 2, 3), 2, 99) AS ins""",
         """SELECT [1, 99, 2, 3] AS ins"""),
        ("""SELECT array_compact(array(1, CAST(NULL AS INT), 2))
                   AS compacted""",
         """SELECT [1, 2] AS compacted"""),
        ("""SELECT array_distinct(array(3, 1, 3, 2)) AS first_seen""",
         """SELECT [3, 1, 2] AS first_seen"""),
        ("""SELECT CAST(array_position(array('a', 'b'), 'b') AS BIGINT)
                   AS hit,
                   CAST(array_position(array('a', 'b'), 'z') AS BIGINT)
                   AS miss""",
         """SELECT CAST(list_position(['a', 'b'], 'b') AS BIGINT) AS hit,
                   CAST(coalesce(list_position(['a', 'b'], 'z'), 0)
                        AS BIGINT) AS miss"""),
        ("""SELECT array_remove(array(1, 2, 1, 3), 1) AS removed""",
         """SELECT [2, 3] AS removed"""),
        ("""SELECT array_repeat('x', 3) AS r""",
         """SELECT ['x', 'x', 'x'] AS r"""),
        ("""SELECT flatten(array(array(1, 2), array(3))) AS f""",
         """SELECT flatten([[1, 2], [3]]) AS f"""),
        ("""SELECT CAST(array_min(array(3, 1, 2)) AS BIGINT) AS mn,
                   CAST(array_max(array(3, 1, 2)) AS BIGINT) AS mx""",
         """SELECT CAST(list_aggregate([3, 1, 2], 'min') AS BIGINT) AS mn,
                   CAST(list_aggregate([3, 1, 2], 'max') AS BIGINT)
                   AS mx"""),
        ("""SELECT array_join(array('a', 'b', 'c'), '-') AS j""",
         """SELECT array_to_string(['a', 'b', 'c'], '-') AS j"""),
        ("""SELECT exists(array(1, 2, 3), x -> x > 2) AS any_gt2,
                   forall(array(1, 2, 3), x -> x > 0) AS all_pos""",
         """SELECT true AS any_gt2, true AS all_pos"""),
        ("""SELECT transform(filter(array(1, 2, 3, 4), x -> x % 2 = 0),
                             x -> x * 10) AS evens_x10""",
         """SELECT list_transform(list_filter([1, 2, 3, 4],
                                              x -> x % 2 = 0),
                                  x -> x * 10) AS evens_x10"""),
        ("""SELECT CAST(aggregate(array(1, 2, 3), 0,
                                  (acc, x) -> acc + x) AS BIGINT)
                   AS total""",
         """SELECT CAST(6 AS BIGINT) AS total"""),
        ("""SELECT zip_with(array(1, 2), array(10, 20),
                            (a, b) -> a + b) AS sums""",
         """SELECT [11, 22] AS sums"""),
        ("""SELECT sort_array(array(2, 1, 3), false) AS descending""",
         """SELECT list_sort([2, 1, 3], 'DESC') AS descending"""),
        ("""SELECT array_contains(array(1, CAST(NULL AS INT)), 1)
                   AS found,
                   array_contains(array(1, CAST(NULL AS INT)), 2)
                   IS NULL AS unknown""",
         """SELECT true AS found, true AS unknown"""),
        ("""SELECT get(array('a', 'b'), 1) AS zero_based,
                   get(array('a', 'b'), 9) IS NULL AS past""",
         """SELECT 'b' AS zero_based, true AS past"""),
        ("""SELECT element_at(array(1, 2, 3), -1) AS last_elem""",
         """SELECT ([1, 2, 3])[-1] AS last_elem"""),
    ],
    # ── datetime surface density 4 ───────────────────────────────────
    "datetime_dense4": [
        """SELECT CAST(date_trunc('week', DATE '2024-01-18') AS DATE)
                  AS wk""",
        """SELECT CAST(date_trunc('quarter', DATE '2024-08-13') AS DATE)
                  AS q""",
        ("""SELECT trunc(DATE '2024-08-13', 'MM') AS m""",
         """SELECT CAST(date_trunc('month', DATE '2024-08-13') AS DATE)
                   AS m"""),
        ("""SELECT add_months(DATE '2024-01-31', 1) AS clamped,
                   add_months(DATE '2024-03-31', -1) AS back""",
         """SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE)
                   AS clamped,
                   CAST(DATE '2024-03-31' - INTERVAL 1 MONTH AS DATE)
                   AS back"""),
        ("""SELECT round(months_between(DATE '2024-03-31',
                                        DATE '2024-01-31'), 4) AS whole,
                   round(months_between(DATE '2024-02-14',
                                        DATE '2024-01-31'), 4) AS frac""",
         """SELECT round(CAST(2.0 AS DOUBLE), 4) AS whole,
                   round(CAST(0.4516129032258065 AS DOUBLE), 4)
                   AS frac"""),
        """SELECT last_day(DATE '2024-02-10') AS leap,
                  last_day(DATE '2023-02-10') AS nonleap""",
        """SELECT make_date(2024, 2, 29) AS leap_day""",
        ("""SELECT CAST(datediff(DATE '2024-03-01', DATE '2024-01-01')
                        AS BIGINT) AS days""",
         """SELECT CAST(date_diff('day', DATE '2024-01-01',
                                  DATE '2024-03-01') AS BIGINT)
                   AS days"""),
        ("""SELECT date_add(DATE '2024-01-01', 45) AS fwd,
                   date_sub(DATE '2024-01-01', 10) AS back""",
         """SELECT DATE '2024-01-01' + 45 AS fwd,
                   DATE '2024-01-01' - 10 AS back"""),
        ("""SELECT date_format(DATE '2024-08-13', 'yyyy/MM/dd') AS f""",
         """SELECT strftime(DATE '2024-08-13', '%Y/%m/%d') AS f"""),
        ("""SELECT date_format(DATE '2024-08-13', 'EEEE') AS dn""",
         """SELECT dayname(DATE '2024-08-13') AS dn"""),
        ("""SELECT CAST(dayofweek(DATE '2024-08-13') AS BIGINT)
                   AS sun1""",
         """SELECT CAST(dayofweek(DATE '2024-08-13') + 1 AS BIGINT)
                   AS sun1"""),
        ("""SELECT CAST(weekday(DATE '2024-08-13') AS BIGINT) AS mon0""",
         """SELECT CAST(1 AS BIGINT) AS mon0"""),
        """SELECT CAST(weekofyear(DATE '2024-01-01') AS BIGINT) AS w1,
                  CAST(weekofyear(DATE '2023-01-01') AS BIGINT) AS w52""",
        """SELECT CAST(quarter(DATE '2024-08-13') AS BIGINT) AS q,
                  CAST(month(DATE '2024-08-13') AS BIGINT) AS m,
                  CAST(year(DATE '2024-08-13') AS BIGINT) AS y""",
        """SELECT CAST(dayofyear(DATE '2024-12-31') AS BIGINT) AS leap,
                  CAST(dayofyear(DATE '2023-12-31') AS BIGINT)
                  AS nonleap""",
        ("""SELECT to_date('13/08/2024', 'dd/MM/yyyy') AS d""",
         """SELECT CAST(strptime('13/08/2024', '%d/%m/%Y') AS DATE)
                   AS d"""),
        ("""SELECT CAST(unix_date(DATE '1970-01-10') AS BIGINT) AS pos,
                   CAST(unix_date(DATE '1969-12-25') AS BIGINT) AS neg""",
         """SELECT CAST(date_diff('day', DATE '1970-01-01',
                                  DATE '1970-01-10') AS BIGINT) AS pos,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  DATE '1969-12-25') AS BIGINT)
                   AS neg"""),
        ("""SELECT next_day(DATE '2024-08-13', 'MON') AS nm""",
         """SELECT DATE '2024-08-19' AS nm"""),
        """SELECT CAST(extract(HOUR FROM
                    make_timestamp(2024, 1, 2, 13, 4, 5)) AS BIGINT)
                  AS h""",
        """SELECT last_day(DATE '2000-02-01') AS century_leap""",
        """SELECT CAST(o_orderdate AS DATE) AS od,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders
           WHERE o_orderdate = (SELECT min(o_orderdate) FROM orders)
           GROUP BY o_orderdate""",
    ],
    # ── conditional / boolean density ────────────────────────────────
    "cond_bool_dense": [
        ("""SELECT CAST(greatest(1, NULL, 3) AS BIGINT) AS g,
                   CAST(least(5, NULL, 2) AS BIGINT) AS l""",
         """SELECT CAST(3 AS BIGINT) AS g, CAST(2 AS BIGINT) AS l"""),
        """SELECT CAST(coalesce(NULL, CAST(5 AS BIGINT)) AS BIGINT)
                  AS c""",
        ("""SELECT CAST(nvl(NULL, 7) AS BIGINT) AS n,
                   CAST(nvl(3, 7) AS BIGINT) AS k""",
         """SELECT CAST(coalesce(NULL, 7) AS BIGINT) AS n,
                   CAST(coalesce(3, 7) AS BIGINT) AS k"""),
        ("""SELECT CAST(nvl2(1, 10, 20) AS BIGINT) AS has,
                   CAST(nvl2(NULL, 10, 20) AS BIGINT) AS hasnt""",
         """SELECT CAST(10 AS BIGINT) AS has,
                   CAST(20 AS BIGINT) AS hasnt"""),
        """SELECT CAST(ifnull(NULL, 9) AS BIGINT) AS i""",
        """SELECT nullif(5, 5) IS NULL AS same,
                  CAST(nullif(5, 6) AS BIGINT) AS diff""",
        ("""SELECT CAST(if(1 < 2, 'yes', 'no') = 'yes' AS BOOLEAN)
                   AS t""",
         """SELECT true AS t"""),
        """SELECT CASE WHEN 1 > 2 THEN 'a' END IS NULL AS no_else""",
        """SELECT CASE 3 WHEN 1 THEN 'one' WHEN 3 THEN 'three'
                  ELSE 'other' END AS simple""",
        """SELECT least(DATE '2024-01-01', DATE '2023-12-31') AS d""",
        """SELECT greatest('apple', 'banana', 'cherry') AS s""",
        ("""SELECT round(nanvl(CAST('NaN' AS DOUBLE), 0.0), 4) AS nv""",
         """SELECT round(CAST(0.0 AS DOUBLE), 4) AS nv"""),
        """SELECT CAST('true' AS BOOLEAN) AS t,
                  CAST('false' AS BOOLEAN) AS f,
                  CAST('1' AS BOOLEAN) AS one,
                  CAST('0' AS BOOLEAN) AS zero""",
        """SELECT coalesce(NULL, NULL, 'third') AS c3,
                  coalesce('first', 'second') AS c1""",
        """SELECT CASE WHEN o_totalprice > 200000 THEN 'high'
                       WHEN o_totalprice > 100000 THEN 'mid'
                       ELSE 'low' END AS band,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1 ORDER BY band""",
    ],
    # ── join null-key semantics density ──────────────────────────────
    "join_null_dense": [
        """SELECT CAST(count(*) AS BIGINT) AS n FROM
             (VALUES (1), (CAST(NULL AS INT))) a(k)
           JOIN (VALUES (1), (CAST(NULL AS INT))) b(k)
           ON a.k = b.k""",
        """SELECT a.k, b.k IS NULL AS unmatched FROM
             (VALUES (1), (CAST(NULL AS INT))) a(k)
           LEFT JOIN (VALUES (1)) b(k) ON a.k = b.k
           ORDER BY a.k NULLS FIRST""",
        ("""SELECT CAST(count(*) AS BIGINT) AS n FROM
              (VALUES (1), (CAST(NULL AS INT))) a(k)
            JOIN (VALUES (1), (CAST(NULL AS INT))) b(k)
            ON a.k <=> b.k""",
         """SELECT CAST(count(*) AS BIGINT) AS n FROM
              (VALUES (1), (CAST(NULL AS INTEGER))) a(k)
            JOIN (VALUES (1), (CAST(NULL AS INTEGER))) b(k)
            ON a.k IS NOT DISTINCT FROM b.k"""),
        """SELECT CAST(coalesce(a.k, b.k) AS BIGINT) AS k,
                  a.k IS NULL AS only_right,
                  b.k IS NULL AS only_left
           FROM (VALUES (1), (2)) a(k)
           FULL OUTER JOIN (VALUES (2), (3)) b(k) ON a.k = b.k
           ORDER BY k""",
        """SELECT CAST(x AS BIGINT) AS x FROM (VALUES (1), (2), (3)) t(x)
           WHERE NOT EXISTS (
             SELECT 1 FROM (VALUES (2), (CAST(NULL AS INT))) u(y)
             WHERE u.y = t.x)
           ORDER BY x""",
        """SELECT CAST(x AS BIGINT) AS x FROM (VALUES (1), (2), (3)) t(x)
           WHERE EXISTS (
             SELECT 1 FROM (VALUES (2), (CAST(NULL AS INT))) u(y)
             WHERE u.y = t.x)
           ORDER BY x""",
        """SELECT CAST(a.k AS BIGINT) AS k, CAST(b.j AS BIGINT) AS j
           FROM (VALUES (1), (2)) a(k)
           JOIN (VALUES (2), (3)) b(j) ON a.k + 1 = b.j
           ORDER BY k""",
        """SELECT n1.n_name AS a, n2.n_name AS b
           FROM nation n1 JOIN nation n2
           ON n1.n_regionkey = n2.n_regionkey
              AND n1.n_nationkey < n2.n_nationkey
           WHERE n1.n_regionkey = 0
           ORDER BY a, b LIMIT 10""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM region CROSS JOIN region r2""",
        """SELECT c_name FROM customer
           JOIN nation ON c_nationkey = n_nationkey
                          AND n_regionkey = 1
           ORDER BY c_name LIMIT 5""",
        """SELECT CAST(count(*) AS BIGINT) AS fanout FROM
             (VALUES (1), (1)) a(k) JOIN (VALUES (1), (1), (1)) b(k)
           ON a.k = b.k""",
        """SELECT r_name, n_name FROM region
           JOIN nation ON r_regionkey = n_regionkey
           WHERE r_name = 'ASIA' ORDER BY n_name""",
        """SELECT CAST(count(*) AS BIGINT) AS n
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           WHERE o.o_orderstatus = 'F' AND l.l_quantity > 45""",
    ],
    # ── window density 6 ─────────────────────────────────────────────
    "window_dense6": [
        """SELECT x, CAST(ntile(3) OVER (ORDER BY x) AS BIGINT) AS bucket
           FROM (VALUES (1), (2), (3), (4), (5), (6), (7), (8), (9),
                        (10)) t(x)
           ORDER BY x""",
        """SELECT x, CAST(lag(x, 1, -1) OVER (ORDER BY x) AS BIGINT)
                  AS prev
           FROM (VALUES (10), (20), (30)) t(x) ORDER BY x""",
        """SELECT x, lead(x, 2) OVER (ORDER BY x) IS NULL AS no_lead
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT o_orderstatus,
                  CAST(rank() OVER (ORDER BY o_orderstatus) AS BIGINT)
                  AS r,
                  CAST(dense_rank() OVER (ORDER BY o_orderstatus)
                       AS BIGINT) AS dr
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT x, round(percent_rank() OVER (ORDER BY x), 4) AS pr
           FROM (VALUES (5)) t(x)""",
        """SELECT x, round(cume_dist() OVER (ORDER BY x), 4) AS cd
           FROM (VALUES (1), (2), (2), (3)) t(x) ORDER BY x, cd""",
        """SELECT n_name,
                  CAST(row_number() OVER (ORDER BY n_nationkey)
                       AS BIGINT) AS rn
           FROM nation ORDER BY rn LIMIT 5""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS running
           FROM (VALUES (1), (2), (3), (4)) t(x) ORDER BY x""",
        """SELECT x, round(avg(CAST(x AS DOUBLE)) OVER (ORDER BY x
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4)
                  AS ma3
           FROM (VALUES (2), (4), (6), (8)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                       RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS win
           FROM (VALUES (1), (3), (9), (12)) t(x) ORDER BY x""",
        """SELECT x,
                  CAST(first_value(x) OVER w AS BIGINT) AS fv,
                  CAST(last_value(x) OVER w AS BIGINT) AS lv
           FROM (VALUES (1), (2), (3)) t(x)
           WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)
           ORDER BY x""",
        """SELECT n_regionkey, n_name FROM (
             SELECT n_regionkey, n_name,
                    row_number() OVER (PARTITION BY n_regionkey
                                       ORDER BY n_name) AS rn
             FROM nation) t WHERE rn <= 2
           ORDER BY n_regionkey, n_name""",
        """SELECT x,
                  CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS fwd,
                  CAST(row_number() OVER (ORDER BY x DESC) AS BIGINT)
                  AS bwd
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT o_orderstatus, CAST(count(*) OVER () AS BIGINT)
                  AS total
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT n_name, CAST(sum(n_nationkey)
                       OVER (PARTITION BY n_regionkey) AS BIGINT)
                  AS region_sum
           FROM nation WHERE n_regionkey = 2 ORDER BY n_name""",
        """SELECT x, CAST(nth_value(x, 2) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
                       FOLLOWING) AS BIGINT) AS second
           FROM (VALUES (10), (20), (30)) t(x) ORDER BY x""",
        """SELECT x, CAST(min(x) OVER (ORDER BY x
                       ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING)
                       AS BIGINT) AS next_min
           FROM (VALUES (3), (1), (2)) t(x) ORDER BY x""",
        """SELECT l_returnflag,
                  round(max(s) OVER (), 2) AS best FROM (
             SELECT l_returnflag, sum(l_extendedprice) AS s
             FROM lineitem GROUP BY l_returnflag) t
           ORDER BY l_returnflag""",
    ],
    # ── set-operation density ────────────────────────────────────────
    "setop_dense": [
        """SELECT CAST(x AS BIGINT) AS x FROM (
             SELECT 1 AS x UNION SELECT 1 UNION SELECT 2) t
           ORDER BY x""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM (
             SELECT o_orderstatus FROM orders
             UNION ALL SELECT o_orderstatus FROM orders) t""",
        """SELECT CAST(x AS BIGINT) AS x FROM (
             SELECT 1 AS x UNION ALL SELECT 2
             INTERSECT SELECT 2) t ORDER BY x""",
        """SELECT CAST(x AS BIGINT) AS x FROM (
             (SELECT 1 AS x UNION ALL SELECT 2 UNION ALL SELECT 2)
             EXCEPT ALL (SELECT 2)) t ORDER BY x""",
        """SELECT o_orderstatus FROM orders
           INTERSECT SELECT l_linestatus FROM lineitem
           ORDER BY o_orderstatus""",
        """SELECT n_name FROM nation WHERE n_regionkey = 0
           EXCEPT SELECT n_name FROM nation WHERE n_nationkey < 5
           ORDER BY n_name""",
        """SELECT CAST(x AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS n
           FROM (SELECT 1 AS x UNION ALL SELECT 1
                 INTERSECT ALL SELECT 1 UNION ALL SELECT 1) t
           GROUP BY x""",
        """SELECT CAST(x AS BIGINT) AS x FROM (
             SELECT 1 AS x UNION SELECT NULL UNION SELECT NULL) t
           ORDER BY x NULLS FIRST""",
        """SELECT round(x, 4) AS x FROM (
             SELECT CAST(1 AS DOUBLE) AS x
             UNION SELECT CAST(1.0 AS DOUBLE)) t""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM (
             SELECT n_nationkey FROM nation
             EXCEPT SELECT r_regionkey FROM region) t""",
        """SELECT x FROM (
             SELECT 'a' AS x UNION ALL SELECT 'b'
             UNION ALL SELECT 'a') t
           GROUP BY x HAVING count(*) = 2""",
        """SELECT CAST(a AS BIGINT) AS a, b FROM (
             SELECT 1 AS a, 'x' AS b UNION SELECT 1, 'y'
             UNION SELECT 1, 'x') t ORDER BY a, b""",
    ],
    # ── VALUES / inline-table density ────────────────────────────────
    "values_dense": [
        """SELECT CAST(x AS BIGINT) AS x, y
           FROM (VALUES (1, 'a'), (2, 'b')) t(x, y) ORDER BY x""",
        """SELECT round(x, 4) AS x FROM
             (VALUES (1), (2.5)) t(x) ORDER BY x""",
        """SELECT CAST(x AS BIGINT) AS x FROM
             (VALUES (1), (NULL), (3)) t(x) ORDER BY x NULLS FIRST""",
        """SELECT t.x, u.y FROM (VALUES ('a')) t(x)
           CROSS JOIN (VALUES ('b'), ('c')) u(y) ORDER BY t.x, u.y""",
        """SELECT CAST(max(x) AS BIGINT) AS mx FROM
             (VALUES (5), (3), (9)) t(x)""",
        """SELECT CAST(x + 1 AS BIGINT) AS inc FROM
             (VALUES (10)) t(x)""",
        """SELECT v.x FROM (VALUES ('one'), ('two'), ('three')) v(x)
           WHERE length(v.x) = 3 ORDER BY v.x""",
        """SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
           FROM (VALUES (1, 2), (3, 4)) t(a, b)
           WHERE a < b ORDER BY a""",
        """SELECT x, CAST(count(*) AS BIGINT) AS n FROM
             (VALUES ('dup'), ('dup'), ('solo')) t(x)
           GROUP BY x ORDER BY x""",
        """SELECT CAST(sum(x * y) AS BIGINT) AS dot FROM
             (VALUES (1, 10), (2, 20)) t(x, y)""",
        """SELECT b FROM (VALUES (true), (false), (NULL)) t(b)
           ORDER BY b NULLS FIRST""",
        """SELECT d FROM (VALUES (DATE '2024-01-01'),
                                 (DATE '2023-06-15')) t(d)
           ORDER BY d""",
    ],
    # ── decimal precision / scale propagation ────────────────────────
    "decimal_dense2": [
        """SELECT CAST(1.10 AS DECIMAL(10, 2))
                  + CAST(2.05 AS DECIMAL(10, 2)) AS s""",
        """SELECT CAST(1.25 AS DECIMAL(10, 2))
                  * CAST(0.04 AS DECIMAL(10, 2)) AS p""",
        """SELECT round(CAST(1 AS DECIMAL(10, 2)) / 3, 4) AS third""",
        """SELECT round(sum(CAST(x AS DECIMAL(10, 2))), 4) AS s FROM
             (VALUES (1.11), (2.22), (3.33)) t(x)""",
        """SELECT round(avg(CAST(x AS DECIMAL(10, 2))), 4) AS a FROM
             (VALUES (1.00), (2.00), (4.00)) t(x)""",
        """SELECT round(CAST(-2.345 AS DECIMAL(10, 3)), 2) AS neg_half""",
        # Spark decimal->int CAST truncates toward zero; DuckDB rounds
        ("""SELECT CAST(CAST(2.9 AS DECIMAL(5, 1)) AS INT) AS t1,
                   CAST(CAST(-2.9 AS DECIMAL(5, 1)) AS INT) AS t2""",
         """SELECT CAST(trunc(CAST(2.9 AS DECIMAL(5, 1))) AS INTEGER)
                   AS t1,
                   CAST(trunc(CAST(-2.9 AS DECIMAL(5, 1))) AS INTEGER)
                   AS t2"""),
        """SELECT round(TRY_CAST('12.345' AS DECIMAL(10, 3)), 4) AS ok,
                  TRY_CAST('abc' AS DECIMAL(10, 2)) IS NULL AS bad""",
        """SELECT CAST(1.5 AS DECIMAL(5, 1)) > 1.4999 AS cmp""",
        """SELECT round(min(CAST(x AS DECIMAL(8, 2))), 4) AS mn,
                  round(max(CAST(x AS DECIMAL(8, 2))), 4) AS mx FROM
             (VALUES (-5.25), (0.00), (7.75)) t(x)""",
        """SELECT round(CAST(10.50 AS DECIMAL(10, 2))
                        % CAST(3.00 AS DECIMAL(10, 2)), 4) AS m""",
        """SELECT round(sum(DISTINCT CAST(x AS DECIMAL(8, 2))), 4) AS sd
           FROM (VALUES (1.50), (1.50), (2.25)) t(x)""",
        """SELECT CAST(round(12345.678, -2) AS BIGINT) AS hundreds""",
        ("""SELECT round(bround(2.5, 0), 4) AS even1,
                   round(bround(3.5, 0), 4) AS even2""",
         """SELECT round(CAST(2.0 AS DOUBLE), 4) AS even1,
                   round(CAST(4.0 AS DOUBLE), 4) AS even2"""),
        """SELECT round(CAST(0.1 AS DECIMAL(3, 1))
                        + CAST(0.2 AS DECIMAL(3, 1)), 4) AS exact""",
    ],
    # ── correlated subquery density ──────────────────────────────────
    "correlated_dense": [
        """SELECT o_orderkey,
                  CAST((SELECT count(*) FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey) AS BIGINT)
                  AS n_lines
           FROM orders o ORDER BY o_orderkey LIMIT 10""",
        """SELECT o_orderkey FROM orders o
           WHERE EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o.o_orderkey
                           AND l.l_quantity > 49)
           ORDER BY o_orderkey LIMIT 10""",
        """SELECT n_name FROM nation n
           WHERE NOT EXISTS (SELECT 1 FROM customer c
                             WHERE c.c_nationkey = n.n_nationkey)
           ORDER BY n_name""",
        """SELECT o_orderkey,
                  round(coalesce((SELECT sum(l_extendedprice)
                                  FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey
                                    AND l.l_discount > 0.09), 0), 2)
                  AS heavy_disc
           FROM orders o ORDER BY o_orderkey LIMIT 8""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM orders o
           WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""",
        """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n
           FROM customer c GROUP BY c_nationkey
           HAVING count(*) > (SELECT count(*) FROM customer)
                             / (SELECT count(DISTINCT c_nationkey) + 5
                                FROM customer)
           ORDER BY c_nationkey""",
        """SELECT o_orderkey,
                  CAST((SELECT max(l_linenumber) FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey) AS BIGINT)
                  AS max_line,
                  CAST((SELECT min(l_linenumber) FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey) AS BIGINT)
                  AS min_line
           FROM orders o ORDER BY o_orderkey LIMIT 10""",
        """SELECT o_orderkey,
                  CASE WHEN (SELECT count(*) FROM lineitem l
                             WHERE l.l_orderkey = o.o_orderkey) > 4
                       THEN 'big' ELSE 'small' END AS sz
           FROM orders o ORDER BY o_orderkey LIMIT 10""",
        """SELECT s_suppkey FROM supplier s
           WHERE EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_suppkey = s.s_suppkey
                           AND l.l_returnflag = 'R')
           ORDER BY s_suppkey LIMIT 10""",
        """SELECT n_nationkey FROM nation n
           WHERE n_nationkey = (SELECT min(c_nationkey) FROM customer c
                                WHERE c.c_nationkey >= n.n_nationkey)
           ORDER BY n_nationkey LIMIT 10""",
        """SELECT r_name FROM region r
           WHERE (SELECT count(*) FROM nation n
                  WHERE n.n_regionkey = r.r_regionkey) = 5
           ORDER BY r_name""",
        """SELECT o_orderkey FROM orders o
           WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey
                                  AND l.l_linenumber = 7)
           ORDER BY o_orderkey LIMIT 10""",
    ],
    # ── JSON path density 2 ──────────────────────────────────────────
    "json_dense2": [
        ("""SELECT get_json_object('{"a": {"b": [1, 2, 3]}}', '$.a.b[1]')
                   AS second""",
         """SELECT json_extract_string('{"a": {"b": [1, 2, 3]}}',
                                       '$.a.b[1]') AS second"""),
        ("""SELECT get_json_object('{"a": 1}', '$.missing') IS NULL
                   AS miss""",
         """SELECT json_extract_string('{"a": 1}', '$.missing') IS NULL
                   AS miss"""),
        ("""SELECT get_json_object('{"k": "v"}', '$.k') AS v""",
         """SELECT json_extract_string('{"k": "v"}', '$.k') AS v"""),
        ("""SELECT get_json_object('{"a": {"b": {"c": 42}}}', '$.a.b.c')
                   AS deep""",
         """SELECT json_extract_string('{"a": {"b": {"c": 42}}}',
                                       '$.a.b.c') AS deep"""),
        ("""SELECT CAST(json_array_length('[1, 2, 3, 4]') AS BIGINT)
                   AS n""",
         """SELECT CAST(json_array_length('[1, 2, 3, 4]') AS BIGINT)
                   AS n"""),
        ("""SELECT array_sort(json_object_keys('{"b": 1, "a": 2}'))
                   AS ks""",
         """SELECT list_sort(json_keys('{"b": 1, "a": 2}')) AS ks"""),
        ("""SELECT CAST(from_json('{"a": 7}', 'a INT').a AS BIGINT)
                   AS typed""",
         """SELECT CAST(7 AS BIGINT) AS typed"""),
        ("""SELECT to_json(named_struct('a', 1, 'b', 'x')) AS j""",
         """SELECT '{"a":1,"b":"x"}' AS j"""),
        ("""SELECT get_json_object('[10, 20, 30]', '$[2]') AS idx""",
         """SELECT '30' AS idx"""),
        ("""SELECT from_json('[1, 2, 3]', 'ARRAY<INT>') AS arr""",
         """SELECT [1, 2, 3] AS arr"""),
        ("""SELECT get_json_object('{"a": null}', '$.a') IS NULL
                   AS json_null""",
         """SELECT true AS json_null"""),
        ("""SELECT CAST(from_json('{"a": {"b": 5}}',
                                  'a STRUCT<b: INT>').a.b AS BIGINT)
                   AS nested""",
         """SELECT CAST(5 AS BIGINT) AS nested"""),
    ],
    # ── grouping sets density 3 ──────────────────────────────────────
    "grouping_dense3": [
        """SELECT coalesce(o_orderstatus, 'ALL') AS st,
                  coalesce(o_orderpriority, 'ALL') AS pr,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders
           GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                   (o_orderstatus), ())
           ORDER BY st, pr LIMIT 25""",
        """SELECT CAST(grouping(o_orderstatus) AS BIGINT) AS g,
                  coalesce(o_orderstatus, '-') AS st,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY ROLLUP (o_orderstatus)
           ORDER BY g, st""",
        """SELECT CAST(count(*) AS BIGINT) AS n_rows FROM (
             SELECT l_returnflag, l_linestatus, count(*) AS c
             FROM lineitem
             GROUP BY CUBE (l_returnflag, l_linestatus)) t""",
        """SELECT coalesce(l_returnflag, '-') AS rf,
                  coalesce(l_linestatus, '-') AS ls,
                  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
                  CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           ORDER BY g_rf, g_ls, rf, ls""",
        # grouping() in HAVING doesn't resolve in Spark when the select
        # list coalesces the key — filter in an outer query instead
        """SELECT st, rev FROM (
             SELECT coalesce(o_orderstatus, 'T') AS st,
                    round(sum(o_totalprice), 2) AS rev,
                    CAST(grouping(o_orderstatus) AS BIGINT) AS g,
                    count(*) AS c
             FROM orders GROUP BY ROLLUP (o_orderstatus)) t
           WHERE g = 1 OR c > 100 ORDER BY st""",
        """SELECT st, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT CASE WHEN grouping(o_orderstatus) = 1 THEN 'total'
                         ELSE o_orderstatus END AS st
             FROM orders GROUP BY ROLLUP (o_orderstatus)) t
           GROUP BY st ORDER BY st""",
        """SELECT coalesce(n_name, r_name, 'GRAND') AS lvl,
                  CAST(count(*) AS BIGINT) AS n
           FROM nation JOIN region ON n_regionkey = r_regionkey
           GROUP BY GROUPING SETS ((n_name), (r_name), ())
           ORDER BY lvl LIMIT 20""",
        """SELECT coalesce(o_orderstatus, 'A') AS st,
                  CAST(year(min(o_orderdate)) AS BIGINT) AS first_year
           FROM orders GROUP BY ROLLUP (o_orderstatus)
           ORDER BY st""",
    ],
    # ── window frames density 7 ──────────────────────────────────────
    "window_frames7": [
        """SELECT x, CAST(sum(x) OVER (ORDER BY x DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS rev_running
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                       ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING)
                       AS BIGINT) AS lagged_pair
           FROM (VALUES (1), (2), (3), (4)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                       ROWS BETWEEN 0 PRECEDING AND 0 FOLLOWING)
                       AS BIGINT) AS self_only
           FROM (VALUES (5), (7)) t(x) ORDER BY x""",
        """SELECT x, CAST(count(*) OVER (ORDER BY x
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS BIGINT) AS remaining
           FROM (VALUES (1), (2), (3), (4)) t(x) ORDER BY x""",
        """SELECT x, max(x) OVER (ORDER BY x
                       ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING)
                  IS NULL AS tail_empty
           FROM (VALUES (1), (2), (3)) t(x) ORDER BY x""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                       RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS BIGINT) AS suffix_sum
           FROM (VALUES (1), (2), (2), (3)) t(x) ORDER BY x, suffix_sum""",
        """SELECT x, CAST(sum(x) OVER (ORDER BY x
                       RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                       AS BIGINT) AS peer_sum
           FROM (VALUES (1), (2), (2), (3)) t(x) ORDER BY x, peer_sum""",
        """SELECT d, CAST(sum(v) OVER (ORDER BY d
                       RANGE BETWEEN INTERVAL 2 DAY PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS win3d
           FROM (VALUES (DATE '2024-01-01', 1),
                        (DATE '2024-01-02', 10),
                        (DATE '2024-01-05', 100),
                        (DATE '2024-01-06', 1000)) t(d, v)
           ORDER BY d""",
        """SELECT x, CAST(min(x) OVER (ORDER BY x
                       RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
                       AS BIGINT) AS near_min
           FROM (VALUES (1), (5), (6), (20)) t(x) ORDER BY x""",
        """SELECT x, round(avg(CAST(x AS DOUBLE)) OVER (
                       PARTITION BY x % 2 ORDER BY x
                       ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), 4)
                  AS par_ma
           FROM (VALUES (1), (2), (3), (4), (5), (6)) t(x)
           ORDER BY x""",
        """SELECT x, CAST(count(*) OVER () AS BIGINT) AS n_all,
                  CAST(count(*) OVER (PARTITION BY x % 2) AS BIGINT)
                  AS n_par
           FROM (VALUES (1), (2), (3), (4), (5)) t(x) ORDER BY x""",
    ],
    # ── interval arithmetic density 2 ────────────────────────────────
    "interval_dense2": [
        """SELECT CAST(DATE '2023-01-31' + INTERVAL 14 MONTH AS DATE)
                  AS ym""",
        ("""SELECT date_add(DATE '2024-01-01', 3 * 7) AS mul""",
         """SELECT CAST(DATE '2024-01-01' + INTERVAL 21 DAY AS DATE)
                   AS mul"""),
        """SELECT CAST(DATE '2024-03-15' - INTERVAL 45 DAY AS DATE)
                  AS back""",
        """SELECT CAST(TIMESTAMP '2024-01-01 00:00:00'
                       + INTERVAL 90 MINUTE AS DATE) AS still_day1,
                  CAST(extract(HOUR FROM TIMESTAMP '2024-01-01 00:00:00'
                       + INTERVAL 90 MINUTE) AS BIGINT) AS h""",
        """SELECT CAST(DATE '2024-02-29' + INTERVAL 1 YEAR AS DATE)
                  AS leap_fwd""",
        ("""SELECT CAST(datediff(DATE '2024-12-31', DATE '2024-01-01')
                        AS BIGINT) AS span""",
         """SELECT CAST(DATE '2024-12-31' - DATE '2024-01-01' AS BIGINT)
                   AS span"""),
        """SELECT CAST(extract(MINUTE FROM TIMESTAMP '2024-01-01 10:20:30'
                       + INTERVAL 100 SECOND) AS BIGINT) AS m""",
        """SELECT CAST(DATE '2024-01-01' + INTERVAL 0 DAY AS DATE)
                  AS identity""",
        """SELECT CAST(TIMESTAMP '2024-06-15 12:00:00'
                       - INTERVAL 36 HOUR AS DATE) AS prev_day""",
        """SELECT DATE '2024-01-10' + INTERVAL 5 DAY
                  > DATE '2024-01-14' AS cmp""",
    ],
    # ── encoding / hash codec density ────────────────────────────────
    "codec_dense": [
        ("""SELECT base64('abc') AS b64""",
         """SELECT 'YWJj' AS b64"""),
        ("""SELECT string(unbase64('YWJj')) AS plain""",
         """SELECT 'abc' AS plain"""),
        """SELECT upper(hex(255)) AS ff, lower(hex(16)) AS ten""",
        ("""SELECT string(unhex('616263')) AS s""",
         """SELECT 'abc' AS s"""),
        """SELECT md5('graft') AS m""",
        ("""SELECT sha1('graft') AS s1""",
         """SELECT '9c298007ec968fa5b8de22a5356f4bd8a865daf2' AS s1"""),
        ("""SELECT sha2('graft', 256) AS s256""",
         """SELECT sha256('graft') AS s256"""),
        ("""SELECT CAST(crc32('graft') AS BIGINT) AS c""",
         """SELECT CAST(31255620 AS BIGINT) AS c"""),
        ("""SELECT url_encode('a b&c') AS enc,
                   url_decode('a%20b%26c') AS dec""",
         """SELECT 'a+b%26c' AS enc, 'a b&c' AS dec"""),
        """SELECT md5('') AS empty_md5""",
        ("""SELECT CAST(xxhash64('graft') AS BIGINT) =
                   CAST(xxhash64('graft') AS BIGINT) AS stable""",
         """SELECT true AS stable"""),
        ("""SELECT length(sha2('x', 512)) AS hexlen""",
         """SELECT CAST(128 AS BIGINT) AS hexlen"""),
    ],
    # ── array surface density 5 (reference: array.slt is the densest
    #    slt file — 6.8k lines) ───────────────────────────────────────
    "arrays_dense5": [
        ("""SELECT array('b', 'a') AS arr ORDER BY arr""",
         """SELECT ['b', 'a'] AS arr ORDER BY arr"""),
        ("""SELECT a, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT array(x % 2, x % 3) AS a
              FROM (VALUES (0), (1), (2), (3), (4), (5)) t(x)) g
            GROUP BY a ORDER BY a""",
         """SELECT a, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT [x % 2, x % 3] AS a
              FROM (VALUES (0), (1), (2), (3), (4), (5)) t(x)) g
            GROUP BY a ORDER BY a"""),
        ("""SELECT x FROM (VALUES (array(1, 2)), (array(1)),
                                  (array(2))) t(x)
            ORDER BY x""",
         """SELECT x FROM (VALUES ([1, 2]), ([1]), ([2])) t(x)
            ORDER BY x"""),
        ("""SELECT array(1, 2) = array(1, 2) AS eq,
                   array(1, 2) = array(2, 1) AS neq""",
         """SELECT [1, 2] = [1, 2] AS eq, [1, 2] = [2, 1] AS neq"""),
        ("""SELECT concat(array(1, 2), array(3)) AS c""",
         """SELECT [1, 2] || [3] AS c"""),
        ("""SELECT element_at(element_at(array(array(1, 2),
                                               array(3, 4)), 2), 1)
                   AS corner""",
         """SELECT ([[1, 2], [3, 4]])[2][1] AS corner"""),
        ("""SELECT CAST(size(array()) AS BIGINT) AS empty,
                   CAST(size(array(1, 1, 1)) AS BIGINT) AS three""",
         """SELECT CAST(0 AS BIGINT) AS empty,
                   CAST(3 AS BIGINT) AS three"""),
        ("""SELECT array_sort(array('banana', 'apple', 'cherry'))
                   AS sorted_strs""",
         """SELECT list_sort(['banana', 'apple', 'cherry'])
                   AS sorted_strs"""),
        ("""SELECT CAST(count(*) AS BIGINT) AS n FROM
              (VALUES (array(1, 2))) a(x)
            JOIN (VALUES (array(1, 2)), (array(9))) b(y)
            ON a.x = b.y""",
         """SELECT CAST(count(*) AS BIGINT) AS n FROM
              (VALUES ([1, 2])) a(x)
            JOIN (VALUES ([1, 2]), ([9])) b(y) ON a.x = b.y"""),
        ("""SELECT transform(array(1, 2, 3),
                             x -> CASE WHEN x % 2 = 0 THEN x
                                       ELSE -x END) AS signed""",
         """SELECT list_transform([1, 2, 3],
                                  x -> CASE WHEN x % 2 = 0 THEN x
                                            ELSE -x END) AS signed"""),
        ("""SELECT array(CAST(NULL AS INT), 1) AS leading_null""",
         """SELECT [CAST(NULL AS INTEGER), 1] AS leading_null"""),
        ("""SELECT array_distinct(array(CAST(NULL AS INT), 1,
                                        CAST(NULL AS INT))) AS dedup""",
         """SELECT [CAST(NULL AS INTEGER), 1] AS dedup"""),
        ("""SELECT array_max(array(1, CAST(NULL AS INT), 3)) IS NOT NULL
                   AS skips_null,
                   CAST(array_max(array(1, CAST(NULL AS INT), 3))
                        AS BIGINT) AS mx""",
         """SELECT true AS skips_null, CAST(3 AS BIGINT) AS mx"""),
        ("""SELECT filter(array(1, CAST(NULL AS INT), 3),
                          x -> x IS NOT NULL) AS compact_hof""",
         """SELECT list_filter([1, CAST(NULL AS INTEGER), 3],
                               x -> x IS NOT NULL) AS compact_hof"""),
        ("""SELECT sort_array(collect_list(n_regionkey)) AS ks
            FROM nation WHERE n_nationkey < 5""",
         """SELECT list_sort(list(n_regionkey)) AS ks
            FROM nation WHERE n_nationkey < 5"""),
        ("""SELECT array_position(array(1, 2, 1), 1) = 1
                   AS first_occurrence""",
         """SELECT list_position([1, 2, 1], 1) = 1
                   AS first_occurrence"""),
        ("""SELECT reverse(array(1, 2, 3)) AS rev""",
         """SELECT list_reverse([1, 2, 3]) AS rev"""),
        ("""SELECT CAST(aggregate(sequence(1, 100), 0,
                                  (acc, x) -> acc + x) AS BIGINT)
                   AS gauss""",
         """SELECT CAST(5050 AS BIGINT) AS gauss"""),
    ],
    # ── string surface density 5 ─────────────────────────────────────
    "string_dense5": [
        """SELECT 'Spark' ilike 'spark' AS ci,
                  'Spark' ilike 'sp%' AS ci_prefix""",
        ("""SELECT 'a1' rlike '^[a-z][0-9]$' AS m""",
         """SELECT regexp_matches('a1', '^[a-z][0-9]$') AS m"""),
        """SELECT c FROM (VALUES ('a'), ('B'), ('c'), ('D')) t(c)
           WHERE c ilike '%b%' OR c ilike '%d%' ORDER BY c""",
        # a bare 2.5 literal is DECIMAL in Spark and Java's %f rejects it
        """SELECT printf('%d-%s-%.2f', 7, 'x', CAST(2.5 AS DOUBLE))
                  AS f""",
        ("""SELECT format_string('[%05d]', 42) AS padded""",
         """SELECT printf('[%05d]', 42) AS padded"""),
        """SELECT length('héllo') AS chars""",
        """SELECT upper('héllo') AS u""",
        """SELECT substring('héllo', 2, 3) AS mid""",
        # Spark LIKE treats backslash as an implicit escape; DuckDB only
        # escapes with an explicit ESCAPE clause — pin Spark's semantics
        ("""SELECT 'a_c' LIKE 'a\\\\_c' AS esc_match,
                   'abc' LIKE 'a\\\\_c' AS esc_reject,
                   'abc' LIKE 'a_c' AS wild_match""",
         """SELECT 'a_c' LIKE 'a\\_c' ESCAPE '\\' AS esc_match,
                   'abc' LIKE 'a\\_c' ESCAPE '\\' AS esc_reject,
                   'abc' LIKE 'a_c' AS wild_match"""),
        """SELECT 'abc' LIKE 'a%' AS pre, 'abc' LIKE '%c' AS suf,
                  'abc' LIKE '%b%' AS mid""",
        ("""SELECT btrim('xxhixx', 'x') AS b""",
         """SELECT trim('xxhixx', 'x') AS b"""),
        """SELECT n_name FROM nation
           WHERE n_name BETWEEN 'I' AND 'K' ORDER BY n_name""",
        ("""SELECT find_in_set('b', 'a,b,c') AS pos""",
         """SELECT CAST(list_position(string_split('a,b,c', ','), 'b')
                        AS INTEGER) AS pos"""),
        ("""SELECT substring_index('a.b.c', '.', 2) AS first2,
                   substring_index('a.b.c', '.', -1) AS last1""",
         """SELECT 'a.b' AS first2, 'c' AS last1"""),
        """SELECT lower(n_name) AS l FROM nation
           WHERE n_regionkey = 3 ORDER BY l""",
        ("""SELECT conv('ff', 16, 10) AS hex2dec,
                   conv('255', 10, 2) AS dec2bin""",
         """SELECT '255' AS hex2dec, '11111111' AS dec2bin"""),
        # sentences() returns ARRAY<ARRAY<STRING>> — nested output is
        # banned by the corpus rules, so take the first sentence only
        ("""SELECT element_at(sentences('Hi there. How are you?'), 1)
                   AS s1""",
         """SELECT ['Hi', 'there'] AS s1"""),
        """SELECT replace('2024-08-13', '-', '/') AS slashes""",
    ],
    # ── window density 8: IGNORE NULLS nav + mixed shapes ────────────
    "window_dense8": [
        ("""SELECT x, CAST(lag(v) IGNORE NULLS OVER (ORDER BY x)
                        AS BIGINT) AS prev_nn
            FROM (VALUES (1, 10), (2, CAST(NULL AS INT)), (3, 30),
                         (4, CAST(NULL AS INT)), (5, 50)) t(x, v)
            ORDER BY x""",
         """SELECT x, CAST(lag(v IGNORE NULLS) OVER (ORDER BY x)
                        AS BIGINT) AS prev_nn
            FROM (VALUES (1, 10), (2, CAST(NULL AS INTEGER)), (3, 30),
                         (4, CAST(NULL AS INTEGER)), (5, 50)) t(x, v)
            ORDER BY x"""),
        ("""SELECT x, CAST(first_value(v) IGNORE NULLS
                        OVER (ORDER BY x) AS BIGINT) AS first_nn
            FROM (VALUES (1, CAST(NULL AS INT)), (2, 20),
                         (3, 30)) t(x, v)
            ORDER BY x""",
         """SELECT x, CAST(first_value(v IGNORE NULLS)
                        OVER (ORDER BY x) AS BIGINT) AS first_nn
            FROM (VALUES (1, CAST(NULL AS INTEGER)), (2, 20),
                         (3, 30)) t(x, v)
            ORDER BY x"""),
        """SELECT x, CAST(rank() OVER (ORDER BY x % 3, x) AS BIGINT)
                  AS r
           FROM (VALUES (1), (2), (3), (4), (5), (6)) t(x)
           ORDER BY x""",
        """WITH ranked AS (
             SELECT n_name, n_regionkey,
                    row_number() OVER (PARTITION BY n_regionkey
                                       ORDER BY n_name) AS rn
             FROM nation)
           SELECT n_regionkey, n_name FROM ranked WHERE rn = 2
           ORDER BY n_regionkey""",
        """SELECT x,
                  CAST(dense_rank() OVER (ORDER BY y) AS BIGINT) AS dr
           FROM (VALUES (1, 'a'), (2, 'a'), (3, 'b'), (4, 'c'),
                        (5, 'c')) t(x, y)
           ORDER BY x""",
        """SELECT x, round(sum(v) OVER (ORDER BY x), 4) AS cum
           FROM (VALUES (1, 0.5), (2, 0.25), (3, 0.125)) t(x, v)
           ORDER BY x""",
        """SELECT x, CAST(count(v) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS nn_so_far
           FROM (VALUES (1, 10), (2, CAST(NULL AS INT)), (3, 30)) t(x, v)
           ORDER BY x""",
        """SELECT o_orderstatus,
                  round(sum(o_totalprice) / sum(sum(o_totalprice))
                        OVER (), 4) AS share
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """SELECT l_returnflag, l_linestatus,
                  CAST(rank() OVER (PARTITION BY l_returnflag
                                    ORDER BY n DESC) AS BIGINT) AS r
           FROM (SELECT l_returnflag, l_linestatus, count(*) AS n
                 FROM lineitem GROUP BY 1, 2) t
           ORDER BY l_returnflag, l_linestatus""",
        """SELECT x, CAST(ntile(2) OVER (PARTITION BY p ORDER BY x)
                       AS BIGINT) AS half
           FROM (VALUES (1, 'a'), (2, 'a'), (3, 'a'),
                        (4, 'b'), (5, 'b')) t(x, p)
           ORDER BY x""",
        """SELECT x,
                  CAST(lead(x, 1, 0) OVER (ORDER BY x) AS BIGINT)
                  AS nxt,
                  CAST(lag(x, 1, 0) OVER (ORDER BY x) AS BIGINT)
                  AS prv
           FROM (VALUES (10), (20), (30)) t(x) ORDER BY x""",
        """SELECT p, x, round(x - avg(x) OVER (PARTITION BY p), 4)
                  AS dev
           FROM (VALUES ('a', 1.0), ('a', 3.0), ('b', 10.0),
                        ('b', 30.0)) t(p, x)
           ORDER BY p, x""",
    ],
    # ── aggregate density 3 ──────────────────────────────────────────
    "agg_dense3": [
        """SELECT CAST(count(DISTINCT l_returnflag) FILTER
                       (WHERE l_quantity > 25) AS BIGINT) AS cdf
           FROM lineitem""",
        """SELECT round(avg(cnt), 4) AS avg_lines_per_order FROM (
             SELECT count(*) AS cnt FROM lineitem
             GROUP BY l_orderkey) t""",
        """SELECT CAST(sum(n) AS BIGINT) AS total_rows FROM (
             SELECT count(*) AS n FROM orders GROUP BY o_orderstatus) t""",
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders
           WHERE o_orderdate >= DATE '1993-07-01'
             AND o_orderdate < DATE '1993-10-01'
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        """SELECT round(sum(l_extendedprice * l_discount), 2)
                  AS revenue_q6_shape
           FROM lineitem
           WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
        """SELECT l_returnflag,
                  round(corr(l_quantity, l_extendedprice), 4) AS c
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT CAST(count(*) AS BIGINT) AS pairs FROM (
             SELECT l_orderkey, l_linenumber FROM lineitem
             GROUP BY l_orderkey, l_linenumber
             HAVING count(*) > 1) t""",
        """SELECT bool_and(n_nationkey >= 0) AS all_nonneg,
                  bool_or(n_nationkey > 23) AS any_late
           FROM nation""",
        """SELECT round(stddev_samp(CAST(o_totalprice AS DOUBLE)), 2)
                  AS sd
           FROM orders WHERE o_orderstatus = 'O'""",
        # CAST(double AS INT) truncates in Spark but rounds in DuckDB —
        # bucket with an explicit floor so both engines agree
        """SELECT x, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT CAST(floor(o_totalprice / 50000) AS INT) AS x
             FROM orders) t
           GROUP BY x HAVING count(*) > 20 ORDER BY x""",
        """SELECT CAST(max(len) AS BIGINT) AS longest_name FROM (
             SELECT length(c_name) AS len FROM customer) t""",
        """SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS uniq,
                  count(*) > count(DISTINCT o_custkey) AS has_repeat
           FROM orders""",
        ("""SELECT round(percentile(CAST(l_quantity AS DOUBLE), 0.5), 4)
                   AS p50
            FROM lineitem""",
         """SELECT round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5),
                         4) AS p50
            FROM lineitem"""),
        """SELECT round(min(o_totalprice) / max(o_totalprice), 6)
                  AS spread
           FROM orders""",
        """SELECT CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 END)
                       AS BIGINT) AS negatives
           FROM customer""",
    ],
    # ── NULL propagation density 3 ───────────────────────────────────
    "null_dense3": [
        """SELECT CAST(x AS BIGINT) AS x FROM
             (VALUES (1), (NULL), (1), (NULL)) t(x)
           GROUP BY x ORDER BY x NULLS FIRST""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM (
             SELECT DISTINCT x FROM
               (VALUES (NULL), (NULL), (1)) t(x)) d""",
        """SELECT (1 IN (2, NULL)) IS NULL AS unknown_in,
                  1 IN (1, NULL) AS found_in""",
        """SELECT (1 NOT IN (2, NULL)) IS NULL AS unknown_not_in""",
        """SELECT nullif(NULL, 5) IS NULL AS n1,
                  coalesce(nullif(3, 3), -1) = -1 AS collapsed""",
        """SELECT NULL + 1 IS NULL AS arith,
                  NULL || 'x' IS NULL AS concat_op,
                  abs(CAST(NULL AS INT)) IS NULL AS fn""",
        # Spark concat() is null-propagating (ANSI CONCAT); DuckDB's
        # skips NULL args — pin Spark's semantics, concat_ws skips
        ("""SELECT concat('a', CAST(NULL AS STRING), 'b') IS NULL
                   AS null_propagates,
                   concat_ws('', 'a', CAST(NULL AS STRING), 'b')
                   AS ws_skips""",
         """SELECT true AS null_propagates, 'ab' AS ws_skips"""),
        """SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 'yes'
                  ELSE 'no' END AS cond""",
        """SELECT x IS DISTINCT FROM y AS d,
                  x IS NOT DISTINCT FROM y AS nd FROM
             (VALUES (CAST(NULL AS INT), CAST(NULL AS INT))) t(x, y)""",
        """SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
           FROM (VALUES (1, NULL), (NULL, 2), (3, 3)) t(x, y)
           WHERE x IS DISTINCT FROM y
           ORDER BY x NULLS FIRST""",
        """SELECT greatest(NULL, NULL) IS NULL AS all_null""",
        """SELECT (CAST(NULL AS INT) = CAST(NULL AS INT)) IS NULL
                  AS eq_unknown""",
        """SELECT min(x) IS NULL AS empty_min, CAST(count(x) AS BIGINT)
                  AS c
           FROM (VALUES (CAST(NULL AS INT))) t(x)""",
        """SELECT CAST(sum(x) AS BIGINT) AS s FROM
             (VALUES (1), (NULL), (3)) t(x)""",
        """SELECT x FROM (VALUES ('a'), (NULL)) t(x)
           WHERE x = x ORDER BY x""",
    ],
    # ── struct density 3 ─────────────────────────────────────────────
    "struct_dense3": [
        ("""SELECT named_struct('a', 1, 'b', 'x')
                   = named_struct('a', 1, 'b', 'x') AS eq,
                   named_struct('a', 1, 'b', 'x')
                   = named_struct('a', 2, 'b', 'x') AS neq""",
         """SELECT struct_pack(a := 1, b := 'x')
                   = struct_pack(a := 1, b := 'x') AS eq,
                   struct_pack(a := 1, b := 'x')
                   = struct_pack(a := 2, b := 'x') AS neq"""),
        ("""SELECT s.a, s.b FROM (
              SELECT named_struct('a', x, 'b', x * 10) AS s
              FROM (VALUES (1), (2)) t(x)) q
            ORDER BY s.a""",
         """SELECT s.a, s.b FROM (
              SELECT struct_pack(a := x, b := x * 10) AS s
              FROM (VALUES (1), (2)) t(x)) q
            ORDER BY s.a"""),
        ("""SELECT CAST(count(*) AS BIGINT) AS n, s.k AS k FROM (
              SELECT named_struct('k', x % 2) AS s
              FROM (VALUES (0), (1), (2), (3)) t(x)) q
            GROUP BY s.k ORDER BY k""",
         """SELECT CAST(count(*) AS BIGINT) AS n, s.k AS k FROM (
              SELECT struct_pack(k := x % 2) AS s
              FROM (VALUES (0), (1), (2), (3)) t(x)) q
            GROUP BY s.k ORDER BY k"""),
        ("""SELECT s.x FROM (VALUES (named_struct('x', 2)),
                                    (named_struct('x', 1))) t(s)
            ORDER BY s""",
         """SELECT s.x FROM (VALUES (struct_pack(x := 2)),
                                    (struct_pack(x := 1))) t(s)
            ORDER BY s"""),
        ("""SELECT struct(1, 'a').col1 AS anon""",
         """SELECT 1 AS anon"""),
        ("""SELECT element_at(array(named_struct('v', 10),
                                    named_struct('v', 20)), 2).v
                   AS second_v""",
         """SELECT CAST(20 AS INTEGER) AS second_v"""),
        ("""SELECT max(named_struct('k', x, 'id', y)).id AS argmax
            FROM (VALUES (1, 'lo'), (9, 'hi'), (5, 'mid')) t(x, y)""",
         """SELECT 'hi' AS argmax"""),
        ("""SELECT named_struct('a', named_struct('b',
                     named_struct('c', 99))).a.b.c AS deep""",
         """SELECT 99 AS deep"""),
    ],
    # ── cast density 3 ───────────────────────────────────────────────
    "cast_dense3": [
        """SELECT CAST('2024-02-29' AS DATE) AS leap,
                  TRY_CAST('2024-02-30' AS DATE) IS NULL AS bad_day""",
        """SELECT TRY_CAST('not a date' AS DATE) IS NULL AS junk,
                  TRY_CAST('2024-13-01' AS DATE) IS NULL AS bad_month""",
        """SELECT CAST(true AS INT) AS t, CAST(false AS INT) AS f""",
        """SELECT CAST(1 AS BOOLEAN) AS one,
                  CAST(0 AS BOOLEAN) AS zero""",
        """SELECT concat('n=', CAST(42 AS STRING)) AS s""",
        """SELECT CAST(CAST('2024-08-13' AS DATE) AS STRING) AS iso""",
        """SELECT CAST('0042' AS INT) AS leading_zeros,
                  CAST('-17' AS INT) AS negative""",
        """SELECT TRY_CAST('' AS DATE) IS NULL AS empty,
                  TRY_CAST('   ' AS INT) IS NULL AS blank""",
        """SELECT CAST('1e3' AS DOUBLE) = 1000.0 AS sci,
                  CAST('-2.5e-1' AS DOUBLE) = -0.25 AS sci_neg""",
        # Spark keeps the source unit ("INTERVAL '90' MINUTE"); DuckDB
        # normalizes to 01:30:00 — only the magnitude survives portably
        ("""SELECT CAST(INTERVAL 90 MINUTE AS STRING) LIKE '%90%'
                   AS has_magnitude""",
         """SELECT true AS has_magnitude"""),
        """SELECT TRY_CAST(CAST(200 AS SMALLINT) AS TINYINT) IS NULL
                  AS narrow_overflow,
                  CAST(CAST(100 AS SMALLINT) AS TINYINT) AS fits""",
        """SELECT CAST('TRUE' AS BOOLEAN) AS upper_t,
                  TRY_CAST('maybe' AS BOOLEAN) IS NULL AS junk_bool""",
        """SELECT CAST(x AS STRING) AS s FROM
             (VALUES (1), (22), (333)) t(x) ORDER BY s""",
    ],
    # ── EXISTS variant density 2 ─────────────────────────────────────
    "exists_dense2": [
        """SELECT r_name FROM region r
           WHERE EXISTS (SELECT 1 FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey LIMIT 1)
           ORDER BY r_name""",
        """SELECT n_name FROM nation n
           WHERE EXISTS (SELECT max(c_acctbal) FROM customer c
                         WHERE c.c_nationkey = n.n_nationkey
                         HAVING max(c_acctbal) > 9000)
           ORDER BY n_name LIMIT 10""",
        """SELECT r_name FROM region r
           WHERE EXISTS (SELECT 1 FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey
                           AND n.n_name LIKE 'A%')
           ORDER BY r_name""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM orders o
           WHERE EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o.o_orderkey)
             AND NOT EXISTS (SELECT 1 FROM lineitem l
                             WHERE l.l_orderkey = o.o_orderkey
                               AND l.l_linenumber > 6)""",
        """SELECT x FROM (VALUES (1), (2), (3)) t(x)
           WHERE EXISTS (SELECT 1 WHERE t.x > 1) ORDER BY x""",
        """SELECT n_name FROM nation n WHERE EXISTS (
             SELECT 1 FROM supplier s
             WHERE s.s_nationkey = n.n_nationkey
             UNION ALL
             SELECT 1 FROM customer c
             WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9990)
           ORDER BY n_name LIMIT 8""",
        """SELECT CAST(count(*) AS BIGINT) AS with_both FROM nation n
           WHERE EXISTS (SELECT 1 FROM supplier s
                         WHERE s.s_nationkey = n.n_nationkey)
             AND EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_nationkey = n.n_nationkey)""",
        """SELECT EXISTS (SELECT 1 FROM nation WHERE n_nationkey < 0)
                  AS none,
                  EXISTS (SELECT 1 FROM nation) AS some""",
    ],
    # ── math density 4 ───────────────────────────────────────────────
    "math_dense4": [
        """SELECT round(sin(pi() / 6), 4) AS half,
                  round(cos(pi() / 3), 4) AS also_half""",
        """SELECT round(atan2(1.0, 0.0), 4) AS north,
                  round(atan2(0.0, -1.0), 4) AS west,
                  round(atan2(-1.0, 0.0), 4) AS south""",
        """SELECT round(tan(pi() / 4), 4) AS one""",
        """SELECT round(asin(1.0), 4) AS right_angle,
                  round(acos(0.0), 4) AS same""",
        """SELECT round(exp(1.0), 4) AS e, round(ln(exp(2.0)), 4)
                  AS two""",
        ("""SELECT round(log2(1024.0), 4) AS ten""",
         """SELECT round(CAST(10.0 AS DOUBLE), 4) AS ten"""),
        """SELECT round(mod(CAST(10.5 AS DOUBLE),
                            CAST(3.0 AS DOUBLE)), 4) AS fmod""",
        """SELECT CAST(floor(-2.5) AS BIGINT) AS f,
                  CAST(ceil(-2.5) AS BIGINT) AS c""",
        ("""SELECT round(rint(2.5), 4) AS even_down,
                   round(rint(3.5), 4) AS even_up""",
         """SELECT round(CAST(2.0 AS DOUBLE), 4) AS even_down,
                   round(CAST(4.0 AS DOUBLE), 4) AS even_up"""),
        """SELECT round(power(0.0, 0.0), 4) AS zero_pow_zero""",
        ("""SELECT round(sinh(0.0), 4) AS s, round(cosh(0.0), 4) AS c,
                   round(tanh(0.0), 4) AS t""",
         """SELECT round(CAST(0.0 AS DOUBLE), 4) AS s,
                   round(CAST(1.0 AS DOUBLE), 4) AS c,
                   round(CAST(0.0 AS DOUBLE), 4) AS t"""),
        ("""SELECT CAST(pmod(-7, 3) AS BIGINT) AS always_pos""",
         """SELECT CAST(2 AS BIGINT) AS always_pos"""),
        """SELECT round(abs(CAST(-0.0 AS DOUBLE)) + 0.0, 4)
                  AS neg_zero""",
        """SELECT round(greatest(1.5, 2.5, 0.5), 4) AS g,
                  round(least(1.5, 2.5, 0.5), 4) AS l""",
        ("""SELECT CAST(width_bucket(5.5, 0.0, 10.0, 5) AS BIGINT)
                   AS bucket""",
         """SELECT CAST(3 AS BIGINT) AS bucket"""),
    ],
    # ── timezone conversion fns (Spark from_utc_timestamp /
    #    to_utc_timestamp / convert_timezone; DuckDB goldens are
    #    precomputed literals — its timezone() reads session config,
    #    the Spark fns take the zone as an argument) ──────────────────
    "tz_conversion": [
        ("""SELECT date_format(from_utc_timestamp(
                    TIMESTAMP '2024-01-01 12:00:00', 'America/New_York'),
                  'yyyy-MM-dd HH:mm:ss') AS ny_winter""",
         """SELECT '2024-01-01 07:00:00' AS ny_winter"""),
        ("""SELECT date_format(from_utc_timestamp(
                    TIMESTAMP '2024-07-01 12:00:00', 'America/New_York'),
                  'yyyy-MM-dd HH:mm:ss') AS ny_summer""",
         """SELECT '2024-07-01 08:00:00' AS ny_summer"""),
        ("""SELECT date_format(to_utc_timestamp(
                    TIMESTAMP '2024-01-01 07:00:00', 'America/New_York'),
                  'yyyy-MM-dd HH:mm:ss') AS back_to_utc""",
         """SELECT '2024-01-01 12:00:00' AS back_to_utc"""),
        ("""SELECT date_format(from_utc_timestamp(
                    TIMESTAMP '2024-01-01 12:00:00', 'Asia/Kathmandu'),
                  'yyyy-MM-dd HH:mm:ss') AS npt""",
         """SELECT '2024-01-01 17:45:00' AS npt"""),
        # spring-forward: 07:30 UTC on 2024-03-10 is already EDT (-4)
        ("""SELECT date_format(from_utc_timestamp(
                    TIMESTAMP '2024-03-10 07:30:00', 'America/New_York'),
                  'yyyy-MM-dd HH:mm:ss') AS dst_edge""",
         """SELECT '2024-03-10 03:30:00' AS dst_edge"""),
        # date rollover across the line
        ("""SELECT CAST(from_utc_timestamp(
                    TIMESTAMP '2024-01-01 20:00:00', 'Asia/Tokyo')
                  AS DATE) AS next_day""",
         """SELECT DATE '2024-01-02' AS next_day"""),
        ("""SELECT date_format(convert_timezone(
                    'UTC', 'Europe/Paris', TIMESTAMP '2024-06-01 10:00:00'),
                  'yyyy-MM-dd HH:mm:ss') AS paris""",
         """SELECT '2024-06-01 12:00:00' AS paris"""),
        # round-trip is identity for any zone
        ("""SELECT CAST(count(*) AS BIGINT) AS all_roundtrip FROM events
            WHERE to_utc_timestamp(
                    from_utc_timestamp(ts, 'Australia/Sydney'),
                    'Australia/Sydney') = ts""",
         """SELECT CAST(count(*) AS BIGINT) AS all_roundtrip FROM events"""),
    ],
    # ── special math fns Spark has and DuckDB spells differently
    #    (goldens via equivalent formulas) ─────────────────────────────
    "math_special": [
        ("""SELECT round(log1p(0.5), 4) AS l1p, round(expm1(1.0), 4) AS em1""",
         """SELECT round(ln(1.5), 4) AS l1p, round(exp(1.0) - 1, 4) AS em1"""),
        ("""SELECT round(log(2, 1024), 4) AS lb2,
                   round(log(3, 81.0), 4) AS lb3""",
         """SELECT round(ln(1024) / ln(2), 4) AS lb2,
                   round(ln(81.0) / ln(3), 4) AS lb3"""),
        ("""SELECT round(hypot(3.0, 4.0), 4) AS h,
                   round(cbrt(27.0), 4) AS cb""",
         """SELECT round(sqrt(9.0 + 16.0), 4) AS h,
                   round(cbrt(27.0), 4) AS cb"""),
        ("""SELECT round(sinh(1.0), 4) AS sh, round(cosh(1.0), 4) AS ch,
                   round(tanh(1.0), 4) AS th""",
         """SELECT round((exp(1.0) - exp(-1.0)) / 2, 4) AS sh,
                   round((exp(1.0) + exp(-1.0)) / 2, 4) AS ch,
                   round((exp(2.0) - 1) / (exp(2.0) + 1), 4) AS th"""),
        ("""SELECT round(asinh(1.0), 4) AS ash, round(acosh(2.0), 4) AS ach,
                   round(atanh(0.5), 4) AS ath""",
         """SELECT round(ln(1.0 + sqrt(2.0)), 4) AS ash,
                   round(ln(2.0 + sqrt(3.0)), 4) AS ach,
                   round(ln(3.0) / 2, 4) AS ath"""),
        ("""SELECT round(csc(1.0), 4) AS csc1, round(sec(1.0), 4) AS sec1,
                   round(cot(1.0), 4) AS cot1""",
         """SELECT round(1 / sin(1.0), 4) AS csc1,
                   round(1 / cos(1.0), 4) AS sec1,
                   round(cos(1.0) / sin(1.0), 4) AS cot1"""),
        ("""SELECT CAST(getbit(11, 0) AS BIGINT) AS b0,
                   CAST(getbit(11, 1) AS BIGINT) AS b1,
                   CAST(getbit(11, 2) AS BIGINT) AS b2""",
         """SELECT CAST(1 AS BIGINT) AS b0, CAST(1 AS BIGINT) AS b1,
                   CAST(0 AS BIGINT) AS b2"""),
        ("""SELECT CAST(bit_count(255) AS BIGINT) AS c255,
                   CAST(bit_count(1024) AS BIGINT) AS c1k""",
         """SELECT CAST(8 AS BIGINT) AS c255, CAST(1 AS BIGINT) AS c1k"""),
        # aggregate sanity over real data: identity ln(exp(x)) == x
        """SELECT l_linenumber,
                  round(exp(ln(CAST(l_linenumber AS DOUBLE))), 4) AS ident
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        ("""SELECT round(rint(2.5), 4) AS r25, round(rint(3.5), 4) AS r35""",
         """SELECT round(2.0, 4) AS r25, round(4.0, 4) AS r35"""),
    ],
    # ── zip / positional explode / map-entry surfaces ────────────────
    "array_zip_explode": [
        ("""SELECT transform(arrays_zip(array(1, 2, 3), array(10, 20, 30)),
                             s -> s.`0` + s.`1`) AS z""",
         """SELECT [11, 22, 33] AS z"""),
        ("""SELECT zip_with(array(1, 2, 3), array(4, 5, 6),
                            (x, y) -> x * y) AS zw""",
         """SELECT [4, 10, 18] AS zw"""),
        ("""SELECT zip_with(array(1, 2, 3), array(10, 20),
                            (x, y) -> coalesce(x, 0) + coalesce(y, 0))
                   AS padded""",
         """SELECT [11, 22, 3] AS padded"""),
        ("""SELECT pos, val
            FROM (SELECT posexplode(array('a', 'b', 'c')) AS (pos, val))
            ORDER BY pos""",
         """SELECT * FROM (VALUES (0, 'a'), (1, 'b'), (2, 'c'))
                    t(pos, val) ORDER BY pos"""),
        ("""SELECT k, v FROM (SELECT explode(map('a', 1, 'b', 2, 'c', 3))
                              AS (k, v)) ORDER BY k""",
         """SELECT * FROM (VALUES ('a', 1), ('b', 2), ('c', 3))
                    t(k, v) ORDER BY k"""),
        ("""SELECT element_at(map_concat(map('a', 1), map('b', 2)), 'b')
                   AS mb""",
         """SELECT 2 AS mb"""),
        ("""SELECT element_at(map_from_entries(
                    array(struct('x', 10), struct('y', 20))), 'y') AS my""",
         """SELECT 20 AS my"""),
        ("""SELECT a, b FROM (SELECT inline(array(
                    named_struct('a', 1, 'b', 'x'),
                    named_struct('a', 2, 'b', 'y')))) ORDER BY a""",
         """SELECT * FROM (VALUES (1, 'x'), (2, 'y')) t(a, b) ORDER BY a"""),
        ("""SELECT n, s FROM (SELECT stack(3, 1, 'one', 2, 'two', 3, 'three')
                              AS (n, s)) ORDER BY n""",
         """SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three'))
                    t(n, s) ORDER BY n"""),
        # transform over entries of a real column-derived map
        ("""SELECT transform(map_keys(map(n_name, n_nationkey)), k -> k)[0]
                   AS only_key
            FROM nation ORDER BY only_key LIMIT 5""",
         """SELECT n_name AS only_key FROM nation
            ORDER BY only_key LIMIT 5"""),
    ],
    # ── window density 9: defaults, reverse frames, ratios ───────────
    "window_dense9": [
        """SELECT l_linenumber, l_quantity,
                  lag(CAST(l_quantity AS BIGINT), 2, CAST(-1 AS BIGINT))
                      OVER (ORDER BY l_linenumber) AS lag2
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        """SELECT l_linenumber,
                  lead(CAST(l_quantity AS BIGINT), 1, CAST(0 AS BIGINT))
                      OVER (ORDER BY l_linenumber DESC) AS lead_desc
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        """SELECT l_linenumber,
                  CAST(sum(l_quantity) OVER (ORDER BY l_linenumber
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS suffix_sum
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        """SELECT o_orderkey,
                  CAST(count(*) OVER (ORDER BY o_orderkey
                    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                  AS BIGINT) AS near
           FROM orders WHERE o_orderkey <= 39 ORDER BY o_orderkey""",
        """SELECT n_name, r_name AS grp,
                  CAST(count(*) OVER () AS BIGINT) AS total,
                  CAST(count(*) OVER (PARTITION BY r_name) AS BIGINT)
                      AS in_grp
           FROM nation JOIN region ON n_regionkey = r_regionkey
           ORDER BY n_name LIMIT 12""",
        """SELECT name, qty, rn FROM (
             SELECT n_name AS name, n_regionkey AS qty,
                    row_number() OVER (PARTITION BY n_regionkey
                                       ORDER BY n_name) AS rn
             FROM nation) WHERE rn <= 2 ORDER BY qty, rn""",
        """SELECT l_linenumber,
                  round(l_quantity / max(l_quantity)
                        OVER (PARTITION BY l_returnflag), 4) AS frac_of_max
           FROM lineitem WHERE l_orderkey <= 3
           ORDER BY l_linenumber, frac_of_max""",
        """SELECT l_returnflag,
                  CAST(min(l_quantity) OVER w AS BIGINT) AS mn,
                  CAST(max(l_quantity) OVER w AS BIGINT) AS mx,
                  l_linenumber
           FROM lineitem WHERE l_orderkey <= 3
           WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_linenumber
                        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
           ORDER BY l_returnflag, l_linenumber""",
        """SELECT l_linenumber,
                  first_value(l_linenumber) OVER (ORDER BY l_linenumber
                    ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS fv_ahead
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        """SELECT o_orderpriority,
                  CAST(rank() OVER (ORDER BY o_orderkey DESC) AS BIGINT)
                      AS rk, o_orderkey
           FROM orders WHERE o_orderkey <= 32
           ORDER BY o_orderkey""",
    ],
    # ── aggregate FILTER clause density ──────────────────────────────
    "agg_filter_dense": [
        """SELECT l_returnflag,
                  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT)
                      AS big,
                  CAST(count(*) FILTER (WHERE l_quantity <= 25) AS BIGINT)
                      AS small
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT l_returnflag,
                  CAST(sum(CAST(l_quantity AS BIGINT))
                       FILTER (WHERE l_discount > 0.05) AS BIGINT) AS hi_disc,
                  round(avg(l_extendedprice)
                        FILTER (WHERE l_tax < 0.04) + 1e-9, 2) AS lo_tax_avg
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        """SELECT CAST(min(o_orderkey) FILTER (WHERE o_orderpriority
                       = '1-URGENT') AS BIGINT) AS first_urgent,
                  CAST(max(o_orderkey) FILTER (WHERE o_orderpriority
                       = '5-LOW') AS BIGINT) AS last_low
           FROM orders""",
        """SELECT o_orderstatus,
                  CAST(count(DISTINCT o_custkey)
                       FILTER (WHERE o_totalprice > 150000) AS BIGINT)
                      AS rich_customers
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        # filter that matches nothing → count 0, sum NULL
        """SELECT CAST(count(*) FILTER (WHERE l_quantity < 0) AS BIGINT)
                      AS none_cnt,
                  CAST(sum(CAST(l_quantity AS BIGINT))
                       FILTER (WHERE l_quantity < 0) AS BIGINT) AS none_sum
           FROM lineitem""",
        """SELECT l_linestatus,
                  round(avg(l_quantity) FILTER (WHERE l_returnflag = 'R')
                        + 1e-9, 4) AS r_avg,
                  round(avg(l_quantity) FILTER (WHERE l_returnflag = 'A')
                        + 1e-9, 4) AS a_avg
           FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
        """SELECT event_type,
                  CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS hi
           FROM events GROUP BY event_type
           HAVING count(*) FILTER (WHERE value > 50) > 10
           ORDER BY event_type""",
        """SELECT n_regionkey,
                  CAST(count(*) FILTER (WHERE n_name LIKE '%A%') AS BIGINT)
                      AS with_a,
                  CAST(count(*) AS BIGINT) AS total
           FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    ],
    # ── unicode / multibyte string edges ─────────────────────────────
    "unicode_dense": [
        ("""SELECT length('héllo wörld') AS cp_len,
                   CAST(octet_length('héllo wörld') AS BIGINT) AS byte_len""",
         """SELECT length('héllo wörld') AS cp_len,
                   CAST(octet_length(encode('héllo wörld')) AS BIGINT)
                       AS byte_len"""),
        """SELECT upper('héllo') AS up, lower('HÉLLO') AS lo""",
        """SELECT substr('αβγδε', 2, 3) AS mid,
                  reverse('αβγδε') AS rev""",
        # DIVERGENCE pinned: Spark chr() is mod-256 latin-1 (8364 % 256
        # = 172 = ¬); DuckDB chr() is the unicode codepoint (€)
        ("""SELECT ascii('€') AS euro_cp, chr(8364) AS euro_ch,
                   ascii('A') AS a_cp""",
         """SELECT 8364 AS euro_cp, chr(172) AS euro_ch, 65 AS a_cp"""),
        """SELECT length('日本語テキスト') AS ja_len,
                  substr('日本語テキスト', 1, 3) AS ja_head""",
        """SELECT replace('naïve café', 'é', 'e') AS ascii_ish,
                  length(replace('naïve café', 'é', 'e')) AS new_len""",
        """SELECT 'héllo' = 'hello' AS eq_accents,
                  'héllo' > 'hello' AS gt_accents""",
        ("""SELECT concat('✓', repeat('─', 3), '✓') AS ruled""",
         """SELECT '✓' || repeat('─', 3) || '✓' AS ruled"""),
        """SELECT trim('  ünïcødé  ') AS trimmed,
                  lpad('æ', 4, '·') AS padded""",
        """SELECT position('ö' IN 'héllo wörld') AS o_pos,
                  contains('héllo wörld', 'wörld') AS has_world""",
    ],
    # ── GROUP BY ALL shorthand (both engines support it) ─────────────
    "groupby_all": [
        """SELECT l_returnflag, l_linestatus,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus""",
        """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS c
           FROM nation GROUP BY ALL ORDER BY n_regionkey""",
        """SELECT substr(n_name, 1, 1) AS initial,
                  CAST(count(*) AS BIGINT) AS c
           FROM nation GROUP BY ALL ORDER BY initial""",
        # GROUP BY ALL with a join and a computed key
        """SELECT r_name, o_orderstatus, CAST(count(*) AS BIGINT) AS c
           FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
           WHERE o_orderkey <= 200
           GROUP BY ALL ORDER BY r_name, o_orderstatus""",
        # mixed aggregate + HAVING still resolves
        """SELECT event_type, CAST(count(*) AS BIGINT) AS c,
                  round(sum(value), 2) AS v
           FROM events GROUP BY ALL HAVING count(*) > 100
           ORDER BY event_type""",
    ],
    # ── numeric cast conventions (several pinned divergences) ────────
    "cast_conventions": [
        # DIVERGENCE pinned: Spark CAST(double AS INT) truncates toward
        # zero; DuckDB rounds half away — goldens state Spark's result
        ("""SELECT CAST(2.7 AS INT) AS p, CAST(-2.7 AS INT) AS n,
                   CAST(2.5 AS INT) AS h""",
         """SELECT 2 AS p, -2 AS n, 2 AS h"""),
        ("""SELECT CAST(CAST(3.999 AS DOUBLE) AS BIGINT) AS t""",
         """SELECT CAST(3 AS BIGINT) AS t"""),
        # string→int with surrounding spaces parses in both engines
        """SELECT CAST('  42  ' AS INT) AS spaced""",
        # bool casts: numeric nonzero is true in both
        """SELECT CAST(5 AS BOOLEAN) AS five, CAST(0 AS BOOLEAN) AS zero""",
        ("""SELECT CAST('true' AS BOOLEAN) AS t,
                   CAST('FALSE' AS BOOLEAN) AS f,
                   try_cast('maybe' AS BOOLEAN) AS m""",
         """SELECT true AS t, false AS f, try_cast('maybe' AS BOOLEAN)
                   AS m"""),
        # boolean→int round trip
        """SELECT CAST(CAST(true AS INT) AS BIGINT) AS ti,
                  CAST(CAST(false AS INT) AS BIGINT) AS fi""",
        # int widening / narrowing boundary: 128 doesn't fit TINYINT
        """SELECT try_cast(127 AS TINYINT) AS fits,
                  try_cast(128 AS TINYINT) AS overflow""",
        # decimal → string keeps scale in both
        """SELECT CAST(CAST(1.50 AS DECIMAL(5, 2)) AS STRING) AS s""",
        # string float with exponent
        """SELECT round(CAST('1.5e2' AS DOUBLE), 4) AS sci""",
        ("""SELECT CAST(INTERVAL '3' DAY AS STRING) AS iv""",
         """SELECT 'INTERVAL ''3'' DAY' AS iv"""),
    ],
    # ── month-end clamping + date arithmetic conventions ─────────────
    "date_clamping": [
        ("""SELECT add_months(DATE '2024-01-31', 1) AS clamped,
                   add_months(DATE '2024-01-31', 13) AS next_year""",
         """SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE)
                       AS clamped,
                   CAST(DATE '2024-01-31' + INTERVAL 13 MONTH AS DATE)
                       AS next_year"""),
        ("""SELECT CAST(DATE '2024-01-31' + INTERVAL '1' MONTH AS DATE)
                   AS via_interval""",
         """SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE)
                   AS via_interval"""),
        ("""SELECT add_months(DATE '2024-02-29', 12) AS leap_fwd,
                   add_months(DATE '2024-02-29', -12) AS leap_back""",
         """SELECT CAST(DATE '2024-02-29' + INTERVAL 12 MONTH AS DATE)
                       AS leap_fwd,
                   CAST(DATE '2024-02-29' - INTERVAL 12 MONTH AS DATE)
                       AS leap_back"""),
        """SELECT last_day(DATE '2024-02-10') AS feb_leap,
                  last_day(DATE '2023-02-10') AS feb_normal""",
        ("""SELECT date_add(DATE '2024-12-30', 5) AS cross_year,
                   date_sub(DATE '2024-01-02', 5) AS back_year""",
         """SELECT DATE '2024-12-30' + 5 AS cross_year,
                   DATE '2024-01-02' - 5 AS back_year"""),
        ("""SELECT CAST(datediff(DATE '2024-03-01', DATE '2024-02-01')
                        AS BIGINT) AS leap_feb,
                   CAST(datediff(DATE '2023-03-01', DATE '2023-02-01')
                        AS BIGINT) AS normal_feb""",
         """SELECT CAST(DATE '2024-03-01' - DATE '2024-02-01' AS BIGINT)
                       AS leap_feb,
                   CAST(DATE '2023-03-01' - DATE '2023-02-01' AS BIGINT)
                       AS normal_feb"""),
        # DIVERGENCE pinned: Spark months_between special-cases BOTH
        # dates being month-ends -> exactly 1.0; DuckDB age() counts the
        # leftover days (1 month 2 days ~ 1.0645)
        ("""SELECT round(months_between(DATE '2024-03-31',
                                        DATE '2024-02-29') + 1e-9, 4)
                   AS fractional""",
         """SELECT round(1.0 + 0.0, 4) AS fractional"""),
        ("""SELECT round(months_between(DATE '2024-03-15',
                                        DATE '2024-02-10') + 1e-9, 4)
                   AS mixed_days""",
         """SELECT round(1.0 + 5.0/31, 4) AS mixed_days"""),
        """SELECT date_trunc('QUARTER', DATE '2024-05-15') = TIMESTAMP
                  '2024-04-01 00:00:00' AS q2_start""",
        ("""SELECT dayofweek(DATE '2024-01-07') AS sunday1,
                   weekday(DATE '2024-01-07') AS sunday0""",
         """SELECT CAST(date_part('dow', DATE '2024-01-07') + 1 AS INT)
                       AS sunday1,
                   CAST(6 AS INT) AS sunday0"""),
        """SELECT extract(WEEK FROM DATE '2024-01-04') AS iso_week,
                  extract(QUARTER FROM DATE '2024-08-14') AS q""",
    ],
    # ── hex literals + bit ops on them ───────────────────────────────
    "hex_literals": [
        # (Spark SQL has NO 0x integer-literal syntax -- hex arrives
        # via hex()/unhex()/conv() only; DuckDB's 0xFF stays untested)
        ("""SELECT hex(-1) AS neg_ones""",
         """SELECT 'FFFFFFFFFFFFFFFF' AS neg_ones"""),
        ("""SELECT conv('z', 36, 10) AS z36,
                   conv('7fffffffffffffff', 16, 10) AS int64_max""",
         """SELECT '35' AS z36, '9223372036854775807' AS int64_max"""),
        """SELECT CAST(255 & 15 AS BIGINT) AS masked,
                  CAST(240 | 15 AS BIGINT) AS joined""",
        ("""SELECT hex(255) AS h, hex(unhex('FF')) AS roundtrip,
                   CAST(length(unhex('FF')) AS BIGINT) AS nbytes""",
         """SELECT 'FF' AS h, 'FF' AS roundtrip,
                   CAST(1 AS BIGINT) AS nbytes"""),
        ("""SELECT conv('ff', 16, 10) AS to_dec,
                   conv('255', 10, 2) AS to_bin""",
         """SELECT '255' AS to_dec, '11111111' AS to_bin"""),
    ],
    # ── human number formatting ──────────────────────────────────────
    "num_format": [
        ("""SELECT format_number(1234567.891, 2) AS grouped""",
         """SELECT '1,234,567.89' AS grouped"""),
        # DIVERGENCE pinned: Spark format_number uses Java DecimalFormat
        # = HALF_EVEN (0.5 -> 0, 1.5 -> 2), not HALF_UP
        ("""SELECT format_number(0.5, 0) AS tie_even,
                   format_number(1.5, 0) AS tie_odd""",
         """SELECT '0' AS tie_even, '2' AS tie_odd"""),
        # Spark format_string %f needs a DOUBLE arg (Java Formatter
        # rejects DECIMAL); DuckDB printf coerces either way
        ("""SELECT format_string('%05d|%.3f|%s', 42,
                                 CAST(2.5 AS DOUBLE), 'x') AS fmt""",
         """SELECT printf('%05d|%.3f|%s', 42, 2.5, 'x') AS fmt"""),
        ("""SELECT format_string('%e', CAST(12345.678 AS DOUBLE)) AS sci""",
         """SELECT printf('%e', 12345.678) AS sci"""),
        ("""SELECT lpad(CAST(7 AS STRING), 3, '0') AS padded,
                   format_string('%%') AS pct""",
         """SELECT lpad(CAST(7 AS VARCHAR), 3, '0') AS padded,
                   '%' AS pct"""),
    ],
    # ── join fan-out and aliasing edges ──────────────────────────────
    "join_dense10": [
        # duplicate join keys multiply: count equals product of per-key
        # counts summed — pinned against DuckDB on real data
        """SELECT CAST(count(*) AS BIGINT) AS fanout
           FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey <= 10) a
           JOIN (SELECT l_orderkey FROM lineitem WHERE l_orderkey <= 10) b
             ON a.l_orderkey = b.l_orderkey""",
        # self-join aliasing both sides of the same table
        """SELECT a.n_name AS x, b.n_name AS y
           FROM nation a JOIN nation b
             ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
           WHERE a.n_regionkey = 0 ORDER BY x, y""",
        # join key is an expression; NULL-producing expr never matches
        """SELECT CAST(count(*) AS BIGINT) AS c
           FROM nation a JOIN nation b
             ON nullif(a.n_regionkey, 0) = nullif(b.n_regionkey, 0)""",
        # FULL OUTER with residual inequality
        """SELECT a.r_name AS ar, b.r_name AS br
           FROM region a FULL OUTER JOIN region b
             ON a.r_regionkey = b.r_regionkey AND a.r_regionkey < 2
           ORDER BY ar NULLS FIRST, br NULLS FIRST""",
        # semi via EXISTS with a second correlation level
        """SELECT r_name FROM region r
           WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey =
                           r.r_regionkey
                         AND EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_nationkey = n.n_nationkey
                                       AND c.c_acctbal > 9000))
           ORDER BY r_name""",
        # anti join via NOT EXISTS over a join of two tables
        """SELECT n_name FROM nation
           WHERE NOT EXISTS (SELECT 1 FROM supplier
                             WHERE s_nationkey = n_nationkey
                               AND s_acctbal > 5000)
           ORDER BY n_name LIMIT 15""",
        # three-way join where the middle table is filtered empty
        """SELECT CAST(count(*) AS BIGINT) AS c
           FROM nation JOIN region ON n_regionkey = r_regionkey
                                   AND r_name = 'NOWHERE'
                JOIN customer ON c_nationkey = n_nationkey""",
        # USING column resolves unqualified after the join
        """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT n_regionkey FROM nation) JOIN
                (SELECT r_regionkey AS n_regionkey FROM region)
                USING (n_regionkey)
           GROUP BY n_regionkey ORDER BY n_regionkey""",
    ],
    # ── higher-moment aggregates: Spark is POPULATION skewness /
    #    excess-population kurtosis; DuckDB is sample-corrected — duck
    #    sides below undo its correction so the goldens are Spark's ──
    "stats_dense": [
        ("""SELECT round(skewness(v) + 1e-9, 4) AS sk
            FROM VALUES (1.0), (2.0), (3.0), (4.0), (10.0) AS t(v)""",
         """SELECT round(skewness(v) * (5 - 2)
                         / sqrt(5.0 * (5 - 1)) + 1e-9, 4) AS sk
            FROM (VALUES (1.0), (2.0), (3.0), (4.0), (10.0)) t(v)"""),
        ("""SELECT round(kurtosis(v) + 1e-9, 4) AS ku
            FROM VALUES (1.0), (2.0), (3.0), (4.0), (10.0) AS t(v)""",
         """SELECT round(278.8 / 100 - 3 + 1e-9, 4) AS ku"""),
        # single-row group: sample stats are NULL, population stats 0
        """SELECT CAST(stddev_samp(v) AS DOUBLE) AS ss,
                  round(stddev_pop(v), 4) AS sp,
                  CAST(var_samp(v) AS DOUBLE) AS vs,
                  round(var_pop(v), 4) AS vp
           FROM (SELECT 42.0 AS v)""",
        # perfect correlation is exactly 1; Spark under ANSI raises
        # DIVIDE_BY_ZERO for the zero-variance case DuckDB NULLs, so
        # only the defined region is SLT-comparable
        ("""SELECT round(corr(x, y) + 1e-9, 4) AS c
            FROM VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 6.0) AS t(x, y)""",
         """SELECT round(corr(x, y) + 1e-9, 4) AS c
            FROM (VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 6.0)) t(x, y)"""),
        ("""SELECT round(covar_pop(x, y), 4) AS cp,
                   round(covar_samp(x, y), 4) AS cs
            FROM VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 6.0) AS t(x, y)""",
         """SELECT round(covar_pop(x, y), 4) AS cp,
                   round(covar_samp(x, y), 4) AS cs
            FROM (VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 6.0)) t(x, y)"""),
        # real-data spot check; the 'A' group's true skewness is ~0 and
        # both engines emit only cancellation noise (~1e-5, differing in
        # sign) there, so only the groups with signal are comparable
        """SELECT l_returnflag, round(skewness(l_quantity) + 1e-9, 3)
                      AS sk
           FROM lineitem WHERE l_returnflag <> 'A'
           GROUP BY l_returnflag ORDER BY l_returnflag""",
        ("""SELECT round(stddev_samp(l_quantity) /
                         stddev_pop(l_quantity) + 1e-9, 6) AS bessel
            FROM lineitem""",
         """SELECT round(stddev_samp(l_quantity) /
                         stddev_pop(l_quantity) + 1e-9, 6) AS bessel
            FROM lineitem"""),
    ],
    # ── array index / position / mutation edges ──────────────────────
    "array_dense6": [
        # DIVERGENCE-adjacent: Spark array_position returns 0 for a
        # missing element (1-based hit index); DuckDB list_position
        # returns NULL — golden pins Spark's 0
        ("""SELECT CAST(array_position(array(10, 20, 30), 20) AS BIGINT)
                       AS hit,
                   CAST(array_position(array(10, 20, 30), 99) AS BIGINT)
                       AS miss""",
         """SELECT CAST(2 AS BIGINT) AS hit, CAST(0 AS BIGINT) AS miss"""),
        # element_at: negative counts from the end; try_ makes
        # out-of-range NULL (index 0 stays a hard error even under try_,
        # INVALID_INDEX_OF_ZERO — asserted in ErrorSemanticsSpec territory)
        ("""SELECT element_at(array(1, 2, 3), -1) AS last_el,
                   try_element_at(array(1, 2, 3), 9) AS oob""",
         """SELECT 3 AS last_el, NULL AS oob"""),
        ("""SELECT slice(array(1, 2, 3, 4, 5), -3, 2) AS from_end,
                   slice(array(1, 2, 3, 4, 5), 2, 99) AS clamped""",
         """SELECT [3, 4] AS from_end, [2, 3, 4, 5] AS clamped"""),
        ("""SELECT array_insert(array(1, 2, 3), 2, 99) AS mid,
                   array_insert(array(1, 2, 3), -1, 99) AS at_end""",
         """SELECT [1, 99, 2, 3] AS mid, [1, 2, 3, 99] AS at_end"""),
        ("""SELECT array_remove(array(1, 2, 1, 3, 1), 1) AS no_ones""",
         """SELECT [2, 3] AS no_ones"""),
        # union/intersect/except keep FIRST-occurrence order, dedup
        ("""SELECT array_union(array(3, 1, 3), array(1, 2)) AS u,
                   array_intersect(array(3, 1, 2), array(2, 3)) AS i,
                   array_except(array(3, 1, 2, 1), array(2)) AS e""",
         """SELECT [3, 1, 2] AS u, [3, 2] AS i, [3, 1] AS e"""),
        ("""SELECT array_compact(array(1, NULL, 2, NULL)) AS nonulls,
                   array_distinct(array(2, 1, 2, 3, 1)) AS first_seen""",
         """SELECT [1, 2] AS nonulls, [2, 1, 3] AS first_seen"""),
        # three-valued membership: contains over a NULL element
        ("""SELECT array_contains(array(1, NULL), 1) AS has1,
                   array_contains(array(1, NULL), 2) AS maybe2""",
         """SELECT true AS has1, NULL AS maybe2"""),
        ("""SELECT sequence(5, 1) AS down,
                   sequence(1, 9, 3) AS stepped""",
         """SELECT [5, 4, 3, 2, 1] AS down, [1, 4, 7] AS stepped"""),
        ("""SELECT array_repeat('ab', 3) AS reps,
                   array_join(array('a', NULL, 'c'), '-', '?') AS joined""",
         """SELECT ['ab', 'ab', 'ab'] AS reps, 'a-?-c' AS joined"""),
        ("""SELECT array_min(array(3, NULL, 1)) AS mn,
                   array_max(array(3, NULL, 1)) AS mx""",
         """SELECT 1 AS mn, 3 AS mx"""),
    ],
    # ── window tie / remainder semantics ─────────────────────────────
    "window_dense10": [
        # ntile remainder goes to the FIRST buckets: 7 rows / 3 tiles
        """SELECT l_linenumber, CAST(ntile(3) OVER (ORDER BY l_linenumber)
                      AS BIGINT) AS tile
           FROM lineitem WHERE l_orderkey = 3 ORDER BY l_linenumber""",
        # rank gap after a tie vs dense_rank; duplicate quantities occur
        """SELECT q, CAST(rank() OVER (ORDER BY q) AS BIGINT) AS rk,
                  CAST(dense_rank() OVER (ORDER BY q) AS BIGINT) AS drk
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q, l_linenumber
                 FROM lineitem WHERE l_orderkey <= 3)
           ORDER BY q, rk LIMIT 20""",
        # percent_rank of a single-row partition is 0; cume_dist is 1
        """SELECT round(percent_rank() OVER (PARTITION BY r_regionkey
                        ORDER BY r_name), 4) AS pr,
                  round(cume_dist() OVER (PARTITION BY r_regionkey
                        ORDER BY r_name), 4) AS cd,
                  r_name
           FROM region ORDER BY r_name""",
        # cume_dist counts ALL peers of the current row (ties jump)
        """SELECT q, round(cume_dist() OVER (ORDER BY q) + 1e-9, 4) AS cd
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem WHERE l_orderkey = 3)
           ORDER BY q""",
        # lead beyond the partition edge: NULL without default
        """SELECT n_name,
                  lead(n_name) OVER (PARTITION BY n_regionkey
                                     ORDER BY n_name) AS next_in_region
           FROM nation WHERE n_regionkey <= 1
           ORDER BY n_name""",
        # aggregate + DISTINCT window emulation via dense_rank trick
        """SELECT l_returnflag,
                  CAST(max(drk) OVER (PARTITION BY l_returnflag)
                       AS BIGINT) AS distinct_quantities,
                  l_linenumber
           FROM (SELECT l_returnflag, l_linenumber,
                        dense_rank() OVER (PARTITION BY l_returnflag
                          ORDER BY l_quantity) AS drk
                 FROM lineitem WHERE l_orderkey <= 5)
           ORDER BY l_returnflag, l_linenumber LIMIT 20""",
        # frame narrower than partition: moving avg over 2 rows
        """SELECT l_linenumber,
                  round(avg(l_quantity) OVER (ORDER BY l_linenumber
                    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) + 1e-9, 4)
                      AS mavg
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
    ],
    # ── boolean / conditional counting aggregates ────────────────────
    "agg_bool_countif": [
        ("""SELECT CAST(count_if(l_quantity > 25) AS BIGINT) AS hi,
                   CAST(count_if(l_quantity <= 25) AS BIGINT) AS lo
            FROM lineitem""",
         """SELECT CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
                        AS BIGINT) AS hi,
                   CAST(sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END)
                        AS BIGINT) AS lo
            FROM lineitem"""),
        ("""SELECT l_returnflag,
                   every(l_quantity > 0) AS all_pos,
                   any(l_quantity > 49) AS some_big
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
         """SELECT l_returnflag,
                   bool_and(l_quantity > 0) AS all_pos,
                   bool_or(l_quantity > 49) AS some_big
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
        """SELECT bool_and(n_regionkey < 5) AS all_lt5,
                  bool_or(n_regionkey = 4) AS has4
           FROM nation""",
        # empty input: bool aggs are NULL, count_if is 0
        ("""SELECT CAST(count_if(true) AS BIGINT) AS c, every(true) AS e
            FROM nation WHERE n_nationkey < 0""",
         """SELECT CAST(0 AS BIGINT) AS c, CAST(NULL AS BOOLEAN) AS e"""),
        # NULL predicate rows are ignored by bool aggs
        ("""SELECT every(nullif(n_regionkey, 0) > 0) AS nulls_skipped
            FROM nation""",
         """SELECT bool_and(nullif(n_regionkey, 0) > 0) AS nulls_skipped
            FROM nation"""),
    ],
    # ── higher-order lambdas: the denser tier (aggregate/reduce with
    #    finish, indexed transform, zip_with length mismatch, map HOFs,
    #    three-valued exists/forall) — reference array.slt exercises the
    #    same shapes via DataFusion's array_* kernels ────────────────────
    "hof_lambda_dense": [
        # aggregate with merge-only: running sum
        ("""SELECT aggregate(array(1, 2, 3, 4), 0, (acc, x) -> acc + x)
                     AS total""",
         """SELECT 10 AS total"""),
        # aggregate with finish lambda applied to the final accumulator
        ("""SELECT aggregate(array(1, 2, 3), 0, (acc, x) -> acc + x,
                             acc -> acc * 100) AS scaled""",
         """SELECT 600 AS scaled"""),
        # reduce is the documented alias of aggregate
        ("""SELECT reduce(array(2, 3, 4), 1, (acc, x) -> acc * x) AS prod""",
         """SELECT 24 AS prod"""),
        # NULL element poisons an arithmetic accumulator
        ("""SELECT aggregate(array(1, NULL, 3), 0, (acc, x) -> acc + x)
                     AS poisoned""",
         """SELECT CAST(NULL AS INTEGER) AS poisoned"""),
        # string accumulator with a different type than the elements
        ("""SELECT aggregate(array(1, 2, 3), '', (acc, x) ->
                             concat(acc, CAST(x AS STRING))) AS glued""",
         """SELECT '123' AS glued"""),
        # indexed transform: (element, index) — index is 0-based
        ("""SELECT transform(array('a', 'b', 'c'),
                             (x, i) -> concat(CAST(i AS STRING), x)) AS idx""",
         """SELECT ['0a', '1b', '2c'] AS idx"""),
        # indexed filter
        ("""SELECT filter(array(10, 11, 12, 13), (x, i) -> i % 2 = 0)
                     AS evens_by_pos""",
         """SELECT [10, 12] AS evens_by_pos"""),
        # zip_with pads the shorter side with NULL
        ("""SELECT zip_with(array(1, 2, 3), array(10, 20),
                            (a, b) -> coalesce(a, 0) + coalesce(b, 0))
                     AS padded""",
         """SELECT [11, 22, 3] AS padded"""),
        ("""SELECT zip_with(array(1, 2), array('x', 'y'),
                            (a, b) -> concat(CAST(a AS STRING), b)) AS pairs""",
         """SELECT ['1x', '2y'] AS pairs"""),
        # exists: three-valued — NULL element + no true match => NULL
        ("""SELECT exists(array(1, NULL), x -> x > 5) AS ex_null,
                   exists(array(1, NULL), x -> x > 0) AS ex_true,
                   exists(array(), x -> x > 0) AS ex_empty""",
         """SELECT CAST(NULL AS BOOLEAN) AS ex_null, true AS ex_true,
                   false AS ex_empty"""),
        # forall: NULL element + no false => NULL; empty => true
        ("""SELECT forall(array(1, NULL), x -> x > 0) AS fa_null,
                   forall(array(1, -1), x -> x > 0) AS fa_false,
                   forall(array(), x -> x > 0) AS fa_empty""",
         """SELECT CAST(NULL AS BOOLEAN) AS fa_null, false AS fa_false,
                   true AS fa_empty"""),
        # map_filter keeps entries whose lambda is true
        ("""SELECT map_keys(map_filter(map('a', 1, 'b', 2, 'c', 3),
                                       (k, v) -> v >= 2)) AS kept""",
         """SELECT ['b', 'c'] AS kept"""),
        # transform_keys / transform_values
        ("""SELECT map_keys(transform_keys(map('a', 1, 'b', 2),
                                           (k, v) -> upper(k))) AS uks,
                   map_values(transform_values(map('a', 1, 'b', 2),
                                               (k, v) -> v * 10)) AS tvs""",
         """SELECT ['A', 'B'] AS uks, [10, 20] AS tvs"""),
        # map_zip_with joins on keys; missing side surfaces NULL
        ("""SELECT map_values(map_zip_with(map('a', 1, 'b', 2),
                                           map('b', 20, 'c', 30),
                     (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0)))
                     AS merged""",
         """SELECT [1, 22, 30] AS merged"""),
        # lambda over a real column: per-row array pipeline
        ("""SELECT n_name,
                   aggregate(transform(split(n_name, ''),
                                       x -> length(x)), 0,
                             (acc, x) -> acc + x) AS char_count
            FROM nation WHERE n_regionkey = 0 ORDER BY n_name""",
         """SELECT n_name, length(n_name) AS char_count
            FROM nation WHERE n_regionkey = 0 ORDER BY n_name"""),
        # nested lambda: transform inside transform (2-D)
        ("""SELECT transform(array(array(1, 2), array(3)),
                             xs -> transform(xs, x -> x * 2)) AS nested""",
         """SELECT [[2, 4], [6]] AS nested"""),
    ],
    # ── array mutation surface the corpus missed: append/prepend/
    #    insert (incl. negative index), array_size, compact+slice edges ──
    "array_mut_surface": [
        ("""SELECT array_append(array(1, 2), 3) AS ap,
                   array_prepend(array(1, 2), 0) AS pp""",
         """SELECT [1, 2, 3] AS ap, [0, 1, 2] AS pp"""),
        # append NULL is kept; append to empty
        ("""SELECT array_append(array(1), NULL) AS keep_null,
                   array_append(array(), 7) AS from_empty""",
         """SELECT [1, NULL] AS keep_null, [7] AS from_empty"""),
        # array_insert: 1-based position; -1 APPENDS at the end (the
        # legacy place-before-last behavior is off by default)
        ("""SELECT array_insert(array(1, 2, 3), 2, 99) AS mid,
                   array_insert(array(1, 2, 3), -1, 99) AS atend""",
         """SELECT [1, 99, 2, 3] AS mid, [1, 2, 3, 99] AS atend"""),
        # insert beyond the end pads with NULLs
        ("""SELECT array_insert(array(1), 4, 9) AS padded""",
         """SELECT [1, NULL, NULL, 9] AS padded"""),
        ("""SELECT array_size(array(1, 2, 3)) AS s3,
                   array_size(array()) AS s0,
                   array_size(CAST(NULL AS ARRAY<INT>)) AS snull""",
         """SELECT 3 AS s3, 0 AS s0, CAST(NULL AS INTEGER) AS snull"""),
        # array_compact drops NULLs only (not empties/zeros)
        ("""SELECT array_compact(array(0, NULL, '', NULL)) IS NOT NULL
                     AS not_null""",
         """SELECT true AS not_null"""),
        ("""SELECT array_compact(array(1, NULL, 2, NULL, 3)) AS dense""",
         """SELECT [1, 2, 3] AS dense"""),
        # slice with negative start counts from the end
        ("""SELECT slice(array(1, 2, 3, 4, 5), -3, 2) AS tail2,
                   slice(array(1, 2, 3, 4, 5), 2, 10) AS overrun""",
         """SELECT [3, 4] AS tail2, [2, 3, 4, 5] AS overrun"""),
        # array_remove removes ALL occurrences; NULLs are not removable
        ("""SELECT array_remove(array(1, 2, 1, 3, 1), 1) AS no_ones""",
         """SELECT [2, 3] AS no_ones"""),
        # mutation chain over a real column
        ("""SELECT r_regionkey,
                   array_size(array_append(
                     array_compact(array(r_name, NULL)), 'X')) AS sz
            FROM region ORDER BY r_regionkey""",
         """SELECT r_regionkey, 2 AS sz FROM region ORDER BY r_regionkey"""),
        # lexicographic array comparison: element order first, then length
        ("""SELECT array(1, 2) < array(1, 3) AS lt_elem,
                   array(1, 2) < array(1, 2, 0) AS lt_prefix,
                   array(2) > array(1, 9, 9) AS gt_first""",
         """SELECT [1, 2] < [1, 3] AS lt_elem,
                   [1, 2] < [1, 2, 0] AS lt_prefix,
                   [2] > [1, 9, 9] AS gt_first"""),
        # array comparison drives ORDER BY and min/max aggregation
        ("""SELECT min(a) AS mn, max(a) AS mx FROM (
              SELECT array(n_regionkey, n_nationkey) AS a FROM nation) t""",
         """SELECT min(a) AS mn, max(a) AS mx FROM (
              SELECT [n_regionkey, n_nationkey] AS a FROM nation) t"""),
    ],
    # ── Spark-surface functions with no direct DuckDB spelling —
    #    goldens pinned as literal pairs (values hand-derived, then
    #    machine-verified by SltSpec's replay) ──────────────────────────
    "spark_fn_surface": [
        # equal_null ≡ IS NOT DISTINCT FROM
        ("""SELECT equal_null(1, 1) AS tt, equal_null(1, 2) AS tf,
                   equal_null(NULL, NULL) AS nn, equal_null(1, NULL) AS tn""",
         """SELECT 1 IS NOT DISTINCT FROM 1 AS tt,
                   1 IS NOT DISTINCT FROM 2 AS tf,
                   NULL IS NOT DISTINCT FROM NULL AS nn,
                   1 IS NOT DISTINCT FROM NULL AS tn"""),
        # luhn_check: valid/invalid card checksums, non-digit rejected
        ("""SELECT luhn_check('79927398713') AS ok,
                   luhn_check('79927398714') AS bad,
                   luhn_check('4111111111111111') AS visa,
                   luhn_check('12a4') AS nondigit""",
         """SELECT true AS ok, false AS bad, true AS visa,
                   false AS nondigit"""),
        # to_binary modes round-tripped through hex so output is text
        ("""SELECT hex(to_binary('414243', 'hex')) AS h,
                   hex(to_binary('ABC', 'utf-8')) AS u,
                   hex(to_binary('QUJD', 'base64')) AS b""",
         """SELECT '414243' AS h, '414243' AS u, '414243' AS b"""),
        # try_to_binary: malformed input -> NULL instead of error
        ("""SELECT try_to_binary('zz', 'hex') IS NULL AS bad_hex,
                   hex(try_to_binary('4142', 'hex')) AS good""",
         """SELECT true AS bad_hex, '4142' AS good"""),
        # bit_get / getbit are aliases; bit 0 is the LSB
        ("""SELECT bit_get(5, 0) AS b0, bit_get(5, 1) AS b1,
                   getbit(5, 2) AS b2""",
         """SELECT CAST(1 AS TINYINT) AS b0, CAST(0 AS TINYINT) AS b1,
                   CAST(1 AS TINYINT) AS b2"""),
        # shiftrightunsigned: logical shift — sign bit does not smear
        ("""SELECT shiftrightunsigned(CAST(-8 AS BIGINT), 2) AS lsr64,
                   shiftrightunsigned(-8, 2) AS lsr32,
                   shiftright(CAST(-8 AS BIGINT), 2) AS asr""",
         """SELECT 4611686018427387902 AS lsr64, 1073741822 AS lsr32,
                   -2 AS asr"""),
        # timestamp_millis/micros land on the same instant as epoch math
        ("""SELECT unix_seconds(timestamp_millis(86400000)) AS day_s,
                   unix_millis(timestamp_millis(1500)) AS ms,
                   unix_micros(timestamp_micros(2500000)) AS us""",
         """SELECT 86400 AS day_s, 1500 AS ms, 2500000 AS us"""),
        # unix_date / date_from_unix_date round-trip
        ("""SELECT unix_date(DATE '1970-02-01') AS d31,
                   date_from_unix_date(365) AS y71""",
         """SELECT 31 AS d31, DATE '1971-01-01' AS y71"""),
        # monthname/dayname: Spark abbreviates to 3 letters (DuckDB
        # spells the full name — divergence pinned here)
        ("""SELECT monthname(DATE '2024-02-29') AS mn,
                   dayname(DATE '2024-02-29') AS dn""",
         """SELECT 'Feb' AS mn, 'Thu' AS dn"""),
        # make_interval verified through timestamp arithmetic
        ("""SELECT CAST(CAST(TIMESTAMP '2020-01-01 00:00:00'
                        + make_interval(0, 0, 0, 1, 2, 3, 4.5) AS DATE)
                     AS STRING) AS plus_day""",
         """SELECT '2020-01-02' AS plus_day"""),
        ("""SELECT unix_seconds(CAST(TIMESTAMP '2020-01-01 00:00:00'
                        + make_dt_interval(1, 2, 3, 4.0) AS TIMESTAMP))
                   - unix_seconds(TIMESTAMP '2020-01-01 00:00:00')
                     AS dt_secs""",
         """SELECT 93784 AS dt_secs"""),
        # positive/negative modulus pair: pmod vs mod
        ("""SELECT pmod(-7, 3) AS pm, mod(-7, 3) AS m""",
         """SELECT 2 AS pm, -1 AS m"""),
        # ceiling/signum aliases and scale-targeted ceil/floor
        ("""SELECT CAST(ceiling(2.1) AS BIGINT) AS c,
                   CAST(signum(-3.5) AS BIGINT) AS sg,
                   CAST(ceil(123.456, 1) AS STRING) AS c1,
                   CAST(floor(123.456, -2) AS STRING) AS fm2""",
         """SELECT 3 AS c, -1 AS sg, '123.5' AS c1, '100' AS fm2"""),
    ],
    # ── struct ordering: field-order lexicographic comparison, structs
    #    as sort keys and group keys ─────────────────────────────────────
    "struct_ordering": [
        ("""SELECT named_struct('a', 1, 'b', 9)
                     < named_struct('a', 2, 'b', 0) AS first_field,
                   named_struct('a', 1, 'b', 1)
                     < named_struct('a', 1, 'b', 2) AS second_field""",
         """SELECT {'a': 1, 'b': 9} < {'a': 2, 'b': 0} AS first_field,
                   {'a': 1, 'b': 1} < {'a': 1, 'b': 2} AS second_field"""),
        # struct as a sort key over real rows
        ("""SELECT n_name FROM nation
            WHERE n_regionkey <= 1
            ORDER BY named_struct('r', n_regionkey, 'n', n_name)
            LIMIT 8""",
         """SELECT n_name FROM nation
            WHERE n_regionkey <= 1
            ORDER BY {'r': n_regionkey, 'n': n_name}
            LIMIT 8"""),
        # struct as a group key
        ("""SELECT s.r AS r, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT named_struct('r', n_regionkey) AS s FROM nation) t
            GROUP BY s ORDER BY r""",
         """SELECT s.r AS r, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT {'r': n_regionkey} AS s FROM nation) t
            GROUP BY s ORDER BY r"""),
        # min/max over struct values picks by field-order comparison
        ("""SELECT max(named_struct('k', n_regionkey, 'v', n_name)).v
                     AS top_v
            FROM nation""",
         """SELECT max({'k': n_regionkey, 'v': n_name}).v AS top_v
            FROM nation"""),
    ],
    # ── frame shorthand: `ROWS/RANGE n PRECEDING` without BETWEEN
    #    implies `AND CURRENT ROW` (pg_compat_window.slt uses these) ─────
    "frame_shorthand": [
        """SELECT l_linenumber, CAST(sum(l_linenumber) OVER (
                    ORDER BY l_linenumber ROWS 2 PRECEDING) AS BIGINT) AS s
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        """SELECT q, CAST(count(*) OVER (ORDER BY q RANGE 3 PRECEDING)
                     AS BIGINT) AS c
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem WHERE l_orderkey <= 2) ORDER BY q, c""",
        """SELECT l_linenumber, CAST(min(l_linenumber) OVER (
                    ORDER BY l_linenumber ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS m
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        """SELECT l_linenumber, CAST(count(*) OVER (
                    ORDER BY l_linenumber ROWS CURRENT ROW) AS BIGINT) AS c1
           FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""",
        # shorthand == the explicit BETWEEN form
        """SELECT q,
                  CAST(sum(q) OVER (ORDER BY q RANGE 2 PRECEDING) AS BIGINT)
                    = CAST(sum(q) OVER (ORDER BY q RANGE BETWEEN 2 PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS same
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem WHERE l_orderkey <= 2) ORDER BY q LIMIT 12""",
    ],
    # ── name-resolution precedence: alias vs column in ORDER BY /
    #    GROUP BY / HAVING, ordinal+alias mixes, CTE name shadowing ──────
    "name_resolution": [
        # ORDER BY prefers the SELECT alias over the base column when
        # the alias shadows a real column name
        ("""SELECT n_name AS n_regionkey FROM nation
            WHERE n_nationkey < 5 ORDER BY n_regionkey""",
         """SELECT n_name AS n_regionkey FROM nation
            WHERE n_nationkey < 5 ORDER BY n_regionkey"""),
        # GROUP BY resolves output aliases
        """SELECT n_regionkey + 100 AS g, count(*) AS n FROM nation
           GROUP BY g ORDER BY g""",
        # GROUP BY mixes ordinals and aliases
        """SELECT n_regionkey AS r, n_nationkey % 2 AS par,
                  count(*) AS n
           FROM nation GROUP BY 1, par ORDER BY r, par""",
        # HAVING sees grouping aliases
        """SELECT n_regionkey AS g, count(*) AS n FROM nation
           GROUP BY g HAVING count(*) >= 5 ORDER BY g""",
        # ORDER BY can use expressions over aliases
        """SELECT n_name, length(n_name) AS ln FROM nation
           WHERE n_regionkey = 2 ORDER BY ln * -1, n_name""",
        # CTE shadowing: the inner WITH wins inside its scope
        """WITH t AS (SELECT 1 AS v)
           SELECT * FROM (WITH t AS (SELECT 2 AS v) SELECT v FROM t) s""",
        # CTE name shadows a real table name
        """WITH nation AS (SELECT 99 AS n_nationkey)
           SELECT n_nationkey FROM nation""",
        # chained CTE references resolve left-to-right
        """WITH a AS (SELECT 3 AS v),
                b AS (SELECT v + 1 AS v FROM a),
                c AS (SELECT v * 2 AS v FROM b)
           SELECT a.v AS av, c.v AS cv FROM a, c""",
        # subquery alias hides the outer name
        """SELECT k FROM (SELECT n_regionkey AS k FROM nation
                          WHERE n_nationkey < 3) nation ORDER BY k""",
    ],
    # ── BINARY type algebra: X'' literals, concat, ordering, lengths —
    #    outputs always pass through hex() so goldens stay text ──────────
    "binary_type": [
        ("""SELECT hex(X'0AFF') AS h, length(X'0AFF') AS len""",
         """SELECT hex(from_hex('0AFF')) AS h,
                   octet_length(from_hex('0AFF')) AS len"""),
        # concat of binary is binary
        ("""SELECT hex(concat(X'AB', X'CD', X'EF')) AS glued""",
         """SELECT hex(from_hex('AB') || from_hex('CD') || from_hex('EF'))
                     AS glued"""),
        # unhex/hex round-trip and case-insensitive input
        ("""SELECT hex(unhex('deadBEEF')) AS rt""",
         """SELECT hex(from_hex('deadBEEF')) AS rt"""),
        # binary comparison is unsigned byte-lexicographic
        ("""SELECT X'00FF' < X'01' AS lt, X'AB' = X'ab' AS eq_case,
                   X'' < X'00' AS empty_first""",
         """SELECT from_hex('00FF') < from_hex('01') AS lt,
                   from_hex('AB') = from_hex('ab') AS eq_case,
                   from_hex('') < from_hex('00') AS empty_first"""),
        # string -> binary via encode keeps utf-8 bytes
        ("""SELECT hex(encode('AB', 'utf-8')) AS ab,
                   hex(encode('é', 'utf-8')) AS accent""",
         """SELECT hex(encode('AB')) AS ab, hex(encode('é')) AS accent"""),
        # md5 is text but sha1/sha2 families land on binary-ish hex
        ("""SELECT length(md5('x')) AS md5_len,
                   length(sha2('x', 256)) AS sha_len""",
         """SELECT length(md5('x')) AS md5_len,
                   length(sha256('x')) AS sha_len"""),
        # ordering real rows by a binary key
        ("""SELECT r_regionkey FROM region
            ORDER BY encode(r_name, 'utf-8'), r_regionkey""",
         """SELECT r_regionkey FROM region
            ORDER BY encode(r_name), r_regionkey"""),
        # binary in aggregates: min/max by byte order
        ("""SELECT hex(min(encode(r_name, 'utf-8'))) AS first_bytes
            FROM region""",
         """SELECT hex(min(encode(r_name))) AS first_bytes FROM region"""),
    ],
    # ── ANSI typed-interval algebra: YEAR TO MONTH vs DAY TO SECOND are
    #    distinct types in Spark (ym+dt does not add; each has its own
    #    arithmetic). Values verified through date/timestamp application
    #    and division/multiplication — literal pairs where DuckDB's
    #    untyped INTERVAL spells it differently ──────────────────────────
    "interval_typed": [
        # multi-unit YM literal: 1-2 = 14 months
        ("""SELECT CAST(DATE '2020-01-15' + INTERVAL '1-2' YEAR TO MONTH
                     AS STRING) AS d""",
         """SELECT '2021-03-15' AS d"""),
        # DT literal with full day-to-second precision
        ("""SELECT CAST(TIMESTAMP '2020-01-01 00:00:00'
                        + INTERVAL '1 02:03:04' DAY TO SECOND AS STRING)
                     AS ts""",
         """SELECT '2020-01-02 02:03:04' AS ts"""),
        # interval * numeric and interval / numeric stay typed
        ("""SELECT CAST(DATE '2020-01-01' + (INTERVAL '2' MONTH) * 3
                     AS STRING) AS mul,
                   CAST(TIMESTAMP '2020-01-01 00:00:00'
                        + (INTERVAL '1' DAY) / 2 AS STRING) AS halfday""",
         """SELECT '2020-07-01' AS mul, '2020-01-01 12:00:00' AS halfday"""),
        # same-type intervals add; result applied to a date
        ("""SELECT CAST(DATE '2020-01-01' +
                        (INTERVAL '1' YEAR + INTERVAL '3' MONTH)
                     AS STRING) AS ym_sum,
                   CAST(TIMESTAMP '2020-01-01 00:00:00' +
                        (INTERVAL '1' DAY + INTERVAL '6' HOUR)
                     AS STRING) AS dt_sum""",
         """SELECT '2021-04-01' AS ym_sum, '2020-01-02 06:00:00' AS dt_sum"""),
        # timestamp difference IS a day-time interval; extract fields
        ("""SELECT CAST(extract(DAY FROM (TIMESTAMP '2020-01-03 07:30:00'
                                - TIMESTAMP '2020-01-01 01:00:00'))
                     AS BIGINT) AS days,
                   CAST(extract(HOUR FROM (TIMESTAMP '2020-01-03 07:30:00'
                                - TIMESTAMP '2020-01-01 01:00:00'))
                     AS BIGINT) AS hours""",
         """SELECT 2 AS days, 6 AS hours"""),
        # negative intervals and subtraction symmetry
        ("""SELECT CAST(DATE '2020-03-31' - INTERVAL '1' MONTH AS STRING)
                     AS back,
                   CAST(DATE '2020-03-31' + INTERVAL '-1' MONTH AS STRING)
                     AS neg""",
         """SELECT '2020-02-29' AS back, '2020-02-29' AS neg"""),
        # interval comparison within a type
        ("""SELECT INTERVAL '2' DAY > INTERVAL '36' HOUR AS cmp_dt,
                   INTERVAL '1' YEAR = INTERVAL '12' MONTH AS cmp_ym""",
         """SELECT true AS cmp_dt, true AS cmp_ym"""),
        # single-field literals KEEP their declared field in rendering
        # (INTERVAL '14' MONTH is MONTH-typed — no 1-2 YM normalization;
        # multi-field types like the timestamp-difference below do
        # render the full DAY TO SECOND form)
        ("""SELECT CAST(INTERVAL '14' MONTH AS STRING) AS ym,
                   CAST(INTERVAL '90' MINUTE AS STRING) AS dt""",
         """SELECT 'INTERVAL ''14'' MONTH' AS ym,
                   'INTERVAL ''90'' MINUTE' AS dt"""),
        # aggregation over day-time intervals (sum/avg are defined)
        ("""SELECT CAST(sum(iv) AS STRING) AS total FROM
              (SELECT TIMESTAMP '2020-01-01 02:00:00'
                      - TIMESTAMP '2020-01-01 00:00:00' AS iv
               UNION ALL
               SELECT TIMESTAMP '2020-01-01 05:30:00'
                      - TIMESTAMP '2020-01-01 00:00:00') t""",
         """SELECT 'INTERVAL ''0 07:30:00'' DAY TO SECOND' AS total"""),
    ],
    # ── Spark-dialect SQL clause surface: IDENTIFIER(), DISTRIBUTE/
    #    CLUSTER/SORT BY (plan-level clauses — results pinned equal to
    #    the plain form), hint comments, backticks, TABLESAMPLE ROWS ─────
    "sql_dialect_surface": [
        # IDENTIFIER(): dynamic table/column names from string literals
        ("""SELECT n_name FROM IDENTIFIER('nation')
            WHERE n_nationkey < 3 ORDER BY n_name""",
         """SELECT n_name FROM nation
            WHERE n_nationkey < 3 ORDER BY n_name"""),
        ("""SELECT IDENTIFIER('n_name') AS nm FROM nation
            WHERE n_regionkey = 4 ORDER BY nm LIMIT 5""",
         """SELECT n_name AS nm FROM nation
            WHERE n_regionkey = 4 ORDER BY nm LIMIT 5"""),
        # DISTRIBUTE BY + SORT BY inside a subquery: outer total order
        # makes the result deterministic; the clauses must parse and
        # not change the answer
        ("""SELECT k, n FROM
              (SELECT n_regionkey AS k, count(*) AS n FROM nation
               GROUP BY n_regionkey DISTRIBUTE BY k SORT BY k) t
            ORDER BY k""",
         """SELECT n_regionkey AS k, count(*) AS n FROM nation
            GROUP BY n_regionkey ORDER BY k"""),
        ("""SELECT k FROM (SELECT n_nationkey AS k FROM nation
                           CLUSTER BY k) t ORDER BY k LIMIT 10""",
         """SELECT n_nationkey AS k FROM nation ORDER BY k LIMIT 10"""),
        # join-strategy hint comments parse and leave semantics alone
        ("""SELECT /*+ BROADCAST(r) */ n_name, r_name
            FROM nation n JOIN region r ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' ORDER BY n_name""",
         """SELECT n_name, r_name
            FROM nation n JOIN region r ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' ORDER BY n_name"""),
        ("""SELECT /*+ MERGE(o) */ count(*) AS n
            FROM orders o JOIN customer c ON o_custkey = c_custkey""",
         """SELECT count(*) AS n
            FROM orders o JOIN customer c ON o_custkey = c_custkey"""),
        # backtick identifiers (Spark) vs double quotes (DuckDB)
        ("""SELECT n_name AS `odd name!` FROM nation
            WHERE n_nationkey = 7 ORDER BY `odd name!`""",
         """SELECT n_name AS "odd name!" FROM nation
            WHERE n_nationkey = 7 ORDER BY "odd name!\""""),
        # TABLESAMPLE (n ROWS) is a deterministic prefix take
        ("""SELECT count(*) AS n FROM (
              SELECT * FROM nation TABLESAMPLE (5 ROWS)) t""",
         """SELECT 5 AS n"""),
    ],
    # ── star-EXCEPT projection (Spark EXCEPT ≡ DuckDB EXCLUDE) ─────────
    "wildcard_except": [
        ("""SELECT * EXCEPT (r_name) FROM region ORDER BY r_regionkey""",
         """SELECT * EXCLUDE (r_name) FROM region ORDER BY r_regionkey"""),
        ("""SELECT * EXCEPT (n_name, n_regionkey) FROM nation
            ORDER BY n_nationkey LIMIT 10""",
         """SELECT * EXCLUDE (n_name, n_regionkey) FROM nation
            ORDER BY n_nationkey LIMIT 10"""),
        # qualified star with EXCEPT after a join
        ("""SELECT n.* EXCEPT (n_regionkey), r.r_name FROM nation n
            JOIN region r ON n.n_regionkey = r.r_regionkey
            ORDER BY n.n_nationkey LIMIT 8""",
         """SELECT n.* EXCLUDE (n_regionkey), r.r_name FROM nation n
            JOIN region r ON n.n_regionkey = r.r_regionkey
            ORDER BY n.n_nationkey LIMIT 8"""),
        # EXCEPT composes with added computed columns
        ("""SELECT * EXCEPT (r_name), length(r_name) AS len FROM region
            ORDER BY r_regionkey""",
         """SELECT * EXCLUDE (r_name), length(r_name) AS len FROM region
            ORDER BY r_regionkey"""),
    ],
    # ── RANGE frames under DESC ordering: offsets invert direction
    #    (x PRECEDING means LARGER values when ORDER BY is DESC) — the
    #    18 prior RANGE cases were all ASC ───────────────────────────────
    "window_range_desc": [
        # numeric offset under DESC: 5 PRECEDING covers values in
        # [current, current+5]
        """SELECT q, CAST(sum(q) OVER (ORDER BY q DESC
                       RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS s5p
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem WHERE l_orderkey <= 2)
           ORDER BY q DESC""",
        # FOLLOWING under DESC walks toward smaller values
        """SELECT q, CAST(count(*) OVER (ORDER BY q DESC
                       RANGE BETWEEN CURRENT ROW AND 10 FOLLOWING)
                     AS BIGINT) AS c10f
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem WHERE l_orderkey <= 2)
           ORDER BY q DESC""",
        # ties: all peers are in-frame at CURRENT ROW under RANGE
        """SELECT k, CAST(sum(k) OVER (ORDER BY k DESC
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum
           FROM (SELECT n_regionkey AS k FROM nation) ORDER BY k DESC,
             cum LIMIT 25""",
        # two-sided symmetric band under DESC
        """SELECT q, CAST(count(*) OVER (ORDER BY q DESC
                       RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                     AS BIGINT) AS band
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem WHERE l_orderkey <= 3)
           ORDER BY q DESC""",
        # interval offset on dates, DESC: 30 days PRECEDING = later dates
        ("""SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(count(*) OVER (ORDER BY CAST(o_orderdate AS DATE)
                       DESC RANGE BETWEEN INTERVAL 30 DAY PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS recent
            FROM orders WHERE o_custkey <= 20
            ORDER BY d DESC, recent LIMIT 20""",
         """SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(count(*) OVER (ORDER BY CAST(o_orderdate AS DATE)
                       DESC RANGE BETWEEN INTERVAL '30 days' PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS recent
            FROM orders WHERE o_custkey <= 20
            ORDER BY d DESC, recent LIMIT 20"""),
        # DESC with NULLS LAST: NULL keys form their own peer frame
        """SELECT k, CAST(count(*) OVER (ORDER BY k DESC NULLS LAST
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS c
           FROM (SELECT nullif(n_regionkey, 0) AS k FROM nation)
           ORDER BY k DESC NULLS LAST, c LIMIT 25""",
        # min over a trailing band under DESC ordering
        """SELECT q, CAST(min(q) OVER (ORDER BY q DESC
                       RANGE BETWEEN 4 PRECEDING AND 4 FOLLOWING)
                     AS BIGINT) AS mn
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem WHERE l_orderkey <= 2)
           ORDER BY q DESC""",
        # ASC vs DESC on the same key: frames cover opposite sides
        """SELECT q,
                  CAST(count(*) OVER (ORDER BY q
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS asc_frame,
                  CAST(count(*) OVER (ORDER BY q DESC
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS desc_frame
           FROM (SELECT CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem WHERE l_orderkey <= 2)
           ORDER BY q DESC""",
    ],
    # ── array_sort comparator lambdas + the sort_array/array_sort NULL
    #    placement divergence (asc: sort_array puts NULLs FIRST,
    #    array_sort puts them LAST) ─────────────────────────────────────
    "array_sort_lambda": [
        ("""SELECT array_sort(array(3, 1, 2),
              (l, r) -> CASE WHEN l < r THEN 1
                             WHEN l > r THEN -1 ELSE 0 END) AS descending""",
         """SELECT [3, 2, 1] AS descending"""),
        # comparator on a derived key: sort strings by LENGTH then text
        ("""SELECT array_sort(array('ccc', 'a', 'bb', 'd'),
              (l, r) -> CASE WHEN length(l) < length(r) THEN -1
                             WHEN length(l) > length(r) THEN 1
                             WHEN l < r THEN -1 WHEN l > r THEN 1
                             ELSE 0 END) AS by_len""",
         """SELECT ['a', 'd', 'bb', 'ccc'] AS by_len"""),
        # even keys before odd, each half ascending
        ("""SELECT array_sort(array(5, 2, 7, 4, 1),
              (l, r) -> CASE WHEN l % 2 = r % 2 THEN
                               CASE WHEN l < r THEN -1
                                    WHEN l > r THEN 1 ELSE 0 END
                             WHEN l % 2 = 0 THEN -1 ELSE 1 END)
                   AS evens_first""",
         """SELECT [2, 4, 1, 5, 7] AS evens_first"""),
        # NULL placement: array_sort asc -> NULLs LAST; sort_array asc ->
        # NULLs FIRST; sort_array desc -> NULLs LAST
        ("""SELECT array_sort(array(2, NULL, 1)) AS asort,
                   sort_array(array(2, NULL, 1)) AS sarr,
                   sort_array(array(2, NULL, 1), false) AS sdesc""",
         """SELECT [1, 2, NULL] AS asort, [NULL, 1, 2] AS sarr,
                   [2, 1, NULL] AS sdesc"""),
        # comparator over a real column's split parts
        ("""SELECT r_regionkey,
                   array_sort(split(r_name, ''),
                     (l, r) -> CASE WHEN l < r THEN 1
                                    WHEN l > r THEN -1 ELSE 0 END) AS rev
            FROM region WHERE r_regionkey <= 1
            ORDER BY r_regionkey""",
         """SELECT r_regionkey,
                   list_sort(string_split(r_name, ''), 'DESC') AS rev
            FROM region WHERE r_regionkey <= 1
            ORDER BY r_regionkey"""),
        # struct-array sort by a chosen field
        ("""SELECT transform(array_sort(
              array(named_struct('k', 3, 'v', 'c'),
                    named_struct('k', 1, 'v', 'a'),
                    named_struct('k', 2, 'v', 'b')),
              (l, r) -> CASE WHEN l.k < r.k THEN -1
                             WHEN l.k > r.k THEN 1 ELSE 0 END),
              s -> s.v) AS by_k""",
         """SELECT ['a', 'b', 'c'] AS by_k"""),
    ],
    # ── second Spark-surface batch: numeric formatting, quantified
    #    LIKE, csv/json structs, alias spellings, JVM reflect ───────────
    "spark_fn_surface2": [
        # to_char numeric formatting (to_varchar is the alias)
        ("""SELECT to_char(454, '999') AS a,
                   to_char(78.12, '$99.99') AS b,
                   to_varchar(-12454.8, '99,999.9S') AS c""",
         """SELECT '454' AS a, '$78.12' AS b, '12,454.8-' AS c"""),
        # to_number parses the same grammar back
        ("""SELECT CAST(to_number('454', '999') AS BIGINT) AS n,
                   CAST(to_number('$78.12', '$99.99') AS STRING) AS d,
                   try_to_number('bad', '999') IS NULL AS bad""",
         """SELECT 454 AS n, '78.12' AS d, true AS bad"""),
        # try_mod: zero divisor -> NULL (ANSI mod errors)
        ("""SELECT try_mod(10, 3) AS m, try_mod(10, 0) IS NULL AS z""",
         """SELECT mod(10, 3) AS m, true AS z"""),
        # quantified LIKE ALL / ANY over pattern lists
        ("""SELECT 'abcde' LIKE ALL ('%a%', '%c%', '%e%') AS all_hit,
                   'abcde' LIKE ALL ('%a%', '%z%') AS all_miss,
                   'abcde' LIKE ANY ('%z%', '%c%') AS any_hit,
                   'abcde' NOT LIKE ANY ('%a%', '%z%') AS nany""",
         """SELECT ('abcde' LIKE '%a%' AND 'abcde' LIKE '%c%'
                    AND 'abcde' LIKE '%e%') AS all_hit,
                   ('abcde' LIKE '%a%' AND 'abcde' LIKE '%z%') AS all_miss,
                   ('abcde' LIKE '%z%' OR 'abcde' LIKE '%c%') AS any_hit,
                   (NOT ('abcde' LIKE '%a%') OR NOT ('abcde' LIKE '%z%'))
                     AS nany"""),
        # alias spellings: ucase/lcase/character_length
        ("""SELECT ucase('mIx') AS u, lcase('mIx') AS l,
                   character_length('abcd') AS cl""",
         """SELECT upper('mIx') AS u, lower('mIx') AS l,
                   length('abcd') AS cl"""),
        # zeroifnull / nullifzero (Spark 4 surface)
        ("""SELECT zeroifnull(CAST(NULL AS INT)) AS z, zeroifnull(7) AS p,
                   nullifzero(0) IS NULL AS nz, nullifzero(5) AS keep""",
         """SELECT coalesce(CAST(NULL AS INTEGER), 0) AS z,
                   coalesce(7, 0) AS p,
                   nullif(0, 0) IS NULL AS nz, nullif(5, 0) AS keep"""),
        # json_tuple generator: multi-field extraction in one pass
        ("""SELECT t.a, t.b FROM (SELECT 1) x
            LATERAL VIEW json_tuple('{"a": "x", "b": 7}', 'a', 'b')
              t AS a, b""",
         """SELECT 'x' AS a, '7' AS b"""),
        # from_csv / to_csv round-trip through a typed struct
        ("""SELECT from_csv('3,9.5,ok', 'a INT, b DOUBLE, c STRING').a AS a,
                   to_csv(named_struct('x', 1, 'y', 'z')) AS csv""",
         """SELECT 3 AS a, '1,z' AS csv"""),
        # schema inference strings are part of the public surface
        ("""SELECT schema_of_json('{"n": 1, "s": "x", "l": [1]}') AS sj,
                   schema_of_csv('1,abc,2.5') AS sc""",
         """SELECT 'STRUCT<l: ARRAY<BIGINT>, n: BIGINT, s: STRING>' AS sj,
                   'STRUCT<_c0: INT, _c1: STRING, _c2: DOUBLE>' AS sc"""),
        # JVM reflection escape hatch (reference exposes UDF registries;
        # Spark's reflect() is the built-in equivalent surface)
        ("""SELECT reflect('java.lang.Integer', 'toBinaryString', 10) AS b,
                   java_method('java.lang.Math', 'floorDiv', 7, 2) AS fd""",
         """SELECT '1010' AS b, '3' AS fd"""),
        # elt / char round out the misc string surface (out-of-range elt
        # is an ANSI INVALID_ARRAY_INDEX error, not NULL — ErrorSemantics
        # territory, so only in-range indices here)
        ("""SELECT elt(2, 'a', 'b', 'c') AS e, char(66) AS ch""",
         """SELECT 'b' AS e, 'B' AS ch"""),
        # conv: base conversion both directions
        ("""SELECT conv('ff', 16, 10) AS hex2dec, conv('255', 10, 16) AS dec2hex,
                   conv('1010', 2, 10) AS bin2dec""",
         """SELECT '255' AS hex2dec, 'FF' AS dec2hex, '10' AS bin2dec"""),
    ],
    # ── decimal precision/scale propagation (Spark rules pinned as
    #    literals where DuckDB's differ: division scale, avg widening) ──
    "decimal_propagation": [
        # multiply: scale adds (s1+s2); value exact
        ("""SELECT CAST(CAST(1.50 AS DECIMAL(5,2))
                        * CAST(2.50 AS DECIMAL(5,2)) AS STRING) AS prod""",
         """SELECT '3.7500' AS prod"""),
        # divide: Spark result scale is max(6, s1+p2+1) — here 8
        ("""SELECT CAST(CAST(1 AS DECIMAL(5,2))
                        / CAST(3 AS DECIMAL(5,2)) AS STRING) AS third""",
         """SELECT '0.33333333' AS third"""),
        # add/sub: scale is max(s1,s2)
        ("""SELECT CAST(CAST(1.2 AS DECIMAL(5,1))
                        + CAST(0.05 AS DECIMAL(5,2)) AS STRING) AS s2""",
         """SELECT '1.25' AS s2"""),
        # sum widens precision, keeps scale
        """SELECT CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS STRING)
                    AS total
           FROM lineitem WHERE l_orderkey <= 3""",
        # avg adds 4 to scale in Spark (DuckDB: double) — value-compare
        ("""SELECT CAST(avg(CAST(l_quantity AS DECIMAL(10,2)))
                     AS DECIMAL(14,4)) AS a
            FROM lineitem WHERE l_orderkey <= 3""",
         """SELECT CAST(avg(CAST(l_quantity AS DECIMAL(10,2)))
                     AS DECIMAL(14,4)) AS a
            FROM lineitem WHERE l_orderkey <= 3"""),
        # round on decimal: HALF_UP (2.5 -> 3), unlike double HALF_EVEN
        ("""SELECT CAST(round(CAST(2.5 AS DECIMAL(5,1)), 0) AS STRING)
                     AS dec_r,
                   CAST(round(CAST(3.5 AS DECIMAL(5,1)), 0) AS STRING)
                     AS dec_r2""",
         """SELECT '3' AS dec_r, '4' AS dec_r2"""),
        # bround on decimal: HALF_EVEN banker's rounding
        ("""SELECT CAST(bround(CAST(2.5 AS DECIMAL(5,1)), 0) AS STRING)
                     AS b1,
                   CAST(bround(CAST(3.5 AS DECIMAL(5,1)), 0) AS STRING)
                     AS b2""",
         """SELECT '2' AS b1, '4' AS b2"""),
        # decimal -> int cast truncates toward zero
        ("""SELECT CAST(CAST(2.9 AS DECIMAL(5,1)) AS INT) AS t1,
                   CAST(CAST(-2.9 AS DECIMAL(5,1)) AS INT) AS t2""",
         """SELECT 2 AS t1, -2 AS t2"""),
        # mod keeps operand scale
        ("""SELECT CAST(CAST(10.50 AS DECIMAL(6,2))
                        % CAST(3 AS DECIMAL(6,2)) AS STRING) AS m""",
         """SELECT '1.50' AS m"""),
        # literal typing: 1.0 is DECIMAL(2,1), 1e0 is DOUBLE
        ("""SELECT CAST(1.0 AS STRING) AS dec_lit,
                   CAST(1e0 AS STRING) AS dbl_lit""",
         """SELECT '1.0' AS dec_lit, '1.0' AS dbl_lit"""),
        # aggregation over the fact table at full decimal precision
        """SELECT l_returnflag,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(1 - l_discount AS DECIMAL(12,2)))
                       AS DECIMAL(18,4)) AS revenue
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ],
    # ── UNION/set-op type widening across branches ──────────────────────
    "union_widening2": [
        # int + decimal -> decimal; total order over the merged column
        """SELECT CAST(x AS STRING) AS xs FROM
             (SELECT 1 AS x UNION ALL SELECT 2.5) u ORDER BY xs""",
        # int + double -> double
        ("""SELECT round(x, 1) AS xr FROM
              (SELECT 1 AS x UNION ALL SELECT 2.5e0) u ORDER BY xr""",
         """SELECT round(x, 1) AS xr FROM
              (SELECT CAST(1 AS DOUBLE) AS x UNION ALL SELECT 2.5) u
            ORDER BY xr"""),
        # int + string -> string in BOTH engines
        """SELECT x FROM (SELECT CAST(1 AS STRING) AS x
                          UNION ALL SELECT 'a') u ORDER BY x""",
        # date + timestamp -> timestamp (compare via epoch day)
        ("""SELECT CAST(CAST(x AS DATE) AS STRING) AS d FROM
              (SELECT DATE '2020-01-01' AS x
               UNION ALL SELECT TIMESTAMP '2020-06-01 12:00:00') u
            ORDER BY d""",
         """SELECT CAST(CAST(x AS DATE) AS STRING) AS d FROM
              (SELECT CAST(DATE '2020-01-01' AS TIMESTAMP) AS x
               UNION ALL SELECT TIMESTAMP '2020-06-01 12:00:00') u
            ORDER BY d"""),
        # NULL-typed branch adopts the other side's type
        """SELECT x FROM (SELECT NULL AS x UNION ALL SELECT 5) u
           ORDER BY x NULLS FIRST""",
        # smallint-vs-bigint widening keeps exact 64-bit values
        """SELECT CAST(x AS BIGINT) AS xb FROM
             (SELECT CAST(1 AS SMALLINT) AS x
              UNION ALL SELECT CAST(9007199254740993 AS BIGINT)) u
           ORDER BY xb""",
        # three-branch chain: widening is associative
        ("""SELECT CAST(x AS STRING) AS xs FROM
              (SELECT 1 AS x UNION ALL SELECT 2.25
               UNION ALL SELECT 3.5e0) u ORDER BY xs""",
         """SELECT CAST(x AS STRING) AS xs FROM
              (SELECT CAST(1 AS DOUBLE) AS x UNION ALL SELECT 2.25
               UNION ALL SELECT 3.5) u ORDER BY xs"""),
        # INTERSECT dedups after coercion
        """SELECT CAST(x AS STRING) AS xs FROM
             (SELECT 1.0 AS x INTERSECT SELECT 1) u ORDER BY xs""",
        # widening applies per-column independently
        """SELECT a, CAST(b AS STRING) AS bs FROM
             (SELECT 1 AS a, 'x' AS b
              UNION ALL SELECT 2, CAST(3 AS STRING)) u ORDER BY a""",
        # real tables: keys arrive as different integer widths
        ("""SELECT CAST(k AS BIGINT) AS kb FROM
              (SELECT CAST(n_nationkey AS SMALLINT) AS k FROM nation
               UNION SELECT CAST(r_regionkey AS BIGINT) FROM region) u
            ORDER BY kb LIMIT 10""",
         """SELECT CAST(k AS BIGINT) AS kb FROM
              (SELECT n_nationkey AS k FROM nation
               UNION SELECT r_regionkey FROM region) u
            ORDER BY kb LIMIT 10"""),
    ],
    # ── join-key implicit coercion: mixed-width and mixed-family keys ──
    "join_key_coercion": [
        # int vs bigint key: exact equality after widening
        ("""SELECT n.n_name FROM nation n
            JOIN region r ON CAST(n.n_regionkey AS BIGINT) = r.r_regionkey
            WHERE r.r_name = 'ASIA' ORDER BY n.n_name""",
         """SELECT n.n_name FROM nation n
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA' ORDER BY n.n_name"""),
        # decimal vs int key
        ("""SELECT count(*) AS c FROM
              (SELECT CAST(o_custkey AS DECIMAL(12,0)) AS k FROM orders) o
            JOIN customer c ON o.k = c.c_custkey""",
         """SELECT count(*) AS c FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey"""),
        # string vs int key — both engines compare numerically
        ("""SELECT count(*) AS c FROM
              (SELECT CAST(n_regionkey AS STRING) AS k FROM nation) n
            JOIN region r ON n.k = r.r_regionkey""",
         """SELECT count(*) AS c FROM nation n
            JOIN region r ON n.n_regionkey = r.r_regionkey"""),
        # date vs timestamp key: date promotes to midnight instant
        ("""SELECT count(*) AS c FROM
              (SELECT DATE '2020-01-01' AS d) a
            JOIN (SELECT TIMESTAMP '2020-01-01 00:00:00' AS t) b
              ON a.d = b.t""",
         """SELECT 1 AS c"""),
        # double vs int key: representable ints match exactly
        ("""SELECT count(*) AS c FROM
              (SELECT CAST(n_nationkey AS DOUBLE) AS k FROM nation) n
            JOIN nation m ON n.k = m.n_nationkey""",
         """SELECT count(*) AS c FROM nation"""),
        # coerced key with NULLs: NULL never matches
        ("""SELECT count(*) AS c FROM
              (SELECT nullif(n_regionkey, 0) AS k FROM nation) n
            JOIN region r ON CAST(n.k AS BIGINT) = r.r_regionkey""",
         """SELECT count(*) AS c FROM nation n
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE n.n_regionkey <> 0"""),
    ],
    # ── outer explode/unnest: empty & NULL collections keep the row ────
    "explode_outer_dense": [
        # explode_outer on NULL/empty arrays keeps the parent row
        ("""SELECT t.id, e.x FROM
              VALUES (1, array(10, 20)), (2, array()),
                     (3, CAST(NULL AS ARRAY<INT>)) AS t(id, a)
            LATERAL VIEW OUTER explode(a) e AS x
            ORDER BY t.id, e.x""",
         """SELECT * FROM (VALUES (1, 10), (1, 20),
                                  (2, CAST(NULL AS INTEGER)),
                                  (3, CAST(NULL AS INTEGER))) t(id, x)
            ORDER BY id, x"""),
        # plain explode DROPS those rows
        ("""SELECT t.id, e.x FROM
              VALUES (1, array(10)), (2, array()),
                     (3, CAST(NULL AS ARRAY<INT>)) AS t(id, a)
            LATERAL VIEW explode(a) e AS x
            ORDER BY t.id, e.x""",
         """SELECT 1 AS id, 10 AS x"""),
        # posexplode_outer emits NULL pos for missing collections
        ("""SELECT t.id, e.p, e.x FROM
              VALUES (1, array('a', 'b')), (2, array()) AS t(id, a)
            LATERAL VIEW OUTER posexplode(a) e AS p, x
            ORDER BY t.id, e.p""",
         """SELECT * FROM (VALUES (1, 0, 'a'), (1, 1, 'b'),
                                  (2, CAST(NULL AS INTEGER),
                                      CAST(NULL AS VARCHAR))) t(id, p, x)
            ORDER BY id, p"""),
        # map explode_outer: key/value pair columns
        ("""SELECT t.id, e.k, e.v FROM
              VALUES (1, map('a', 1)), (2, CAST(NULL AS MAP<STRING,INT>))
                AS t(id, m)
            LATERAL VIEW OUTER explode(m) e AS k, v
            ORDER BY t.id, e.k""",
         """SELECT * FROM (VALUES (1, 'a', 1),
                                  (2, CAST(NULL AS VARCHAR),
                                      CAST(NULL AS INTEGER))) t(id, k, v)
            ORDER BY id, k"""),
        # chained laterals multiply only the non-empty sides
        ("""SELECT t.id, e1.x, e2.y FROM
              VALUES (1, array(1, 2), array('a')) AS t(id, a, b)
            LATERAL VIEW explode(a) e1 AS x
            LATERAL VIEW explode(b) e2 AS y
            ORDER BY t.id, e1.x, e2.y""",
         """SELECT * FROM (VALUES (1, 1, 'a'), (1, 2, 'a')) t(id, x, y)
            ORDER BY id, x, y"""),
        # explode over a real column computed per-row
        ("""SELECT r_regionkey, e.w FROM region
            LATERAL VIEW OUTER explode(split(r_name, ' ')) e AS w
            ORDER BY r_regionkey, e.w""",
         """SELECT r_regionkey, w FROM
              (SELECT r_regionkey, unnest(string_split(r_name, ' ')) AS w
               FROM region) u
            ORDER BY r_regionkey, w"""),
    ],
}



# ── timestamp/tz density push (r6 verdict #5) ─────────────────────────
# The reference's timestamps.slt is its single largest file (2,846
# lines); these five generated families close our thinnest area with an
# INDEPENDENT oracle: expectations come from Python's zoneinfo/datetime
# (IANA tzdata + proleptic Gregorian), not from DuckDB — the duck side
# of each pair is the precomputed literal. Zones/instants stay within
# 2016-2027 where IANA and JDK tzdata agree.
def _ts_families():
    import calendar
    from zoneinfo import ZoneInfo
    import datetime as _dt
    UTC = _dt.timezone.utc
    F = "%Y-%m-%d %H:%M:%S"

    def ts(v):
        # explicit zero-padded render: strftime young-year behavior is
        # platform-dependent (year 1 prints "1" under glibc)
        return (f"{v.year:04d}-{v.month:02d}-{v.day:02d} "
                f"{v.hour:02d}:{v.minute:02d}:{v.second:02d}")
    zones = ["America/New_York", "Europe/Paris", "Australia/Sydney",
             "America/Sao_Paulo", "Asia/Kathmandu", "Asia/Kolkata",
             "America/Phoenix", "Europe/London", "Pacific/Auckland",
             "America/St_Johns"]
    instants = [_dt.datetime(y, m, d, 6, 30)
                for y in (2016, 2020, 2024, 2027)
                for (m, d) in ((1, 15), (3, 10), (3, 27), (4, 6),
                               (6, 30), (10, 27), (11, 3), (12, 31))]

    # 1. from_utc_timestamp across DST transitions, 8 instants per zone
    dst = []
    for zi, z in enumerate(zones):
        for inst in instants[zi % 4::4]:
            loc = inst.replace(tzinfo=UTC).astimezone(ZoneInfo(z))
            dst.append((
                f"SELECT date_format(from_utc_timestamp(TIMESTAMP "
                f"'{inst:{F}}', '{z}'), 'yyyy-MM-dd HH:mm:ss') AS local_time",
                f"SELECT '{loc:{F}}' AS local_time"))

    # 2. to_utc_timestamp round-trips on unambiguous local times
    rev = []
    for z in zones:
        for inst in (_dt.datetime(2024, 1, 15, 6, 30),
                     _dt.datetime(2024, 6, 30, 6, 30),
                     _dt.datetime(2020, 12, 31, 23, 30)):
            loc = inst.replace(tzinfo=UTC).astimezone(ZoneInfo(z)) \
                .replace(tzinfo=None)
            rev.append((
                f"SELECT date_format(to_utc_timestamp(TIMESTAMP "
                f"'{loc:{F}}', '{z}'), 'yyyy-MM-dd HH:mm:ss') AS utc_time",
                f"SELECT '{inst:{F}}' AS utc_time"))

    # 3. tz-aware truncation: date_trunc over local wall-clock times
    def _trunc(t, u):
        if u == "year":
            return t.replace(month=1, day=1, hour=0, minute=0, second=0)
        if u == "quarter":
            return t.replace(month=((t.month - 1) // 3) * 3 + 1, day=1,
                             hour=0, minute=0, second=0)
        if u == "month":
            return t.replace(day=1, hour=0, minute=0, second=0)
        if u == "week":  # Spark date_trunc week = Monday 00:00
            m = t - _dt.timedelta(days=t.weekday())
            return m.replace(hour=0, minute=0, second=0)
        if u == "day":
            return t.replace(hour=0, minute=0, second=0)
        if u == "hour":
            return t.replace(minute=0, second=0)
        return t.replace(second=0)
    tr = []
    for zi, z in enumerate(zones[:8]):
        for ui, u in enumerate(
                ("year", "quarter", "month", "week", "day", "hour", "minute")):
            inst = instants[(zi * 7 + ui) % len(instants)]
            loc = inst.replace(tzinfo=UTC).astimezone(ZoneInfo(z)) \
                .replace(tzinfo=None)
            tr.append((
                f"SELECT date_format(date_trunc('{u}', TIMESTAMP "
                f"'{loc:{F}}'), 'yyyy-MM-dd HH:mm:ss') AS t",
                f"SELECT '{_trunc(loc, u):{F}}' AS t"))

    # 4. interval month arithmetic — end-of-month clamping matrix
    def _add_months(d, n):
        y, m = divmod(d.year * 12 + d.month - 1 + n, 12)
        m += 1
        return _dt.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))
    ia = []
    for b in ("2024-01-31", "2024-02-29", "2023-01-31", "2024-03-31",
              "2024-05-31", "2024-08-31", "2023-02-28", "2024-10-31",
              "2000-02-29", "1900-01-31"):
        d0 = _dt.date.fromisoformat(b)
        for n in (1, 2, 3, 6, 11, 12, 13, 24, -1, -12):
            exp = _add_months(d0, n)
            spark = (f"SELECT CAST(DATE '{b}' + INTERVAL '{n}' MONTH AS DATE)"
                     f" AS viaint, add_months(DATE '{b}', {n}) AS viafn")
            ia.append((spark,
                       f"SELECT DATE '{exp}' AS viaint, DATE '{exp}' AS viafn"))
    for (t0, iv, unit, exp) in (
            ("2024-01-01 23:59:59", "1", "SECOND", "2024-01-02 00:00:00"),
            ("2024-02-28 23:00:00", "90", "MINUTE", "2024-02-29 00:30:00"),
            ("2023-02-28 23:00:00", "90", "MINUTE", "2023-03-01 00:30:00"),
            ("2024-12-31 23:59:00", "61", "SECOND", "2025-01-01 00:00:01"),
            ("2024-03-01 00:00:30", "-31", "SECOND", "2024-02-29 23:59:59"),
            ("2024-01-31 12:00:00", "24", "HOUR", "2024-02-01 12:00:00")):
        ia.append((
            f"SELECT date_format(TIMESTAMP '{t0}' + INTERVAL '{iv}' {unit}, "
            f"'yyyy-MM-dd HH:mm:ss') AS t",
            f"SELECT '{exp}' AS t"))

    # 5. format matrix: Java DateTimeFormatter pattern vs strftime golden
    pats = [("yyyy-MM-dd", "%Y-%m-%d"), ("dd/MM/yyyy", "%d/%m/%Y"),
            ("MM-dd-yyyy HH:mm", "%m-%d-%Y %H:%M"), ("yyyyMMdd", "%Y%m%d"),
            ("HH:mm:ss", "%H:%M:%S"), ("EEEE", "%A"), ("MMM", "%b"),
            ("DDD", "%j")]
    vals = [_dt.datetime(2024, 2, 29, 13, 5, 9),
            _dt.datetime(2016, 1, 1, 0, 0, 0),
            _dt.datetime(2027, 12, 31, 23, 59, 58),
            _dt.datetime(2020, 7, 4, 6, 45, 1),
            _dt.datetime(2021, 11, 30, 18, 30, 59),
            _dt.datetime(2019, 3, 10, 2, 30, 0),
            _dt.datetime(2025, 10, 26, 1, 30, 0),
            _dt.datetime(2022, 5, 15, 12, 0, 0),
            _dt.datetime(2023, 9, 23, 9, 9, 9),
            _dt.datetime(2018, 4, 1, 4, 4, 4),
            _dt.datetime(2026, 8, 8, 20, 8, 0),
            _dt.datetime(2024, 6, 20, 22, 22, 2)]
    fm = []
    for vi, v in enumerate(vals):
        for pj, (jp, sp) in enumerate(pats):
            if (vi + pj) % 2 == 0:  # interleave: 48 print cases
                fm.append((
                    f"SELECT date_format(TIMESTAMP '{v:{F}}', '{jp}') AS s",
                    f"SELECT '{v.strftime(sp)}' AS s"))
    for v in vals[:10]:  # parse direction on full-precision patterns
        for (jp, sp) in (("yyyy-MM-dd HH:mm:ss", F),
                         ("dd/MM/yyyy HH:mm:ss", "%d/%m/%Y %H:%M:%S")):
            s = v.strftime(sp)
            fm.append((
                f"SELECT date_format(to_timestamp('{s}', '{jp}'), "
                f"'yyyy-MM-dd HH:mm:ss') AS t",
                f"SELECT '{v:{F}}' AS t"))

    # 6. epoch boundaries: seconds/millis/micros constructors + reverse
    ep = []
    for sec in (-62135596800, -2208988800, -1, 0, 1, 951782399, 951782400,
                2147483647, 2147483648, 4102444800, 253402300799):
        v = _dt.datetime.fromtimestamp(sec, UTC).replace(tzinfo=None)
        ep.append((
            f"SELECT date_format(timestamp_seconds({sec}), "
            f"'yyyy-MM-dd HH:mm:ss') AS t",
            f"SELECT '{ts(v)}' AS t"))
        ep.append((
            f"SELECT unix_timestamp(TIMESTAMP '{ts(v)}') AS s",
            f"SELECT CAST({sec} AS BIGINT) AS s"))
    for ms in (-1, 1, 999, 1000, 1712345678901, -62135596800000):
        v = _dt.datetime.fromtimestamp(ms // 1000, UTC) \
            + _dt.timedelta(milliseconds=ms % 1000)
        ep.append((
            f"SELECT date_format(timestamp_millis({ms}), "
            f"'yyyy-MM-dd HH:mm:ss.SSS') AS t",
            f"SELECT '{ts(v)}.{(ms % 1000):03d}' AS t"))

    # ── deep decimal/cast matrices (r6 verdict #2 residual) ──────────
    # Exactness by construction: +,-,* of decimals are exact in both
    # engines; division cases are built so the exact quotient terminates
    # within 4 dp (v1 = q*v2 exactly), so engine result-scale rules
    # cannot introduce rounding. Every output is CAST to an explicit
    # DECIMAL type, pinning the cross-engine surface.
    import decimal as _dec
    _dec.getcontext().prec = 60  # 18,2 x 18,2 products + 14 dp quantize
    import random as _rnd
    rng = _rnd.Random(20260814)
    dm = []
    for _ in range(60):
        p1, s1 = rng.choice([(5, 2), (9, 4), (12, 6), (18, 2), (20, 8)])
        p2, s2 = rng.choice([(5, 2), (9, 4), (12, 6), (18, 2)])
        v1 = _dec.Decimal(rng.randint(-10**(p1-s1-1)+1, 10**(p1-s1-1)-1)) \
            + _dec.Decimal(rng.randint(0, 10**s1 - 1)) / (10**s1)
        v2 = _dec.Decimal(rng.randint(-10**(p2-s2-1)+1, 10**(p2-s2-1)-1)) \
            + _dec.Decimal(rng.randint(0, 10**s2 - 1)) / (10**s2)
        add = (v1 + v2).quantize(_dec.Decimal(10)**-8)
        sub = (v1 - v2).quantize(_dec.Decimal(10)**-8)
        spark = (f"SELECT CAST(CAST('{v1}' AS DECIMAL({p1},{s1})) + "
                 f"CAST('{v2}' AS DECIMAL({p2},{s2})) AS DECIMAL(28,8)) AS a, "
                 f"CAST(CAST('{v1}' AS DECIMAL({p1},{s1})) - "
                 f"CAST('{v2}' AS DECIMAL({p2},{s2})) AS DECIMAL(28,8)) AS s")
        duck = (f"SELECT CAST('{add}' AS DECIMAL(28,8)) AS a, "
                f"CAST('{sub}' AS DECIMAL(28,8)) AS s")
        if (p1 - s1) + (p2 - s2) <= 20:  # product fits DECIMAL(38,14)
            mul = (v1 * v2).quantize(_dec.Decimal(10)**-14)
            spark += (f", CAST(CAST('{v1}' AS DECIMAL({p1},{s1})) * "
                      f"CAST('{v2}' AS DECIMAL({p2},{s2})) AS DECIMAL(38,14)) AS m")
            duck += f", CAST('{mul}' AS DECIMAL(38,14)) AS m"
        dm.append((spark, duck))
    for _ in range(30):
        q = _dec.Decimal(rng.randint(-99999, 99999)) / 10**rng.randint(0, 4)
        v2 = _dec.Decimal(rng.randint(1, 9999)) / 10**rng.randint(0, 2)
        v1 = q * v2  # exact product -> v1/v2 terminates at q
        dm.append((
            f"SELECT CAST(CAST('{v1}' AS DECIMAL(24,8)) / "
            f"CAST('{v2}' AS DECIMAL(10,2)) AS DECIMAL(20,6)) AS q",
            f"SELECT CAST('{q}' AS DECIMAL(20,6)) AS q"))

    cm = []
    # cast matrix: in-range and overflow try_cast across
    # string/int/decimal/double, NULL on failure in BOTH engines
    for (expr, golden) in [
        ("try_cast('123.456' AS DECIMAL(6,2))", "CAST('123.46' AS DECIMAL(6,2))"),
        ("try_cast('99999.99' AS DECIMAL(7,2))", "CAST('99999.99' AS DECIMAL(7,2))"),
        ("try_cast('100000.0' AS DECIMAL(7,2))", "NULL"),
        ("try_cast('-99999.99' AS DECIMAL(7,2))", "CAST('-99999.99' AS DECIMAL(7,2))"),
        ("try_cast('abc' AS DECIMAL(7,2))", "NULL"),
        ("try_cast('' AS DECIMAL(7,2))", "NULL"),
        ("try_cast('2147483647' AS INT)", "2147483647"),
        ("try_cast('2147483648' AS INT)", "NULL"),
        ("try_cast('-2147483648' AS INT)", "CAST(-2147483648 AS INT)"),
        ("try_cast('9223372036854775807' AS BIGINT)", "CAST(9223372036854775807 AS BIGINT)"),
        ("try_cast('9223372036854775808' AS BIGINT)", "NULL"),
        ("try_cast('32767' AS SMALLINT)", "CAST(32767 AS SMALLINT)"),
        ("try_cast('32768' AS SMALLINT)", "NULL"),
        ("try_cast('127' AS TINYINT)", "CAST(127 AS TINYINT)"),
        ("try_cast('128' AS TINYINT)", "NULL"),
        ("CAST(CAST(1.5 AS DOUBLE) AS DECIMAL(4,1))", "CAST('1.5' AS DECIMAL(4,1))"),
        ("CAST(CAST('0.1' AS DECIMAL(3,1)) AS DOUBLE)", "CAST(0.1 AS DOUBLE)"),
        ("CAST(CAST(255 AS BIGINT) AS DECIMAL(10,3))", "CAST('255.000' AS DECIMAL(10,3))"),
        ("try_cast(CAST('99.995' AS DECIMAL(5,3)) AS DECIMAL(4,2))", "NULL"),
        ("CAST(CAST('99.994' AS DECIMAL(5,3)) AS DECIMAL(4,2))", "CAST('99.99' AS DECIMAL(4,2))"),
    ]:
        cm.append((f"SELECT {expr} AS v", f"SELECT {golden} AS v"))
    # signed-zero / rounding edges on decimal-int interplay
    for n in (1, 7, -7, 10, -10, 25, -25, 999, -999):
        for d in (2, 4, 8):
            exact = _dec.Decimal(n) / d  # terminates (d is a power of 2)
            cm.append((
                f"SELECT CAST(CAST({n} AS DECIMAL(10,0)) / {d} AS DECIMAL(16,6)) AS v",
                f"SELECT CAST('{exact}' AS DECIMAL(16,6)) AS v"))

    return {"decimal_matrix": dm, "cast_matrix2": cm,
            "ts_dst_matrix": dst, "ts_tz_roundtrip": rev,
            "ts_trunc_local": tr, "ts_interval_clamp": ia,
            "ts_format_matrix": fm, "ts_epoch_edges": ep}


CORPUS.update(_ts_families())


def _unsigned_policy():
    """unsigned_widening: executable pin of SURVEY §1's type-mapping
    policy for arrow types Spark lacks (r7 verdict #7 — policy was
    prose-only). u8→SMALLINT, u16→INT, u32→BIGINT each hold their
    unsigned max with +1 headroom; u64→DECIMAL(20,0) carries full
    unsigned-64 arithmetic (sum/product/mod/exact division); the
    Decimal256 gap is pinned as p-capped-at-38 with try_* overflow
    returning NULL — never a wrapped or silently-rounded value."""
    import decimal as _dec
    _dec.getcontext().prec = 80
    U8, U16, U32 = 255, 65535, 4294967295
    U64 = 18446744073709551615
    up = []
    # widened-type headroom: each unsigned max, and max+1 still exact in
    # the WIDER Spark type (the reason u32 cannot map to INT etc.)
    for umax, ty in [(U8, "SMALLINT"), (U16, "INT"), (U32, "BIGINT")]:
        up.append(f"SELECT CAST(CAST({umax} AS {ty}) AS BIGINT) AS vmax, "
                  f"CAST(CAST({umax} AS {ty}) + 1 AS BIGINT) AS vnext")
    # u64 → DECIMAL(20,0): max value round-trips; arithmetic widens
    u64d = f"CAST('{U64}' AS DECIMAL(20,0))"
    up.append((f"SELECT CAST({u64d} AS DECIMAL(20,0)) AS v",
               f"SELECT CAST('{U64}' AS DECIMAL(20,0)) AS v"))
    up.append((f"SELECT CAST({u64d} + 1 AS DECIMAL(22,0)) AS v",
               f"SELECT CAST('{U64 + 1}' AS DECIMAL(22,0)) AS v"))
    up.append((f"SELECT CAST({u64d} * 2 AS DECIMAL(24,0)) AS v",
               f"SELECT CAST('{U64 * 2}' AS DECIMAL(24,0)) AS v"))
    up.append((f"SELECT CAST({u64d} % 1000003 AS BIGINT) AS v",
               f"SELECT CAST({U64 % 1000003} AS BIGINT) AS v"))
    # exact division: U64 ends in 5, so /5 terminates at scale 0
    up.append((f"SELECT CAST({u64d} / 5 AS DECIMAL(21,1)) AS v",
               f"SELECT CAST('{U64 // 5}' AS DECIMAL(21,1)) AS v"))
    # u64 aggregate: sum of (max, max-1, 1) needs 21 digits — exact in
    # the widened DECIMAL, impossible in any 64-bit integer type
    up.append((
        "SELECT CAST(sum(v) AS DECIMAL(24,0)) AS s FROM VALUES "
        f"(CAST('{U64}' AS DECIMAL(20,0))), "
        f"(CAST('{U64 - 1}' AS DECIMAL(20,0))), "
        "(CAST(1 AS DECIMAL(20,0))) AS t(v)",
        f"SELECT CAST('{2 * U64}' AS DECIMAL(24,0)) AS s FROM (VALUES "
        f"(CAST('{U64}' AS DECIMAL(20,0)))) t(v)"))
    # try_cast overflow → NULL (and the in-range twin → the value):
    # narrowing below each unsigned max must refuse, not wrap
    up.append(f"SELECT try_cast('{U64}' AS BIGINT) AS n, "
              f"CAST(try_cast('{U64 // 2}' AS BIGINT) AS BIGINT) AS ok")
    up.append(f"SELECT try_cast(CAST({U32} AS BIGINT) + 1 AS INT) AS n, "
              f"CAST(try_cast(CAST({U32} AS BIGINT) AS BIGINT) AS BIGINT) AS ok")
    up.append("SELECT try_cast(CAST(256 AS INT) AS TINYINT) AS n, "
              "CAST(try_cast(CAST(127 AS INT) AS TINYINT) AS BIGINT) AS ok")
    up.append("SELECT try_cast(CAST(65536 AS INT) AS SMALLINT) AS n, "
              "CAST(try_cast(CAST(32767 AS INT) AS SMALLINT) AS BIGINT) AS ok")
    # Decimal256 gap: precision is capped at 38 — a 39-digit literal is
    # NULL under try_cast on both engines, and the widest in-range
    # product (19,0)x(19,0) -> 38 digits stays EXACT
    p38max = 10 ** 38 - 1
    up.append((f"SELECT try_cast('{10 ** 38}' AS DECIMAL(38,0)) AS n, "
               f"try_cast('{p38max}' AS DECIMAL(38,0)) AS ok",
               f"SELECT CAST(NULL AS DECIMAL(38,0)) AS n, "
               f"CAST('{p38max}' AS DECIMAL(38,0)) AS ok"))
    m19 = 10 ** 19 - 1
    up.append((
        f"SELECT CAST(CAST('{m19}' AS DECIMAL(19,0)) * "
        f"CAST('{m19}' AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS v",
        f"SELECT CAST('{m19 * m19}' AS DECIMAL(38,0)) AS v"))
    # beyond 38 digits there is no Decimal256 to widen into: u64max^2
    # (39 digits) under Spark's try_multiply is NULL — the documented
    # policy, asserted as a value (duck side is the literal golden)
    up.append((
        f"SELECT try_multiply({u64d}, {u64d}) AS v",
        "SELECT CAST(NULL AS DECIMAL(38,0)) AS v"))
    return {"unsigned_widening": up}


CORPUS.update(_unsigned_policy())


def _time_mapping():
    """time_mapping: executable pin of SURVEY §1's Time32/Time64 policy —
    Spark has no TIME type, so time-of-day is represented as BIGINT
    micros-since-midnight (or kept inside TimestampType). These cases
    pin the representation: extraction from timestamps, round-trip
    against hour/minute/second, literal construction, wrap-around
    arithmetic, and the hour-of-day aggregation a 100 TB log pipeline
    actually runs."""
    tod_spark = "unix_micros(ts) - unix_micros(date_trunc('DAY', ts))"
    tod_duck = "epoch_us(ts) - epoch_us(date_trunc('day', ts))"
    tm = []
    # extraction: micros since midnight from a timestamp column
    tm.append((
        f"SELECT event_id, {tod_spark} AS tod_us FROM events "
        "ORDER BY event_id LIMIT 10",
        f"SELECT event_id, {tod_duck} AS tod_us FROM events "
        "ORDER BY event_id LIMIT 10"))
    # round-trip: micros FLOOR-divided to seconds agrees with
    # hour/minute/second fields (Spark DIV / DuckDB // — plain `/` is
    # true division in both and the BIGINT cast then truncs vs rounds)
    tm.append((
        f"SELECT event_id, CAST(({tod_spark}) DIV 1000000 AS BIGINT) - "
        "CAST(hour(ts)*3600 + minute(ts)*60 + second(ts) AS BIGINT) AS drift "
        "FROM events ORDER BY event_id LIMIT 10",
        f"SELECT event_id, CAST(({tod_duck}) // 1000000 AS BIGINT) - "
        "CAST(hour(ts)*3600 + minute(ts)*60 + second(ts) AS BIGINT) AS drift "
        "FROM events ORDER BY event_id LIMIT 10"))
    # literal construction: a wall-time as BIGINT micros
    tm.append((
        "SELECT unix_micros(to_timestamp('1970-01-01 12:34:56.789', "
        "'yyyy-MM-dd HH:mm:ss.SSS')) AS t",
        "SELECT epoch_us(TIMESTAMP '1970-01-01 12:34:56.789') AS t"))
    # wrap-around arithmetic: +1h stays inside [0, 24h) under pmod
    tm.append((
        f"SELECT event_id, pmod(({tod_spark}) + 3600000000, 86400000000) "
        "AS shifted FROM events ORDER BY event_id LIMIT 10",
        f"SELECT event_id, (({tod_duck}) + 3600000000) % 86400000000 "
        "AS shifted FROM events ORDER BY event_id LIMIT 10"))
    # ordering by time-of-day ACROSS dates (the reason a raw timestamp
    # cannot stand in for a TIME value)
    tm.append((
        f"SELECT event_id, {tod_spark} AS tod_us FROM events "
        "ORDER BY tod_us, event_id LIMIT 10",
        f"SELECT event_id, {tod_duck} AS tod_us FROM events "
        "ORDER BY tod_us, event_id LIMIT 10"))
    # hour-of-day histogram + per-type min/max time-of-day
    tm.append(
        "SELECT CAST(hour(ts) AS BIGINT) AS h, CAST(count(*) AS BIGINT) "
        "AS n FROM events GROUP BY hour(ts) ORDER BY h")
    tm.append((
        f"SELECT event_type, min({tod_spark}) AS t0, max({tod_spark}) AS t1 "
        "FROM events GROUP BY event_type ORDER BY event_type",
        f"SELECT event_type, min({tod_duck}) AS t0, max({tod_duck}) AS t1 "
        "FROM events GROUP BY event_type ORDER BY event_type"))
    # boundary literals: midnight and 23:59:59.999999 as micros
    tm.append((
        "SELECT unix_micros(to_timestamp('1970-01-01 00:00:00', "
        "'yyyy-MM-dd HH:mm:ss')) AS lo, "
        "unix_micros(to_timestamp('1970-01-01 23:59:59.999999', "
        "'yyyy-MM-dd HH:mm:ss.SSSSSS')) AS hi",
        "SELECT epoch_us(TIMESTAMP '1970-01-01 00:00:00') AS lo, "
        "epoch_us(TIMESTAMP '1970-01-01 23:59:59.999999') AS hi"))
    return {"time_mapping": tm}


CORPUS.update(_time_mapping())


def fmt_elem(e):
    """Array-ELEMENT formatting, mirrored in SltSpec: python's str() of a
    list is the golden shape — None / 'quoted str' / True / digits.
    Floats are banned inside arrays (binary-format ambiguity)."""
    if e is None:
        return "None"
    if isinstance(e, bool):
        return "True" if e else "False"
    if isinstance(e, str):
        return "'" + e + "'"
    if isinstance(e, float):
        raise ValueError("float inside array output — corpus rule violation")
    return str(e)


def fmt(v):
    if v is None:
        return "NULL"
    if isinstance(v, list):
        return "[" + ", ".join(fmt_elem(e) for e in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (float, decimal.Decimal)):
        # Java's String.format("%.4f") rounds HALF_UP; Python's "%.4f"
        # rounds half-even — quantize explicitly so 4th-decimal ties
        # can't diverge between golden and replay. Ties DO occur for
        # dyadic rationals (0.03125 = 1/32 is exactly ...125), so both
        # sides must round the EXACT value HALF_UP: Decimal(v) here is
        # the exact binary expansion (same as Java's new
        # BigDecimal(double)); SltSpec quantizes DECIMAL outputs with
        # BigDecimal.setScale(4, HALF_UP) to match.
        return str(decimal.Decimal(v).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP))
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        raise ValueError("raw timestamp in output — cast to DATE/epoch")
    return str(v)


def main():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        if t == "events":
            # match Engine.table: ns timestamps truncate to µs
            con.execute(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(CAST(ts AS TIMESTAMP) AS ts) FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
    total = 0
    for family, queries in CORPUS.items():
        out = [f"# {family}.slt — generated by tools/gen_slt.py over {SF}",
               "# do not edit by hand; regenerate instead", ""]
        for case in queries:
            if isinstance(case, tuple):
                spark_sql, duck_sql = case
            else:
                spark_sql = duck_sql = case
            norm = lambda s: "\n".join(l.strip()
                                       for l in s.strip().splitlines())
            spark_sql, duck_sql = norm(spark_sql), norm(duck_sql)
            rows = con.execute(duck_sql).fetchall()
            assert len(rows) <= 40, f"golden too big ({len(rows)}): {duck_sql}"
            out.append("query")
            out.append(spark_sql)
            if duck_sql != spark_sql:
                out.append("--duck--")
                out.append(duck_sql)
            out.append("----")
            for r in rows:
                line = "\t".join(fmt(v) for v in r)
                # SltSpec's parser treats an empty line as end-of-golden:
                # a row formatting to "" would silently truncate the block
                assert line != "", f"empty-formatted row in: {duck_sql}"
                out.append(line)
            out.append("")
            total += 1
        with open(f"{OUT}/{family}.slt", "w") as f:
            f.write("\n".join(out) + "\n")
        print(f"{family}: {len(queries)} queries")
    print(f"total {total}")


if __name__ == "__main__":
    main()
