#!/usr/bin/env python
"""Generate the SLT-style golden corpus (src/test/resources/slt/*.slt).

Each case is ONE portable ANSI SQL text that runs identically on DuckDB
and Spark SQL; DuckDB computes the golden here, graft.SltSpec replays
the same text through spark.sql and compares formatted values. This is
the sqllogictest shape the reference uses as its test backbone
(datafusion/sqllogictest/test_files/*.slt) with DuckDB in the
Postgres-oracle role.

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
}


def fmt(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # Java's String.format("%.4f") rounds HALF_UP; Python's "%.4f"
        # rounds half-even — quantize explicitly so 4th-decimal ties
        # can't diverge between golden and replay.
        # Decimal(v) is the EXACT binary value (same as Java's
        # new BigDecimal(double)) — an exact tie at the 4th decimal is
        # impossible for a dyadic rational, so both sides round alike.
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
        for sql in queries:
            sql = "\n".join(l.strip() for l in sql.strip().splitlines())
            rows = con.execute(sql).fetchall()
            assert len(rows) <= 40, f"golden too big ({len(rows)}): {sql}"
            out.append("query")
            out.append(sql)
            out.append("----")
            for r in rows:
                line = "\t".join(fmt(v) for v in r)
                # SltSpec's parser treats an empty line as end-of-golden:
                # a row formatting to "" would silently truncate the block
                assert line != "", f"empty-formatted row in: {sql}"
                out.append(line)
            out.append("")
            total += 1
        with open(f"{OUT}/{family}.slt", "w") as f:
            f.write("\n".join(out) + "\n")
        print(f"{family}: {len(queries)} queries")
    print(f"total {total}")


if __name__ == "__main__":
    main()
