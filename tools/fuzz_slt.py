#!/usr/bin/env python
"""Grammar fuzzer for the SLT corpus: random PORTABLE SQL expressions,
goldens computed by DuckDB, emitted as src/test/resources/slt/fuzz_*.slt
(SltSpec discovers families from the resource dir, so the output is
picked up with no code change).

This mechanizes the hand-written corpus's purpose — pinning Spark's
expression semantics against an independent engine — over a much larger
sample. The grammar is restricted to surfaces whose semantics the two
dialects genuinely share:

  int expr  : literals, +, -, *, CASE, coalesce, nullif, abs,
              CAST(bool AS INT)  [no /, %, greatest/least: ANSI
              div-by-zero and NULL-handling divergences are pinned by
              hand-written families instead]
  bool expr : <, <=, =, <>, IS NULL, IS NOT NULL, AND, OR, NOT,
              IS [NOT] DISTINCT FROM, BETWEEN, IN (list)
  str expr  : literals, concat, upper, lower, trim, replace,
              substr with POSITIVE args only (negative-start semantics
              diverge), repeat, reverse, left/right with positive args

Every case is deterministic (seeded), FROM-less (single row), and
output-cast per corpus rules (CAST AS BIGINT / AS STRING; booleans
print true/false/NULL). Overflow is impossible by construction: int
literals are in [-4, 4] and expression depth <= 4, bounding |value| by
4^(2^4) well under int64; string length is bounded by repeat<=3 and
depth, under ~200 chars.

Usage: python tools/fuzz_slt.py [n_per_family] [seed]
Then:  sbt "testOnly graft.SltSpec"   (replays through Spark)
"""
import random
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 20260814
OUT = "src/test/resources/slt"


def lit_int(r):
    if r.random() < 0.12:
        return "NULL"
    return str(r.randint(-4, 4))


def int_expr(r, depth):
    if depth <= 0:
        return lit_int(r)
    k = r.random()
    if k < 0.20:
        return lit_int(r)
    if k < 0.34:
        return f"({int_expr(r, depth - 1)} + {int_expr(r, depth - 1)})"
    if k < 0.46:
        return f"({int_expr(r, depth - 1)} - {int_expr(r, depth - 1)})"
    if k < 0.56:
        return f"({int_expr(r, depth - 1)} * {int_expr(r, depth - 1)})"
    if k < 0.70:
        return (f"CASE WHEN {bool_expr(r, depth - 1)} "
                f"THEN {int_expr(r, depth - 1)} "
                f"ELSE {int_expr(r, depth - 1)} END")
    if k < 0.80:
        return f"coalesce({int_expr(r, depth - 1)}, {int_expr(r, depth - 1)})"
    if k < 0.88:
        return f"nullif({int_expr(r, depth - 1)}, {int_expr(r, depth - 1)})"
    if k < 0.95:
        return f"abs({int_expr(r, depth - 1)})"
    return f"CAST({bool_expr(r, depth - 1)} AS INT)"


def bool_expr(r, depth):
    if depth <= 0:
        a, b = int_expr(r, 0), int_expr(r, 0)
        return f"({a} < {b})"
    k = r.random()
    if k < 0.30:
        op = r.choice(["<", "<=", "=", "<>", ">", ">="])
        return f"({int_expr(r, depth - 1)} {op} {int_expr(r, depth - 1)})"
    if k < 0.42:
        return f"({int_expr(r, depth - 1)} IS NULL)"
    if k < 0.50:
        return f"({int_expr(r, depth - 1)} IS NOT NULL)"
    if k < 0.64:
        return f"({bool_expr(r, depth - 1)} AND {bool_expr(r, depth - 1)})"
    if k < 0.78:
        return f"({bool_expr(r, depth - 1)} OR {bool_expr(r, depth - 1)})"
    if k < 0.82:
        return f"(NOT {bool_expr(r, depth - 1)})"
    if k < 0.88:
        neg = r.choice(["", "NOT "])
        return (f"({int_expr(r, depth - 1)} IS {neg}DISTINCT FROM "
                f"{int_expr(r, depth - 1)})")
    if k < 0.94:
        lo, hi = sorted([r.randint(-4, 4), r.randint(-4, 4)])
        return (f"({int_expr(r, depth - 1)} BETWEEN {lo} AND {hi})")
    vals = ", ".join(str(r.randint(-4, 4))
                     for _ in range(r.randint(2, 4)))
    return f"({int_expr(r, depth - 1)} IN ({vals}))"


STR_LITS = ["''", "'a'", "'ab'", "'Abc'", "'x y'", "'-'"]


def str_expr(r, depth):
    if depth <= 0 or r.random() < 0.25:
        return r.choice(STR_LITS)
    k = r.random()
    if k < 0.18:
        return f"concat({str_expr(r, depth - 1)}, {str_expr(r, depth - 1)})"
    if k < 0.30:
        return f"upper({str_expr(r, depth - 1)})"
    if k < 0.42:
        return f"lower({str_expr(r, depth - 1)})"
    if k < 0.52:
        return f"trim({str_expr(r, depth - 1)})"
    if k < 0.64:
        return (f"replace({str_expr(r, depth - 1)}, "
                f"{r.choice(STR_LITS[1:])}, {r.choice(STR_LITS)})")
    if k < 0.76:
        start, ln = r.randint(1, 4), r.randint(0, 4)
        return f"substr({str_expr(r, depth - 1)}, {start}, {ln})"
    if k < 0.84:
        return f"repeat({str_expr(r, depth - 1)}, {r.randint(0, 3)})"
    if k < 0.84:
        return f"reverse({str_expr(r, depth - 1)})"
    if k < 0.88:
        pad = r.choice(["lpad", "rpad"])
        return (f"{pad}({str_expr(r, depth - 1)}, {r.randint(0, 6)}, "
                f"{r.choice(STR_LITS[1:])})")
    if k < 0.92:
        sep = r.choice(["'a'", "' '", "'-'"])
        return (f"split_part({str_expr(r, depth - 1)}, {sep}, "
                f"{r.randint(1, 3)})")
    if k < 0.96:
        return (f"translate({str_expr(r, depth - 1)}, 'abx', 'XY')")
    side = r.choice(["left", "right"])
    return f"{side}({str_expr(r, depth - 1)}, {r.randint(0, 3)})"


def gen_family(name, make_case, n, seed):
    r = random.Random(seed)
    con = duckdb.connect()
    seen = set()
    out = [f"# {name}.slt — generated by tools/fuzz_slt.py "
           f"(seed {seed}, n {n})",
           "# do not edit by hand; regenerate instead", ""]
    made = 0
    dup_streak = 0
    while made < n:
        sql = make_case(r)
        if sql in seen:
            dup_streak += 1
            if dup_streak > 2000:
                print(f"{name}: grammar exhausted at {made} < {n}")
                break
            continue
        dup_streak = 0
        seen.add(sql)
        rows = con.execute(sql).fetchall()
        assert len(rows) == 1 and len(rows[0]) == 1, sql
        v = rows[0][0]
        if v is None:
            golden = "NULL"
        elif isinstance(v, bool):
            golden = "true" if v else "false"
        else:
            golden = str(v)
        assert golden != "", sql
        out += ["query", sql, "----", golden, ""]
        made += 1
    with open(f"{OUT}/{name}.slt", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"{name}: {made} cases")


# ── query-shape fuzzing over the real testdata tables ───────────────
# Random filter + FK-join + GROUP BY + HAVING + ORDER BY compositions:
# exercises plan-level interplay (pushdown through joins, partial aggs,
# having-over-agg) rather than scalar semantics. Group keys are
# restricted to low-cardinality columns so goldens stay <= 40 rows.

SF = "/root/testdata/sf0.001"

# table -> (group-able low-card cols, int agg cols, join spec or None)
# join spec: (dim table, fact key, dim key, dim group col)
QTABLES = {
    "nation": (["n_regionkey"], ["n_nationkey"],
               ("region", "n_regionkey", "r_regionkey", "r_name")),
    "supplier": (["s_nationkey"], ["s_suppkey"],
                 ("nation", "s_nationkey", "n_nationkey", "n_name")),
    "customer": (["c_nationkey"], ["c_custkey"],
                 ("nation", "c_nationkey", "n_nationkey", "n_name")),
    "orders": (["o_orderstatus", "o_orderpriority"], ["o_orderkey"],
               None),
    "lineitem": (["l_returnflag", "l_linestatus", "l_linenumber"],
                 ["l_orderkey", "l_linenumber"], None),
}


def query_case(r):
    fact = r.choice(list(QTABLES))
    group_cols, agg_cols, join = QTABLES[fact]
    gcol = r.choice(group_cols)
    acol = r.choice(agg_cols)
    select = [gcol]
    frm = fact
    if join is not None and r.random() < 0.5:
        dim, fk, dk, dcol = join
        frm = f"{fact} JOIN {dim} ON {fk} = {dk}"
        if r.random() < 0.5:
            gcol = dcol
            select = [dcol]
    aggs = r.sample([
        "CAST(count(*) AS BIGINT) AS cnt",
        f"CAST(sum(CAST({acol} AS BIGINT)) AS BIGINT) AS s",
        f"CAST(min({acol}) AS BIGINT) AS mn",
        f"CAST(max({acol}) AS BIGINT) AS mx",
        f"CAST(count(DISTINCT {acol}) AS BIGINT) AS dc",
    ], r.randint(1, 3))
    where = ""
    if r.random() < 0.6:
        m = r.randint(2, 7)
        where = f" WHERE {acol} % {m} = {r.randint(0, m - 1)}"
    having = ""
    if r.random() < 0.35:
        having = f" HAVING count(*) > {r.randint(0, 3)}"
    return (f"SELECT {', '.join(select + aggs)} FROM {frm}{where} "
            f"GROUP BY {gcol}{having} ORDER BY {gcol}")


def gen_query_family(name, n, seed):
    r = random.Random(seed)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    seen = set()
    out = [f"# {name}.slt — generated by tools/fuzz_slt.py "
           f"(seed {seed}, n {n})",
           "# do not edit by hand; regenerate instead", ""]
    made = 0
    dup_streak = 0
    while made < n:
        sql = query_case(r)
        if sql in seen:
            dup_streak += 1
            if dup_streak > 2000:
                print(f"{name}: grammar exhausted at {made} < {n}")
                break
            continue
        dup_streak = 0
        seen.add(sql)
        rows = con.execute(sql).fetchall()
        if not (0 < len(rows) <= 40):
            continue
        out += ["query", sql, "----"]
        for row in rows:
            line = "\t".join("NULL" if v is None else str(v) for v in row)
            assert line != "", sql
            out.append(line)
        out.append("")
        made += 1
    with open(f"{OUT}/{name}.slt", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"{name}: {made} cases")


# ── date fuzzing (pair-emitting: Spark and DuckDB spell date
#    arithmetic differently; the --duck-- section records both) ───────

def rand_date(r):
    import datetime as dt
    base = dt.date(2020, 1, 1)
    return base + dt.timedelta(days=r.randint(0, 2557))  # through 2026


def date_case(r):
    """Returns (spark_sql, duck_sql)."""
    d = rand_date(r)
    lit = f"DATE '{d.isoformat()}'"
    k = r.random()
    if k < 0.22:
        n = r.randint(-900, 900)
        return (f"SELECT date_add({lit}, {n}) AS v",
                f"SELECT {lit} + {n} AS v")
    if k < 0.36:
        d2 = rand_date(r)
        lit2 = f"DATE '{d2.isoformat()}'"
        return (f"SELECT CAST(datediff({lit}, {lit2}) AS BIGINT) AS v",
                f"SELECT CAST({lit} - {lit2} AS BIGINT) AS v")
    if k < 0.50:
        n = r.randint(-30, 30)
        return (f"SELECT add_months({lit}, {n}) AS v",
                f"SELECT CAST({lit} + {n} * INTERVAL 1 MONTH AS DATE) AS v")
    if k < 0.60:
        return (f"SELECT last_day({lit}) AS v", f"SELECT last_day({lit}) AS v")
    if k < 0.74:
        unit = r.choice(["YEAR", "MONTH", "WEEK", "QUARTER"])
        return (f"SELECT CAST(date_trunc('{unit}', {lit}) AS DATE) AS v",
                f"SELECT CAST(date_trunc('{unit}', {lit}) AS DATE) AS v")
    if k < 0.92:
        field = r.choice(["YEAR", "MONTH", "DAY", "QUARTER", "WEEK", "DOY"])
        return (f"SELECT CAST(extract({field} FROM {lit}) AS BIGINT) AS v",
                f"SELECT CAST(extract({field} FROM {lit}) AS BIGINT) AS v")
    n = r.randint(-5, 5)
    return (f"SELECT CAST(date_add(add_months({lit}, {n}), {n * 7}) AS "
            f"STRING) AS v",
            f"SELECT CAST(CAST({lit} + {n} * INTERVAL 1 MONTH AS DATE) "
            f"+ {n * 7} AS VARCHAR) AS v")


def gen_query_pair_family(name, make_case, n, seed):
    """gen_pair_family, but with the testdata views registered (for
    table-reading pair cases)."""
    r = random.Random(seed)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    _emit_pairs(name, make_case, n, r, con)


def fmt_scalar(v):
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (float, decimal.Decimal)):
        # HALF_UP on the exact binary expansion == SltSpec's
        # BigDecimal.setScale(4, HALF_UP) (same rule as gen_slt.fmt)
        return str(decimal.Decimal(v).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP))
    return str(v)


def gen_pair_family(name, make_case, n, seed):
    _emit_pairs(name, make_case, n, random.Random(seed), duckdb.connect())


def _emit_pairs(name, make_case, n, r, con):
    seen = set()
    out = [f"# {name}.slt — generated by tools/fuzz_slt.py (n {n})",
           "# do not edit by hand; regenerate instead", ""]
    made = 0
    dup_streak = 0
    while made < n:
        spark_sql, duck_sql = make_case(r)
        if spark_sql in seen:
            # a finite grammar (e.g. the subquery shapes) can have fewer
            # unique texts than n — emit what exists instead of spinning
            dup_streak += 1
            if dup_streak > 2000:
                print(f"{name}: grammar exhausted at {made} < {n}")
                break
            continue
        dup_streak = 0
        seen.add(spark_sql)
        rows = con.execute(duck_sql).fetchall()
        if not (0 < len(rows) <= 40):  # e.g. HAVING filtered everything
            continue
        out.append("query")
        out.append(spark_sql)
        if duck_sql != spark_sql:
            out += ["--duck--", duck_sql]
        out.append("----")
        for row in rows:
            line = "\t".join(fmt_scalar(v) for v in row)
            assert line != "", duck_sql
            out.append(line)
        out.append("")
        made += 1
    with open(f"{OUT}/{name}.slt", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"{name}: {made} cases")


# ── int-array fuzzing (dual-rendered: Spark and DuckDB array fns
#    differ in name AND convention — slice takes (start, LENGTH) in
#    Spark vs (start, END-INCLUSIVE) in DuckDB; outputs are wrapped in
#    sort_array/list_sort so order-unstable ops stay comparable) ──────

def array_expr(r, depth):
    """Returns (spark_text, duck_text) for an int-array expression."""
    if depth <= 0 or r.random() < 0.25:
        vals = [r.randint(-4, 9) for _ in range(r.randint(1, 4))]
        return (f"array({', '.join(map(str, vals))})",
                f"[{', '.join(map(str, vals))}]")
    k = r.random()
    s1, d1 = array_expr(r, depth - 1)
    if k < 0.16:
        s2, d2 = array_expr(r, depth - 1)
        return (f"concat({s1}, {s2})", f"list_concat({d1}, {d2})")
    if k < 0.30:
        n = r.randint(-3, 3)
        return (f"transform({s1}, x -> x + {n})",
                f"list_transform({d1}, x -> x + {n})")
    if k < 0.44:
        m = r.randint(2, 3)
        return (f"filter({s1}, x -> x % {m} = 0)",
                f"list_filter({d1}, x -> x % {m} = 0)")
    if k < 0.56:
        v = r.randint(-4, 9)
        return (f"array_remove({s1}, {v})",
                f"list_filter({d1}, x -> x <> {v})")
    if k < 0.68:
        start, ln = r.randint(1, 3), r.randint(0, 3)
        return (f"slice({s1}, {start}, {ln})",
                f"list_slice({d1}, {start}, {start + ln - 1})")
    return (f"reverse({s1})", f"list_reverse({d1})")


def array_case(r):
    s, d = array_expr(r, 3)
    k = r.random()
    if k < 0.20:
        return (f"SELECT CAST(size({s}) AS BIGINT) AS v",
                f"SELECT CAST(len({d}) AS BIGINT) AS v")
    # order-UNSTABLE ops (array_union/array_distinct: DuckDB's
    # list_distinct scrambles order) are only generated here, directly
    # under the sort wrapper, so their order never feeds another op
    if k < 0.35:
        s2, d2 = array_expr(r, 2)
        return (f"SELECT sort_array(array_union({s}, {s2})) AS v",
                f"SELECT list_sort(list_distinct(list_concat({d}, {d2})))"
                f" AS v")
    if k < 0.45:
        return (f"SELECT sort_array(array_distinct({s})) AS v",
                f"SELECT list_sort(list_distinct({d})) AS v")
    return (f"SELECT sort_array({s}) AS v", f"SELECT list_sort({d}) AS v")


# ── aggregate / window fuzzing over inline VALUES tables (the
#    reference's densest slt areas). Spark spells the derived table
#    `FROM VALUES ... AS t(...)`, DuckDB `FROM (VALUES ...) t(...)` ──

def values_table(r, ncols, nrows, null_frac=0.15):
    rows = []
    for _ in range(nrows):
        row = []
        for c in range(ncols):
            if c > 0 and r.random() < null_frac:
                row.append("NULL")
            else:
                row.append(str(r.randint(-5, 9)))
        rows.append("(" + ", ".join(row) + ")")
    return ", ".join(rows)


AGG_EXPRS = [
    "CAST(count(*) AS BIGINT) AS cnt",
    "CAST(count(x) AS BIGINT) AS cx",
    "CAST(count(DISTINCT x) AS BIGINT) AS dx",
    "CAST(sum(x) AS BIGINT) AS sx",
    "CAST(min(x) AS BIGINT) AS mn",
    "CAST(max(x) AS BIGINT) AS mx",
    "round(avg(x) + 1e-9, 4) AS ax",
    "CAST(sum(x) FILTER (WHERE x > 0) AS BIGINT) AS spos",
    "CAST(count(*) FILTER (WHERE x IS NULL) AS BIGINT) AS cnull",
]


def agg_case(r):
    k = r.random()
    if k < 0.25:
        # two group keys (second NULL-bearing) — composite-key hashing
        vals = values_table(r, 3, r.randint(4, 10))
        aggs = r.sample(AGG_EXPRS, r.randint(1, 3))
        body = (f"SELECT g, h, {', '.join(aggs)} FROM {{src}} "
                f"GROUP BY g, h ORDER BY g, h NULLS FIRST")
        return (body.format(src=f"VALUES {vals} AS t(g, h, x)"),
                body.format(src=f"(VALUES {vals}) t(g, h, x)"))
    if k < 0.40:
        # expression group key: the key is computed, not a column
        vals = values_table(r, 2, r.randint(4, 10))
        m = r.randint(2, 3)
        aggs = r.sample(AGG_EXPRS, r.randint(1, 3))
        body = (f"SELECT g % {m} AS gm, {', '.join(aggs)} FROM {{src}} "
                f"GROUP BY g % {m} ORDER BY gm NULLS FIRST")
        return (body.format(src=f"VALUES {vals} AS t(g, x)"),
                body.format(src=f"(VALUES {vals}) t(g, x)"))
    vals = values_table(r, 2, r.randint(3, 10))
    aggs = r.sample(AGG_EXPRS, r.randint(1, 4))
    having = ""
    if r.random() < 0.3:
        having = f" HAVING count(*) > {r.randint(0, 2)}"
    body = (f"SELECT g, {', '.join(aggs)} FROM {{src}} "
            f"GROUP BY g{having} ORDER BY g")
    return (body.format(src=f"VALUES {vals} AS t(g, x)"),
            body.format(src=f"(VALUES {vals}) t(g, x)"))


def window_case(r):
    n = r.randint(4, 9)
    # i is a UNIQUE 0..n-1 ordering column (shuffled into the VALUES so
    # physical order differs from logical); x may tie and be NULL
    idx = list(range(n))
    r.shuffle(idx)
    rows = ", ".join(
        f"({i}, {r.randint(0, 2)}, "
        f"{'NULL' if r.random() < 0.15 else r.randint(-5, 9)})"
        for i in idx)
    part = r.choice(["", "PARTITION BY g "])
    k = r.random()
    if k < 0.18:
        w = f"CAST(row_number() OVER ({part}ORDER BY i) AS BIGINT)"
    elif k < 0.36:
        fn = r.choice(["rank", "dense_rank"])
        # ties on x are fine: rank values are order-independent
        w = (f"CAST({fn}() OVER ({part}ORDER BY x NULLS FIRST, i) "
             f"AS BIGINT)")
    elif k < 0.50:
        off = r.randint(1, 2)
        fn = r.choice(["lag", "lead"])
        w = f"CAST({fn}(x, {off}) OVER ({part}ORDER BY i) AS BIGINT)"
    elif k < 0.66:
        a, b = r.randint(0, 2), r.randint(0, 2)
        fn = r.choice(["sum", "min", "max"])
        w = (f"CAST({fn}(x) OVER ({part}ORDER BY i ROWS BETWEEN "
             f"{a} PRECEDING AND {b} FOLLOWING) AS BIGINT)")
    elif k < 0.74:
        w = (f"CAST(sum(x) OVER ({part}ORDER BY i ROWS BETWEEN "
             f"UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)")
    elif k < 0.82:
        # RANGE frame on the unique int key; DESC flips offset direction
        a, b = r.randint(0, 3), r.randint(0, 3)
        d = r.choice(["", "DESC "])
        fn = r.choice(["sum", "count", "min"])
        arg = "x" if fn != "count" else "*"
        w = (f"CAST({fn}({arg}) OVER ({part}ORDER BY i {d}RANGE BETWEEN "
             f"{a} PRECEDING AND {b} FOLLOWING) AS BIGINT)")
    elif k < 0.88:
        # ROWS frame under DESC ordering
        a = r.randint(0, 2)
        w = (f"CAST(max(x) OVER ({part}ORDER BY i DESC ROWS BETWEEN "
             f"{a} PRECEDING AND CURRENT ROW) AS BIGINT)")
    elif k < 0.94:
        w = f"CAST(ntile({r.randint(2, 4)}) OVER (ORDER BY i) AS BIGINT)"
    else:
        w = (f"round(cume_dist() OVER ({part}ORDER BY x NULLS FIRST, i)"
             f" + 1e-9, 4)")
    body = f"SELECT i, {w} AS w FROM {{src}} ORDER BY i"
    return (body.format(src=f"VALUES {rows} AS t(i, g, x)"),
            body.format(src=f"(VALUES {rows}) t(i, g, x)"))


# ── set-op and join fuzzing over inline VALUES tables ────────────────

def setop_case(r):
    a = values_table(r, 2, r.randint(2, 6), null_frac=0.2)
    b = values_table(r, 2, r.randint(2, 6), null_frac=0.2)
    op = r.choice(["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
                   "EXCEPT", "EXCEPT ALL"])
    body = (f"SELECT * FROM (SELECT g, x FROM {{a}} {op} "
            f"SELECT g, x FROM {{b}}) s "
            f"ORDER BY g NULLS FIRST, x NULLS FIRST")
    return (body.format(a=f"VALUES {a} AS t1(g, x)",
                        b=f"VALUES {b} AS t2(g, x)"),
            body.format(a=f"(VALUES {a}) t1(g, x)",
                        b=f"(VALUES {b}) t2(g, x)"))


def join_case(r):
    a = values_table(r, 2, r.randint(2, 6), null_frac=0.25)
    b = values_table(r, 2, r.randint(2, 6), null_frac=0.25)
    if r.random() < 0.25:
        # SEMI/ANTI tier: Spark's join syntax vs the portable
        # EXISTS/NOT EXISTS spelling on the DuckDB side. NULL keys never
        # match, so ANTI KEEPS null-key rows (unlike NOT IN)
        semi = r.random() < 0.5
        kind = "LEFT SEMI JOIN" if semi else "LEFT ANTI JOIN"
        neg = "" if semi else "NOT "
        spark_q = (f"SELECT t1.g AS g1, t1.x AS x1 "
                   f"FROM VALUES {a} AS t1(g, x) {kind} "
                   f"VALUES {b} AS t2(g, x) ON t1.g = t2.g "
                   f"ORDER BY g1 NULLS FIRST, x1 NULLS FIRST")
        duck_q = (f"SELECT t1.g AS g1, t1.x AS x1 "
                  f"FROM (VALUES {a}) t1(g, x) "
                  f"WHERE {neg}EXISTS (SELECT 1 FROM (VALUES {b}) t2(g, x) "
                  f"WHERE t1.g = t2.g) "
                  f"ORDER BY g1 NULLS FIRST, x1 NULLS FIRST")
        return (spark_q, duck_q)
    jt = r.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
    # NULL keys never match (three-valued =) — the draw rate makes
    # unmatched rows common on both sides
    extra = ""
    if r.random() < 0.3:
        extra = f" AND t1.x > {r.randint(-2, 2)}"
    body = (f"SELECT t1.g AS g1, t1.x AS x1, t2.g AS g2, t2.x AS x2 "
            f"FROM {{a}} {jt} {{b}} ON t1.g = t2.g{extra} "
            f"ORDER BY g1 NULLS FIRST, x1 NULLS FIRST, "
            f"g2 NULLS FIRST, x2 NULLS FIRST")
    return (body.format(a=f"VALUES {a} AS t1(g, x)",
                        b=f"VALUES {b} AS t2(g, x)"),
            body.format(a=f"(VALUES {a}) t1(g, x)",
                        b=f"(VALUES {b}) t2(g, x)"))


# ── map fuzzing (Spark map('k', v, ...) vs DuckDB MAP {'k': v};
#    DuckDB map[k] yields a LIST — unwrap with [1]; missing key is []
#    which unwraps to NULL, matching Spark's element_at miss) ──────────

def map_literal(r, keys):
    vals = [r.randint(-5, 9) for _ in keys]
    spark = "map(" + ", ".join(
        f"'{k}', {v}" for k, v in zip(keys, vals)) + ")"
    duck = "MAP {" + ", ".join(
        f"'{k}': {v}" for k, v in zip(keys, vals)) + "}"
    return spark, duck


def map_case(r):
    pool = list("abcde")
    r.shuffle(pool)
    nk = r.randint(1, 4)
    keys = pool[:nk]
    s, d = map_literal(r, keys)
    k = r.random()
    if k < 0.30:
        probe = r.choice(pool)  # may hit or miss
        return (f"SELECT element_at({s}, '{probe}') AS v",
                f"SELECT ({d})['{probe}'][1] AS v")
    if k < 0.45:
        return (f"SELECT sort_array(map_keys({s})) AS v",
                f"SELECT list_sort(map_keys({d})) AS v")
    if k < 0.60:
        return (f"SELECT sort_array(map_values({s})) AS v",
                f"SELECT list_sort(map_values({d})) AS v")
    if k < 0.72:
        return (f"SELECT CAST(size({s}) AS BIGINT) AS v",
                f"SELECT CAST(cardinality({d}) AS BIGINT) AS v")
    # concat of DISJOINT maps (Spark's default dedup policy errors on
    # duplicate keys), then probe one side
    rest = pool[nk:]
    if not rest:
        rest = ["z"]
    nk2 = r.randint(1, len(rest))
    s2, d2 = map_literal(r, rest[:nk2])
    probe = r.choice(keys + rest[:nk2])
    return (f"SELECT element_at(map_concat({s}, {s2}), '{probe}') AS v",
            f"SELECT (map_concat({d}, {d2}))['{probe}'][1] AS v")


# ── struct + subquery fuzzing ────────────────────────────────────────

def struct_expr(r, depth):
    """Nested int-leaf struct; returns (spark_text, duck_text, paths)
    where paths is the list of dotted field paths to int leaves."""
    fields = []
    n = r.randint(1, 3)
    names = r.sample(list("pqrs"), n)
    sparks, ducks, paths = [], [], []
    for nm in names:
        if depth > 0 and r.random() < 0.35:
            s, d, sub = struct_expr(r, depth - 1)
            sparks.append(f"'{nm}', {s}")
            ducks.append(f"'{nm}': {d}")
            paths += [f"{nm}.{p}" for p in sub]
        else:
            v = r.randint(-5, 9)
            sparks.append(f"'{nm}', {v}")
            ducks.append(f"'{nm}': {v}")
            paths.append(nm)
    return ("named_struct(" + ", ".join(sparks) + ")",
            "{" + ", ".join(ducks) + "}", paths)


def struct_case(r):
    s, d, paths = struct_expr(r, 2)
    p = r.choice(paths)
    return (f"SELECT CAST({s}.{p} AS BIGINT) AS v",
            f"SELECT CAST(({d}).{p} AS BIGINT) AS v")


def subquery_case(r):
    """Correlated / IN / EXISTS / scalar subqueries over nation+region+
    supplier (all non-null keys, so NOT IN stays two-valued)."""
    k = r.random()
    cutoff = r.randint(0, 4)
    if k < 0.25:
        neg = r.choice(["", "NOT "])
        q = (f"SELECT n_name FROM nation WHERE n_regionkey {neg}IN "
             f"(SELECT r_regionkey FROM region WHERE r_regionkey "
             f"<= {cutoff}) ORDER BY n_name")
    elif k < 0.50:
        neg = r.choice(["", "NOT "])
        q = (f"SELECT r_name FROM region r WHERE {neg}EXISTS "
             f"(SELECT 1 FROM nation n WHERE n.n_regionkey = "
             f"r.r_regionkey AND n.n_nationkey > {r.randint(0, 24)}) "
             f"ORDER BY r_name")
    elif k < 0.70:
        q = (f"SELECT n_name, CAST((SELECT count(*) FROM supplier s "
             f"WHERE s.s_nationkey = nation.n_nationkey) AS BIGINT) "
             f"AS ns FROM nation WHERE n_regionkey = {cutoff} "
             f"ORDER BY n_name")
    elif k < 0.85:
        agg = r.choice(["min", "max"])
        q = (f"SELECT n_name FROM nation WHERE n_nationkey "
             f"{r.choice(['<', '>'])} (SELECT {agg}(n_regionkey) + "
             f"{r.randint(1, 9)} FROM nation) ORDER BY n_name")
    else:
        # DIALECT GAP: Spark has no quantified ALL/ANY(subquery) — the
        # pair pins the min/max emulation against DuckDB's native form
        # (subquery is never empty here; the empty-set edge diverges)
        cmp_ = r.choice(["<", ">="])
        nk = r.randint(2, 12)
        op, agg = (("ALL", "max") if cmp_ == ">=" else ("ANY", "max")
                   ) if r.random() < 0.5 else (
                   ("ALL", "min") if cmp_ == "<" else ("ANY", "min"))
        # >= ALL == >= max; < ANY == < max; <  ALL == < min; >= ANY == >= min
        agg = {"(>= , ALL)": "max", "(< , ANY)": "max",
               "(< , ALL)": "min", "(>= , ANY)": "min"}[
                   f"({cmp_} , {op})"]
        sub = f"SELECT n_regionkey FROM nation WHERE n_nationkey <= {nk}"
        spark_q = (f"SELECT r_name FROM region WHERE r_regionkey {cmp_} "
                   f"(SELECT {agg}(n_regionkey) FROM nation WHERE "
                   f"n_nationkey <= {nk}) ORDER BY r_name")
        duck_q = (f"SELECT r_name FROM region WHERE r_regionkey {cmp_} "
                  f"{op} ({sub}) ORDER BY r_name")
        return (spark_q, duck_q)
    return (q, q)


# ── grouping-sets fuzzing: CUBE/ROLLUP/GROUPING SETS over VALUES
#    tables with NULL-bearing group keys. grouping(g) columns pin the
#    data-NULL vs total-row distinction; ORDER BY covers all columns so
#    the multi-grouping output order is fully determined ───────────────

def groupsets_case(r):
    vals = values_table(r, 3, r.randint(4, 9), null_frac=0.2)
    spec = r.choice([
        "CUBE (g1, g2)",
        "ROLLUP (g1, g2)",
        "GROUPING SETS ((g1), (g2))",
        "GROUPING SETS ((g1, g2), (g1), ())",
        "GROUPING SETS ((g1), (g1, g2))",
    ])
    aggs = r.sample([
        "CAST(count(*) AS BIGINT) AS cnt",
        "CAST(sum(x) AS BIGINT) AS sx",
        "CAST(count(x) AS BIGINT) AS cx",
        "CAST(min(x) AS BIGINT) AS mn",
    ], r.randint(1, 3))
    body = (f"SELECT g1, g2, CAST(grouping(g1) AS BIGINT) AS gg1, "
            f"CAST(grouping(g2) AS BIGINT) AS gg2, {', '.join(aggs)} "
            f"FROM {{src}} GROUP BY {spec} "
            f"ORDER BY gg1, gg2, g1 NULLS FIRST, g2 NULLS FIRST")
    return (body.format(src=f"VALUES {vals} AS t(g1, g2, x)"),
            body.format(src=f"(VALUES {vals}) t(g1, g2, x)"))


# ── higher-order-function fuzzing: lambda pipelines over int-array
#    literals. Spark transform/filter/aggregate vs DuckDB list_*; the
#    fold is pinned via list_reduce with the init prepended (DuckDB's
#    list_reduce has no init parameter), and Spark's 0-based lambda
#    index vs DuckDB's 1-based is aligned with an explicit -1 ─────────

def hof_array(r, with_nulls=True):
    vals = [("NULL" if with_nulls and r.random() < 0.12
             else str(r.randint(-4, 9)))
            for _ in range(r.randint(1, 5))]
    return (f"array({', '.join(vals)})", f"[{', '.join(vals)}]")


def hof_chain(r, depth, with_nulls=True):
    """A transform/filter pipeline; returns (spark, duck)."""
    s, d = hof_array(r, with_nulls)
    for _ in range(depth):
        k = r.random()
        if k < 0.40:
            c = r.randint(-3, 3)
            op = r.choice(["+", "-", "*"])
            s = f"transform({s}, x -> x {op} {c})"
            d = f"list_transform({d}, x -> x {op} {c})"
        elif k < 0.65:
            c = r.randint(-2, 6)
            cmp_ = r.choice(["<", ">", "<=", ">="])
            s = f"filter({s}, x -> x {cmp_} {c})"
            d = f"list_filter({d}, x -> x {cmp_} {c})"
        else:
            # indexed transform: Spark i is 0-based, DuckDB 1-based
            s = f"transform({s}, (x, i) -> x + i)"
            d = f"list_transform({d}, (x, i) -> x + (i - 1))"
    return s, d


def hof_case(r):
    k = r.random()
    if k < 0.40:
        # fold to a scalar: aggregate(init, +|*) ≡ list_reduce(prepend)
        s, d = hof_chain(r, r.randint(0, 2))
        init = r.randint(-2, 3)
        op = r.choice(["+", "*"])
        return (f"SELECT CAST(aggregate({s}, {init}, "
                f"(acc, x) -> acc {op} x) AS BIGINT) AS v",
                f"SELECT CAST(list_reduce(list_prepend({init}, {d}), "
                f"(acc, x) -> acc {op} x) AS BIGINT) AS v")
    if k < 0.60:
        # exists/forall via DuckDB bool-fold emulation (NULL-free
        # elements: the three-valued NULL edge is pinned by the
        # hand-written hof_lambda_dense family instead)
        s, d = hof_chain(r, r.randint(0, 2), with_nulls=False)
        c = r.randint(-2, 6)
        if r.random() < 0.5:
            return (f"SELECT exists({s}, x -> x > {c}) AS v",
                    f"SELECT coalesce(list_bool_or(list_transform({d}, "
                    f"x -> x > {c})), false) AS v")
        return (f"SELECT forall({s}, x -> x > {c}) AS v",
                f"SELECT coalesce(list_bool_and(list_transform({d}, "
                f"x -> x > {c})), true) AS v")
    if k < 0.80:
        # ordered output of the whole pipeline
        s, d = hof_chain(r, r.randint(1, 3))
        return (f"SELECT sort_array({s}) AS v",
                f"SELECT list_sort({d}, 'ASC', 'NULLS FIRST') AS v")
    # zip_with over same-length literals (padding edge is hand-pinned)
    n = r.randint(1, 4)
    a = [str(r.randint(-4, 9)) for _ in range(n)]
    b = [str(r.randint(-4, 9)) for _ in range(n)]
    op = r.choice(["+", "*", "-"])
    sa, sb = f"array({', '.join(a)})", f"array({', '.join(b)})"
    da, db = f"[{', '.join(a)}]", f"[{', '.join(b)}]"
    return (f"SELECT zip_with({sa}, {sb}, (a, b) -> a {op} b) AS v",
            f"SELECT list_transform(range(1, {n + 1}), "
            f"i -> ({da})[i] {op} ({db})[i]) AS v")


# ── decimal arithmetic fuzzing: +,-,* chains over DECIMAL(4,s)
#    literals; the final value is cast to a FIXED (30,10) scale on both
#    sides so precision-propagation differences in intermediate types
#    can't leak into the rendering (propagation RULES are pinned by the
#    hand-written decimal_propagation family; this pins VALUES) ───────

def dec_expr(r, depth):
    if depth <= 0 or r.random() < 0.30:
        s = r.choice([0, 1, 2])
        whole = r.randint(-9, 9)
        frac = r.randint(0, 10 ** s - 1) if s else 0
        txt = f"{whole}.{str(frac).zfill(s)}" if s else str(whole)
        return f"CAST({txt} AS DECIMAL(4,{s}))"
    op = r.choice(["+", "-", "*"])
    return f"({dec_expr(r, depth - 1)} {op} {dec_expr(r, depth - 1)})"


def dec_case(r):
    e = dec_expr(r, r.randint(1, 3))
    return (f"SELECT CAST(CAST({e} AS DECIMAL(30,10)) AS STRING) AS v",
            f"SELECT CAST(CAST({e} AS DECIMAL(30,10)) AS VARCHAR) AS v")


# ── cast-chain fuzzing: value-preserving conversions among int/
#    bigint/double/string/boolean. The one deliberate divergence —
#    double→int is trunc-toward-zero in Spark (ANSI) but ROUND in
#    DuckDB — is aligned by wrapping the DuckDB side in trunc() ───────

def cast_case(r):
    v = r.randint(-99, 99)
    spark, duck = str(v), str(v)
    is_double = False
    for _ in range(r.randint(1, 4)):
        k = r.random()
        if k < 0.20:
            spark = f"CAST({spark} AS BIGINT)"
            duck = (f"CAST(trunc({duck}) AS BIGINT)" if is_double
                    else f"CAST({duck} AS BIGINT)")
            is_double = False
        elif k < 0.40:
            half = r.choice(["0", "5"])  # exactly representable
            spark = f"(CAST({spark} AS DOUBLE) + 0.{half})"
            duck = f"(CAST({duck} AS DOUBLE) + 0.{half})"
            is_double = True
        elif k < 0.60:
            spark = f"CAST({spark} AS INT)"
            duck = (f"CAST(trunc({duck}) AS INT)" if is_double
                    else f"CAST({duck} AS INT)")
            is_double = False
        elif k < 0.80:
            # string round-trip only from exact-int states
            if not is_double:
                spark = f"CAST(CAST({spark} AS STRING) AS INT)"
                duck = f"CAST(CAST({duck} AS VARCHAR) AS INT)"
        else:
            spark = f"(CAST(CAST({spark} AS BOOLEAN) AS INT) + {v})"
            duck = f"(CAST(CAST({duck} AS BOOLEAN) AS INT) + {v})"
            is_double = False
    if is_double:
        return (f"SELECT round(CAST({spark} AS DOUBLE), 4) AS v",
                f"SELECT round(CAST({duck} AS DOUBLE), 4) AS v")
    return (f"SELECT CAST({spark} AS BIGINT) AS v",
            f"SELECT CAST({duck} AS BIGINT) AS v")


# ── null-ordering fuzzing: ASC/DESC × NULLS FIRST/LAST × LIMIT/OFFSET
#    over NULL-bearing VALUES. The directives are ALWAYS explicit —
#    Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST, so the
#    bare form is exactly the non-portable surface (pinned by hand in
#    null_sort.slt). A unique tiebreak column keeps LIMIT cuts exact ───

def nullsort_case(r):
    n = r.randint(4, 9)
    rows = []
    for i in range(n):
        v = "NULL" if r.random() < 0.3 else str(r.randint(-3, 3))
        rows.append(f"({v}, {i})")
    vals = ", ".join(rows)
    d1 = r.choice(["ASC", "DESC"])
    nd = r.choice(["NULLS FIRST", "NULLS LAST"])
    lim = ""
    if r.random() < 0.5:
        lim = f" LIMIT {r.randint(1, n)}"
        if r.random() < 0.5:
            lim += f" OFFSET {r.randint(0, 3)}"
    body = (f"SELECT v, t FROM {{src}} "
            f"ORDER BY v {d1} {nd}, t{lim}")
    return (body.format(src=f"VALUES {vals} AS s(v, t)"),
            body.format(src=f"(VALUES {vals}) s(v, t)"))


def main():
    gen_family(
        "fuzz_int",
        lambda r: f"SELECT CAST({int_expr(r, 4)} AS BIGINT) AS v",
        N, SEED)
    gen_family(
        "fuzz_bool",
        lambda r: f"SELECT {bool_expr(r, 3)} AS v",
        N, SEED + 1)
    gen_family(
        "fuzz_string",
        lambda r: f"SELECT concat('<', {str_expr(r, 4)}, '>') AS v",
        N, SEED + 2)
    gen_query_family("fuzz_query", N // 2, SEED + 3)
    gen_pair_family("fuzz_date", date_case, N, SEED + 4)
    gen_pair_family("fuzz_array", array_case, N, SEED + 5)
    gen_pair_family("fuzz_agg", agg_case, N // 2, SEED + 6)
    gen_pair_family("fuzz_window", window_case, N // 2, SEED + 7)
    gen_pair_family("fuzz_setop", setop_case, N // 2, SEED + 8)
    gen_pair_family("fuzz_join", join_case, N // 2, SEED + 9)
    gen_pair_family("fuzz_map", map_case, N // 2, SEED + 10)
    gen_pair_family("fuzz_struct", struct_case, N // 2, SEED + 11)
    gen_query_pair_family("fuzz_subquery", subquery_case, N // 2,
                          SEED + 12)
    gen_pair_family("fuzz_hof", hof_case, N // 2, SEED + 13)
    gen_pair_family("fuzz_decimal", dec_case, N // 2, SEED + 14)
    gen_pair_family("fuzz_cast", cast_case, N // 2, SEED + 15)
    gen_pair_family("fuzz_groupsets", groupsets_case, N // 2, SEED + 16)
    gen_pair_family("fuzz_nullsort", nullsort_case, N // 2, SEED + 17)


if __name__ == "__main__":
    main()
