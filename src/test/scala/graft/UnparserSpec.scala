package graft

import graft.plans.Unparser
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LogicalPlan → SQL unparser round-trips: for each DataFrame shape,
  * the generated SQL re-executed through spark.sql must reproduce the
  * original rows exactly (reference contract: plan_to_sql —
  * datafusion/sql/src/unparser/). */
class UnparserSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = {
    val s = SparkTestSession.spark
    Engine.registerAll(s, sf)
    s
  }

  private def roundtrip(df: DataFrame): Unit = {
    val sql = Unparser.toSql(df)
    val again = spark.sql(sql)
    val a = df.collect().map(_.toSeq).groupBy(identity).map {
      case (k, v) => k -> v.length }
    val b = again.collect().map(_.toSeq).groupBy(identity).map {
      case (k, v) => k -> v.length }
    assert(a == b, s"round-trip mismatch for:\n$sql")
  }

  test("project + filter + sort + limit round-trips") {
    roundtrip(spark.table("orders")
      .filter(col("o_totalprice") > 100000)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
      .limit(25))
  }

  test("aggregate with grouping round-trips") {
    roundtrip(spark.table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q")))
  }

  test("global aggregate (no grouping) round-trips") {
    roundtrip(spark.table("orders")
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("mx")))
  }

  test("having (filter over aggregate) round-trips") {
    roundtrip(spark.table("orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 100))
  }

  test("joins of all basic types round-trip") {
    val n = spark.table("nation")
    val r = spark.table("region")
    roundtrip(n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("n_name"), col("r_name")))
    roundtrip(n.join(r, n("n_regionkey") === r("r_regionkey"), "left")
      .select(col("n_name"), col("r_name")))
    roundtrip(n.join(r, n("n_regionkey") === r("r_regionkey"), "left_semi")
      .select(col("n_name")))
    roundtrip(n.join(r, n("n_regionkey") === r("r_regionkey") &&
        r("r_name") === "EUROPE", "left_anti")
      .select(col("n_name")))
  }

  test("distinct and set operations round-trip") {
    val o = spark.table("orders")
    roundtrip(o.select(col("o_orderstatus")).distinct())
    val a = o.filter(col("o_orderkey") < 100).select(col("o_orderkey"))
    val b = o.filter(col("o_orderkey") < 50).select(col("o_orderkey"))
    roundtrip(a.unionAll(b))
    roundtrip(a.intersect(b))
    roundtrip(a.except(b))
  }

  test("nested composition round-trips") {
    roundtrip(spark.table("lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
      .filter(col("rev") > 1000)
      .orderBy(col("rev").desc)
      .limit(10))
  }

  test("window functions round-trip") {
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
    roundtrip(spark.table("orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .withColumn("rn", row_number().over(w))
      .withColumn("run",
        sum(col("o_orderkey")).over(w.rowsBetween(W.unboundedPreceding, 0))))
  }

  test("EXISTS / NOT EXISTS subqueries round-trip (SQL-built plans)") {
    roundtrip(spark.sql(
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_totalprice > 300000)""".stripMargin))
    roundtrip(spark.sql(
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey)""".stripMargin))
  }

  test("IN / NOT IN subqueries round-trip") {
    roundtrip(spark.sql(
      """SELECT n_name FROM nation
        |WHERE n_regionkey IN (SELECT r_regionkey FROM region
        |                      WHERE r_name IN ('ASIA', 'EUROPE'))""".stripMargin))
    roundtrip(spark.sql(
      """SELECT s_name FROM supplier
        |WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation
        |                          WHERE n_regionkey = 0)""".stripMargin))
  }

  test("scalar subqueries round-trip, incl. under arithmetic") {
    roundtrip(spark.sql(
      """SELECT o_orderkey FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
        |""".stripMargin))
    roundtrip(spark.sql(
      "SELECT (SELECT count(*) FROM region) AS n_regions"))
  }

  test("GROUPING SETS round-trips and renders explicit GROUPING SETS text") {
    val df = spark.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |                        (o_orderpriority), ())""".stripMargin)
    val sql = Unparser.toSql(df)
    assert(sql.contains("GROUPING SETS"), sql)
    roundtrip(df)
  }

  test("ROLLUP and CUBE round-trip via the grouping-sets expansion") {
    roundtrip(spark.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |""".stripMargin))
    roundtrip(spark.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |""".stripMargin))
  }

  test("grouping()/grouping_id() outputs raise a named error") {
    val df = spark.sql(
      """SELECT o_orderpriority, grouping(o_orderpriority) AS g, count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderpriority)""".stripMargin)
    val e = intercept[IllegalArgumentException](Unparser.toSql(df))
    assert(e.getMessage.contains("grouping()"), e.getMessage)
  }

  test("PIVOT round-trips and renders a PIVOT clause (DataFrame and SQL built)") {
    val df = spark.table("events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view"))
      .agg(count(lit(1)))
    val sql = Unparser.toSql(df)
    assert(sql.contains("PIVOT"), sql)
    roundtrip(df)
    // sum over a value column, SQL-built
    roundtrip(spark.sql(
      """SELECT * FROM (SELECT event_type, user_id % 5 AS u, value
        |               FROM events)
        |PIVOT (sum(value) FOR event_type
        |       IN ('click' AS click, 'view' AS view))""".stripMargin))
  }

  test("UNION distinct renders with the UNION keyword") {
    val a = spark.table("nation").select(col("n_regionkey").as("k"))
    val b = spark.table("region").select(col("r_regionkey").as("k"))
    val df = a.union(b).distinct()
    val sql = Unparser.toSql(df)
    assert(sql.contains(" UNION ") && !sql.contains("UNION ALL"), sql)
    roundtrip(df)
    roundtrip(spark.sql(
      "SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey FROM region"))
  }

  test("set operations over bare named relations round-trip") {
    val n = spark.table("nation").select(col("n_regionkey"))
    val r = spark.table("region").select(col("r_regionkey").as("n_regionkey"))
    // bare-table children must render as full query terms, not '(nation)'
    roundtrip(spark.table("region").unionAll(spark.table("region")))
    roundtrip(spark.table("region").union(spark.table("region")).distinct())
    roundtrip(n.unionAll(r))
    roundtrip(n.intersect(r))
    roundtrip(n.except(r))
  }

  test("generate/unnest round-trips as LATERAL VIEW") {
    val docs = spark.table("documents").filter(col("doc_id") < 20)
    roundtrip(docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word")))
    roundtrip(docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word"))))
    // OUTER: an empty array keeps the row with NULL under explode_outer
    roundtrip(docs.select(col("doc_id"),
      explode_outer(slice(split(col("text"), " "), lit(1),
        (col("doc_id") % 2).cast("int"))).as("word")))
    // map generator: two output columns from explode of a map
    roundtrip(docs.select(col("doc_id"),
      explode(map(lit("lang"), col("lang"), lit("src"), col("source")))))
    val sql = Unparser.toSql(docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word")))
    assert(sql.contains("LATERAL VIEW"), sql)
  }

  test("raw file scans round-trip via direct-file-query syntax") {
    val df = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_regionkey") <= 2)
      .select(col("n_nationkey"), col("n_name"))
    roundtrip(df)
    val sql = Unparser.toSql(df)
    assert(sql.contains("parquet.`"), sql)
    roundtrip(spark.read.parquet(s"$sf/region.parquet").limit(3))
  }

  test("unsupported nodes raise a named error") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      // a LocalRelation (in-memory rows) has no catalog/file identity
      Unparser.toSql(Seq((1, "a")).toDF("x", "y").limit(1))
    }
    assert(e.getMessage.contains("Unparser"))
  }

  test("optimized plan with filter+fetch over a file scan round-trips") {
    // reference: select_to_sql_recursively re-emits TableScan-level
    // filters/fetch (sql/src/unparser/plan.rs:218) — here they survive
    // optimization as Filter/GlobalLimit nodes and re-emit as
    // WHERE/LIMIT around the direct-file-query term
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 100000)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(10)
    val sql = Unparser.toSql(df.queryExecution.optimizedPlan)
    assert(sql.contains("parquet.`") && sql.contains("LIMIT"), sql)
    val a = df.collect().map(_.toSeq).toSeq
    val b = spark.sql(sql).collect().map(_.toSeq).toSeq
    assert(a == b, s"optimized round-trip mismatch:\n$sql")
  }

  test("same-name equi-join keys re-emit as USING and round-trip") {
    val n = spark.table("nation")
      .select(col("n_name"), col("n_regionkey").as("regionkey"))
    val r = spark.table("region")
      .select(col("r_regionkey").as("regionkey"), col("r_name"))
    // DataFrame Seq-key join (the analyzer's USING encoding)
    val df = n.join(r, Seq("regionkey")).select(col("n_name"), col("r_name"))
    val sql = Unparser.toSql(df)
    assert(sql.contains("USING (`regionkey`)"), sql)
    roundtrip(df)
    // SQL-built USING join
    roundtrip(spark.sql(
      """SELECT n_name, r_name
        |FROM (SELECT n_name, n_regionkey AS rk FROM nation) a
        |JOIN (SELECT r_regionkey AS rk, r_name FROM region) b
        |USING (rk)""".stripMargin))
    // left SEMI with a same-name key also takes the USING path
    roundtrip(n.join(r, Seq("regionkey"), "left_semi"))
    // OUTER joins with differently-named ON keys round-trip as before
    val r2 = spark.table("region")
      .select(col("r_regionkey"), col("r_name"))
    roundtrip(n.join(r2, col("regionkey") === col("r_regionkey"), "left")
      .select(col("n_name"), col("r_name")))
  }

  test("outer USING joins re-emit USING via the merged-key projection") {
    // r12 (verdict #7 — the r11 refusal retired): the analyzer's
    // merged-key Project over the outer equi-join is recognized and
    // re-emitted as USING; unmatched rows on BOTH sides exercise the
    // coalesced key. Keys shifted so neither side covers the other.
    val n = spark.table("nation").filter(col("n_nationkey") < 10)
      .select(col("n_name"), col("n_regionkey").as("regionkey"))
    val r = spark.table("region")
      .select((col("r_regionkey") + 2).as("regionkey"), col("r_name"))
    for (how <- Seq("full", "left", "right")) {
      val df = n.join(r, Seq("regionkey"), how)
      val sql = Unparser.toSql(df)
      assert(sql.contains("USING (`regionkey`)"), s"$how: $sql")
      roundtrip(df)
      // with a projection above (the common shape) too
      roundtrip(n.join(r, Seq("regionkey"), how)
        .select(col("regionkey"), col("n_name")))
    }
    // SQL-built FULL USING over two keys
    roundtrip(spark.sql(
      """SELECT * FROM
        |  (SELECT n_regionkey AS k1, n_nationkey % 2 AS k2, n_name
        |   FROM nation) a
        |FULL JOIN
        |  (SELECT r_regionkey AS k1, r_regionkey % 2 AS k2, r_name
        |   FROM region) b
        |USING (k1, k2)""".stripMargin))
    // a bare outer join whose same-name keys did NOT come from USING
    // (no merged projection above) now renders at root as an aliased
    // qualified-ON join (r13) — both same-named key columns survive
    val bare = n.join(r, n("regionkey") === r("regionkey"), "full")
    val bareSql = Unparser.toSql(bare.queryExecution.analyzed)
    assert(bareSql.contains(" ON "), bareSql)
    roundtrip(bare)
  }

  test("root-level join with same-name keys renders aliased ON (r13)") {
    // USING re-emission would silently narrow the ROOT join's schema
    // (the merged key appears once where the plan's output carries it
    // twice) — r11 refused; r13 renders the root join with derived-
    // table aliases and a QUALIFIED ON, keeping BOTH key columns
    val n = spark.table("nation")
      .select(col("n_name"), col("n_regionkey").as("regionkey"))
    val r = spark.table("region")
      .select(col("r_regionkey").as("regionkey"), col("r_name"))
    val df = n.join(r, n("regionkey") === r("regionkey"))
    val sql = Unparser.toSql(df.queryExecution.analyzed)
    val again = spark.sql(sql)
    // schema fidelity: the duplicate key column is PRESERVED
    assert(again.columns.toSeq == df.columns.toSeq,
      s"schema narrowed: ${again.columns.toSeq} vs ${df.columns.toSeq}\n$sql")
    roundtrip(df)
    // semi/anti and non-equi residuals ride the same path
    roundtrip(n.join(r,
      n("regionkey") === r("regionkey") && r("r_name") =!= "ASIA",
      "left_semi"))
    // a side that ITSELF carries duplicate names (unprojected join
    // below) refuses with the named error — qualified `alias.k` would
    // be ambiguous INSIDE the derived table (r13 review)
    val dupSide = n.join(r, n("regionkey") === r("regionkey"))
    val r2 = spark.table("region")
      .select(col("r_regionkey").as("regionkey"),
        col("r_name").as("r_name2"))
    val e = intercept[IllegalArgumentException] {
      Unparser.toSql(dupSide.join(r2, n("regionkey") === r2("regionkey"))
        .queryExecution.analyzed)
    }
    assert(e.getMessage.contains("side-duplicated"), e.getMessage)
  }

  test("file-scan read options / user csv schema raise named errors") {
    import org.apache.spark.sql.types._
    // options don't survive the format.`path` spelling (r10 ADVICE)
    val tmp = java.nio.file.Files.createTempDirectory("unparse_csv")
    val csv = tmp.resolve("t.csv")
    java.nio.file.Files.write(csv, "a,b\n1,x\n2,y\n".getBytes)
    val withOpt = spark.read.option("header", "true").csv(csv.toString)
    val e1 = intercept[IllegalArgumentException] {
      Unparser.toSql(withOpt.filter(col("a") =!= "0"))
    }
    assert(e1.getMessage.contains("read options"), e1.getMessage)
    // a user-supplied csv schema (non-_cN names, no options) also can't
    // survive — the direct query would revert to _c0/_c1
    val withSchema = spark.read.schema(
      StructType(Seq(StructField("a", StringType),
        StructField("b", StringType)))).csv(csv.toString)
    val e2 = intercept[IllegalArgumentException] {
      Unparser.toSql(withSchema.filter(col("a") =!= "0"))
    }
    assert(e2.getMessage.contains("user-supplied"), e2.getMessage)
    // an option-free csv read (inferred _cN names) still unparses
    val plain = spark.read.csv(csv.toString).limit(1)
    assert(Unparser.toSql(plain).contains("csv.`"))
  }
}
