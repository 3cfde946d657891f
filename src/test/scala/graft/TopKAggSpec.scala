package graft

import graft.plans.{TopKAgg, TopKAggExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  test("topKGroupsByMax == groupBy + orderBy + limit (ranked rows)") {
    val li = Engine.table(spark, sf, "lineitem")
    val got = TopKAgg.topKGroupsByMax(li, Seq("l_partkey"),
        "l_extendedprice", 25, "m")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = li.groupBy(col("l_partkey"))
      .agg(max(col("l_extendedprice")).as("m"))
      .orderBy(col("m").desc_nulls_last, col("l_partkey"))
      .limit(25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exp)
  }

  test("bounded state survives tiny k and ties across partitions") {
    import spark.implicits._
    TopKAgg.register(spark)
    // many duplicate values → boundary ties decided by group asc
    val df = (1 to 1000).map(i => (i.toLong, (i % 7).toDouble))
      .toDF("g", "v").repartition(13)
    val got = TopKAgg.topKGroupsByMax(df, Seq("g"), "v", 5, "m")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = df.groupBy(col("g")).agg(max(col("v")).as("m"))
      .orderBy(col("m").desc_nulls_last, col("g")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exp)
  }

  test("null aggregate values rank last and merge correctly") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double])](
      (1L, None), (1L, Some(5.0)), (2L, None), (3L, Some(1.0)),
      (4L, Some(9.0)), (4L, None)).toDF("g", "v").repartition(3)
    val got = TopKAgg.topKGroupsByMax(df, Seq("g"), "v", 4, "m")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(got == Seq(4L -> Some(9.0), 1L -> Some(5.0), 3L -> Some(1.0),
      2L -> None))
  }

  test("fusion rule rewrites limit-sort-aggregate into TopKAggExec") {
    TopKAgg.register(spark)
    Engine.registerAll(spark, sf)
    val df = spark.sql("""
      SELECT l_partkey, max(l_extendedprice) AS m
      FROM lineitem GROUP BY l_partkey
      ORDER BY m DESC NULLS LAST, l_partkey LIMIT 10""")
    df.collect() // force AQE to finalize the plan
    assert(df.queryExecution.executedPlan.toString.contains("TopKAgg"),
      df.queryExecution.executedPlan.toString)
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = spark.sql("""
      SELECT l_partkey, max(l_extendedprice) AS m
      FROM (SELECT * FROM lineitem) GROUP BY l_partkey""")
      .orderBy(col("m").desc_nulls_last, col("l_partkey")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exp)
  }

  test("topKGroupsByMin == groupBy + orderBy-asc + limit, and rule fires") {
    TopKAgg.register(spark)
    Engine.registerAll(spark, sf)
    val li = Engine.table(spark, sf, "lineitem")
    val got = TopKAgg.topKGroupsByMin(li, Seq("l_partkey"),
        "l_extendedprice", 25, "m")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = li.groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice")).as("m"))
      .orderBy(col("m").asc_nulls_last, col("l_partkey"))
      .limit(25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exp)
    val df = spark.sql("""
      SELECT l_partkey, min(l_extendedprice) AS m
      FROM lineitem GROUP BY l_partkey
      ORDER BY m ASC NULLS LAST, l_partkey LIMIT 10""")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TopKAgg"))
  }

  test("fusion preserves interleaved output column order (agg first)") {
    TopKAgg.register(spark)
    Engine.registerAll(spark, sf)
    val df = spark.sql("""
      SELECT max(l_extendedprice) AS m, l_partkey
      FROM lineitem GROUP BY l_partkey
      ORDER BY m DESC NULLS LAST, l_partkey LIMIT 10""")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TopKAgg"),
      df.queryExecution.executedPlan.toString)
    assert(df.columns.toSeq == Seq("m", "l_partkey"))
    val got = df.collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val exp = spark.sql("""
      SELECT max(l_extendedprice) AS m, l_partkey
      FROM (SELECT * FROM lineitem) GROUP BY l_partkey""")
      .orderBy(col("m").desc_nulls_last, col("l_partkey")).limit(10)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got == exp)
  }

  test("fusion handles SELECT order differing from GROUP BY order") {
    import spark.implicits._
    TopKAgg.register(spark)
    val df = (1 to 300).map(i => (i % 5, i % 11, i.toDouble))
      .toDF("a", "b", "v").repartition(7)
    df.createOrReplaceTempView("swap_t")
    val q = spark.sql("""
      SELECT b, a, max(v) AS m FROM swap_t GROUP BY a, b
      ORDER BY m DESC NULLS LAST LIMIT 6""")
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("TopKAgg"))
    assert(q.columns.toSeq == Seq("b", "a", "m"))
    val got = q.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .toSet
    val exp = spark.sql("""
      SELECT b, a, max(v) AS m FROM (SELECT * FROM swap_t) GROUP BY a, b
      ORDER BY m DESC NULLS LAST LIMIT 6""")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    // boundary ties are nondeterministic without full tiebreaks; the max
    // values must agree and every (b,a,m) row must be a valid top row
    assert(got.map(_._3).toSeq.sorted == exp.map(_._3).toSeq.sorted)
    val all = spark.sql(
      "SELECT b, a, max(v) AS m FROM swap_t GROUP BY a, b")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got.subsetOf(all))
  }

  test("fusion accepts aliased grouping attributes") {
    TopKAgg.register(spark)
    Engine.registerAll(spark, sf)
    val df = spark.sql("""
      SELECT l_partkey AS pk, max(l_extendedprice) AS m
      FROM lineitem GROUP BY l_partkey
      ORDER BY m DESC NULLS LAST, pk LIMIT 10""")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TopKAgg"),
      df.queryExecution.executedPlan.toString)
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = spark.sql("""
      SELECT l_partkey AS pk, max(l_extendedprice) AS m
      FROM (SELECT * FROM lineitem) GROUP BY l_partkey""")
      .orderBy(col("m").desc_nulls_last, col("pk")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exp)
  }

  test("direct API normalizes -0.0/0.0 and NaN-payload group keys") {
    import spark.implicits._
    val weirdNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val df = Seq((-0.0, 1.0), (0.0, 2.0), (Double.NaN, 3.0),
      (weirdNaN, 4.0), (5.0, 5.0)).toDF("g", "v").repartition(3)
    val got = TopKAgg.topKGroupsByMax(df, Seq("g"), "v", 10, "m")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val exp = df.groupBy(col("g")).agg(max(col("v")).as("m"))
      .orderBy(col("m").desc_nulls_last, col("g")).limit(10)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    // -0.0/0.0 collapse to one group, both NaN payloads to one group
    assert(got.length == 3)
    assert(got.map { case (g, m) => (if (g.isNaN) "nan" else g.toString, m) }
      == exp.map { case (g, m) => (if (g.isNaN) "nan" else g.toString, m) })
  }

  test("rule does NOT fire on unsupported patterns") {
    TopKAgg.register(spark)
    Engine.registerAll(spark, sf)
    // ascending order on a MAX → not the top-k pattern
    val df = spark.sql("""
      SELECT l_partkey, max(l_extendedprice) AS m
      FROM lineitem GROUP BY l_partkey ORDER BY m ASC LIMIT 10""")
    df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("TopKAgg"))
    // non-min/max aggregate → unsupported
    val df2 = spark.sql("""
      SELECT l_partkey, avg(l_extendedprice) AS m
      FROM lineitem GROUP BY l_partkey ORDER BY m DESC NULLS LAST LIMIT 10""")
    df2.collect()
    assert(!df2.queryExecution.executedPlan.toString.contains("TopKAgg"))
  }
}
