package graft.tools

import graft.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B harness for the r9 "decimal-sort outlier" adjudication (r10
  * verdict #5): the bench's sort suite times `decimal` over LINEITEM
  * (600k rows × 16 cols at sf0.1) but `int`/`utf8` over EVENTS (100k
  * rows) — the 0.595 s vs 0.173 s gap conflates key type with table
  * size and payload width. This harness holds the table constant:
  * lineitem sorted by an int key, the decimal key, and the same values
  * as double and as unscaled long, all materialized through noop.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... tools/run_jvm.sh graft.tools.SortAb
  */
object SortAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "5").toInt
    val spark = Engine.session(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-sort-ab")
    def li = Engine.table(spark, sfDir, "lineitem")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cases: Seq[(String, () => Unit)] = Seq(
      "li_int(l_orderkey)" -> (() => noop(li.orderBy("l_orderkey"))),
      "li_int(l_partkey)" -> (() => noop(li.orderBy("l_partkey"))),
      "li_decimal(l_extendedprice)" ->
        (() => noop(li.orderBy("l_extendedprice"))),
      "li_double(cast)" -> (() => noop(
        li.withColumn("k", col("l_extendedprice").cast("double"))
          .orderBy("k"))),
      "li_long(unscaled)" -> (() => noop(
        li.withColumn("k", (col("l_extendedprice") * 100).cast("long"))
          .orderBy("k"))),
      // key-only sort: drops the 16-col payload, isolating key cost
      "keyonly_decimal" -> (() => noop(
        li.select("l_extendedprice").orderBy("l_extendedprice"))),
      "keyonly_int" -> (() => noop(
        li.select("l_orderkey").orderBy("l_orderkey"))))
    cases.foreach { case (name, thunk) =>
      thunk() // warm
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); thunk(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[sortab] $name%-30s median ${times((iters - 1) / 2)}%.3f " +
        f"min ${times.head}%.3f")
    }
    spark.stop()
  }
}
