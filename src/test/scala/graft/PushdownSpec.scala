package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level pushdown/pruning pins (reference: push_down_filter.slt,
  * parquet row-group pruning §4.4; Spark gives all of it via Catalyst —
  * these tests keep it that way): predicates must reach the parquet
  * scan as PushedFilters, projection must shrink ReadSchema, partition
  * filters must prune directories before any file is opened, and
  * orderBy+limit must plan as TakeOrderedAndProject, not a global sort.
  */
class PushdownSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("tpch_q6-shape filters reach the parquet scan as PushedFilters") {
    val df = Engine.table(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= "1994-01-01" &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select((col("l_extendedprice") * col("l_discount")).as("rev"))
    val plan = planOf(df)
    val pushed = plan.linesIterator.find(_.contains("PushedFilters:"))
      .getOrElse(fail(s"no PushedFilters in plan:\n$plan"))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c not pushed: $pushed")
  }

  test("projection prunes ReadSchema to the referenced columns") {
    val df = Engine.table(spark, sf, "lineitem")
      .filter(col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_quantity"))
    val schemaLine = planOf(df).linesIterator
      .find(_.contains("ReadSchema:")).getOrElse(fail("no ReadSchema"))
    assert(schemaLine.contains("l_orderkey") &&
      schemaLine.contains("l_quantity"))
    // the widest column must NOT be read
    assert(!schemaLine.contains("l_extendedprice"), schemaLine)
    assert(!schemaLine.contains("l_shipdate"), schemaLine)
  }

  test("partition filters prune hive directories before file listing") {
    val dir = "/tmp/graft_pushdown_part"
    Engine.table(spark, sf, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("status") === "F")
    assert(planOf(pruned).contains("PartitionFilters:"),
      "partition filter missing from the scan")
    // inputFiles reports the pre-pruning FileIndex — the real check is
    // the scan's numFiles metric after execution
    pruned.collect()
    val executed = pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = executed.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec"))
    val fFiles = new java.io.File(s"$dir/status=F")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val allFiles = new java.io.File(dir).listFiles()
      .filter(_.isDirectory)
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(scan.metrics("numFiles").value == fFiles,
      s"scan read ${scan.metrics("numFiles").value} files, partition has $fFiles")
    assert(fFiles < allFiles, "test needs multiple partitions to prune")
  }

  test("orderBy+limit plans as TakeOrderedAndProject, not a global sort") {
    val df = Engine.table(spark, sf, "orders")
      .orderBy(col("o_totalprice").desc).limit(5)
    assert(planOf(df).contains("TakeOrderedAndProject"))
  }

  test("scalar-subquery limits stay out of the fact scan's way (IsNotNull only)") {
    // a join-key filter Spark derives (IsNotNull) must still push even
    // when the query has no explicit predicate on the fact table
    val l = Engine.table(spark, sf, "lineitem")
    val p = Engine.table(spark, sf, "part").filter(col("p_size") === 15)
    val plan = planOf(l.join(p, col("l_partkey") === col("p_partkey")))
    // pin the FACT scan's own PushedFilters line (the part scan always
    // has one from the explicit p_size filter — matching any line would
    // make this test vacuous)
    val factPushed = plan.linesIterator
      .filter(_.contains("PushedFilters:")).toList
    assert(factPushed.exists(_.contains("IsNotNull(l_partkey)")),
      factPushed.mkString("\n"))
  }
}
