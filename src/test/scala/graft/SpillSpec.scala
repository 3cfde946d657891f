package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spill-path correctness, mirroring the reference's memory-limit tests
  * (datafusion/core/tests/memory_limit/): force the window and
  * sort-merge-join buffers to spill to disk after a handful of rows and
  * assert results are identical to the in-memory execution. At 100 TB
  * these paths are the NORMAL case — a partition that doesn't fit its
  * executor's memory must produce the same answer, just slower.
  */
class SpillSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  /** Run `body` with forced operator spills (tiny in-memory buffers),
    * restoring the session confs afterwards. */
  private def withForcedSpills[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.windowExec.buffer.spill.threshold",
      "spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(k => spark.conf.set(k, "16"))
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("window aggregate spills produce identical results") {
    val ev = Engine.table(spark, sf, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def run() = ev
      .select(col("event_id"), sum(col("value")).over(w).as("rs"))
      .agg(count(lit(1)), round(sum(col("rs")), 2),
        round(sum(abs(hash(col("event_id"), col("rs")))), 0))
      .collect().head.toSeq
    val inMem = run()
    val spilled = withForcedSpills(run())
    assert(spilled == inMem)
  }

  test("Analyze reports per-operator runtime metrics incl. spills") {
    val q = SparkEntry.all("tpch_q6").build(spark, sf)
    val report = Analyze.analyze(q)
    assert(report.nonEmpty)
    val scan = report.find(_._2.toLowerCase.contains("scan"))
    assert(scan.isDefined, report.map(_._2).mkString(", "))
    assert(scan.get._3.getOrElse("numOutputRows", 0L) > 0L)
    // a forced-spill window run must surface spill metrics
    val ev = Engine.table(spark, sf, "events")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spilled = withForcedSpills {
      Analyze.analyze(
        ev.select(col("event_id"), sum(col("value")).over(w).as("rs")))
    }
    val windowNode = spilled.find(_._2.toLowerCase.contains("window"))
    assert(windowNode.isDefined)
    assert(windowNode.get._3.getOrElse("spillSize", 0L) > 0L,
      windowNode.get._3.toString)
  }

  test("sort-merge join spills produce identical results") {
    val orders = Engine.table(spark, sf, "orders")
    val lineitem = Engine.table(spark, sf, "lineitem")
    def run() = orders
      .hint("merge")
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)), round(sum(col("l_extendedprice")), 2),
        sum(abs(hash(col("o_orderkey"), col("l_linenumber")))))
      .collect().head.toSeq
    val inMem = run()
    val spilled = withForcedSpills(run())
    assert(spilled == inMem)
  }
}
