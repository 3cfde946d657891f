package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join split: the RUNTIME half of the skew story (the static
  * half — explicit salting — is the skew_salted_* queries). A join
  * where one key owns ~90% of the probe rows must still return exact
  * results when AQE splits the oversized partition into parallel
  * sub-joins; at 100 TB this is what keeps a hot key from pinning one
  * executor for hours. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed sort-merge join and results stay exact") {
    import spark.implicits._
    // 90% of fact rows on key 0, the rest uniform over 1..9
    val fact = spark.range(0, 100000)
      .select((when(col("id") % 10 === 0, col("id") % 9 + 1)
        .otherwise(0L)).as("k"), col("id").as("v"))
    val dim = (0L to 9L).map(k => (k, s"name_$k")).toDF("k", "name")
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so local-scale skew triggers the optimization
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
      // force SMJ (broadcast would bypass the skewed exchange entirely)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = fact.join(dim.hint("shuffle_merge"), "k")
      val rows = joined.collect().map(r => r.getString(2) -> 1L)
        .groupMapReduce(_._1)(_._2)(_ + _)
      // exact per-key counts survive the split
      val expected = fact.groupBy("k").count().collect()
        .map(r => s"name_${r.getLong(0)}" -> r.getLong(1)).toMap
      assert(rows === expected)
      // and the SAME execution's final adaptive plan marked the join
      // skew-split. Walk through AQE/QueryStage wrappers explicitly:
      // query stages are leaf nodes, so a plain collect() stops at them
      // (same traversal as graft.Analyze)
      def findSmj(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[SortMergeJoinExec] = p match {
        case a: AdaptiveSparkPlanExec => findSmj(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findSmj(q.plan)
        case j: SortMergeJoinExec => j +: p.children.flatMap(findSmj)
        case _ => p.children.flatMap(findSmj)
      }
      val smj = findSmj(joined.queryExecution.executedPlan)
      assert(smj.exists(_.isSkewJoin),
        "expected the sort-merge join to be marked isSkewJoin by AQE")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
