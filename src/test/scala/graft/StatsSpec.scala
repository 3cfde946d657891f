package graft

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer statistics: ANALYZE TABLE column stats let
  * Catalyst estimate a filter's output size, flipping a
  * just-too-big-to-broadcast join side into a broadcast join once the
  * post-filter estimate clears the threshold. This is the Spark
  * analogue of the reference's selectivity/statistics propagation
  * (datafusion FilterExec stat propagation, physical-plan/src/
  * filter.rs) — at 100 TB, the difference between shuffling the fact
  * table against a dim and broadcasting the dim's filtered slice. */
class StatsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  test("column stats + CBO flip a filtered dim join to broadcast") {
    spark.sql("DROP TABLE IF EXISTS stats_part")
    Engine.table(spark, sf, "part").write.mode("overwrite")
      .saveAsTable("stats_part")
    spark.sql(
      "ANALYZE TABLE stats_part COMPUTE STATISTICS FOR ALL COLUMNS")
    // static plan inspection (AQE replans on runtime sizes — the point
    // here is the STATIC stats-driven decision)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def joined = Engine.table(spark, sf, "lineitem")
        .join(spark.table("stats_part").filter(col("p_size") === 15),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      def filteredEstimate: BigInt = spark.table("stats_part")
        .filter(col("p_size") === 15)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val rawSize: BigInt = spark.table("stats_part")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(filteredEstimate * 2 < rawSize,
        s"stats should shrink the filter estimate ($filteredEstimate vs $rawSize)")
      // threshold sits between the filtered estimate and the raw size:
      // only a stats-aware planner can see the broadcast opportunity
      val threshold = (filteredEstimate * 2).min(rawSize - 1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        threshold.toString)

      val withCbo = joined.queryExecution.executedPlan.collect {
        case b: BroadcastHashJoinExec => b }
      assert(withCbo.nonEmpty,
        "CBO + column stats should broadcast the filtered dim")

      spark.conf.set("spark.sql.cbo.enabled", "false")
      val withoutCbo = joined.queryExecution.executedPlan.collect {
        case b: BroadcastHashJoinExec => b }
      assert(withoutCbo.isEmpty,
        "without CBO the filter keeps the raw size estimate — no broadcast")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS stats_part")
    }
  }
}
