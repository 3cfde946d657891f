package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` Spark internals: build a DataFrame
  * from a custom LogicalPlan (needed by graft's custom operators, e.g.
  * the TopK-aggregation node) and append experimental rules/strategies.
  * Lives in the org.apache.spark.sql package solely for access; contains
  * no logic.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Release the block-manager storage behind a localCheckpoint'd
    * Dataset (Dataset.unpersist only covers CacheManager entries, not
    * checkpoint RDD blocks). Matches the ROOT plan only, so passing a
    * plan that merely contains checkpointed children is a no-op — never
    * unpersist blocks a live plan still references. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
