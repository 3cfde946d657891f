package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, ExpressionInfo}
import org.apache.spark.sql.types.LongType

import graft.functions.{Gcd, Lcm}
import graft.plans.{TopKAggregationRule, TopKAggStrategy}

/** Library entry point for `spark.sql.extensions=graft.GraftExtensions`
  * (reference analogue: SessionContext::register_udf* —
  * datafusion/core/src/execution/context/mod.rs:979-1002). Injects the
  * custom Catalyst expressions into every session built with these
  * extensions; the SQL-UDF parity layer (GraftFunctions.registerSql) is
  * session-scoped and complements this. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_gcd"),
      new ExpressionInfo(classOf[Gcd].getName, "graft_gcd"),
      exprs => Gcd(Cast(exprs(0), LongType), Cast(exprs(1), LongType))))
    e.injectFunction((
      FunctionIdentifier("graft_lcm"),
      new ExpressionInfo(classOf[Lcm].getName, "graft_lcm"),
      exprs => Lcm(Cast(exprs(0), LongType), Cast(exprs(1), LongType))))
    // TopK aggregation fusion: limit-sort-aggregate → bounded top-k
    // operator (custom LogicalPlan + Strategy + SparkPlan, plans/
    // TopKAggregate.scala)
    e.injectOptimizerRule(_ => TopKAggregationRule)
    e.injectPlannerStrategy(_ => TopKAggStrategy)
  }
}
