package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Add, AggregateWindowFunction, AttributeReference, Cast, Expression, If,
  IsNull, Literal, Multiply, Subtract}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** UDWF surface (reference: WindowUDFImpl + PartitionEvaluator,
  * datafusion/expr/src/udwf.rs:251, partition_evaluator.rs:89). Spark has
  * no public user-defined-window-function API, so the Spark-first
  * equivalent is a custom Catalyst AggregateWindowFunction: a declarative
  * running-state aggregate evaluated per row over the window frame —
  * exactly the role of the reference's stateful PartitionEvaluator.
  *
  * Ewma(x, alpha): exponentially weighted moving average with the
  * recurrence e_1 = x_1, e_i = alpha*x_i + (1-alpha)*e_{i-1}. This is NOT
  * expressible with built-in window aggregates (the state is a fold, not
  * a frame-decomposable sum), which is what makes it the canonical UDWF
  * demo. Null inputs carry the previous state forward.
  *
  * Scale: evaluated by Spark's WindowExec with running-frame streaming
  * state — one buffered row per partition position, O(1) state per row,
  * shuffle only on the window partition keys (same cost envelope as
  * row_number).
  */
case class Ewma(child: Expression, alphaExpr: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child, alphaExpr)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ewma"

  // alpha must be a foldable literal (enforced by eval at plan time)
  private lazy val alpha = Literal(
    alphaExpr.eval() match {
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.doubleValue()
      case n: java.lang.Number => n.doubleValue()
      case d: Decimal => d.toDouble
      case other => other.toString.toDouble
    }, DoubleType)
  private type Decimal = org.apache.spark.sql.types.Decimal

  private lazy val state =
    AttributeReference("ewma", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(state)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    // (1-alpha) computed at runtime in IEEE double so an external oracle
    // evaluating the same recurrence reproduces bit-identical results
    Seq(If(IsNull(x), state,
      If(IsNull(state), x,
        Add(Multiply(alpha, x),
          Multiply(Subtract(Literal(1.0), alpha), state)))))
  }
  override lazy val evaluateExpression: Expression = state

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), alphaExpr = newChildren(1))
}

object GraftWindowFunctions {
  /** Requires `register(spark)`; use as
    * `GraftWindowFunctions.ewma(col, 0.3).over(windowSpec)` with a
    * running ROWS frame (the function fixes its own frame). */
  def ewma(x: Column, alpha: Double): Column =
    call_function("graft_ewma", x, org.apache.spark.sql.functions.lit(alpha))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ewma", exprs => Ewma(exprs(0), exprs(1)), "built-in")
}
