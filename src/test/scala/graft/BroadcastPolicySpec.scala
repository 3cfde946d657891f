package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB broadcast-hint contract (round 5, VERDICT item 1).
  *
  * A forced `broadcast()` hint overrides AQE's size check: on a relation
  * that grows with SF (customer, part, supplier, date-sliced orders) it
  * works at bench SF and kills the job at 100× (8 GB broadcast limit /
  * driver OOM). So the policy is: hints ONLY on scale-constant sides —
  * nation (25 rows), region (5 rows), and aggregate-reduced sides whose
  * cardinality is bounded by a fixed domain, not by SF.
  *
  * Half 1 pins the policy structurally: every ResolvedHint in the
  * benchmark corpus (tpch, h2o, click families) must wrap a scale-constant
  * subtree. Half 2 pins that removing the hints cost nothing at small
  * SF: the formerly-hinted dimension joins still EXECUTE as
  * BroadcastHashJoin because AQE/the planner picks broadcast from
  * measured sizes (and would degrade to a shuffled join at 100×, which
  * the hint would not).
  */
class BroadcastPolicySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val corpus: Seq[String] = SparkEntry.all.keys.toSeq.sorted
    .filter(n => n.startsWith("tpch_") || n.startsWith("h2o_") ||
      n.startsWith("click_"))

  /** Columns with a fixed domain regardless of SF (TPC-H generators draw
    * them from constant lists), so an Aggregate grouped on them has
    * bounded output cardinality. */
  private val boundedDomainCols =
    Set("p_brand", "p_type", "l_returnflag", "l_linestatus",
      "o_orderpriority", "o_orderstatus", "event_type", "n_name", "r_name")

  private def scaleConstant(p: LogicalPlan): Boolean = {
    val reducedByBoundedAgg = p.collectFirst {
      case a: Aggregate if a.groupingExpressions.isEmpty => ()
      case a: Aggregate if a.groupingExpressions.forall(
        _.references.forall(r => boundedDomainCols(r.name))) => ()
    }.isDefined
    lazy val fixedDimScanOnly = {
      val leaves = p.collectLeaves()
      leaves.nonEmpty && leaves.forall {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.forall { rp =>
            val s = rp.toString
            s.contains("nation") || s.contains("region")
          }
          case _ => false
        }
        case _ => false
      }
    }
    reducedByBoundedAgg || fixedDimScanOnly
  }

  test("every broadcast hint in the benchmark corpus wraps a scale-constant side") {
    val sf = "/root/testdata/sf0.001"
    val offenders = corpus.flatMap { name =>
      val analyzed = SparkEntry.all(name).build(spark, sf)
        .queryExecution.analyzed
      analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.isDefined &&
            !scaleConstant(h.child) =>
          s"$name: ${h.hints.strategy.get} on\n${h.child.treeString}"
      }
    }
    assert(offenders.isEmpty,
      s"SF-scaled relations carry forced broadcast hints:\n${offenders.mkString("\n")}")
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Flatten the adaptive plan: QueryStageExec nodes (including Spark 4's
    * ResultQueryStageExec wrapping the whole final plan) are leaves whose
    * real subtree hangs off `.plan`, invisible to foreach/collect. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p.flatMap {
    case q: QueryStageExec => q +: allNodes(q.plan)
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case n => Seq(n)
  }

  private def joinCounts(p: SparkPlan): (Int, Int) = {
    val nodes = allNodes(p)
    (nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
      nodes.count(n => n.isInstanceOf[SortMergeJoinExec] ||
        n.isInstanceOf[ShuffledHashJoinExec]))
  }

  // The queries whose hints round 5 removed, with the number of dimension
  // joins that must still broadcast at small SF without them. At sf0.01
  // every formerly-hinted side is far under the 10 MB threshold, so the
  // planner/AQE must pick BroadcastHashJoin on its own — proving the
  // hints were dead weight at bench SF and pure risk at 100×.
  private val expectedBroadcasts = Map(
    "tpch_q3" -> 1,  // customer (mktsegment slice)
    "tpch_q4" -> 1,  // 3-month orders slice (AQE chooses the build side)
    "tpch_q5" -> 3,  // supplier + nation + region
    "tpch_q7" -> 3,  // supplier + nation ×2
    "tpch_q8" -> 5,  // part + supplier + nation ×2 + region
    "tpch_q9" -> 3,  // part + supplier + nation
    "tpch_q14" -> 1, // part
    "tpch_q16" -> 1, // part (size/brand slice)
    "tpch_q17" -> 1, // part (brand slice)
    "tpch_q19" -> 1, // part
    "tpch_q20" -> 1, // part (name slice)
    "tpch_q21" -> 1, // supplier
    "tpch_q2" -> 2,  // part (size slice) + supplier
    "tpch_q11" -> 2, // nation (hinted) + supplier (unhinted)
    "h2o_j1" -> 1,   // supplier
    "h2o_j2" -> 1,   // part
    "h2o_j3" -> 1    // part (size slice), left join
  )

  test("formerly-hinted dim joins still execute as BroadcastHashJoin at small SF") {
    val sf = "/root/testdata/sf0.01"
    val misses = expectedBroadcasts.toSeq.sortBy(_._1).flatMap {
      case (name, minBhj) =>
        val (bhj, shuffled) = joinCounts(
          finalPlan(SparkEntry.all(name).build(spark, sf)))
        if (bhj >= minBhj) None
        else Some(s"$name: expected >= $minBhj BroadcastHashJoin, " +
          s"got $bhj (shuffled joins: $shuffled)")
    }
    assert(misses.isEmpty, misses.mkString("\n"))
  }
}
