package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{
  AdaptiveSparkPlanExec, QueryStageExec}

/** EXPLAIN ANALYZE analogue (reference: AnalyzeExec —
  * datafusion/physical-plan/src/analyze.rs:42): execute a query, then
  * report each physical operator with its runtime metrics (output rows,
  * spill/peak-memory bytes, timings). Spark already collects SQLMetrics
  * per operator; this walks the final AQE-resolved plan and surfaces
  * them — the tool for confirming "did this spill", "how many rows
  * crossed this exchange" on real runs.
  *
  * Usage: runMain graft.Analyze [sfDir] [query ...]
  */
object Analyze {

  /** Materialize the DataFrame through its OWN QueryExecution (a
    * `df.write...` would plan a separate execution whose metrics this
    * report can't see) and return the per-operator metrics tree. No
    * rows reach the driver — the plan's RDD is foreach'd in place. */
  def analyze(df: DataFrame): Seq[(Int, String, Map[String, Long])] = {
    df.queryExecution.toRdd.foreach(_ => ())
    metricsReport(df)
  }

  /** The plan's metrics tree: (indent, nodeName, non-zero metrics).
    * Call AFTER the DataFrame's own QueryExecution has run. */
  def metricsReport(df: DataFrame): Seq[(Int, String, Map[String, Long])] = {
    val out = Seq.newBuilder[(Int, String, Map[String, Long])]
    def walk(p: SparkPlan, depth: Int): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
      case q: QueryStageExec => walk(q.plan, depth)
      case _ =>
        val ms = p.metrics.collect {
          case (k, m) if m.value > 0 => k -> m.value
        }.toMap
        out += ((depth, p.nodeName, ms))
        p.children.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("tpch_q1", "tpch_q6", "tpch_q18")
    val spark = Engine.session(cores = 4, appName = "graft-analyze")
    names.foreach { n =>
      println(s"\n========== ANALYZE $n ==========")
      val df = SparkEntry.all(n).build(spark, sfDir)
      analyze(df).foreach { case (depth, node, ms) =>
        val m = if (ms.isEmpty) ""
          else ms.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString("  [", ", ", "]")
        println(("  " * depth) + node + m)
      }
    }
    Engine.clearCache(spark)
    spark.stop()
  }
}
