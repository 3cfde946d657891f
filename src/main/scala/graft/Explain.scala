package graft

/** Plan auditor: prints the formatted physical plan of the named queries
  * (or a default audit set) so pushdown/broadcast/shuffle decisions can be
  * inspected. Usage: runMain graft.Explain [sfDir] [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("tpch_q1", "tpch_q3", "tpch_q6", "pipe_dedup_minhash")
    val spark = Engine.session(cores = 4, appName = "graft-explain")
    if (names == Seq("ALL")) audit(spark, sfDir)
    else names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.all(n).build(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }

  /** Corpus-wide smell sweep: one line per query — counts of exchanges
    * and the join/aggregate strategies Catalyst picked, so a nested-loop
    * join or a missing partial aggregate sneaking into a new query is
    * visible without reading 199 full plans. */
  def audit(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    println(f"${"query"}%-28s exch bnlj cart smj bhj shj hashagg objagg sortagg")
    SparkEntry.all.toSeq.sortBy(_._1).foreach { case (n, q) =>
      try {
        // count from the explain TEXT: with AQE on, executedPlan is an
        // AdaptiveSparkPlanExec whose tree isn't traversable pre-execution
        val text = q.build(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        def count(needle: String): Int =
          text.sliding(needle.length).count(_ == needle)
        // "Exchange" is a substring of "BroadcastExchange"/"ReusedExchange":
        // count only shuffle exchanges, same subtraction idiom as the aggs
        val shuffleExch =
          count("Exchange") - count("BroadcastExchange") - count("ReusedExchange")
        println(f"$n%-28s $shuffleExch%4d ${count("BroadcastNestedLoopJoin")}%4d " +
          f"${count("CartesianProduct")}%4d ${count("SortMergeJoin")}%3d " +
          f"${count("BroadcastHashJoin")}%3d ${count("ShuffledHashJoin")}%3d " +
          // "HashAggregate" is a substring of "ObjectHashAggregate"
          f"${count("HashAggregate") - count("ObjectHashAggregate")}%7d " +
          f"${count("ObjectHashAggregate")}%6d ${count("SortAggregate")}%7d")
      } catch {
        case e: Throwable =>
          println(f"$n%-28s PLAN-ERROR ${String.valueOf(e.getMessage).take(60)}")
      }
    }
  }
}
