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
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.all(n).build(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
