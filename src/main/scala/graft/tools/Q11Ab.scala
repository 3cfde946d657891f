package graft.tools

import graft.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r10 verdict #6: re-A/B the tpch_q11 checkpoint variant at a larger
  * generated SF (the r9 negative was pinned at sf0.1 = 600k lineitem
  * rows; the two-pass shape's extra cost is one fact SCAN, which grows
  * with SF, while the checkpoint variant's extra cost is a
  * part-cardinality write, which doesn't).
  *
  * The fact is replicated ×fac in-memory (explode over a sequence —
  * same technique as PipeScale), keys untouched so the group
  * cardinality (l_partkey) and join fan-out stay exactly sf0.1-shaped;
  * only per-group row count grows. Values are identical across
  * replicas, so both variants must return identical part sets (sums
  * scale by fac exactly — DECIMAL, no fp drift).
  *
  * Usage: SPARK_GRAFT_Q11_FAC=10 tools/run_jvm.sh graft.tools.Q11Ab
  */
object Q11Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fac = sys.env.getOrElse("SPARK_GRAFT_Q11_FAC", "10").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "5").toInt
    val spark = Engine.session(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-q11-ab")

    val n = Engine.table(spark, sfDir, "nation")
      .filter(col("n_regionkey") === 2).select(col("n_nationkey"))
    val su = Engine.table(spark, sfDir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"),
        "left_semi")
    def scoped(): DataFrame = Engine.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"))
      .withColumn("rep", explode(sequence(lit(1), lit(fac))))
      .drop("rep")
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"),
        (col("l_quantity") * col("l_extendedprice")).as("v"))

    // A — shipped two-pass shape: threshold from its own partial
    // aggregate over the fact (second scan, no fact shuffle)
    def twoPass(): DataFrame = {
      val s = scoped()
      val threshold = s.agg((sum(col("v")) * 0.001).as("thr"))
      s.groupBy(col("l_partkey")).agg(sum(col("v")).as("raw_value"))
        .join(broadcast(threshold))
        .filter(col("raw_value") > col("thr"))
        .select(col("l_partkey"), round(col("raw_value"), 2).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }
    // B — checkpoint variant: group once, checkpoint the
    // part-cardinality frame, threshold from the grouped sums
    def checkpointed(): DataFrame = {
      val grouped = scoped().groupBy(col("l_partkey"))
        .agg(sum(col("v")).as("raw_value"))
        .localCheckpoint(true)
      val threshold = grouped.agg((sum(col("raw_value")) * 0.001).as("thr"))
      grouped.join(broadcast(threshold))
        .filter(col("raw_value") > col("thr"))
        .select(col("l_partkey"), round(col("raw_value"), 2).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }

    val a = twoPass().collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val b = checkpointed().collect().map(r => (r.getLong(0), r.getDecimal(1)))
    require(a.toSeq == b.toSeq,
      s"variant results differ: ${a.length} vs ${b.length} rows")
    println(s"[q11ab] fac=$fac rows=${a.length} — results identical")

    for ((name, thunk) <- Seq(
        "two_pass" -> (() => twoPass()),
        "checkpoint" -> (() => checkpointed()))) {
      thunk().write.format("noop").mode("overwrite").save() // warm
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        thunk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q11ab] $name%-12s fac=$fac median ${times((iters - 1) / 2)}%.3f " +
        f"min ${times.head}%.3f")
    }
    spark.stop()
  }
}
