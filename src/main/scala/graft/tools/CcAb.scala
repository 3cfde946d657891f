package graft.tools

import graft.Engine
import graft.pipeline.{Clustering, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the connected-components fixpoint round (r14 verdict
  * #2: ~7 exchanges/round, scheduling-bound on small edge sets). The
  * loop runs at DataFrame-construction time, so committed query plans
  * never show the per-round shape; this probe captures the EXECUTED
  * plan of each convergence-probe job through a QueryExecutionListener
  * (the probe materializes the lazily-checkpointed round output, so its
  * plan contains the full round subtree), and times the whole operator
  * on (a) the real ngram near-dup pairs of the documents corpus with
  * the pair generation pre-materialized out of the timed region, and
  * (b) a synthetic 5000-chain that needs the full O(log n) rounds.
  *
  * Usage: tools/run_jvm.sh graft.tools.CcAb [reps]
  *        SPARK_GRAFT_SF_DIR / _CPUS as usual; plans printed once after
  *        the timings, delimited for plans/r15 extraction. */
object CcAb {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(thunk: => Unit): Unit = {
      thunk // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ccab] $tag%-18s median ${ts.sorted.apply((ts.size - 1) / 2)}%.3f s  all ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    // (a) real near-dup pairs, candidate generation OUTSIDE the timing
    val docs = Engine.table(spark, sf, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    println(s"[ccab] pairs = ${pairs.count()}")
    time("cc(real-pairs)") {
      noop(Clustering.connectedComponents(pairs, "id_a", "id_b"))
    }

    // (b) synthetic 5000-chain — O(log n) rounds, tiny data
    val chain = spark.range(1, 5000)
      .select(col("id").as("id_a"), (col("id") - 1).as("id_b"))
      .localCheckpoint()
    time("cc(5000-chain)") {
      noop(Clustering.connectedComponents(chain, "id_a", "id_b"))
    }

    // ── round-plan artifacts ─────────────────────────────────────────
    // The loop's lazy checkpoints push the round subtree into RDD
    // lineage (the probe's QueryExecution sees only Scan ExistingRDD),
    // so the round plan is printed EXPLICITLY here: the current
    // Clustering.ccRound vs the superseded r14 groupBy+join
    // formulation, reproduced verbatim below (from git history,
    // commit 2c7e36e Clustering.scala) for the plan diff.
    def largeStarR14(e: org.apache.spark.sql.DataFrame) = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }
    def smallStarR14(e: org.apache.spark.sql.DataFrame) = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
      val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      val rewired = dir.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      rewired.union(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    val seed = chain.select(col("id_a").as("u"), col("id_b").as("v"))
      .localCheckpoint()
    def show(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val exch = p.sliding("Exchange".length).count(_ == "Exchange") -
        p.sliding("BroadcastExchange".length).count(_ == "BroadcastExchange") -
        p.sliding("ReusedExchange".length).count(_ == "ReusedExchange")
      println(s"===== CC ROUND PLAN [$tag] ($exch shuffle exchanges) =====")
      println(p)
      println(s"===== END CC ROUND PLAN [$tag] =====")
    }
    show("r14 groupBy+join", smallStarR14(largeStarR14(seed)))
    show("r15 fused window", Clustering.ccRound(seed))
    spark.stop()
  }
}
