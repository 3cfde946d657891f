package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning: on a hive-partitioned fact table, a
  * selective join against a broadcastable dim must prune fact PARTITIONS
  * at runtime (the dominant scan-saver for 100 TB star joins — without
  * DPP the fact scan reads every partition; with it, only the dim-selected
  * ones). Asserts both the plan shape (a DynamicPruning subquery on the
  * partition column) and result correctness vs the static rewrite. */
class DppSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  test("selective dim join dynamically prunes fact partitions") {
    val base = "/tmp/graft_dpp"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    // fact: lineitem partitioned by l_returnflag (3 partitions)
    Engine.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    // dim: one row per flag with an attribute; must be a FILE scan — a
    // LocalRelation's filter constant-folds away and DPP's
    // hasSelectivePredicate check then sees no filter at all
    import spark.implicits._
    Seq(("A", "keep"), ("N", "drop"), ("R", "drop"))
      .toDF("flag", "verdict").write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")
    val joined = fact
      .join(dim.filter(col("verdict") === "keep"),
        col("l_returnflag") === col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a DynamicPruning partition filter in:\n$plan")
    val Array(row) = joined.collect()
    val expect = Engine.table(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "A")
      .agg(count(lit(1)), sum(col("l_quantity"))).head()
    assert(row.getLong(0) == expect.getLong(0))
    assert(row.getDouble(1) == expect.getDouble(1))
  }
}
