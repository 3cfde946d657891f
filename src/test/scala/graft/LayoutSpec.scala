package graft

import graft.operators.{Upsert, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout + MERGE operators: z-order clustering tightens per-file
  * min/max spans on every clustered column (the file-skipping property),
  * and Upsert.merge obeys the MERGE algebra. */
class LayoutSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  test("zValue is a bijection of the masked key pair") {
    val orders = Engine.table(spark, sf, "orders")
    val masked = orders.select(
      (col("o_custkey").bitwiseAND(lit(255L))).as("x"),
      (col("o_orderkey").bitwiseAND(lit(255L))).as("y"))
    val nPairs = masked.distinct().count()
    val nZ = orders.select(
      ZOrder.zValue(Seq(col("o_custkey"), col("o_orderkey")), 8).as("z"))
      .distinct().count()
    assert(nZ == nPairs, "distinct z-values must equal distinct key pairs")
  }

  test("z-order clustering tightens per-partition spans on BOTH columns") {
    val orders = Engine.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"))
    // per-partition normalized span of a column, averaged over partitions
    def avgSpan(df: org.apache.spark.sql.DataFrame, c: String,
        total: Double): Double = {
      val spans = df
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getLong(1).toDouble / total)
      spans.sum / spans.length
    }
    val totCust = 1499.0
    val totOrd = 14999.0
    val zClustered = ZOrder.cluster(orders, Seq("o_custkey", "o_orderkey"),
      numFiles = 16, bits = 16)
    // single-column sort: perfect on the sort column, useless on the other
    val singleSorted = orders.repartitionByRange(16, col("o_orderkey"))
    val zWorst = math.max(avgSpan(zClustered, "o_custkey", totCust),
      avgSpan(zClustered, "o_orderkey", totOrd))
    val sWorst = math.max(avgSpan(singleSorted, "o_custkey", totCust),
      avgSpan(singleSorted, "o_orderkey", totOrd))
    // z-order: every partition covers ~a quadrant of the (cust, ord) plane
    // → both spans shrink; single-col sort leaves o_custkey at ~full span
    assert(zWorst < 0.5, s"z-order worst-column avg span $zWorst")
    assert(sWorst > 0.9, s"single-sort worst-column avg span $sWorst")
  }

  test("merge with an empty source is the identity") {
    val t = Engine.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).limit(500)
    val empty = t.filter(lit(false))
    val merged = Upsert.merge(t, empty, Seq("o_orderkey"))
    assert(merged.exceptAll(t).isEmpty && t.exceptAll(merged).isEmpty)
  }

  test("self-merge is the identity and merge is upsert-idempotent") {
    val t = Engine.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).limit(500)
    val once = Upsert.merge(t, t, Seq("o_orderkey"))
    assert(once.exceptAll(t).isEmpty && t.exceptAll(once).isEmpty)
    val s = t.withColumn("o_totalprice", col("o_totalprice") + 1)
    val m1 = Upsert.merge(t, s, Seq("o_orderkey"))
    val m2 = Upsert.merge(m1, s, Seq("o_orderkey"))
    assert(m2.exceptAll(m1).isEmpty && m1.exceptAll(m2).isEmpty)
  }

  test("compaction rewrites many small files into few, content-preserving") {
    import graft.sources.Compaction
    val base = "/tmp/graft_compact"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val li = Engine.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    li.repartition(64).write.parquet(s"$base/small")
    val (totalBytes, before) = Compaction.stats(spark, s"$base/small")
    assert(before == 64)
    val (_, after) = Compaction.compact(spark, s"$base/small",
      s"$base/compacted", targetFileBytes = totalBytes / 4)
    assert(after <= 8, s"expected ~4-5 files, got $after")
    val out = spark.read.parquet(s"$base/compacted")
    assert(out.count() == li.count())
    assert(out.exceptAll(li).isEmpty && li.exceptAll(out).isEmpty)
  }

  test("pruned merge rewrites ONLY touched partitions, byte-identically elsewhere") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = "/tmp/graft_io/layout_merge_pruned"
    val orders = Engine.table(spark, sf, "orders")
      .select(pmod(col("o_orderkey"), lit(8)).as("pk"),
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val target = orders.filter(col("o_orderkey") < 8000)
    target.write.mode("overwrite").partitionBy("pk").parquet(dir)
    // snapshot every data file's bytes, keyed by relative path
    def snapshot(): Map[String, Seq[Byte]] =
      Files.walk(Paths.get(dir)).iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => Paths.get(dir).relativize(p).toString ->
          Files.readAllBytes(p).toSeq)
        .toMap
    val before = snapshot()
    assert(before.keySet.map(_.split("/")(0)).size == 8, "8 partitions")
    // source touches partitions 0 and 1 only
    val source = orders
      .filter(col("o_orderkey") >= 4000 && col("o_orderkey") < 12000 &&
        col("pk") < 2)
      .withColumn("o_orderstatus", lit("U"))
    val affected = Upsert.mergeIntoPartitioned(spark, dir, "pk", source,
      Seq("pk", "o_orderkey"))
    assert(affected.map(_.toString).sorted == Seq("0", "1"))
    val after = snapshot()
    // untouched partitions: the same files, byte for byte
    val untouchedBefore = before.filter(!_._1.matches("pk=[01]/.*"))
    val untouchedAfter = after.filter(!_._1.matches("pk=[01]/.*"))
    assert(untouchedAfter == untouchedBefore,
      "untouched partitions must keep their exact files")
    // touched partitions were rewritten (no surviving old file)
    assert(before.keys.filter(_.matches("pk=[01]/.*"))
      .forall(f => !after.contains(f)), "touched partitions rewritten")
    // final content equals the plain full merge of the same inputs
    val expect = Upsert.merge(target, source, Seq("pk", "o_orderkey"))
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(dir)
      .select(col("pk").cast("long"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .collect().map(_.toSeq).toSet
    assert(got == expect)
  }

  test("pruned merge into the NULL partition keeps unmatched rows there") {
    import spark.implicits._
    val dir = "/tmp/graft_io/layout_merge_null_part"
    // partition col with NULLs: ids 1-4 in pk='a', 5-8 in NULL partition
    val target = Seq((1L, "a", "t1"), (2L, "a", "t2"),
        (5L, null, "t5"), (6L, null, "t6"))
      .toDF("id", "pk", "v")
    target.write.mode("overwrite").partitionBy("pk").parquet(dir)
    // source updates id 5 in the NULL partition (and inserts id 7 there)
    val source = Seq((5L, null.asInstanceOf[String], "S5"),
        (7L, null.asInstanceOf[String], "S7"))
      .toDF("id", "pk", "v")
    Upsert.mergeIntoPartitioned(spark, dir, "pk", source, Seq("pk", "id"))
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toMap
    // unmatched NULL-partition row 6 must SURVIVE; 5 updated; 7 inserted;
    // partition 'a' untouched
    assert(got == Map(1L -> "t1", 2L -> "t2", 5L -> "S5", 6L -> "t6",
      7L -> "S7"))
  }

  test("antiMerge removes exactly the matched keys") {
    val t = Engine.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val del = t.filter(col("o_orderkey") % 3 === 0).select(col("o_orderkey"))
    val kept = Upsert.antiMerge(t, del, Seq("o_orderkey"))
    assert(kept.count() == t.count() - del.distinct().count())
    assert(kept.filter(col("o_orderkey") % 3 === 0).isEmpty)
  }
}
