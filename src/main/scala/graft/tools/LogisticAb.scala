package graft.tools

import graft.Engine
import graft.pipeline.Classifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the logistic-refinement wall-time scaling (r12: the
  * ×50 PipeScale stage read 4.4× the ×20 wall for 2.5× corpus —
  * superlinear, cause unadjudicated: spill, GC, or the bursty box that
  * poisoned the same day's verify-step bench). Runs
  * trainLogisticFixed(3 iters) at each replication factor on one quiet
  * JVM and prints per-factor wall, accumulated GC, and shuffle bytes —
  * linear rows with flat GC/shuffle-per-row reads as box noise; rising
  * GC or spill reads as a real capacity knee.
  *
  * Usage: tools/run_jvm.sh graft.tools.LogisticAb [fac ...] (default
  *        10 20 50); SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as usual.
  */
object LogisticAb {
  def main(args: Array[String]): Unit = {
    val facs = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 20, 50)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val docs = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    def labeled(df: DataFrame): DataFrame = df.withColumn("label",
      (size(filter(split(col("text"), "\\s+"), t => t === "spark")) >= 2)
        .cast("int"))
    val (w1, b1) = Classifier.trainLogOdds(labeled(docs), "text", "label", 1024)
    val (wq0, bq0) = Classifier.quantize(w1, b1)
    // warmup at ×2 (codegen, broadcast paths)
    Classifier.trainLogisticFixed(
      labeled(docs.withColumn("rep", explode(sequence(lit(0), lit(1))))
        .select((col("doc_id") * 2 + col("rep")).as("doc_id"), col("text"))),
      "text", "label", wq0, bq0, iters = 1, lr = 0.05)
    facs.foreach { fac =>
      val docsN = docs
        .withColumn("rep", explode(sequence(lit(0), lit(fac - 1))))
        .select((col("doc_id") * fac + col("rep")).as("doc_id"), col("text"))
        .localCheckpoint(true)
      val n = docsN.count()
      meter.reset()
      val g0 = gcMs; val t0 = System.nanoTime()
      val (wN, _) = Classifier.trainLogisticFixed(
        labeled(docsN), "text", "label", wq0, bq0, iters = 3, lr = 0.05)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"[logisticab] ×$fac%-3d docs=$n%-7d wall=$wall%7.1f s " +
        f"(${wall / 3}%5.1f s/iter, ${n * 3 / wall / 1e3}%6.0f kdocs/s) " +
        f"gc=${gcMs - g0}%5d ms shuffleW=${meter.write.get / 1e6}%7.1f MB " +
        f"spill=${meter.spilledDisk.get / 1e6}%6.1f MB " +
        f"w0changed=${wN.zip(wq0).count(p => p._1 != p._2)}")
    }
    spark.stop()
  }
}
