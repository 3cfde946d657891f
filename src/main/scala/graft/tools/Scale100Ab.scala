package graft.tools

import graft.Engine
import graft.pipeline.{Classifier, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ×100 scaling probe for the tier's two heaviest stages (r12 verdict
  * #5): exact substring dedup (spans + cut) and the deterministic
  * logistic refinement. PipeScale's standing gate rehearses ×20 (and
  * ×50 has been recorded); this probe takes the next doubling on a
  * quiet JVM with the ShuffleMeter, GC, and spill meters attached, so
  * the linearity claims either extend to ×100 or the knee is found
  * here before a user finds it. Invariants are NOT dropped for the
  * probe: rep-0 spans must equal the ×1 span set, replica coverage
  * must be total, and the refined weights must be bit-identical to ×1
  * (the fixed-point integer-sum argument is scale-free).
  *
  * Usage: tools/run_jvm.sh graft.tools.Scale100Ab [fac ...]
  *        (default 100); SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as usual.
  * Results are recorded in SCALE.md's scaling table per round.
  */
object Scale100Ab {
  def main(args: Array[String]): Unit = {
    val facs = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100)
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
      (size(filter(split(coalesce(col("text"), lit("")), "\\s+"),
        t => t === "spark")) >= 2).cast("int"))
    val subW = 15
    // ×1 references (also the codegen warmup)
    val spans1 = Dedup.duplicateSpans(docs, "doc_id", "text", subW)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val (w1, b1) = Classifier.trainLogOdds(labeled(docs), "text", "label", 1024)
    val (wq0, bq0) = Classifier.quantize(w1, b1)
    val (lw1, lb1) = Classifier.trainLogisticFixed(
      labeled(docs), "text", "label", wq0, bq0, iters = 3, lr = 0.05)

    facs.foreach { fac =>
      val docsN = docs
        .withColumn("rep", explode(sequence(lit(0), lit(fac - 1))))
        .select((col("doc_id") * fac + col("rep")).as("doc_id"), col("text"))
        .localCheckpoint(true)
      val nDocs = docsN.count()
      val tokensN = docsN
        .agg(sum(graft.pipeline.TextAnalysis.tokenCount(col("text"))))
        .head().getLong(0)

      // ── substring spans ─────────────────────────────────────────────
      meter.reset(); val g0 = gcMs; val t0 = System.nanoTime()
      val spansRep0 = Dedup.duplicateSpans(docsN, "doc_id", "text", subW)
        .filter(col("doc_id") % fac === 0)
        .collect()
        .map(r =>
          (r.getLong(0) / fac, r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val wallSpan = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      require(spansRep0 == spans1, s"×$fac spans mismatch: " +
        s"extra=${(spansRep0 diff spans1).take(3)} " +
        s"missing=${(spans1 diff spansRep0).take(3)}")
      println(f"[scale100] spans    ×$fac%-4d docs=$nDocs%-8d " +
        f"tokens=${tokensN / 1e6}%5.1f M wall=$wallSpan%7.1f s " +
        f"(${tokensN / wallSpan / 1e6}%5.1f Mtok/s) gc=${gcMs - g0}%6d ms " +
        f"shufW=${meter.write.get / 1e6}%8.1f MB " +
        f"(${meter.write.get.toDouble / tokensN}%5.1f B/tok) " +
        f"spill=${meter.spilledDisk.get / 1e6}%6.1f MB")

      // ── substring cut ───────────────────────────────────────────────
      meter.reset(); val g1 = gcMs; val t1 = System.nanoTime()
      val badRep = Dedup.cutDuplicateSpans(docsN, "doc_id", "text", subW)
        .filter(col("doc_id") % fac =!= 0)
        .filter(when(col("n_tokens") >= subW, col("n_kept") =!= 0)
          .otherwise(col("n_kept") =!= col("n_tokens")))
        .count()
      val wallCut = (System.nanoTime() - t1) / 1e9
      Thread.sleep(1500)
      require(badRep == 0, s"×$fac: $badRep replicas kept the wrong tokens")
      println(f"[scale100] cut      ×$fac%-4d docs=$nDocs%-8d " +
        f"wall=$wallCut%7.1f s (${tokensN / wallCut / 1e6}%5.1f Mtok/s) " +
        f"gc=${gcMs - g1}%6d ms " +
        f"shufW=${meter.write.get / 1e6}%8.1f MB " +
        f"spill=${meter.spilledDisk.get / 1e6}%6.1f MB")

      // ── logistic refinement (3 iters) ───────────────────────────────
      meter.reset(); val g2 = gcMs; val t2 = System.nanoTime()
      val (lwN, lbN) = Classifier.trainLogisticFixed(
        labeled(docsN), "text", "label", wq0, bq0, iters = 3, lr = 0.05)
      val wallLog = (System.nanoTime() - t2) / 1e9
      Thread.sleep(1500)
      require(java.util.Arrays.equals(lwN, lw1) && lbN == lb1,
        s"×$fac logistic weights not bit-identical to ×1")
      println(f"[scale100] logistic ×$fac%-4d docs=$nDocs%-8d " +
        f"wall=$wallLog%7.1f s (${wallLog / 3}%5.1f s/iter, " +
        f"${nDocs * 3 / wallLog / 1e3}%6.0f kdocs/s) gc=${gcMs - g2}%6d ms " +
        f"shufW=${meter.write.get / 1e6}%8.1f MB " +
        f"spill=${meter.spilledDisk.get / 1e6}%6.1f MB")
      docsN.unpersist(blocking = true)
    }
    spark.stop()
  }
}
