package graft.tools

import graft.Engine
import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for the substring-CUT ×100 exponent (r13
  * verdict "What's wrong" #1: cut read 2.39× per corpus doubling
  * while spans stayed linear — attributed to "second scan + GC" but
  * not measured). cutDuplicateSpans = span DISCOVERY
  * (duplicateSpans: two kernel scans + the (h1,h2) shuffle) + span
  * APPLICATION (group spans per doc, join them onto the re-split
  * corpus, per-token interval filter, portable rolling fingerprint).
  * This probe times the two halves separately at each factor — the
  * application half against a PRE-MATERIALIZED span set
  * (localCheckpoint models "spans already on disk") — so the
  * superlinear term lands on a named stage with GC/shuffle/spill
  * evidence instead of a guess.
  *
  * Usage: tools/run_jvm.sh graft.tools.CutAb [fac ...]
  *        (default 25 50 100); SPARK_GRAFT_SF_DIR / _CPUS as usual. */
object CutAb {
  def main(args: Array[String]): Unit = {
    val facs = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(25, 50, 100)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val subW = 15
    val docs = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // warmup (codegen + catalog)
    Dedup.cutDuplicateSpans(docs, "doc_id", "text", subW).count()

    case class Stage(name: String, run: Int => Long)
    facs.foreach { fac =>
      val docsN = docs
        .withColumn("rep", explode(sequence(lit(0), lit(fac - 1))))
        .select((col("doc_id") * fac + col("rep")).as("doc_id"), col("text"))
        .localCheckpoint(true)
      val nDocs = docsN.count()
      // noop sink, NOT count() (guide §1.4; r14 fix): cutWithSpans'
      // left join has a unique right side, so count() lets
      // EliminateOuterJoin drop the join — and with it the entire cut
      // — and "apply"/"fused" read as instant while discover reads
      // 20 s. noop executes every column of every row.
      def timed(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        meter.reset(); val g0 = gcMs; val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        println(f"[cutab] $name%-10s ×$fac%-4d docs=$nDocs%-8d " +
          f"wall=$wall%7.1f s gc=${gcMs - g0}%6d ms " +
          f"shufW=${meter.write.get / 1e6}%8.1f MB " +
          f"spill=${meter.spilledDisk.get / 1e6}%6.1f MB")
      }
      // (a) discovery alone
      timed("discover") {
        Dedup.duplicateSpans(docsN, "doc_id", "text", subW)
      }
      // (b) discovery again, result MATERIALIZED for (c)
      val spansN = Dedup.duplicateSpans(docsN, "doc_id", "text", subW)
        .localCheckpoint(true)
      // (c) application alone, spans precomputed
      timed("apply") {
        Dedup.cutWithSpans(docsN, "doc_id", "text", spansN)
      }
      // (d) the fused operator (what Scale100Ab times)
      timed("fused") {
        Dedup.cutDuplicateSpans(docsN, "doc_id", "text", subW)
      }
      spansN.unpersist(blocking = true)
      docsN.unpersist(blocking = true)
    }
    spark.stop()
  }
}
