package graft.tools

import graft.Engine
import graft.pipeline.{Classifier, Materialize, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing profile of pipe_quality_distill_refined (r14 verdict
  * #3): decomposes the chain — teacher (perplexityBuckets + join
  * checkpoint), NB training collects, softmax GD loop, scoring+final
  * join — so the next optimization lands on a named stage.
  *
  * Usage: tools/run_jvm.sh graft.tools.DistillProf [reps] */
object DistillProf {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Sketches.register(spark)
    val classes = Seq("head", "middle", "tail")

    def t[A](tag: String)(thunk: => A): A = {
      val t0 = System.nanoTime()
      val r = thunk
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"[prof] ---- rep $rep ----")
      val docs = Engine.table(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      val labeled = t("teacher+join checkpoint") {
        Materialize.checkpoint(
          TextAnalysis.perplexityBuckets(
              docs.filter(col("doc_id") % 2 === 0),
              docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
            .join(docs, "doc_id")
            .select(col("doc_id"), col("text"), col("bucket")))
      }
      val train = labeled.filter(col("doc_id") % 4 === 1)
      val (w, p) = t("trainLogOddsMulti") {
        Classifier.trainLogOddsMulti(train, "text", "bucket", classes,
          d = 1024)
      }
      val (wq0, bq0) = Classifier.quantizeMulti(w, p)
      val (wq, bq) = t("trainSoftmaxFixed x5") {
        Classifier.trainSoftmaxFixed(train, "text", "bucket", classes,
          wq0, bq0, iters = 5, lr = 0.05)
      }
      t("score+join+sort noop") {
        Classifier.scoreMultiFixed(
            labeled.filter(col("doc_id") % 4 === 3), "doc_id", "text",
            classes, wq, bq)
          .join(labeled.select(col("doc_id"), col("bucket")), "doc_id")
          .select(col("doc_id"), col("n_feats"), col("s_head"),
            col("s_middle"), col("s_tail"), col("pred"), col("bucket"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
