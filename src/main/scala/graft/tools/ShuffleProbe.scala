package graft.tools

import graft.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot shuffle-volume probe for a named SparkEntry query or the
  * substring-dedup spans operator: runs the plan once and prints total
  * shuffle write/read bytes from stage metrics (the SCALE.md
  * measurement tool — the ×20 replica shape in PipeScale collapses
  * same-partition duplicates in the partial agg, so the LOW-dup-rate
  * shape needs its own measurement: that is where the distinct-window
  * groupBy shuffle is maximal per token).
  *
  * Usage: tools/run_jvm.sh graft.tools.ShuffleProbe <sfDir> <name>
  *   name = a SparkEntry query name, or "substring_spans" for
  *   Dedup.duplicateSpans(documents, w=15) directly.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ShuffleProbe <sfDir> <queryName|substring_spans>")
    val Array(sfDir, name) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val df = name match {
      case "substring_spans" =>
        graft.pipeline.Dedup.duplicateSpans(
          Engine.table(spark, sfDir, "documents"), "doc_id", "text", 15)
      case q => graft.SparkEntry.queries(q)(spark, sfDir)
    }
    df.write.format("noop").mode("overwrite").save()
    Thread.sleep(2000) // listener bus drain
    // detach BEFORE the tool's own token/byte aggregations — their
    // partial-agg exchanges would contaminate the measured bytes
    // (r12 review; a map-only query must read 0, not a few KB)
    spark.sparkContext.removeSparkListener(meter)
    val docs = Engine.table(spark, sfDir, "documents")
    val tokens = docs
      .agg(sum(graft.pipeline.TextAnalysis.tokenCount(col("text"))))
      .head().getLong(0)
    val textBytes = docs.agg(sum(length(col("text")))).head().getLong(0)
    println(f"[shuffleprobe] $name: write=${meter.write.get / 1e6}%.2f MB " +
      f"read=${meter.read.get / 1e6}%.2f MB | documents tokens=$tokens " +
      f"(${meter.write.get.toDouble / tokens}%.2f B/token written; " +
      f"text ${textBytes.toDouble / tokens}%.2f B/token)")
    spark.stop()
  }
}
