package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-group sampling for training-data curation. Spark's
  * `sample`/`sampleBy` are probabilistic per-partition and not reproducible
  * across engines or partition layouts; ranking by a content hash gives a
  * uniform-ish, engine-independent, re-runnable sample — the property a
  * 100 TB curation pipeline needs (re-running the job yields the same
  * sample; the oracle can reproduce it too).
  */
object Sampling {

  /** Keep the n rows with the smallest md5(idCol) per key group. */
  def deterministicSamplePerGroup(
      df: DataFrame, keys: Seq[String], idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }
}
