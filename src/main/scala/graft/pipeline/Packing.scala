package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Token-stream packing — the LLM-pretraining step after curation:
  * documents are concatenated in a deterministic order into one token
  * stream and cut into fixed `budget`-token training sequences; a
  * document may straddle a cut. The operator computes, per document,
  * its [tok_start, tok_end) offsets in the stream and the first/last
  * sequence ids it lands in (no reference equivalent — beyond-reference
  * pipeline operator like dedup/similarity).
  *
  * Scale: the naive formulation is `sum(n) OVER (ORDER BY id)` — a
  * GLOBAL window, which Spark executes on a single partition: the whole
  * corpus funnels through one task. This implementation is the classic
  * two-phase distributed prefix sum instead:
  *   1. range-partition by id (partition p holds an id-contiguous
  *      block), cumsum WITHIN each partition — fully parallel;
  *   2. collect the P per-partition totals (P longs — driver-tiny),
  *      exclusive-scan them, broadcast the offsets back, add.
  * No stage sees more than its partition's rows. Determinism: the
  * ordering is total by `idCol`, so the output is partition-count
  * independent (PackingSpec asserts 1 vs 16 partitions byte-equal).
  */
object Packing {

  /** @return input columns + tok_start (inclusive), tok_end (exclusive),
    *         seq_first, seq_last (`budget`-wide sequence ids covered). */
  def packTokenStream(df: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions

    // id-contiguous blocks; __n pinned to long so the partition fold
    // doesn't depend on the input column's integer width
    val ranged = df.withColumn("__n", col(nTokensCol).cast("long"))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
    val nIdx = ranged.schema.fieldIndex("__n")

    // phase 1: per-partition running totals (one narrow pass)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields ++ Seq(
        StructField("__pid", LongType, nullable = false),
        StructField("__local_cum", LongType, nullable = false)))
    val withLocal = spark.createDataFrame(
      ranged.rdd.mapPartitionsWithIndex { (pid, rows) =>
        var cum = 0L
        rows.map { r =>
          cum += r.getLong(nIdx)
          Row.fromSeq(r.toSeq ++ Seq(pid.toLong, cum))
        }
      }, schema)
      .persist()

    // phase 2: P partition totals → exclusive prefix offsets (driver
    // scan over P longs, rebroadcast as a tiny join)
    val totals = withLocal.groupBy(col("__pid"))
      .agg(max(col("__local_cum")).as("__ptotal"))
      .orderBy(col("__pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val offsets = totals
      .scanLeft((-1L, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .init.zip(totals)
      .map { case ((_, prefix), (pid, _)) => (pid, prefix) }
    val offsetDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__offset")

    withLocal
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("tok_end", col("__local_cum") + col("__offset"))
      .withColumn("tok_start", col("tok_end") - col("__n"))
      // integer DIV, not floor(double /): offsets in a 100 TB stream
      // exceed the 2^53 range where double division stays exact
      .withColumn("seq_first", expr(s"tok_start div ${budget}L"))
      .withColumn("seq_last", greatest(col("tok_end") - 1, col("tok_start")))
      .withColumn("seq_last", expr(s"seq_last div ${budget}L"))
      .drop("__pid", "__local_cum", "__offset", "__n")
  }
}
