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

    // id-contiguous blocks; __n pinned to long so the partition folds
    // don't depend on the input column's integer width. NOTE: `ranged`
    // is evaluated once per phase below (totals, then cumsum) — persist
    // the INPUT before calling if it is expensive to recompute; the
    // operator deliberately holds no cache of its own (a library-held
    // persist has no owner to release it and leaks for the session).
    val ranged = df.withColumn("__n", col(nTokensCol).cast("long"))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
    val nIdx = ranged.schema.fieldIndex("__n")

    // phase 1: per-partition token totals — a fold that carries ONE long
    // per partition to the driver. NULL token counts fail fast with a
    // named error (Row.getLong alone would die with an opaque task NPE).
    // A function VALUE capturing only locals: task closures must not
    // drag the enclosing module in.
    val nullMsg =
      s"packTokenStream: NULL $nTokensCol — fill or filter nulls first"
    val idx = nIdx
    val tokensOf: Row => Long = r => {
      if (r.isNullAt(idx)) throw new IllegalArgumentException(nullMsg)
      r.getLong(idx)
    }
    val totals = ranged.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var t = 0L
      rows.foreach(r => t += tokensOf(r))
      Iterator((pid.toLong, t))
    }.collect().sortBy(_._1)
    val offsets = totals
      .scanLeft((-1L, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .init.zip(totals)
      .map { case ((_, prefix), (pid, _)) => (pid, prefix) }.toMap

    // phase 2: local cumsum + broadcast offset in one pass (the range
    // partitioner is deterministic, so both passes see identical blocks)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields ++ Seq(
        StructField("tok_end", LongType, nullable = false)))
    val withEnd = spark.createDataFrame(
      ranged.rdd.mapPartitionsWithIndex { (pid, rows) =>
        var cum = bOffsets.value.getOrElse(pid.toLong, 0L)
        rows.map { r =>
          cum += tokensOf(r)
          Row.fromSeq(r.toSeq :+ cum)
        }
      }, schema)

    withEnd
      .withColumn("tok_start", col("tok_end") - col("__n"))
      // integer DIV, not floor(double /): offsets in a 100 TB stream
      // exceed the 2^53 range where double division stays exact
      .withColumn("seq_first", expr(s"tok_start div ${budget}L"))
      .withColumn("seq_last", greatest(col("tok_end") - 1, col("tok_start")))
      .withColumn("seq_last", expr(s"seq_last div ${budget}L"))
      .drop("__n")
  }
}
