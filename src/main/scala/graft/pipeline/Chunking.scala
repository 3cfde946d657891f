package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — split long documents into overlapping
  * fixed-token windows for embedding/RAG/context-window pipelines
  * (beyond-reference pipeline operator, like dedup/similarity).
  *
  * Pure map-side Column algebra: tokenize once, derive the window
  * starts with `sequence`, then slice+rejoin per window — everything
  * stays inside the scan stage (no shuffle, no UDF); the 1→N fan-out
  * happens in `explode`, which streams. At 100 TB this is bounded by
  * scan throughput exactly like the text-analysis operators.
  */
object Chunking {

  /** One row per (doc, window): chunk_id (0-based), chunk_start (token
    * offset), chunk_text, n_chunk_tokens. Windows advance by
    * `chunkTokens - overlap`; the final window may be short; documents
    * with at most `chunkTokens` tokens yield exactly one chunk.
    */
  def chunkDocs(df: DataFrame, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    // NULL text fails fast with a named error, matching packTokenStream's
    // contract (a silent explode-of-null would just drop the row).
    val toks = when(col(textCol).isNull, raise_error(
        lit(s"chunkDocs: NULL $textCol — fill or filter nulls first")))
      .otherwise(split(col(textCol), "\\s+"))
    df
      .withColumn("__toks", toks)
      .withColumn("__ntok", size(col("__toks")))
      // last window start: the largest multiple of step < n (so a short
      // tail still emits, but an exactly-covered doc adds no empty chunk)
      .withColumn("chunk_start",
        explode(sequence(lit(0),
          greatest(ceil((col("__ntok") - lit(chunkTokens)).cast("double")
            / step), lit(0)).cast("int") * step,
          lit(step))))
      .withColumn("chunk_id", (col("chunk_start") / step).cast("long"))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), col("chunk_start") + 1,
          lit(chunkTokens)), " "))
      .withColumn("n_chunk_tokens",
        least(col("__ntok") - col("chunk_start"), lit(chunkTokens))
          .cast("long"))
      .drop("__toks", "__ntok")
  }
}
