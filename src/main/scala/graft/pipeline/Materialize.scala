package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Intra-query materialization for multi-consumer / fixpoint
  * intermediates, with a reliability escape hatch (r14 verdict #7).
  *
  * Default: `localCheckpoint` — the repo convention since r13 (no
  * CacheManager registration, so no cross-query plan substitution; blocks
  * die with the frame). localCheckpoint truncates lineage to executor-
  * local blocks, so on a real cluster an executor loss kills the job; at
  * 100 TB the operators' scaladocs say "checkpoint to storage". Setting
  *   spark.graft.checkpoint.reliable=true
  * (plus `sparkContext.setCheckpointDir`) routes every such site through
  * `Dataset.checkpoint` — the fault-tolerant storage-backed variant —
  * without touching call sites. Local bench/driver runs keep the default,
  * so timings stay comparable.
  */
object Materialize {
  /** Conf key gating reliable (storage-backed) checkpoints. */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Materialize `df` per the session's reliability setting. Semantics
    * are identical either way (same rows, lineage truncated); only the
    * storage medium and fault tolerance differ. */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.conf.getOption(ReliableKey).contains("true"))
      df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
