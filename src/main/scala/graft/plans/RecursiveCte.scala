package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import graft.pipeline.Materialize

/** WITH RECURSIVE support (reference: RecursiveQueryExec + WorkTableExec,
  * datafusion/physical-plan/src/recursive_query.rs:57, work_table.rs:97;
  * SQL side sql/src/cte.rs). Spark has no recursive CTE — the documented
  * gap (SURVEY.md §2.8) — so the library provides the standard driver-side
  * fixpoint loop: frontier ← step(frontier) \ seen, accumulate until
  * empty or maxIter.
  *
  * Scale notes: each iteration is a distributed union/except (shuffles on
  * the full row); `localCheckpoint` cuts the growing lineage so iteration
  * N doesn't replay 1..N-1. Total work = sum of frontier sizes — same as
  * the reference's worktable algorithm, just scheduled as Spark jobs.
  * Superseded checkpoint blocks are unpersisted as soon as nothing can
  * reference them (a re-checkpointed accumulator COPIES every row, so
  * the pieces it replaced are dead) — without this a deep recursion
  * retains every frontier for the life of the session.
  */
object RecursiveCte {

  private def release(df: DataFrame): Unit =
    GraftSqlShim.unpersistLocalCheckpoint(df)

  /** UNION (distinct) semantics fixpoint: rows already produced don't
    * re-enter the frontier.
    *
    * One Spark job per iteration: the new frontier is lazily
    * local-checkpointed and materialized by the emptiness count itself
    * (an eager checkpoint + separate isEmpty would be 2-3 jobs per
    * iteration — driver-loop job launch dominates deep recursions).
    * `acc` is a union over already-checkpointed frontiers, so its
    * lineage stays flat without re-checkpointing.
    */
  def fixpoint(
      init: DataFrame,
      step: DataFrame => DataFrame,
      maxIter: Int = 100): DataFrame = {
    var acc = Materialize.checkpoint(init, eager = true)
    // checkpointed pieces the CURRENT acc still references
    val accPieces = mutable.Buffer[DataFrame](acc)
    // a frontier that outlived its membership in accPieces (it was
    // superseded by an acc re-checkpoint but is still the next step's
    // input) — released once the following iteration has consumed it
    var dangling: Option[DataFrame] = None
    var frontier = acc
    var i = 0
    var unionDepth = 0
    var done = frontier.isEmpty
    while (i < maxIter && !done) {
      val next = Materialize.checkpoint(step(frontier).except(acc), eager = false)
      if (next.count() == 0) {
        release(next) // empty, never joins acc
        done = true
      } else {
        // the count materialized `next`; the previous frontier is no
        // longer an input to anything unless acc still unions it
        dangling.foreach(release)
        dangling = None
        frontier = next
        acc = acc.union(next)
        accPieces += next
        unionDepth += 1
        // bound the union fan-in: an unbounded union tree makes each
        // iteration's analyze/optimize pass O(depth), i.e. O(n^2) total
        if (unionDepth >= 8) {
          acc = Materialize.checkpoint(acc, eager = true)
          // the re-checkpoint copied every row: superseded pieces are
          // dead — except the current frontier, still the next input
          accPieces.filterNot(_ eq frontier).foreach(release)
          accPieces.clear()
          accPieces += acc
          dangling = Some(frontier)
          unionDepth = 0
        }
      }
      i += 1
    }
    dangling.foreach(release)
    acc
  }

  /** UNION ALL semantics fixpoint: every produced row is kept, no
    * dedup against prior iterations (the SQL `WITH RECURSIVE ... UNION
    * ALL` form; terminates when a step yields no rows, so the step must
    * be contracting — same contract as the reference's worktable
    * execution of UNION ALL CTEs).
    *
    * Because there is no cross-iteration dedup, several steps can run
    * inside ONE Spark job: step(∅) = ∅, so chaining `batch` step
    * applications and unioning their outputs is semantics-preserving
    * even when the fixpoint lands mid-batch (the tail contributes
    * nothing, as narrow no-op work). This cuts the driver's
    * job-per-iteration floor by `batch`× — the dominant cost of deep,
    * narrow recursions — while each job stays fully distributed.
    */
  def fixpointAll(
      init: DataFrame,
      step: DataFrame => DataFrame,
      maxIter: Int = 100,
      batch: Int = 8): DataFrame = {
    require(batch >= 1, "batch must be >= 1")
    var acc = Materialize.checkpoint(init, eager = true)
    val accPieces = mutable.Buffer[DataFrame](acc)
    // frontier checkpoints never join acc here (newRows does), so the
    // previous frontier dies as soon as the current batch's two jobs
    // have consumed it
    var prevFrontier: Option[DataFrame] = None
    var frontier = acc
    var i = 0
    var unionDepth = 0
    var done = frontier.isEmpty
    while (i < maxIter && !done) {
      val k = math.min(batch, maxIter - i)
      val steps = Iterator.iterate(frontier)(step).drop(1).take(k).toVector
      // one job materializes the batch's last frontier (the emptiness
      // probe + next iteration's input) …
      val next = Materialize.checkpoint(steps.last, eager = false)
      val lastEmpty = next.count() == 0
      // … and one job materializes the batch's accumulated rows (the
      // intermediate steps recompute narrowly from the checkpointed
      // frontier — no shuffle, no lineage growth)
      val newRows = Materialize.checkpoint(steps.reduce(_ unionAll _), eager = true)
      prevFrontier.foreach(release)
      prevFrontier = Some(next)
      acc = acc.union(newRows)
      accPieces += newRows
      unionDepth += 1
      if (unionDepth >= 8) {
        acc = Materialize.checkpoint(acc, eager = true)
        accPieces.foreach(release)
        accPieces.clear()
        accPieces += acc
        unionDepth = 0
      }
      frontier = next
      done = lastEmpty
      i += k
    }
    prevFrontier.foreach(release)
    acc
  }
}
