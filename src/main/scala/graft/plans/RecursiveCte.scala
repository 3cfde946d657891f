package graft.plans

import org.apache.spark.sql.DataFrame

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
  */
object RecursiveCte {

  /** UNION (distinct) semantics fixpoint: rows already produced don't
    * re-enter the frontier. */
  def fixpoint(
      init: DataFrame,
      step: DataFrame => DataFrame,
      maxIter: Int = 100): DataFrame = {
    var acc = init.localCheckpoint(eager = true)
    var frontier = acc
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      frontier = step(frontier).except(acc).localCheckpoint(eager = true)
      if (!frontier.isEmpty) acc = acc.union(frontier).localCheckpoint(eager = true)
      i += 1
    }
    acc
  }
}
