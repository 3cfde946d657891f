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
    var acc = init.localCheckpoint(eager = true)
    var frontier = acc
    var i = 0
    var unionDepth = 0
    var done = frontier.isEmpty
    while (i < maxIter && !done) {
      val next = step(frontier).except(acc).localCheckpoint(eager = false)
      if (next.count() == 0) done = true
      else {
        frontier = next
        acc = acc.union(next)
        unionDepth += 1
        // bound the union fan-in: an unbounded union tree makes each
        // iteration's analyze/optimize pass O(depth), i.e. O(n^2) total
        if (unionDepth >= 8) {
          acc = acc.localCheckpoint(eager = true)
          unionDepth = 0
        }
      }
      i += 1
    }
    acc
  }
}
