package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range joins — point-in-interval and interval-overlap — via bin
  * bucketing (an extension; the reference has no range-join operator:
  * SURVEY.md §2.3 notes its SymmetricHashJoinExec interval analysis is
  * stream-state pruning, not a range join, and DuckDB's IEJoin serves as
  * the oracle).
  *
  * Spark plans a raw `p BETWEEN lo AND hi` predicate with no equi keys as
  * a BroadcastNestedLoopJoin — O(|L|·|R|) probes, workable only while one
  * side fits a broadcast. The scale path quantizes the range domain into
  * fixed-width bins: each interval row is replicated to every bin it
  * overlaps (fan-out ≈ width/binWidth + 1), each point maps to exactly
  * one bin, and the join becomes a hash equi-join on the bin id (plus any
  * user equi keys) followed by the exact range predicate over the
  * bin-local candidates. One shuffle on (keys, bin), no quadratic probe,
  * and a skewed bin is ordinary join skew — AQE splits it.
  *
  * Pick `binWidth` near the median interval width: much smaller inflates
  * the interval-side replication, much larger inflates candidates per
  * bin. Correctness is binWidth-invariant (property-tested in
  * RangeJoinSpec).
  *
  * Bounds are numeric (long/double/int); join DATE/TIMESTAMP ranges by
  * passing epoch days/seconds (e.g. `datediff(d, '1970-01-01')`).
  */
object RangeJoin {

  private def bin(c: org.apache.spark.sql.Column, w: Double) =
    floor(c.cast("double") / w).cast("long")

  /** Inner point-in-interval join: every (point, interval) pair with
    * `points(point)` in `[intervals(lo), intervals(hi)]` (inclusive both
    * ends) and equal values on `keys`. Null points/bounds and empty
    * intervals (lo > hi) never match. Non-key column names must be
    * disjoint across the two inputs; output = points.* ++ intervals.*
    * (keys once).
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      point: String, lo: String, hi: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin",
        explode(sequence(bin(col(lo), binWidth), bin(col(hi), binWidth))))
    val pt = points
      .filter(col(point).isNotNull)
      .withColumn("__bin", bin(col(point), binWidth))
    pt.join(iv, keys :+ "__bin")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__bin")
  }

  /** Inner interval-overlap join: every (left, right) pair whose closed
    * intervals intersect — `lLo <= rHi && rLo <= lHi` — with equal values
    * on `keys`. Both sides replicate to their bins; a pair is emitted
    * only in the first bin of its intersection (`bin(max(lLo, rLo))` —
    * floor is monotone, so that bin is covered by both intervals and is
    * unique), which dedupes without a distinct. Null bounds and empty
    * intervals never match; non-key column names must be disjoint.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin",
        explode(sequence(bin(col(lo), binWidth), bin(col(hi), binWidth))))
    binned(left, lLo, lHi).join(binned(right, rLo, rHi), keys :+ "__bin")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__bin") === greatest(bin(col(lLo), binWidth), bin(col(rLo), binWidth)))
      .drop("__bin")
  }
}
