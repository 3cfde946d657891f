package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-column file skipping
  * (beyond the reference — DataFusion relies on whatever order the files
  * arrive in; lakehouse engines cluster by z-value so per-file min/max
  * stats stay tight on EVERY clustered column, not just the sort prefix).
  *
  * zValue interleaves the low `bits` bits of each column:
  * bit i of column j lands at output bit `i * n + (n - 1 - j)`.
  * Pure shift/mask arithmetic → whole-stage codegen, no UDF.
  *
  * Scale path: `cluster` = repartitionByRange on the z-value (sampled
  * range boundaries → balanced files) + sortWithinPartitions, so a 100 TB
  * rewrite is one range exchange; readers then prune files on any
  * clustered column's min/max. ZOrderSpec measures the per-file span
  * shrink vs a single-column sort.
  */
object ZOrder {

  /** Morton code of the given integer columns' low `bits` bits, as BIGINT.
    * n * bits must stay ≤ 63. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1, "zValue needs at least one column")
    require(n * bits <= 63, s"$n cols x $bits bits exceeds a signed long")
    val parts =
      for {
        (c, j) <- cols.zipWithIndex
        i <- 0 until bits
      } yield shiftleft(
        shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
        i * n + (n - 1 - j))
    parts.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into `numFiles` z-clustered ranges (one output file per
    * partition when written).
    *
    * Columns are min/max-normalized to the full `bits` width first —
    * without this, a column with a wider domain owns the curve's high
    * bits and the narrow column degenerates to a suffix sort (LayoutSpec
    * caught exactly that). One extra min/max agg pass; a 100 TB rewrite
    * would read those bounds from catalog/file statistics instead. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    val statExprs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val statRow = df.agg(statExprs.head, statExprs.tail: _*).head()
    val scale = (1L << bits) - 1
    val normd = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (statRow.getDouble(2 * i), statRow.getDouble(2 * i + 1))
      val width = math.max(hi - lo, 1e-300)
      ((col(c).cast("double") - lit(lo)) / lit(width) * lit(scale.toDouble))
        .cast("long")
    }
    df.withColumn("__z", zValue(normd, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
