package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass data-quality profiling for pipeline gating (beyond the
  * reference — the Deequ/profiler shape): per-column null count, distinct
  * count, and type-appropriate stats, emitted long-format
  * (column, metric, value) so a 5000-column profile is still one row
  * group, not a 15000-column row.
  *
  * Everything folds into a SINGLE two-phase hash aggregate over one scan —
  * no per-column jobs — then a constant-width unpivot.
  *
  * Distinct counts: approx_count_distinct (HLL++, fixed state) by
  * default — one count(DISTINCT) PER COLUMN would give the aggregate an
  * Expand factor equal to the column count, unusable at 100 TB. Spark's
  * HLL++ is dense-only (no exact sparse mode), so its estimate is ±rsd
  * even at tiny cardinalities; pass approxDistinct=false when exact
  * values are required and the Expand cost is acceptable (the oracled
  * query does, to stay hash-comparable).
  */
object Quality {

  /** Long-format profile: one row per (column, metric). Metrics:
    * n_nulls + n_distinct for every column; min/max/avg for
    * numerics; len_min/len_max/len_avg for strings. Doubles are rounded
    * to 4 places to keep downstream compares deterministic. */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = true): DataFrame = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs: Seq[Column] = cols.flatMap { c =>
      val nd = if (approxDistinct) approx_count_distinct(col(c), 0.005)
        else countDistinct(col(c))
      val base = Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__n_nulls"),
        nd.as(s"${c}__n_distinct"))
      fields(c) match {
        case _: NumericType => base ++ Seq(
          round(min(col(c)).cast("double"), 4).as(s"${c}__min"),
          round(max(col(c)).cast("double"), 4).as(s"${c}__max"),
          round(avg(col(c)) + 1e-9, 4).as(s"${c}__avg"))
        case StringType => base ++ Seq(
          min(length(col(c))).cast("long").as(s"${c}__len_min"),
          max(length(col(c))).cast("long").as(s"${c}__len_max"),
          round(avg(length(col(c))) + 1e-9, 4).as(s"${c}__len_avg"))
        case _ => base
      }
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // constant-width unpivot of the single profile row
    val entries = wide.columns.map { full =>
      val Array(c, m) = full.split("__", 2)
      struct(lit(c).as("col_name"), lit(m).as("metric"),
        col(full).cast("double").as("value"))
    }
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.metric").as("metric"),
        col("e.value").as("value"))
  }

  /** Piggyback quality metrics onto a query the pipeline runs ANYWAY:
    * df.observe collects the aggregates on the rows flowing through the
    * plan — zero extra scan, zero extra shuffle (an accumulator per
    * metric). At 100 TB this is how a write job also produces its row
    * count / null rate / value bounds; `profile` is the standalone
    * alternative when no carrier query exists. Returns the instrumented
    * frame plus the Observation to read AFTER an action runs it. */
  def observed(df: DataFrame, name: String,
      metrics: Seq[Column]): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
