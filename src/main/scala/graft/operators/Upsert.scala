package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-shaped upsert over immutable columnar storage (neither Spark-on-
  * parquet nor the reference has MERGE INTO — DataFusion's DML surface is
  * INSERT only, datafusion/core/src/dataframe/mod.rs write_table; engines
  * with MERGE rewrite it to exactly this join):
  *
  *   merge(target, source, keys) =
  *     WHEN MATCHED     THEN UPDATE SET * (source wins)
  *     WHEN NOT MATCHED THEN INSERT *
  *     (unmatched target rows pass through)
  *
  * One shuffled full-outer join on the key — both sides hash-partition, so
  * at 100 TB the cost is a single co-partitioned exchange of each side;
  * AQE handles skewed keys. The rewritten table is the join output, ready
  * for a partitioned overwrite (the classic copy-on-write merge).
  */
object Upsert {

  /** Full MERGE: source rows replace matched target rows, new source keys
    * are appended, unmatched target rows survive. Schemas must agree on
    * `keys` ++ `valueCols` (the non-key columns to carry). */
  def merge(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame = {
    val valueCols = target.columns.filterNot(keys.contains)
    require(valueCols.forall(source.columns.contains),
      s"source is missing value columns: ${valueCols.mkString(",")}")
    val t = target.as("t")
    // presence marker instead of key-null tests: NULL key values stay
    // correct under the null-safe join below
    val s = source.withColumn("__src", lit(1)).as("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    // matched → source value; source-only → source; target-only → target
    val merged: Seq[Column] =
      keys.map(k =>
        when(col("s.__src").isNotNull, col(s"s.$k"))
          .otherwise(col(s"t.$k")).as(k)) ++
        valueCols.map(c =>
          when(col("s.__src").isNotNull, col(s"s.$c"))
            .otherwise(col(s"t.$c")).as(c))
    t.join(s, cond, "full_outer").select(merged: _*)
  }

  /** Partition-pruned MERGE against a hive-partitioned parquet table ON
    * DISK — the production upsert shape at 100 TB: only partitions the
    * source touches are read, merged, and dynamically overwritten;
    * untouched partitions' files are never opened, let alone rewritten,
    * so cost scales with the touched slice, not the table.
    *
    * Correctness requires every MATCHED target row to live in a touched
    * partition, so the merge keys must pin the partition column —
    * enforced by `partCol ∈ keys` (the common layout: MERGE ON
    * (day, id) into a day-partitioned table). The source's distinct
    * partition values come to the driver once — bounded by partition
    * count, never by rows.
    *
    * @return the affected partition values (diagnostics/tests). */
  def mergeIntoPartitioned(spark: SparkSession, tableDir: String,
      partCol: String, source: DataFrame, keys: Seq[String]): Seq[Any] = {
    require(keys.contains(partCol),
      s"mergeIntoPartitioned: merge keys must include the partition " +
        s"column $partCol, or matched rows outside touched partitions " +
        "would be silently duplicated")
    val affected = source.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    // isin() is three-valued: a NULL partition value in the target never
    // matches, so when the source touches the NULL partition the filter
    // must include it explicitly — otherwise dynamic overwrite would
    // replace __HIVE_DEFAULT_PARTITION__ with source-only rows, silently
    // deleting every unmatched pre-existing row there
    val nonNull = affected.filter(_ != null)
    val hit =
      if (affected.contains(null) && nonNull.nonEmpty)
        col(partCol).isin(nonNull: _*) || col(partCol).isNull
      else if (affected.contains(null)) col(partCol).isNull
      else col(partCol).isin(nonNull: _*)
    val target = spark.read.parquet(tableDir).filter(hit) // pruned scan
    val merged = merge(target, source, keys)
    // dynamic overwrite replaces ONLY the partitions present in the
    // merged output (exactly the affected set); static mode would drop
    // every other partition of the table
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(tableDir)
    affected
  }

  /** MERGE ... WHEN MATCHED THEN DELETE: drop target rows whose key occurs
    * in source (an anti join — the dedup/retraction path). */
  def antiMerge(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame =
    target.join(source.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
}
