package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** COPY TO / multi-format source-sink surface (reference: CopyTo logical
  * plan expr/src/logical_plan/plan.rs:273, partitioned demux
  * core/src/datasource/file_format/write/demux.rs; scans CsvExec /
  * NdJsonExec / ParquetExec under core/src/datasource/physical_plan/).
  *
  * Spark's DataFrameWriter/Reader already implement all of it — this is
  * the thin `COPY TO`-shaped API plus round-trip helpers the queries use.
  * Hive-style `partitionBy` directories give partition pruning on read
  * (the ListingTable behavior, free in Spark).
  */
object CopyTo {

  /** COPY (df) TO path [PARTITIONED BY (...)] [FORMAT fmt] */
  def copyTo(df: DataFrame, path: String, format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): Unit = {
    var w = df.write.mode("overwrite").format(format).options(options)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(path)
  }

  def readBack(spark: SparkSession, path: String, format: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.read.format(format).options(options)
    schema.foreach(s => r = r.schema(s))
    r.load(path)
  }
}
