package graft

import graft.sources.AvroIo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Avro container-file source/sink (reference AvroExec capability):
  * round-trip fidelity incl. nulls, multi-file parallel scan, and the
  * one-task-per-file streaming shape. */
class AvroIoSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  test("avro round-trip preserves supported types and nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, 10, 1.5, 2.5f, "a", true, Array[Byte](1, 2)),
      (2L, 20, -0.5, 0.0f, "", false, Array.empty[Byte]))
      .toDF("l", "i", "d", "f", "s", "b", "bin")
      .union(Seq((3L, 30, 0.0, 1.0f, "z", true, Array[Byte](9)))
        .toDF("l", "i", "d", "f", "s", "b", "bin"))
      .withColumn("s", when(col("l") === 2L, lit(null)).otherwise(col("s")))
    val dir = "/tmp/graft_io/avro_spec_types"
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getFloat(3),
        Option(r.getString(4)), r.getBoolean(5),
        r.getAs[Array[Byte]](6).toSeq)
    assert(back.collect().map(key).toSet == df.collect().map(key).toSet)
  }

  test("avro logical types round-trip: date, timestamp-micros, decimal") {
    import spark.implicits._
    val df = Seq(
      (1L, "2020-02-29", "2020-06-15 13:45:30.123456", "12345.67"),
      (2L, "1969-12-31", "1969-12-31 23:59:59.999999", "-0.01"),
      (3L, null, null, null))
      .toDF("id", "ds", "tss", "decs")
      .select(col("id"), col("ds").cast("date").as("d"),
        col("tss").cast("timestamp").as("ts"),
        col("decs").cast("decimal(12,2)").as("dec"))
    val dir = "/tmp/graft_io/avro_spec_logical"
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), Option(r.getDate(1)).map(_.toString),
        Option(r.getTimestamp(2)).map(_.toString),
        Option(r.getDecimal(3)).map(_.toPlainString))
    assert(back.collect().map(key).sortBy(_._1).toSeq ==
      df.collect().map(key).sortBy(_._1).toSeq)
  }

  test("avro read runs one streaming task per container file") {
    import spark.implicits._
    val df = spark.range(0, 5000).toDF("l").repartition(4)
    val dir = "/tmp/graft_io/avro_spec_files"
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 5000)
    assert(back.agg(sum("l")).head.getLong(0) == (0L until 5000L).sum)
    // early termination must not break subsequent reads (listener path)
    assert(AvroIo.read(spark, dir).limit(3).collect().length == 3)
    assert(AvroIo.read(spark, dir).count() == 5000)
  }

  test("avro block-split scan covers every record exactly once") {
    import spark.implicits._
    // ONE container file, many records, then a split size far below the
    // file length: rows must fan out over many byte-range tasks with no
    // record dropped or doubled (sync-marker ownership contract)
    val df = spark.range(0, 20000)
      .select(col("id").as("l"), concat(lit("row-"), col("id")).as("s"))
      .repartition(1)
    val dir = "/tmp/graft_io/avro_spec_split"
    AvroIo.write(df, dir)
    val fileLen = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.length()).sum
    assert(fileLen > 64 * 1024, s"test file too small ($fileLen) to split")
    val back = AvroIo.read(spark, dir, splitBytes = 16 * 1024)
    assert(back.rdd.getNumPartitions > 3,
      s"expected many splits, got ${back.rdd.getNumPartitions}")
    assert(back.count() == 20000)
    assert(back.agg(sum("l")).head.getLong(0) == (0L until 20000L).sum)
    assert(back.select("s").distinct().count() == 20000)
    // split boundaries landing inside blocks must not change results
    assert(AvroIo.read(spark, dir, splitBytes = 10000).count() == 20000)
    assert(AvroIo.read(spark, dir, splitBytes = fileLen * 2).count() == 20000)
  }

  test("avro scan of a real table matches the parquet source") {
    val orders = Engine.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val dir = "/tmp/graft_io/avro_spec_orders"
    AvroIo.write(orders, dir)
    val back = AvroIo.read(spark, dir)
    assert(back.count() == orders.count())
    val a = back.agg(sum("o_orderkey")).head.getLong(0)
    val b = orders.agg(sum("o_orderkey")).head.getLong(0)
    assert(a == b)
  }
}
