package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ArrowIpcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("arrow IPC round-trip preserves all supported types and nulls") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("b", BooleanType)))
    val rows = (0 until 10000).map { n =>
      if (n % 7 == 0) Row(null, null, null, null, null, null)
      else Row(n.toLong, n, n / 3.0, n / 7.0f, s"str_$n", n % 2 == 0)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 5), schema)
    val dir = "/tmp/graft_io/arrow_spec"
    ArrowIpc.write(df, dir)
    // one file per partition
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow"))
    assert(files.length == 5)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema == schema)
    val a = df.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("arrow IPC read spans batches (batch size 4096)") {
    import spark.implicits._
    val df = spark.range(0, 9000).toDF("l").repartition(1)
    val dir = "/tmp/graft_io/arrow_spec_batches"
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.count() == 9000)
    assert(back.agg(org.apache.spark.sql.functions.sum("l")).head.getLong(0)
      == (0L until 9000L).sum)
  }

  test("arrow IPC read streams per file: one task per part, no file buffering") {
    import spark.implicits._
    val df = spark.range(0, 6000).toDF("l").repartition(3)
    val dir = "/tmp/graft_io/arrow_spec_stream"
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir)
    // the scan parallelizes (path, len) pairs — one partition per file,
    // each streamed through the Hadoop channel in O(batch) memory
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == 6000)
    assert(back.agg(org.apache.spark.sql.functions.sum("l")).head.getLong(0)
      == (0L until 6000L).sum)
  }
}
