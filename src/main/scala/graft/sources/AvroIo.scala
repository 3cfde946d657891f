package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{
  GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink (reference: AvroExec —
  * datafusion/core/src/datasource/physical_plan/avro.rs:38). The
  * spark-avro CONNECTOR is not in this image, but the Avro core jars
  * (avro, avro-mapred) ship with Spark itself — so the bridge is built
  * directly on the Avro Java API, the same per-partition-file shape as
  * ArrowIpc: the sink writes one .avro object-container file per
  * partition through the Hadoop FileSystem API, the scan hands each
  * task a file path and streams GenericRecords through DataFileStream —
  * O(record-block) read memory, never whole-file buffering.
  *
  * Supported column types (nullable): Long, Int, Double, Float, String,
  * Boolean, Binary — each encoded as the Avro union ["null", T].
  * At scale: one task per container file (Avro files ARE block-split-
  * table via sync markers, but per-file tasks keep the bridge small;
  * the writer bounds file size by its input partitioning).
  */
object AvroIo {

  private def toAvroSchema(schema: StructType, name: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroIo: unsupported type $other for column ${f.name}")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def toSparkType(s: Schema): DataType = {
    // unwrap the ["null", T] union the writer produces
    val base =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else s
    base.getType match {
      case Schema.Type.LONG => LongType
      case Schema.Type.INT => IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.STRING => StringType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(
        s"AvroIo: unsupported avro type $other")
    }
  }

  /** Write `df` as a directory of Avro container files, one per
    * partition, through the Hadoop FileSystem API (HDFS/S3A/file
    * alike). */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema, "graft_record").toString
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(hconf).mkdirs(dirPath)
    val confEntries = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val taskConf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => taskConf.set(k, v) }
      val avroSchema = new Schema.Parser().parse(avroJson)
      val partPath = new org.apache.hadoop.fs.Path(dir, f"part-$idx%05d.avro")
      val fs = partPath.getFileSystem(taskConf)
      val out = fs.create(partPath, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      writer.create(avroSchema, out)
      rows.foreach { row =>
        val rec = new GenericData.Record(avroSchema)
        var i = 0
        while (i < schema.length) {
          val v = row.get(i) match {
            case null => null
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other => other
          }
          rec.put(i, v)
          i += 1
        }
        writer.append(rec)
      }
      writer.close() // closes the underlying stream
      Iterator.empty
    }.count()
    ()
  }

  /** Distributed scan of a directory of Avro container files: schema
    * from the first file's header (driver-side), then one task per file
    * streaming records through DataFileStream. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    require(fs.exists(dirPath), s"AvroIo.read: no such directory $dir")
    val files = fs.listStatus(dirPath)
      .filter(_.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted.toSeq
    require(files.nonEmpty, s"AvroIo.read: no .avro files under $dir")
    val sparkSchema = {
      val in = fs.open(new org.apache.hadoop.fs.Path(files.head))
      val stream = new DataFileStream[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      try StructType(stream.getSchema.getFields.asScala.map(f =>
        StructField(f.name, toSparkType(f.schema()), nullable = true)).toSeq)
      finally { stream.close(); in.close() }
    }
    val confEntries = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val n = sparkSchema.length
    val rows = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { pathStr =>
        val taskConf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => taskConf.set(k, v) }
        val path = new org.apache.hadoop.fs.Path(pathStr)
        val tfs = path.getFileSystem(taskConf)
        val in = tfs.open(path)
        val stream = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true; stream.close(); in.close()
        }
        // early-terminating consumers never exhaust the iterator —
        // close on task completion too (same rule as ArrowIpc.read)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = stream.hasNext
            if (!h) closeAll()
            h
          }
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq(Seq.tabulate(n) { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
                case other => other
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
