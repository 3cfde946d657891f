package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalType, LogicalTypes, Schema}
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
  * task a sync-marker-aligned byte-range split and streams
  * GenericRecords through DataFileReader — O(record-block) read memory,
  * never whole-file buffering, and giant files split across tasks.
  *
  * Supported column types (nullable): Long, Int, Double, Float, String,
  * Boolean, Binary — each encoded as the Avro union ["null", T] — plus
  * the standard Avro logical types: Date (int/date),
  * Timestamp (long/timestamp-micros; timestamp-millis read too), and
  * Decimal (bytes/decimal with the column's precision and scale).
  * At scale: splits default to 128 MiB; every data block is read by
  * exactly one task (a block belongs to the split containing its
  * leading sync marker — the Hadoop AvroRecordReader contract).
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
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType => LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
        case d: DecimalType => LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
        case other => throw new IllegalArgumentException(
          s"AvroIo: unsupported type $other for column ${f.name}")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** Unwrap the ["null", T] union the writer produces. */
  private def unionBase(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toSparkType(s: Schema): DataType = {
    val base = unionBase(s)
    (base.getLogicalType, base.getType) match {
      case (_: LogicalTypes.Date, _) => DateType
      case (_: LogicalTypes.TimestampMicros, _) => TimestampType
      case (_: LogicalTypes.TimestampMillis, _) => TimestampType
      case (d: LogicalTypes.Decimal, _) =>
        DecimalType(d.getPrecision, d.getScale)
      case (_, Schema.Type.LONG) => LongType
      case (_, Schema.Type.INT) => IntegerType
      case (_, Schema.Type.DOUBLE) => DoubleType
      case (_, Schema.Type.FLOAT) => FloatType
      case (_, Schema.Type.STRING) => StringType
      case (_, Schema.Type.BOOLEAN) => BooleanType
      case (_, Schema.Type.BYTES) => BinaryType
      case (_, other) => throw new IllegalArgumentException(
        s"AvroIo: unsupported avro type $other")
    }
  }

  /** Spark value → Avro encoding for one column (null handled by the
    * caller's union; logical types follow the Avro spec's physical
    * encodings: date=epoch days, timestamp-micros=µs since epoch,
    * decimal=big-endian unscaled bytes at the schema's scale). */
  private def toAvroValue(dt: DataType, colName: String): Any => Any = dt match {
    case BinaryType => {
      case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
      case other => other
    }
    case DateType => {
      case d: java.sql.Date =>
        java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
      case ld: java.time.LocalDate =>
        java.lang.Integer.valueOf(ld.toEpochDay.toInt)
      case other => other
    }
    case TimestampType => {
      case t: java.sql.Timestamp => java.lang.Long.valueOf(
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
      case i: java.time.Instant => java.lang.Long.valueOf(
        i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case other => other
    }
    case d: DecimalType => {
      case b: java.math.BigDecimal =>
        // a value whose scale exceeds the column's declared scale can
        // reach here when the DataFrame was built from external rows
        // with no cast enforcing the DecimalType — fail with the column
        // named instead of a bare mid-task ArithmeticException
        val rescaled =
          try b.setScale(d.scale, java.math.RoundingMode.UNNECESSARY)
          catch { case _: ArithmeticException =>
            throw new IllegalArgumentException(
              s"AvroIo: value $b of column '$colName' does not fit " +
              s"DECIMAL(${d.precision},${d.scale}) without rounding; " +
              "cast the column to the declared type first")
          }
        java.nio.ByteBuffer.wrap(rescaled.unscaledValue().toByteArray)
      case other => other
    }
    case _ => identity
  }

  /** Avro decoded value → Spark external row value for one column. */
  private def toSparkValue(avro: Schema): Any => Any = {
    val base = unionBase(avro)
    (base.getLogicalType: LogicalType) match {
      case _: LogicalTypes.Date => {
        case i: java.lang.Integer =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
        case other => other
      }
      case _: LogicalTypes.TimestampMicros => {
        case us: java.lang.Long =>
          val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          ts
        case other => other
      }
      case _: LogicalTypes.TimestampMillis => {
        case ms: java.lang.Long => new java.sql.Timestamp(ms)
        case other => other
      }
      case d: LogicalTypes.Decimal => {
        case bb: java.nio.ByteBuffer =>
          val arr = new Array[Byte](bb.remaining()); bb.get(arr)
          new java.math.BigDecimal(
            new java.math.BigInteger(arr), d.getScale)
        case other => other
      }
      case _ => {
        case u: org.apache.avro.util.Utf8 => u.toString
        case bb: java.nio.ByteBuffer =>
          val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
        case other => other
      }
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
    val convs: Array[Any => Any] =
      schema.fields.map(f => toAvroValue(f.dataType, f.name))
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
          val raw = row.get(i)
          rec.put(i, if (raw == null) null else convs(i)(raw))
          i += 1
        }
        writer.append(rec)
      }
      writer.close() // closes the underlying stream
      Iterator.empty
    }.count()
    ()
  }

  /** Distributed scan of a directory of Avro container files with the
    * default 128 MiB split size. */
  def read(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, 128L * 1024 * 1024)

  /** Distributed scan of a directory of Avro container files: schema
    * from the first file's header (driver-side), then one task per
    * BYTE-RANGE SPLIT. Container files are splittable on their sync
    * markers (the same contract Hadoop's AvroRecordReader uses): a task
    * seeks to the first sync point at or after its range start
    * (DataFileReader.sync) and stops once the reader passes the range
    * end (pastSync), so each data block is read by exactly one task and
    * a single multi-GB container file fans out across the cluster
    * instead of serializing through one task. */
  def read(spark: SparkSession, dir: String, splitBytes: Long): DataFrame = {
    require(splitBytes > 0, s"AvroIo.read: splitBytes must be > 0")
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    require(fs.exists(dirPath), s"AvroIo.read: no such directory $dir")
    val files = fs.listStatus(dirPath)
      .filter(_.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName).toSeq
    require(files.nonEmpty, s"AvroIo.read: no .avro files under $dir")
    val splits: Seq[(String, Long, Long)] = files.flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map(i => (st.getPath.toString,
        i * splitBytes, math.min((i + 1) * splitBytes, len)))
    }
    val sparkSchema = {
      val in = fs.open(files.head.getPath)
      val stream = new DataFileStream[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      try StructType(stream.getSchema.getFields.asScala.map(f =>
        StructField(f.name, toSparkType(f.schema()), nullable = true)).toSeq)
      finally { stream.close(); in.close() }
    }
    val confEntries = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val n = sparkSchema.length
    val fieldNames = sparkSchema.fields.map(_.name)
    val rows = spark.sparkContext
      .parallelize(splits, splits.length)
      .flatMap { case (pathStr, start, end) =>
        val taskConf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => taskConf.set(k, v) }
        val path = new org.apache.hadoop.fs.Path(pathStr)
        val in = new org.apache.avro.mapred.FsInput(path, taskConf)
        // a corrupt header must not leak the input stream — the
        // completion listener is only registered further down
        val reader =
          try org.apache.avro.file.DataFileReader.openReader(
            in, new GenericDatumReader[GenericRecord]())
          catch { case t: Throwable => in.close(); throw t }
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true; reader.close(); in.close()
        }
        // early-terminating consumers never exhaust the iterator —
        // close on task completion too (same rule as ArrowIpc.read)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
        // the Spark schema (and positional decode below) came from the
        // FIRST file's header — a directory mixing files with different
        // field counts/names would silently misalign columns: error
        // with the offending file named instead
        try {
          val taskFields = reader.getSchema.getFields.asScala.map(_.name)
          if (taskFields.length != n || !taskFields.sameElements(fieldNames))
            throw new IllegalArgumentException(
              s"AvroIo.read: $pathStr header fields " +
              taskFields.mkString("[", ",", "]") +
              " do not match the directory schema " +
              fieldNames.mkString("[", ",", "]") +
              " (derived from the first file)")
          // own the blocks whose sync marker lies in [start, end)
          reader.sync(start)
        } catch { case t: Throwable => closeAll(); throw t }
        // per-field decoders from THIS file's header (logical types ride
        // on the writer schema, not the reader's guess)
        val convs = reader.getSchema.getFields.asScala
          .map(f => toSparkValue(f.schema())).toArray
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext && !reader.pastSync(end)
            if (!h) closeAll()
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(Seq.tabulate(n) { i =>
              val raw = rec.get(i)
              if (raw == null) null else convs(i)(raw)
            })
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
