package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{
  BigIntVector, BitVector, FieldVector, Float4Vector, Float8Vector,
  IntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{
  ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC file source/sink (reference: ArrowExec —
  * datafusion/core/src/datasource/physical_plan/arrow_file.rs:49). Spark
  * has no built-in Arrow *file* format, but bundles arrow-vector, so the
  * bridge is small: the sink writes one IPC file per partition (the same
  * parallel-demux shape as any file sink), the scan hands each task a
  * (path, length) pair and streams record batches through an
  * ArrowFileReader over a per-task Hadoop channel — O(batch) read memory.
  *
  * Supported column types: Long, Int, Double, Float, String, Boolean
  * (nullable) — the reference's ArrowExec is likewise a niche bridge, not
  * a primary format (parquet is). Scale: one file per task on both
  * sides; batches stream (default 4096 rows), so memory is O(batch), and
  * a directory of files parallelizes across the cluster.
  */
object ArrowIpc {

  private val BatchRows = 4096

  private def toArrowField(f: StructField): Field = {
    val t = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BooleanType => ArrowType.Bool.INSTANCE
      case other => throw new IllegalArgumentException(
        s"ArrowIpc: unsupported type $other for column ${f.name}")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  private def toSparkType(f: Field): DataType = f.getType match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case other => throw new IllegalArgumentException(
      s"ArrowIpc: unsupported arrow type $other for column ${f.getName}")
  }

  private def setValue(v: FieldVector, i: Int, value: Any): Unit =
    if (value == null) v match {
      case x: BigIntVector => x.setNull(i)
      case x: IntVector => x.setNull(i)
      case x: Float8Vector => x.setNull(i)
      case x: Float4Vector => x.setNull(i)
      case x: VarCharVector => x.setNull(i)
      case x: BitVector => x.setNull(i)
    } else v match {
      case x: BigIntVector => x.setSafe(i, value.asInstanceOf[Long])
      case x: IntVector => x.setSafe(i, value.asInstanceOf[Int])
      case x: Float8Vector => x.setSafe(i, value.asInstanceOf[Double])
      case x: Float4Vector => x.setSafe(i, value.asInstanceOf[Float])
      case x: VarCharVector =>
        x.setSafe(i, value.asInstanceOf[String].getBytes("UTF-8"))
      case x: BitVector =>
        x.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
    }

  private def getValue(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector => x.get(i) == 1
    }

  /** Minimal read-only SeekableByteChannel over a Hadoop
    * FSDataInputStream — lets ArrowFileReader do its footer seek against
    * any Hadoop filesystem, on the driver (schema discovery) and in
    * every scan task (batch streaming). */
  private final class HadoopSeekableByteChannel(
      in: org.apache.hadoop.fs.FSDataInputStream, fileSize: Long)
      extends java.nio.channels.SeekableByteChannel {
    private var stillOpen = true
    override def read(dst: java.nio.ByteBuffer): Int = {
      val buf = new Array[Byte](dst.remaining())
      val n = in.read(buf, 0, buf.length)
      if (n > 0) dst.put(buf, 0, n)
      n
    }
    override def write(src: java.nio.ByteBuffer): Int =
      throw new UnsupportedOperationException("read-only channel")
    override def position(): Long = in.getPos
    override def position(p: Long): java.nio.channels.SeekableByteChannel = {
      in.seek(p); this
    }
    override def size(): Long = fileSize
    override def truncate(s: Long): java.nio.channels.SeekableByteChannel =
      throw new UnsupportedOperationException("read-only channel")
    override def isOpen: Boolean = stillOpen
    override def close(): Unit = { stillOpen = false; in.close() }
  }

  /** Write `df` as a directory of Arrow IPC files, one per partition.
    * All filesystem access goes through the Hadoop FileSystem API — the
    * driver mkdirs and each task creates its part file on the filesystem
    * named by `dir`'s scheme (HDFS/S3A/file alike), never an
    * executor-local java.io path. */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema // serializable; arrow Fields are built per task
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(hconf).mkdirs(dirPath)
    // Configuration is not serializable: ship its entries and rebuild
    // per task (the same trick Spark's own SerializableConfiguration
    // plays, without reaching into a private[spark] class)
    val confEntries = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val taskConf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => taskConf.set(k, v) }
      val partPath = new org.apache.hadoop.fs.Path(dir, s"part-$idx.arrow")
      val fs = partPath.getFileSystem(taskConf)
      val arrowFields = schema.fields.map(toArrowField).toList
      val allocator = new RootAllocator()
      val root = VectorSchemaRoot.create(
        new ArrowSchema(arrowFields.asJava), allocator)
      val out = fs.create(partPath, true)
      val writer = new ArrowFileWriter(root, null,
        java.nio.channels.Channels.newChannel(out))
      writer.start()
      var n = 0
      val vecs = root.getFieldVectors.asScala.toArray
      rows.foreach { row =>
        var c = 0
        while (c < vecs.length) { setValue(vecs(c), n, row.get(c)); c += 1 }
        n += 1
        if (n == BatchRows) {
          root.setRowCount(n); writer.writeBatch(); root.allocateNew(); n = 0
        }
      }
      if (n > 0) { root.setRowCount(n); writer.writeBatch() }
      writer.end(); writer.close(); out.close(); root.close(); allocator.close()
      Iterator.empty
    }.count() // materialize the write
    ()
  }

  /** Distributed scan of a directory of Arrow IPC files: schema from the
    * first file's footer (driver-side, via the Hadoop FileSystem API so
    * remote filesystems work); each task opens its file through the same
    * Hadoop channel and streams record batches — read memory is
    * O(batch), not O(file), so a multi-GB .arrow part never buffers
    * whole in an executor. One task per file (IPC files aren't
    * block-splittable without footer-offset planning; write() bounds
    * part size by its batching, so per-file tasks stay balanced). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    require(fs.exists(dirPath), s"ArrowIpc.read: no such directory $dir")
    val statuses = fs.listStatus(dirPath)
      .filter(_.getPath.getName.endsWith(".arrow"))
    require(statuses.nonEmpty, s"ArrowIpc.read: no .arrow files under $dir")
    val first = statuses.minBy(_.getPath.getName)
    val sparkSchema = {
      val alloc = new RootAllocator()
      val ch = new HadoopSeekableByteChannel(
        fs.open(first.getPath), first.getLen)
      val r = new ArrowFileReader(ch, alloc)
      val fields = r.getVectorSchemaRoot.getSchema.getFields.asScala
        .map(f => StructField(f.getName, toSparkType(f), f.isNullable))
      r.close(); ch.close(); alloc.close()
      StructType(fields.toSeq)
    }
    // ship conf entries, not the (unserializable) Configuration — same
    // trick as write()
    val confEntries = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val files = statuses.map(s => (s.getPath.toString, s.getLen)).toSeq
    val rows = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { case (pathStr, len) =>
        val taskConf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => taskConf.set(k, v) }
        val path = new org.apache.hadoop.fs.Path(pathStr)
        val tfs = path.getFileSystem(taskConf)
        val alloc = new RootAllocator()
        val ch = new HadoopSeekableByteChannel(tfs.open(path), len)
        val reader = new ArrowFileReader(ch, alloc)
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true
          reader.close(); ch.close(); alloc.close()
        }
        // an early-terminating consumer (limit/take/failure) never
        // exhausts the iterator — close on task completion too, or the
        // stream fd + allocator buffers leak for the executor's lifetime
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
        val root = reader.getVectorSchemaRoot
        val out = Iterator.unfold(()) { _ =>
          if (reader.loadNextBatch()) {
            val vecs = root.getFieldVectors.asScala.toArray
            val batch = Array.tabulate(root.getRowCount) { i =>
              Row.fromSeq(vecs.toSeq.map(v => getValue(v, i)))
            }
            Some((batch, ()))
          } else {
            closeAll()
            None
          }
        }
        out.flatten
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
