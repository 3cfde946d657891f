package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Stream ≡ batch: the transforms in graft.streaming.Streaming are
  * mode-agnostic; feeding the same rows through MemoryStream must produce
  * the batch answer (the reference's "stream = unbounded table" semantics,
  * datafusion/core/src/datasource/stream.rs). */
class StreamingSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private lazy val rows: Seq[Ev] = {
    import spark.implicits._
    Engine.table(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Ev].collect().toSeq
  }

  test("streaming tumbling window equals batch, fed incrementally") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streaming.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName("tumb")
      .outputMode("complete").start()
    val (first, second) = rows.splitAt(rows.size / 2)
    ms.addData(first)
    q.processAllAvailable()
    ms.addData(second)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumb").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = Streaming.tumblingCounts(rows.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
  }

  test("stream-stream interval join equals batch join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streaming.clickToPurchase(ms.toDF())
      .select(col("c_id"), col("p_id"))
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    ms.addData(rows)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssj").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Streaming.clickToPurchase(rows.toDF())
      .select(col("c_id"), col("p_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("stream-static join enriches streaming rows from a static table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // static dimension derived from the same events (user → first type)
    val dim = rows.groupBy(_.user_id)
      .map { case (u, es) => (u, es.minBy(_.event_id).event_type) }
      .toSeq.toDF("user_id", "first_type")
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .join(dim, Seq("user_id")) // stream-static: dim is broadcast/reread
      .select(col("event_id"), col("user_id"), col("first_type"))
      .writeStream.format("memory").queryName("ssj_static")
      .outputMode("append").start()
    val (a, b) = rows.splitAt(rows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssj_static").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = rows.toDF().join(dim, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("first_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState running totals converge to batch totals") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val pairs = rows.map(e => (e.user_id, e.value))
    val ms = MemoryStream[(Long, Double)]
    val q = Streaming.runningUserTotals(ms.toDS())
      .toDF("user_id", "n", "total")
      .writeStream.format("memory").queryName("tot")
      .outputMode("append").start()
    val (a, b) = pairs.splitAt(pairs.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    q.stop()
    // last emitted update per user == batch aggregate
    val streamed = spark.table("tot")
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = pairs.groupBy(_._1).map { case (u, vs) => u -> vs.size.toLong }
    assert(streamed == batch)
  }

  test("left-outer interval join emits unmatched clicks after watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def ev(id: Long, offsetMin: Int, user: Long, typ: String): Ev =
      Ev(id, new java.sql.Timestamp(base.getTime + offsetMin * 60000L),
        user, typ, id * 1.0)
    val data = Seq(
      ev(1, 0, 1, "click"), ev(2, 10, 1, "purchase"), // matched pair
      ev(3, 5, 2, "click"),                           // no purchase → NULL
      ev(4, 50, 3, "purchase"))                       // purchase w/o click
    val ms = MemoryStream[Ev]
    val q = Streaming.clickToPurchaseLeftOuter(ms.toDF(), watermark = "10 minutes")
      .select(col("c_id"), col("p_id"))
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    ms.addData(data)
    q.processAllAvailable()
    // unmatched rows need the watermark to pass c_ts + 30min + delay;
    // push it far ahead, then one more batch to flush evictions
    ms.addData(ev(9, 600, 9, "click"))
    q.processAllAvailable()
    ms.addData(ev(10, 1200, 9, "click"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssj_outer").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    // batch truth over the original rows (flush clicks 9/10 excluded —
    // their own intervals never close before the stream stops)
    val batch = Streaming.clickToPurchaseLeftOuter(data.toDF())
      .select(col("c_id"), col("p_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(streamed.filter(_._1 < 9L) == batch)
    assert(batch.contains((3L, -1L)), "unmatched click must carry NULL")
  }

  test("full-outer interval join emits unmatched rows of BOTH sides") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def ev(id: Long, offsetMin: Int, user: Long, typ: String): Ev =
      Ev(id, new java.sql.Timestamp(base.getTime + offsetMin * 60000L),
        user, typ, id * 1.0)
    val data = Seq(
      ev(1, 0, 1, "click"), ev(2, 10, 1, "purchase"), // matched pair
      ev(3, 5, 2, "click"),                           // no purchase → NULL p
      ev(4, 50, 3, "purchase"))                       // no click → NULL c
    val ms = MemoryStream[Ev]
    val q = Streaming.clickToPurchaseFullOuter(ms.toDF(), watermark = "10 minutes")
      .select(col("c_id"), col("p_id"))
      .writeStream.format("memory").queryName("ssj_full")
      .outputMode("append").start()
    ms.addData(data)
    q.processAllAvailable()
    // push the watermark far past every interval, then one more batch to
    // flush evictions. BOTH sides need late events: the global watermark
    // is min(click wm, purchase wm), so click-only flushes would pin the
    // purchase watermark and the unmatched purchase would never evict
    ms.addData(ev(9, 600, 9, "click"), ev(11, 600, 9, "purchase"))
    q.processAllAvailable()
    ms.addData(ev(10, 1200, 9, "click"), ev(12, 1200, 9, "purchase"))
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row): (Long, Long) =
      (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))
    val streamed = spark.table("ssj_full").collect().map(key).toSet
    val batch = Streaming.clickToPurchaseFullOuter(data.toDF())
      .select(col("c_id"), col("p_id")).collect().map(key).toSet
    // flush events 9-12 excluded on both key positions: their intervals
    // never close before the stream stops
    assert(streamed.filter(t => t._1 < 9L && t._2 < 9L) == batch)
    assert(batch.contains((3L, -1L)), "unmatched click must NULL-pad")
    assert(batch.contains((-1L, 4L)), "unmatched purchase must NULL-pad")
  }

  test("right-outer interval join emits unmatched purchases on eviction") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def ev(id: Long, offsetMin: Int, user: Long, typ: String): Ev =
      Ev(id, new java.sql.Timestamp(base.getTime + offsetMin * 60000L),
        user, typ, id * 1.0)
    val data = Seq(
      ev(1, 0, 1, "click"), ev(2, 10, 1, "purchase"), // matched pair
      ev(3, 5, 2, "click"),                           // no purchase → dropped
      ev(4, 50, 3, "purchase"))                       // no click → NULL c
    val ms = MemoryStream[Ev]
    val q = Streaming.clickToPurchaseRightOuter(ms.toDF(), watermark = "10 minutes")
      .select(col("c_id"), col("p_id"))
      .writeStream.format("memory").queryName("ssj_right")
      .outputMode("append").start()
    ms.addData(data)
    q.processAllAvailable()
    // late events on BOTH sides advance the global (min) watermark
    ms.addData(ev(9, 600, 9, "click"), ev(11, 600, 9, "purchase"))
    q.processAllAvailable()
    ms.addData(ev(10, 1200, 9, "click"), ev(12, 1200, 9, "purchase"))
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row): (Long, Long) =
      (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))
    val streamed = spark.table("ssj_right").collect().map(key).toSet
    val batch = Streaming.clickToPurchaseRightOuter(data.toDF())
      .select(col("c_id"), col("p_id")).collect().map(key).toSet
    assert(streamed.filter(t => t._1 < 9L && t._2 < 9L) == batch)
    assert(batch.contains((-1L, 4L)), "unmatched purchase must NULL-pad")
    assert(!batch.exists(_._1 == 3L), "unmatched click must NOT emit")
  }

  test("transformWithState running totals equal flatMapGroupsWithState and batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val pairs = rows.map(e => (e.user_id, e.value))
      val ms = MemoryStream[(Long, Double)]
      val q = Streaming.runningUserTotalsTws(ms.toDS())
        .toDF("user_id", "n", "total")
        .writeStream.format("memory").queryName("tws")
        .outputMode("update").start()
      val (a, b) = pairs.splitAt(pairs.size / 2)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      q.stop()
      // final update per user == batch aggregate == fMGWS contract
      val streamed = spark.table("tws")
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = pairs.groupBy(_._1)
        .map { case (u, vs) => u -> vs.size.toLong }
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("watermark discards late data in append-mode aggregation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def ev(id: Long, offsetMin: Int): Ev =
      Ev(id, new java.sql.Timestamp(base.getTime + offsetMin * 60000L),
        1L, "click", 1.0)
    val ms = MemoryStream[Ev]
    val q = Streaming.tumblingCounts(ms.toDF(), width = "10 minutes",
        watermark = "15 minutes")
      .writeStream.format("memory").queryName("wm")
      .outputMode("append").start()
    // window [10:00,10:10) gets 2 events; advance watermark far past it
    ms.addData(ev(1, 2), ev(2, 5))
    q.processAllAvailable()
    ms.addData(ev(3, 60)) // 11:00 → watermark 10:45 → 10:00 window final
    q.processAllAvailable()
    // a straggler for the already-finalized window must be dropped
    ms.addData(ev(4, 3))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    assert(out(base) == 2L,
      s"late event must not change the finalized window: $out")
  }

  test("streaming dedup drops duplicate keys across microbatches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def ev(id: Long, offsetMin: Int): Ev =
      Ev(id, new java.sql.Timestamp(base.getTime + offsetMin * 60000L),
        id % 3, "click", 1.0)
    val ms = MemoryStream[Ev]
    val q = Streaming.dedupStream(ms.toDF(), Seq("event_id"))
      .select(col("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    ms.addData(ev(1, 0), ev(2, 1), ev(1, 2)) // dup inside one batch
    q.processAllAvailable()
    ms.addData(ev(2, 3), ev(3, 4)) // dup across batches + a new key
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup").collect().map(_.getLong(0)).toSeq
    assert(out.sorted == Seq(1L, 2L, 3L), s"got $out")
    // batch mode degenerates to dropDuplicates
    val batch = Streaming.dedupStream(
      Seq(ev(1, 0), ev(1, 2), ev(2, 1)).toDF(), Seq("event_id"))
    assert(batch.count() == 2)
  }

  test("session windows produce per-user sessions in batch mode") {
    import spark.implicits._
    val out = Streaming.sessionCounts(rows.toDF()).collect()
    assert(out.nonEmpty)
    // every session has n_events >= 1 and end - start >= gap
    out.foreach { r =>
      assert(r.getLong(3) >= 1)
      assert(r.getTimestamp(1).getTime - r.getTimestamp(0).getTime >= 600000L)
    }
  }

  test("checkpointed file-to-file query is exactly-once across restarts") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = "/tmp/graft_stream_ckpt"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("value", DoubleType)))
    def addFile(ids: Range): Unit =
      ids.map(i => (i.toLong, i * 0.5)).toDF("event_id", "value")
        .coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .select(col("event_id"), (col("value") * 2).as("v2"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    addFile(0 until 100)
    runOnce()
    // new files land while the query is DOWN; the restart resumes from
    // the checkpointed offset — old files are not reprocessed
    addFile(100 until 200)
    runOnce()
    // a restart with nothing new must emit nothing
    runOnce()
    val out = spark.read.parquet(sink).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.length === 200, "each input row exactly once")
    assert(out.toMap.keySet === (0L until 200L).toSet)
    assert(out.toMap.forall { case (k, v) => v == k * 1.0 })
  }

  test("Trigger.AvailableNow drains the backlog then stops on its own") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val base = "/tmp/graft_stream_avail"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val schema = StructType(Seq(StructField("event_id", LongType)))
    (0L until 300L).toDF("event_id").coalesce(3)
      .write.parquet(s"$base/src")
    // the backfill pattern: bounded catch-up over existing files with
    // streaming semantics (checkpoint, batching), then clean exit
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
      .writeStream.format("parquet")
      .option("path", s"$base/sink")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "query must self-terminate")
    val out = spark.read.parquet(s"$base/sink")
    assert(out.count() == 300)
    // maxFilesPerTrigger=1 → the drain ran as multiple micro-batches
    val nBatches = new java.io.File(s"$base/ckpt/commits").listFiles()
      .count(_.getName.forall(_.isDigit))
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")
  }

  test("foreachBatch idempotent sink stays exactly-once through batch replay") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = "/tmp/graft_stream_feb"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("value", DoubleType)))
    def addFile(ids: Range): Unit =
      ids.map(i => (i.toLong, i * 0.5)).toDF("event_id", "value")
        .coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream
        .foreachBatch(Streaming.idempotentParquetSink(sink))
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    addFile(0 until 100); runOnce()
    addFile(100 until 150); runOnce()
    // simulate "wrote the sink, died before committing": delete the LAST
    // batch's commit marker — on restart Structured Streaming re-runs that
    // batchId through foreachBatch with the same content
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    // also drop the ChecksumFs .crc sidecar, or the replay's rename-commit
    // fails on the stale checksum (local-FS artifact only)
    new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
      .delete()
    commits.last.delete()
    runOnce() // replays the last batch → overwrite, not append
    val out = spark.read.parquet(sink)
    assert(out.count() === 150, "replayed batch must not duplicate rows")
    assert(out.select(col("event_id")).as[Long].collect().toSet ===
      (0L until 150L).toSet)
    // the sink reads as a batch_id-partitioned table with ≥ 2 batches
    assert(out.select(col("batch_id")).distinct().count() >= 2)
  }

  test("streaming incremental dedup vs growing store equals the batch " +
      "operator run snapshot by snapshot") {
    import spark.implicits._
    import graft.pipeline.Dedup
    implicit val ctx = spark.sqlContext
    val base = "/tmp/graft_stream_incdedup"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    // corpus: sf0.001 docs split by id (A = lower half, B = upper) so
    // the smaller-id law precondition holds across batches; B also
    // carries an EXACT copy of an A text under a fresh max id, so the
    // cross-batch store path provably fires
    val all = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mid = all(all.length / 2)._1
    val a = all.filter(_._1 < mid).toSeq
    val b = all.filter(_._1 >= mid).toSeq :+
      ((all.map(_._1).max + 1000L, a.head._2))
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(Streaming.incrementalDedupSink(
        s"$base/store", s"$base/report", "doc_id", "text", maxHamming = 1))
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    q.stop()
    def asMap(df: org.apache.spark.sql.DataFrame, sigCol: String) =
      df.select("doc_id", sigCol, "is_dup", "dup_src").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // the sink runs the auto router over the WIDE store schema; below
    // the knee its decision — and sig0, same scramble family — is
    // bit-identical to the narrow batch operator (Dedup scaladoc)
    val streamed = asMap(spark.read.parquet(s"$base/report"), "sig0")
    // ground truth: the batch operator over the whole corpus at once
    val union = (a ++ b).toDF("doc_id", "text")
    val whole = asMap(Dedup.incrementalDedupSimhash(
      Dedup.emptySigStore(spark), union, "doc_id", "text",
      maxHamming = 1), "sig")
    assert(streamed == whole,
      s"stream != batch: ${(streamed.toSet diff whole.toSet).take(3)} / " +
        s"${(whole.toSet diff streamed.toSet).take(3)}")
    // the planted copy was caught via the PERSISTED store (batch 0's
    // signatures), not within its own micro-batch
    val planted = streamed(all.map(_._1).max + 1000L)
    assert(planted._2 && planted._3.exists(_ < mid),
      s"planted cross-batch dup not attributed to batch 0: $planted")
    // the store reads back as one table holding every signature seen,
    // carrying the wide schema from batch 0 (so the router can cross
    // the knee mid-stream without a store migration)
    val store = spark.read.parquet(s"$base/store")
    assert(store.count() == a.size + b.size)
    assert(Seq("id", "sig0", "sig1").forall(store.columns.contains),
      s"store schema must be wide: ${store.columns.mkString(",")}")
  }
}
