package graft.tools

import graft.Engine
import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Store-scaling probe for the incremental signature-store dedup: the
  * production asymmetry is a HUGE history and a small new snapshot, so
  * this grows the store ×(fac−1) replicas (ids o·fac+rep, rep ≥ 1)
  * while the batch stays the rep-0 originals, and measures wall +
  * shuffle per store signature with the exactness law asserted at
  * every point (dup_src(o·f) = m1(o)·f when a smaller-id batch doc
  * matches first, else m1(o)·f + 1 — the PipeScale 1b invariant).
  * The claim under test: history cost is signatures-only and the
  * bloom-prefiltered chunk join scales with the store row count, not
  * the text corpus.
  *
  * Usage: tools/run_jvm.sh graft.tools.IncrementalAb [fac ...]
  *        (default 10 50 100); SPARK_GRAFT_SF_DIR as usual. */
object IncrementalAb {
  def main(args: Array[String]): Unit = {
    val facs = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 50, 100)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val docs = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    import org.apache.spark.sql.DataFrame
    // two variants: narrow (4×2^8 buckets — the sizing rule bounds it
    // near ~50k signatures) and wide (4×2^15 — the >50k store shape);
    // each is checked against ITS OWN ×1 self-probe law
    case class V(name: String,
        mkStore: DataFrame => DataFrame,
        dedup: (DataFrame, DataFrame) => DataFrame)
    val variants = Seq(
      V("narrow",
        df => Dedup.simhashStorePortable(df, "doc_id", "text"),
        (s, b) => Dedup.incrementalDedupSimhash(s, b, "doc_id", "text",
          maxHamming = 1, persistSigs = false)),
      V("wide  ",
        df => Dedup.simhashStorePortableWide(df, "doc_id", "text"),
        (s, b) => Dedup.incrementalDedupSimhashWide(s, b, "doc_id", "text",
          maxHamming = 2, persistSigs = false)
          .select(col("doc_id"), col("sig0").as("sig"), col("is_dup"),
            col("dup_src"))),
      // r14: the Jaccard face — band buckets are value-continuous
      // (~2^30 slice hashes per band), so the fixed-key-space crowding
      // that knees the narrow SimHash path shouldn't appear; this row
      // is the measurement behind that claim
      V("minhash",
        df => Dedup.minhashSigStore(df, "doc_id", "text"),
        (s, b) => Dedup.incrementalDedupMinhash(s, b, "doc_id", "text",
          persistSigs = false)
          .select(col("doc_id"), lit(0L).as("sig"), col("is_dup"),
            col("dup_src"))))
    variants.foreach { v =>
      val m1 = v.dedup(v.mkStore(docs), docs)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      facs.foreach { fac =>
        // persisted store: every replica rep >= 1, materialized up
        // front (at production it is parquet on disk — the probe
        // measures the DEDUP job, not store construction)
        val store = v.mkStore(
            docs.withColumn("rep", explode(sequence(lit(1), lit(fac - 1))))
              .select((col("doc_id") * fac + col("rep")).as("doc_id"),
                col("text")))
          .repartition(spark.sparkContext.defaultParallelism)
          .localCheckpoint(true)
        val storeRows = store.count()
        val batch = docs.select((col("doc_id") * fac).as("doc_id"),
          col("text"))
        meter.reset(); val g0 = gcMs; val t0 = System.nanoTime()
        val rep = v.dedup(store, batch)
          .collect()
          .map(r => r.getLong(0) -> ((r.getBoolean(2),
            if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        val expect = m1.keys.map { o =>
          val m = m1(o)
          o * fac -> ((true, if (m < o) m * fac else m * fac + 1))
        }.toMap
        require(rep == expect, s"${v.name} ×$fac law violated: " +
          s"${(rep.toSet diff expect.toSet).take(3)}")
        println(f"[incrementalab] ${v.name} ×$fac%-4d store=$storeRows%-8d " +
          f"batch=${m1.size}%-6d wall=$wall%6.1f s " +
          f"(${storeRows / wall / 1e3}%6.0f ksig/s) gc=${gcMs - g0}%5d ms " +
          f"shufW=${meter.write.get / 1e6}%7.1f MB " +
          f"spill=${meter.spilledDisk.get / 1e6}%5.1f MB")
        store.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}
