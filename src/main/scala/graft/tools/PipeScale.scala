package graft.tools

import graft.Engine
import graft.pipeline.{Clustering, Decontamination, Dedup}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline-tier scale rehearsal (r9): the TPC-DS gate has ×10/×100/×300
  * rehearsals, but the LLM-pipeline operators' 100 TB posture was
  * design-argument-only. This harness replicates `documents` ×FACTOR as
  * EXACT copies — the pathological shape of crawl corpora, where
  * boilerplate pages form duplicate clusters of thousands — and asserts
  * each heavy operator's result maps 1:1 onto its ×1 result:
  *
  *  - exact dedup: same surviving text groups, keep_id mapped ×FACTOR,
  *    copy counts ×FACTOR;
  *  - MinHash+LSH → connected components → cluster-keep: every replica
  *    clique collapses onto its ×1 component, so the keeper set is
  *    exactly the ×1 keeper set mapped ×FACTOR (this is the quadratic-
  *    in-cluster-size candidate path under deliberate stress: every
  *    band bucket holds all FACTOR replicas);
  *  - bloom decontamination (train scaled, eval fixed): flagged set =
  *    ×1 flagged rows expanded to all replicas with identical
  *    n_hits/n_eval_docs.
  *
  * Run:  SPARK_GRAFT_PIPE_SCALE=20 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *         tools/run_jvm.sh graft.tools.PipeScale
  * Exits non-zero on any mismatch. Not part of sbt test (it is a
  * multi-minute rehearsal, recorded in ROUND_NOTES per round like the
  * TPC-DS ×100 gate).
  */
object PipeScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val fac = sys.env.getOrElse("SPARK_GRAFT_PIPE_SCALE", "20").toInt
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // exact-copy replicas with disjoint id ranges: ×1 doc o → o*fac+rep
    val docsN = docs
      .withColumn("rep", explode(sequence(lit(0), lit(fac - 1))))
      .select((col("doc_id") * fac + col("rep")).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val n1 = docs.count(); val nN = docsN.count()
    require(nN == n1 * fac, s"replication: $nN != $n1*$fac")
    println(s"[pipescale] corpus ×$fac: $nN docs (from $n1)")

    def timed[T](tag: String)(thunk: => T): T = {
      val t0 = System.nanoTime()
      val r = thunk
      println(f"[pipescale] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ── 1. exact dedup ──────────────────────────────────────────────
    val ex1 = Dedup.exactDedup(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val exN = timed(s"exact dedup ×$fac") {
      Dedup.exactDedup(docsN, "doc_id", "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    val exExpect = ex1.map { case (h, keep, n) => (h, keep * fac, n * fac) }
    require(exN == exExpect, s"exact dedup mismatch: ${(exN diff exExpect).take(3)}")

    // ── 2. LSH pairs → connected components → cluster-keep ─────────
    // keeper set at ×1 (same params as pipe_dedup_cluster_keep)
    val keep1 = Clustering.dedupByPairs(docs, "doc_id",
        Dedup.minhashPairs(docs, "doc_id", "text", 3, 64, 16, 0.6)
          .select("id_a", "id_b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keepN = timed(s"lsh cluster-keep ×$fac") {
      Clustering.dedupByPairs(docsN, "doc_id",
          Dedup.minhashPairs(docsN, "doc_id", "text", 3, 64, 16, 0.6)
            .select("id_a", "id_b"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    // every doc is now in a clique with its replicas: component min of
    // a ×1 component C is min(C)*fac; ×1-unpaired docs d keep as d*fac
    val keepExpect = keep1.map(_ * fac)
    require(keepN == keepExpect,
      s"cluster-keep mismatch: extra=${(keepN diff keepExpect).take(3)} " +
        s"missing=${(keepExpect diff keepN).take(3)}")

    // ── 3. bloom decontamination (train ×fac, eval fixed at ×1) ────
    val eval1 = docs.filter(col("doc_id") % 17 === 0)
    val trainN = docsN.filter((col("doc_id") / fac).cast("long") % 17 =!= 0)
    val fl1 = Decontamination.contaminationReport(
        docs.filter(col("doc_id") % 17 =!= 0), eval1,
        "doc_id", "text", "doc_id", "text", n = 3, minHits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val flN = timed(s"bloom decontaminate ×$fac") {
      Decontamination.contaminationReportBloom(trainN, eval1,
          "doc_id", "text", "doc_id", "text", n = 3, minHits = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val flExpect = for {
      (o, hits, ev) <- fl1; rep <- 0 until fac
    } yield (o * fac + rep, hits, ev)
    require(flN == flExpect,
      s"decontamination mismatch: extra=${(flN diff flExpect).take(3)} " +
        s"missing=${(flExpect diff flN).take(3)}")

    println(s"[pipescale] ALL PASS at ×$fac " +
      s"(exact=${exN.size} groups, keepers=${keepN.size}, flagged=${flN.size})")
    spark.stop()
  }
}
