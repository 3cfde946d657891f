package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, GraftExtensions}
import graft.pipeline.Similarity

/** A/B harness for the IVF×PQ composed recall at ×fac (r11): decomposes
  * the composition's loss against the exact-L2 ground truth into its
  * three knobs — rerank shortlist size (probed-slice rule vs full-corpus
  * rule), probe fraction (1/4 vs 1/2), and router training metric
  * (L2 Lloyd vs none). One ground-truth computation, one replicated
  * corpus, several ivfPqTopK calls. Findings pin the PipeScale 4d floor.
  */
object IvfPqAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fac = sys.env.getOrElse("SPARK_GRAFT_PIPE_SCALE", "20").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Engine.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val embN = emb
      .withColumn("rep", explode(sequence(lit(0), lit(fac - 1))))
      .select((col("vec_id") * fac + col("rep")).as("vec_id"),
        zip_with(col("embedding"), sequence(lit(1), size(col("embedding"))),
          (v, j) => v.cast("double") +
            pmod(xxhash64(col("vec_id") * fac + col("rep"), j), lit(1000L))
              .cast("double") * 1e-6).as("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val queries = embN.filter(col("vec_id") % (40L * fac) === 0)
    val f = fac
    val kk = 10 + f - 1

    // ground truth + recall accounting shared with PipeScale 4c/4d
    // (AnnRecall — r11 review: one definition of recall, no drift)
    val exact = AnnRecall.l2Exact(embN, queries, f)
    println(s"[ivfpqab] ground truth ready: ${exact.size} queries")

    val n = embN.count()
    val (nCells, nProbe) = Similarity.ivfParams(n)
    val (kCw, rerFull) = Similarity.pqParams(n, kk)
    val (_, rerSlice) = Similarity.pqParams(
      math.max(1L, n * nProbe / nCells), kk)

    def run(tag: String, probe: Int, rer: Int, iters: Int): Unit = {
      val t0 = System.nanoTime()
      val rec = AnnRecall.recallVs(exact,
        AnnRecall.top10L2(Similarity.ivfPqTopK(embN, queries,
          "vec_id", "embedding", topk = kk, nCells = nCells,
          nProbe = probe, m = 16, k = kCw, kmeansIters = iters,
          rerankFactor = rer), f))
      println(f"[ivfpqab] $tag recall=$rec%.3f (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    println(s"[ivfpqab] n=$n cells=$nCells probe=$nProbe k=$kCw " +
      s"rerSlice=$rerSlice rerFull=$rerFull")
    run(s"base   probe=$nProbe rer=$rerSlice it=2", nProbe, rerSlice, 2)
    run(s"rer+   probe=$nProbe rer=$rerFull it=2", nProbe, rerFull, 2)
    run(s"probe+ probe=${nProbe * 2} rer=$rerSlice it=2", nProbe * 2, rerSlice, 2)
    run(s"noit   probe=$nProbe rer=$rerSlice it=0", nProbe, rerSlice, 0)
    spark.stop()
  }
}
