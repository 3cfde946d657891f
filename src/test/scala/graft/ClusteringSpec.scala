package graft

import graft.pipeline.{Clustering, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components properties: equivalence with a driver-side
  * union-find on random graphs (chains force many label hops, so a
  * naive one-round propagation would fail), star-forest fixpoint
  * stability, and dedupByPairs semantics. */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clustering.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 20
      val edges = Seq.fill(n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      assert(ccOf(edges) === unionFind(edges), s"trial $trial")
    }
  }

  test("long chain collapses to one component (log-round convergence)") {
    val chain = (0L until 200L).sliding(2).map(s => (s(1), s(0))).toSeq
    val cc = ccOf(chain)
    assert(cc.size === 200)
    assert(cc.values.toSet === Set(0L))
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val cc = ccOf(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (5L, 4L)))
    assert(cc === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("dedupByPairs keeps exactly the cluster minima plus unpaired rows") {
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, s"row$i")).toDF("id", "payload")
    val pairs = Seq((2L, 3L), (3L, 7L), (9L, 8L)).toDF("id_a", "id_b")
    val kept = Clustering.dedupByPairs(df, "id", pairs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L, 5L, 6L, 8L, 10L))
  }

  test("reliable-checkpoint escape hatch: same components, storage-backed") {
    // spark.graft.checkpoint.reliable=true routes every Materialize site
    // through Dataset.checkpoint (fault-tolerant, storage-backed) — the
    // r14 verdict #7 escape hatch. Results must be identical to the
    // default localCheckpoint path, and the checkpoint dir must actually
    // receive RDD data.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    spark.conf.set(graft.pipeline.Materialize.ReliableKey, "true")
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (12L, 12L))
      assert(ccOf(edges) === unionFind(edges))
      val files = java.nio.file.Files.walk(dir.toPath).iterator()
      val sawRddData = Iterator.continually(files)
        .takeWhile(_.hasNext).map(_.next().toString)
        .exists(_.contains("rdd-"))
      assert(sawRddData, "reliable path wrote no checkpoint RDD files")
    } finally {
      spark.conf.unset(graft.pipeline.Materialize.ReliableKey)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("agrees with the recursive-CTE closure on real near-dup pairs") {
    val docs = Engine.table(spark, "/root/testdata/sf0.01", "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .select(col("id_a"), col("id_b")).persist()
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)
    val cc = Clustering.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.unpersist()
    assert(cc === unionFind(edges))
  }
}
