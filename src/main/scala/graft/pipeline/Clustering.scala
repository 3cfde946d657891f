package graft.pipeline

import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the clustering
  * step a training-data dedup pipeline runs AFTER candidate generation
  * (Dedup.minhashPairs / simhashPairs emit pairwise edges; transitive
  * closure groups them into duplicate clusters, and one representative
  * per cluster survives).
  *
  * The reference has no graph operator (its dedup surface is
  * DISTINCT / GROUP BY — datafusion/optimizer/src/replace_distinct_
  * aggregate.rs); this is a beyond-reference scale-path operator like
  * the rest of graft.pipeline.
  *
  * Algorithm: alternating large-star / small-star edge rewiring
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14). Each round is two groupBy/join shuffles over the CURRENT
  * edge list only — no adjacency lists are ever collected (a
  * collect_list of a hub's neighbors can't spill; the groupBy+join
  * formulation can), so a 100 TB edge set with power-law hubs still
  * partitions. Converges in O(log n) rounds to a star forest whose
  * roots are the component minima; a naive min-label propagation needs
  * O(diameter) rounds — a 1000-long dup chain would take 1000 shuffles.
  *
  * Driver-side work is the fixpoint loop only (same contract as
  * plans/RecursiveCte): each iteration is one Spark job whose
  * convergence probe doubles as the checkpoint materializer;
  * localCheckpoint cuts lineage, superseded checkpoints are released.
  */
object Clustering {

  private def release(df: DataFrame): Unit =
    GraftSqlShim.unpersistLocalCheckpoint(df)

  /** Large-star: every node connects its LARGER neighbors to the
    * minimum of its neighborhood (including itself). Star forests are
    * a fixpoint: for a root, this re-emits its own star; leaves see
    * only the (smaller) root and emit nothing. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    // no output distinct (r14: one exchange per round saved) — the only
    // consumer is smallStar, whose min-agg is duplicate-insensitive and
    // whose own distinct() dedups the rewired edges; largeStar's output
    // is already oriented u > v (v > original u ≥ m), so smallStar's
    // greatest/least reorientation is the identity on it
    sym.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** Small-star: orient edges larger→smaller, then every node connects
    * all its (smaller) neighbors to the smallest one, keeping its own
    * link to it. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
    val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
    val rewired = dir.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    rewired.union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Component assignment for every vertex of the pair list: returns
    * (id, component) with component = the smallest vertex id reachable
    * through the pairs (so cluster representatives are deterministic —
    * the min-id doc survives dedup, as in exactDedup).
    *
    * `edges` is undirected; self-pairs and duplicates are tolerated.
    * Vertex ids may be any orderable type (both columns must agree).
    */
  def connectedComponents(
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    // edge-set fingerprint: (count, xor of row hashes) — order-free,
    // overflow-free under ANSI; probe job doubles as materializer
    def probe(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // materialize the pair list ONCE: it feeds the loop seed, the vertex
    // set, and the final assignment — without this a costly candidate-
    // generation plan (e.g. exact ngram pairs) re-executes per consumer.
    // Released before returning: the returned frame is its own (vertex-
    // sized) checkpoint, so no edge-sized blocks outlive the call.
    val ein = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .localCheckpoint(eager = true)
    var e = ein
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)
    var sig = probe(e)
    var i = 0
    var converged = sig._1 == 0
    while (i < maxIter && !converged) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val nsig = probe(next)
      release(e)
      e = next
      converged = nsig == sig // star forest ⇒ both stars are identity
      sig = nsig
      i += 1
    }
    // star forest: every non-root has exactly one edge (id → root);
    // min() guards the maxIter-truncated case, roots map to themselves
    val verts = ein.select(col("u").as("id"))
      .union(ein.select(col("v").as("id")))
      .distinct()
    val assign = e.groupBy(col("u").as("id")).agg(min(col("v")).as("cc"))
    val out = verts.join(assign, Seq("id"), "left")
      .select(col("id"), coalesce(col("cc"), col("id")).as("component"))
      .localCheckpoint(eager = true)
    // the eager output copy owns the data now — drop the (edge-sized)
    // intermediate checkpoints instead of leaving them to driver GC
    release(e)
    release(ein)
    out
  }

  /** Cluster-and-keep: drop every row whose id sits in a pair cluster
    * but is not its representative (the min id). Rows never paired
    * survive untouched — dedup semantics over any candidate generator. */
  def dedupByPairs(
      df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val drop = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }
}
