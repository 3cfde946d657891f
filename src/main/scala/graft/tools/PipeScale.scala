package graft.tools

import graft.Engine
import graft.pipeline.{Clustering, Decontamination, Dedup, Similarity}
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

    // ── 1b. incremental dedup vs a persisted signature store (r13) ──
    //    Production shape: history = every replica with rep ≥ 1
    //    (persisted ONCE as (id, sig) — localCheckpoint models the
    //    on-disk store), new snapshot = the rep-0 docs. EXACT
    //    invariant: every batch doc has hamming-0 copies in the store,
    //    so all are dups, and with m1(o) = min original within
    //    hamming 1 of o (self included, computed by the ×1 self-probe)
    //    the attribution must be dup_src(o·f) = m1(o)·f when a
    //    SMALLER-id batch doc matches first, else m1(o)·f + 1 (the
    //    first store replica). The meter watches the dedup job itself:
    //    what the history side ships is (id, sig, chunk, ck) rows —
    //    signatures, never text. ───────────────────────────────────────
    val m1 = Dedup.incrementalDedupSimhash(
        Dedup.simhashStorePortable(docs, "doc_id", "text"),
        docs, "doc_id", "text", maxHamming = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val storeN = Dedup.simhashStorePortable(
        docsN.filter(col("doc_id") % fac =!= 0), "doc_id", "text")
      .localCheckpoint(true)
    val storeRows = storeN.count()
    val incMeter = new ShuffleMeter
    spark.sparkContext.addSparkListener(incMeter)
    val incN = timed(s"incremental dedup ×$fac") {
      Dedup.incrementalDedupSimhash(storeN,
          docsN.filter(col("doc_id") % fac === 0), "doc_id", "text",
          maxHamming = 1)
        .collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    }
    Thread.sleep(2000) // listener bus drain
    spark.sparkContext.removeSparkListener(incMeter)
    val histTextBytes = docsN.filter(col("doc_id") % fac =!= 0)
      .agg(sum(length(col("text")))).head().getLong(0)
    println(f"[pipescale] incremental dedup ×$fac shuffle: " +
      f"write=${incMeter.write.get / 1e6}%.1f MB " +
      f"(${incMeter.write.get.toDouble / storeRows}%.1f B/store-sig; " +
      f"history text=${histTextBytes / 1e6}%.1f MB, spill=" +
      f"${incMeter.spilledDisk.get / 1e6}%.1f MB)")
    require(incMeter.write.get < histTextBytes,
      "incremental dedup shuffled more than the history text itself — " +
        "the signatures-only posture is broken")
    val incExpect = m1.keys.map { o =>
      val m = m1(o)
      o * fac -> ((true, if (m < o) m * fac else m * fac + 1))
    }.toMap
    require(incN == incExpect,
      s"incremental dedup ×$fac mismatch: " +
        s"${(incN.toSet diff incExpect.toSet).take(3)} / " +
        s"${(incExpect.toSet diff incN.toSet).take(3)}")

    // ── 1c. incremental MINHASH-LSH dedup vs a persisted store (r14) ─
    //    Same production shape and ×1-mapping law as 1b under the
    //    Jaccard-face rule (band-slice identity + agree ≥ 8/16):
    //    replicas share text, hence signatures, hence band keys —
    //    match(o·f+r, o'·f+r') ⇔ match(o, o') — so the attribution
    //    formula carries over verbatim. The meter watches that the
    //    history side ships (id, sig, band, slice) rows only. ─────────
    val mh1 = Dedup.incrementalDedupMinhash(
        Dedup.minhashSigStore(docs, "doc_id", "text"),
        docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val mhStoreN = Dedup.minhashSigStore(
        docsN.filter(col("doc_id") % fac =!= 0), "doc_id", "text")
      .localCheckpoint(true)
    val mhStoreRows = mhStoreN.count()
    val mhMeter = new ShuffleMeter
    spark.sparkContext.addSparkListener(mhMeter)
    val mhN = timed(s"incremental minhash ×$fac") {
      Dedup.incrementalDedupMinhash(mhStoreN,
          docsN.filter(col("doc_id") % fac === 0), "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    }
    Thread.sleep(2000) // listener bus drain
    spark.sparkContext.removeSparkListener(mhMeter)
    println(f"[pipescale] incremental minhash ×$fac shuffle: " +
      f"write=${mhMeter.write.get / 1e6}%.1f MB " +
      f"(${mhMeter.write.get.toDouble / mhStoreRows}%.1f B/store-sig; " +
      f"history text=${histTextBytes / 1e6}%.1f MB, spill=" +
      f"${mhMeter.spilledDisk.get / 1e6}%.1f MB)")
    require(mhMeter.write.get < histTextBytes,
      "incremental minhash shuffled more than the history text itself — " +
        "the signatures-only posture is broken")
    val mhExpect = mh1.keys.map { o =>
      val m = mh1(o)
      o * fac -> ((true, if (m < o) m * fac else m * fac + 1))
    }.toMap
    require(mhN == mhExpect,
      s"incremental minhash ×$fac mismatch: " +
        s"${(mhN.toSet diff mhExpect.toSet).take(3)} / " +
        s"${(mhExpect.toSet diff mhN.toSet).take(3)}")

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

    // ── 2b. simhash pigeonhole path, same keeper-mapping assertion —
    //    its bucket count (4 chunks × 2^16) is also fixed, but the
    //    headroom is corpus ≲ 10M docs (SCALE.md), far above any
    //    rehearsal factor; this stage watches the wall-time curve ────
    val simKeep1 = Clustering.dedupByPairs(docs, "doc_id",
        Dedup.simhashPairs(docs, "doc_id", "text", 3)
          .select("id_a", "id_b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val simKeepN = timed(s"simhash cluster-keep ×$fac") {
      Clustering.dedupByPairs(docsN, "doc_id",
          Dedup.simhashPairs(docsN, "doc_id", "text", 3)
            .select("id_a", "id_b"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    require(simKeepN == simKeep1.map(_ * fac),
      s"simhash cluster-keep mismatch: " +
        s"extra=${(simKeepN diff simKeep1.map(_ * fac)).take(3)}")

    // ── 2c. WIDE simhash (the >10M-doc variant, SCALE.md) — the same
    //    keeper-mapping assertion against ITS OWN ×1 run, at the
    //    precision-raising maxHamming=3 (3 bits over 126 — the setting
    //    the widening exists for: chunk width 16→31 bits, bucket space
    //    4×2^16 → 4×2^31). Replica pairs have identical signatures
    //    (hamming 0) so the mapping invariant is exact. PINNED NEGATIVE
    //    (measured here once, r10): the threshold-PRESERVING setting
    //    (mh=6 over 126 bits = narrow's 3/63 rate) took 174 s at ×20 vs
    //    11.6 s for mh=3 — pigeonhole forces chunks = mh+1, so at a
    //    constant hamming RATE chunk width stays ~constant (15–16 bits)
    //    no matter how wide the signature: widening buys blocking
    //    granularity ONLY at fixed absolute maxHamming. Not a standing
    //    stage: the cost is the finding, re-measuring it every gate
    //    buys nothing ──────────────────────────────────────────────────
    for (mh <- Seq(3)) {
      // sigLongs from the sizing rule at the corpus size the wide path
      // exists for (r11: the rule is derived, not hand-picked — 20M
      // docs is past the narrow path's ~6.5M bound and must yield 2)
      val wideSl = Dedup.simhashSigLongs(20_000_000L, mh)
      require(wideSl == 2,
        s"simhashSigLongs(20M, mh=$mh) = $wideSl, expected the wide 2")
      val wideKeep1 = Clustering.dedupByPairs(docs, "doc_id",
          Dedup.simhashPairsWide(docs, "doc_id", "text",
            maxHamming = mh, sigLongs = wideSl).select("id_a", "id_b"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val wideKeepN = timed(s"wide simhash keep ×$fac (mh=$mh)") {
        Clustering.dedupByPairs(docsN, "doc_id",
            Dedup.simhashPairsWide(docsN, "doc_id", "text",
              maxHamming = mh, sigLongs = wideSl).select("id_a", "id_b"))
          .select("doc_id").collect().map(_.getLong(0)).toSet
      }
      require(wideKeepN == wideKeep1.map(_ * fac),
        s"wide simhash (mh=$mh) keeper mismatch: " +
          s"extra=${(wideKeepN diff wideKeep1.map(_ * fac)).take(3)} " +
          s"missing=${(wideKeep1.map(_ * fac) diff wideKeepN).take(3)}")
    }

    // ── 2d. exact substring dedup (Lee et al. span cut) at ×fac ─────
    //    The replication scheme (o → o·fac+rep) preserves doc order
    //    with rep as tie-break, so every duplicated window's keeper
    //    stays at the SAME (doc, pos) inside a rep-0 doc. Exact
    //    invariants: rep-0 span sets == the ×1 span sets verbatim, and
    //    every rep>0 replica with >= w tokens is fully covered by spans
    //    (kept = 0; shorter replicas have no windows and stay intact).
    //    This is the boilerplate-paragraph shape the operator exists
    //    for: at ×20 every window is duplicated, so the groupBy's
    //    map-side partial agg carries the whole corpus's window set ───
    val subW = 15
    val spans1 = Dedup.duplicateSpans(docs, "doc_id", "text", subW)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // shuffle-volume meter (r11 verdict #4): the wins relation is
    // (doc_id, pos, h1, h2) per token position ≈ 32 B/token vs ~5 B of
    // text — measure the actual bytes so SCALE.md's 100 TB cost model
    // is written down, not estimated
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val spansRep0 = timed(s"substring spans ×$fac") {
      Dedup.duplicateSpans(docsN, "doc_id", "text", subW)
        .filter(col("doc_id") % fac === 0)
        .collect()
        .map(r =>
          (r.getLong(0) / fac, r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    Thread.sleep(2000) // listener bus drain
    spark.sparkContext.removeSparkListener(meter)
    val tokensN = docsN
      .agg(sum(graft.pipeline.TextAnalysis.tokenCount(col("text"))))
      .head().getLong(0)
    val textBytesN = docsN.agg(sum(length(col("text")))).head().getLong(0)
    println(f"[pipescale] substring spans ×$fac shuffle: " +
      f"write=${meter.write.get / 1e6}%.1f MB read=${meter.read.get / 1e6}%.1f MB " +
      f"(${meter.write.get.toDouble / tokensN}%.1f B/token written; " +
      f"text=${textBytesN / 1e6}%.1f MB, " +
      f"${textBytesN.toDouble / tokensN}%.1f B/token)")
    require(spansRep0 == spans1,
      s"substring spans mismatch: extra=${(spansRep0 diff spans1).take(3)} " +
        s"missing=${(spans1 diff spansRep0).take(3)}")
    val badRep = timed(s"substring cut ×$fac") {
      Dedup.cutDuplicateSpans(docsN, "doc_id", "text", subW)
        .filter(col("doc_id") % fac =!= 0)
        .filter(when(col("n_tokens") >= subW, col("n_kept") =!= 0)
          .otherwise(col("n_kept") =!= col("n_tokens")))
        .count()
    }
    require(badRep == 0, s"$badRep replicas kept the wrong tokens")

    // ── 2e. n-gram LM cross-entropy at ×fac (r11 verdict #2) — the
    //    last pipeline operator without a rehearsal. DERIVED invariant:
    //    training on the ×f replica corpus with the Laplace α scaled to
    //    f yields bit-identical conditional probabilities —
    //    (f·c12 + f)/(f·c1 + f·V) is the same IEEE quotient as
    //    (c12 + 1)/(c1 + V) since every scaled term is an exact double
    //    and |V| is replication-invariant — so rep-0 eval docs score as
    //    at ×1 (n_bigrams EXACT; xent within TWO 4-dp rounding steps =
    //    2e-4 — each side's per-doc fp sum order can perturb its own
    //    pre-rounding value across a boundary independently, one step
    //    per engine pass; r13 ADVICE aligned comment and assertion). The
    //    wall point watches the c12 table build: corpus-scale bigram
    //    explode → groupBy, the AQE broadcast→shuffle-join transition
    //    territory at 100 TB. ───────────────────────────────────────────
    import graft.pipeline.TextAnalysis
    val ce1 = TextAnalysis.crossEntropyScore(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val ceN = timed(s"crossentropy ×$fac (α=$fac)") {
      TextAnalysis.crossEntropyScore(
          docsN.filter(expr(s"doc_id div $fac") % 2 === 0),
          docsN.filter(expr(s"doc_id div $fac") % 2 === 1),
          "doc_id", "text", alpha = fac.toDouble)
        .filter(col("doc_id") % fac === 0)
        .collect().map(r =>
          r.getLong(0) / fac -> ((r.getLong(1), r.getDouble(2))))
        .toMap
    }
    require(ceN.keySet == ce1.keySet,
      s"crossentropy doc set mismatch: extra=${(ceN.keySet diff ce1.keySet).take(3)} " +
        s"missing=${(ce1.keySet diff ceN.keySet).take(3)}")
    ce1.foreach { case (id, (nb, xent)) =>
      val (nbN, xentN) = ceN(id)
      require(nbN == nb, s"crossentropy doc $id: n_bigrams $nbN != $nb")
      require(math.abs(xentN - xent) <= 2e-4,
        f"crossentropy doc $id: xent $xentN%.4f != ×1 $xent%.4f under " +
          s"the α=f invariant")
    }

    // ── 2f. hashed linear classifier at ×fac (r11 verdict #3) — same
    //    α-scaling argument, and STRONGER: the weight vector and bias
    //    must be BIT-IDENTICAL to ×1 (every count scales exactly ×f;
    //    (f·n + f·α)/(f·N + f·α·d) is the same IEEE quotient), and
    //    since scoring folds the same literal weights over the same
    //    token arrays in the same order, rep-0 scores are EXACTLY the
    //    ×1 scores — no tolerance. Wall point: the train-side feature
    //    explode+groupBy and the map-side kernel scoring pass at ×f. ───
    import graft.pipeline.Classifier
    def labeled(df: DataFrame): DataFrame = df.withColumn("label",
      (size(filter(split(coalesce(col("text"), lit("")), "\\s+"),
        t => t === "spark")) >= 2).cast("int"))
    graft.functions.Sketches.register(spark)
    val (w1, b1) = Classifier.trainLogOdds(labeled(docs), "text", "label",
      d = 1024)
    val score1 = Classifier.score(docs, "doc_id", "text", w1.toSeq, b1)
      .select(col("doc_id"), col("n_feats"), col("score"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val (wN, bN) = timed(s"classifier train ×$fac (α=$fac)") {
      Classifier.trainLogOdds(labeled(docsN), "text", "label",
        d = 1024, alpha = fac.toDouble)
    }
    require(java.util.Arrays.equals(wN, w1) && bN == b1,
      s"classifier weights not bit-identical under the α=f invariant " +
        s"(first diff at ${wN.toSeq.zip(w1.toSeq).indexWhere(p => p._1 != p._2)})")
    val scoreN = timed(s"classifier score ×$fac") {
      Classifier.score(docsN, "doc_id", "text", wN.toSeq, bN)
        .select(col("doc_id"), col("n_feats"), col("score"))
        .filter(col("doc_id") % fac === 0)
        .collect().map(r =>
          r.getLong(0) / fac -> ((r.getLong(1), r.getDouble(2))))
        .toMap
    }
    require(scoreN == score1,
      s"classifier rep-0 scores differ from ×1: " +
        s"${scoreN.toSet.diff(score1.toSet).take(3)}")

    // ── 2g. deterministic logistic refinement at ×fac (r12) — the
    //    strongest invariance in the tier and it needs NO α trick:
    //    every replica doc produces the IDENTICAL integer error term,
    //    so grad_f = f·grad and N_f = f·N exactly, and the update
    //    lr·(f·g)/(2^24·f·N) is the same IEEE quotient as lr·g/(2^24·N)
    //    — every GD trajectory step, and therefore the final weight
    //    vector, must be BIT-IDENTICAL to ×1. This also rehearses the
    //    per-iteration gradient aggregation at corpus scale (the
    //    explode→groupBy integer shuffle, d-bounded map-side). ─────────
    val (lwq0, lbq0) = Classifier.quantize(w1, b1)
    val (lw1, lb1) = Classifier.trainLogisticFixed(
      labeled(docs), "text", "label", lwq0, lbq0, iters = 3, lr = 0.05)
    val (lwN, lbN) = timed(s"logistic refine ×$fac (3 iters)") {
      Classifier.trainLogisticFixed(
        labeled(docsN), "text", "label", lwq0, lbq0, iters = 3, lr = 0.05)
    }
    require(java.util.Arrays.equals(lwN, lw1) && lbN == lb1,
      s"logistic weights not bit-identical at ×$fac (first diff at " +
        s"${lwN.toSeq.zip(lw1.toSeq).indexWhere(p => p._1 != p._2)})")

    // ── 2h. multiclass (LM-distill) classifier at ×fac (r13) — the
    //    2f α-scaling argument applied classwise: every per-class
    //    bucket count and doc count scales exactly ×f, so with α=f
    //    the d×K weight matrix AND the K priors are bit-identical
    //    ((f·n+f·α)/(f·N+f·α·d) and (f·n+f·α)/(f·N+f·α·K) are the
    //    same IEEE quotients), and rep-0 scores are EXACTLY the ×1
    //    scores. Label: 'spark'-count terciles {0,1,≥2} — exact under
    //    replication (the distill teacher's tercile labels are NOT:
    //    xent is only fp-close, so a threshold-adjacent doc could
    //    flip bucket; the machinery is what this stage pins). ────────
    val mclasses = Seq("none", "one", "many")
    def mlabeled(df: DataFrame): DataFrame = df.withColumn("mlab",
      when(size(filter(split(coalesce(col("text"), lit("")), "\\s+"),
        t => t === "spark")) === 0, "none")
        .when(size(filter(split(coalesce(col("text"), lit("")), "\\s+"),
          t => t === "spark")) === 1, "one")
        .otherwise("many"))
    import graft.pipeline.Classifier
    val (mw1, mp1) = Classifier.trainLogOddsMulti(
      mlabeled(docs), "text", "mlab", mclasses, d = 1024)
    val mscore1 = Classifier.scoreMulti(docs, "doc_id", "text",
        mclasses, mw1, mp1)
      .select(col("doc_id"), col("pred")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (mwN, mpN) = timed(s"multiclass train ×$fac (α=$fac)") {
      Classifier.trainLogOddsMulti(mlabeled(docsN), "text", "mlab",
        mclasses, d = 1024, alpha = fac.toDouble)
    }
    mclasses.foreach { c =>
      require(java.util.Arrays.equals(mwN(c), mw1(c)) && mpN(c) == mp1(c),
        s"multiclass weights/prior for '$c' not bit-identical under α=f")
    }
    val mscoreN = timed(s"multiclass score ×$fac") {
      Classifier.scoreMulti(docsN, "doc_id", "text", mclasses, mwN, mpN)
        .filter(col("doc_id") % fac === 0)
        .select(col("doc_id"), col("pred")).collect()
        .map(r => r.getLong(0) / fac -> r.getString(1)).toMap
    }
    require(mscoreN == mscore1,
      s"multiclass rep-0 predictions differ from ×1: " +
        s"${mscoreN.toSet.diff(mscore1.toSet).take(3)}")

    // ── 3. bloom decontamination (train ×fac, eval fixed at ×1) ────
    val eval1 = docs.filter(col("doc_id") % 17 === 0)
    // integral floor division — exact at any scale (double division is
    // only exact while doc_id*fac stays under 2^53)
    val trainN = docsN.filter(expr(s"doc_id div $fac") % 17 =!= 0)
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

    // ── 3b. token-stream packing at ×fac — the two-phase distributed
    //    prefix sum under a 20× id-domain. Invariants are closed-form,
    //    no ×1 mapping needed: offsets form an exact gapless partition
    //    of [0, total) in id order, and the ×fac total is exactly
    //    fac × the ×1 total (replicas carry identical token counts) ───
    val toks1 = docs.select(col("doc_id"),
      graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val toksN = docsN.select(col("doc_id"),
      graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val total1 = toks1.agg(sum(col("n_tokens"))).head().getLong(0)
    val packed = timed(s"pack token stream ×$fac") {
      graft.pipeline.Packing.packTokenStream(
          toksN, "doc_id", "n_tokens", budget = 2048)
        .select(col("doc_id"), col("tok_start"), col("tok_end"))
        .collect().sortBy(_.getLong(0))
    }
    require(packed.length == nN, "packing dropped rows")
    var expectStart = 0L
    packed.foreach { r =>
      require(r.getLong(1) == expectStart,
        s"packing gap at doc ${r.getLong(0)}: ${r.getLong(1)} != $expectStart")
      expectStart = r.getLong(2)
    }
    require(expectStart == total1 * fac,
      s"packing total ${expectStart} != ${total1 * fac}")

    // ── 4. similarity tier: ANN at ×fac embeddings ──────────────────
    // Replicas get a deterministic per-dimension perturbation of up to
    // ~1e-3 (pmod(hash,1000)*1e-6) so
    // every vector is distinct (no top-k ties to adjudicate), while
    // the geometry — and therefore any recall statement — is unmoved.
    // Exact-copy ids can't be asserted against ×1 here (top-k sets
    // change when the corpus grows), so the invariant is RECALL: IVF
    // top-k recall against the in-run brute-force ground truth must
    // not collapse as the corpus scales (×fac recall ≥ ×1 recall −
    // 0.15, both measured in this run with identical parameters).
    val emb = Engine.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val embN = emb
      .withColumn("rep", explode(sequence(lit(0), lit(fac - 1))))
      .select((col("vec_id") * fac + col("rep")).as("vec_id"),
        zip_with(col("embedding"), sequence(lit(1), size(col("embedding"))),
          (v, j) => v.cast("double") +
            pmod(xxhash64(col("vec_id") * fac + col("rep"), j), lit(1000L))
              .cast("double") * 1e-6).as("embedding"))
      // the source parquet is one tiny file → ONE partition; without
      // this the per-vector ANN kernels (ivf assignment, pq encode)
      // run the whole ×fac corpus on a single core
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    def queriesOf(df: DataFrame, everyNth: Long): DataFrame =
      df.filter(col("vec_id") % everyNth === 0)
    // Recall of IVF vs in-run brute-force ground truth. At ×fac each
    // query's literal top-k is its own fac−1 replicas (cos ≈ 1, same
    // cell — recall would be trivially 1.0), so both sides fetch
    // k + fac − 1, drop same-original rows, and keep the first 10 in
    // the ops' own (cos desc, nid) order: the recall statement is then
    // about the GEOMETRY (replicas of the ×1 neighbors), not about
    // finding one's own copies.
    // IVF parameters come from the sizing rule under test
    // (Similarity.ivfParams: nCells = 2^ceil(log2(n/200)) clamped to
    // [16, 2^16], nProbe = nCells/4, kmeansIters=2) — the rehearsal
    // validates the rule itself, same contract as the LSH band rule
    // below. Recall floor: ≥ 0.8 at probe fraction 1/4 whenever the
    // derived granularity is ≥ 256 cells (the measured curve's knee —
    // below that, e.g. at ×1's 2000 vectors → 16 cells, structureless
    // data tops out near 0.5 and only the no-collapse bound applies).
    def recall(corpus: DataFrame, queries: DataFrame, f: Int): Double = {
      def top10(df: DataFrame) = df
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(
          _.filter { case (q, n, _) => n / f != q / f }
            .sortBy { case (_, n, c) => (-c, n) }.take(10).map(_._2).toSet)
        .toMap
      val kk = 10 + f - 1
      val (nCells, nProbe) = Similarity.ivfParams(corpus.count())
      val exact = top10(Similarity.bruteForceTopK(
        corpus, queries, "vec_id", "embedding", kk))
      val ivf = top10(Similarity.ivfTopK(
        corpus, queries, "vec_id", "embedding", kk,
        nCells = nCells, nProbe = nProbe, kmeansIters = 2))
      require(exact.nonEmpty && exact.values.forall(_.size == 10),
        "brute-force ground truth malformed")
      exact.map { case (q, s) =>
        (s intersect ivf.getOrElse(q, Set.empty)).size / 10.0
      }.sum / exact.size
    }
    val r1 = recall(emb, queriesOf(emb, 40), 1)       // 2000/40 = 50 queries
    val rN = timed(s"ivf top-k recall ×$fac") {
      recall(embN, queriesOf(embN, 40L * fac), fac)   // same 50 originals
    }
    val (cellsN, _) = Similarity.ivfParams(2000L * fac)
    println(f"[pipescale] ivf recall ×1=$r1%.3f ×$fac=$rN%.3f " +
      s"(nCells ×$fac=$cellsN)")
    require(rN >= r1 - 0.15,
      f"ivf recall collapsed with scale: ×1=$r1%.3f ×$fac=$rN%.3f")
    if (cellsN >= 256)
      require(rN >= 0.8,
        f"ivf recall $rN%.3f below the 0.8 floor the sizing rule " +
          s"promises at $cellsN cells (probe fraction 1/4, kmeansIters=2)")

    // ── 4c. PQ/ADC rerank recall at ×fac (r10) — PQ approximates L2,
    //    so the ground truth here is exact squared-L2 top-k (own
    //    original excluded, same replica discipline as the ivf stage).
    //    Parameters come from the sizing rule under test
    //    (Similarity.pqParams): ADC error doesn't shrink as the corpus
    //    grows while distractors inside the error band grow ∝ n, so
    //    FIXED parameters collapse — measured 0.836 → 0.532 from ×1 to
    //    ×50 at fixed k=64/rerank=5 (pinned negative, SCALE.md). Under
    //    the rule (k by the n/200 granularity rule capped at one byte,
    //    shortlist ≥ 1% of the corpus): 0.62 at ×1 (k at the 16
    //    floor), ≥0.95 at ×20/×50 — recall RISES with scale. Floors:
    //    no-collapse vs ×1, and ≥0.8 absolute once k reaches the
    //    256 cap (the rule's knee, mirroring the ivf 256-cell floor) ──
    // exact squared-L2 ground truth (shared helpers: AnnRecall — also
    // the IvfPqAb harness's accounting, one definition of recall),
    // computed ONCE per corpus for the PQ (4c) and IVF×PQ (4d) stages
    import graft.tools.{AnnRecall => AR}
    val gt1 = AR.l2Exact(emb, queriesOf(emb, 40), 1)
    val gtN = timed(s"exact L2 ground truth ×$fac") {
      AR.l2Exact(embN, queriesOf(embN, 40L * fac), fac)
    }
    def pqRecall(corpus: DataFrame, queries: DataFrame, f: Int,
        exact: Map[Long, Set[Long]]): Double = {
      val kk = 10 + f - 1
      val (kCw, rer) = Similarity.pqParams(corpus.count(), kk)
      AR.recallVs(exact, AR.top10L2(Similarity.pqTopK(corpus, queries,
        "vec_id", "embedding", topk = kk,
        m = 16, k = kCw, kmeansIters = 2, rerankFactor = rer), f))
    }
    val pq1 = pqRecall(emb, queriesOf(emb, 40), 1, gt1)
    val pqN = timed(s"pq rerank recall ×$fac") {
      pqRecall(embN, queriesOf(embN, 40L * fac), fac, gtN)
    }
    val (kN, rerN) = Similarity.pqParams(2000L * fac, 10 + fac - 1)
    println(f"[pipescale] pq recall ×1=$pq1%.3f ×$fac=$pqN%.3f " +
      s"(k=$kN rerank=$rerN)")
    require(pqN >= pq1 - 0.15,
      f"pq recall collapsed with scale: ×1=$pq1%.3f ×$fac=$pqN%.3f")
    if (kN >= 256)
      require(pqN >= 0.8,
        f"pq rerank recall $pqN%.3f below the 0.8 floor the sizing " +
          s"rule promises at k=$kN (m=16, kmeansIters=2, rerank=$rerN)")

    // ── 4d. IVF × PQ composed recall at ×fac (r11 verdict #3) — the
    //    production ANN shape: router, ADC, and rerank all rank by
    //    squared L2 (refineCentroidsL2 trains the router on the same
    //    metric), parameters from BOTH sizing rules applied to the
    //    FULL corpus. MEASURED (IvfPqAb ×20, n=40k, 256 cells/64
    //    probed, k=256): sizing the rerank shortlist by the PROBED
    //    slice (rer=5) reads 0.746 while the full-corpus rule (rer=14)
    //    reads 0.840 at the same wall — the shortlist requirement
    //    follows n (ADC error-band distractors PLUS router
    //    uncertainty), while what probing divides is the ADC candidate
    //    VOLUME (cost), not the shortlist. Doubling probe reads 0.880
    //    (router ceiling); kmeansIters=0 reads 0.694 (L2 Lloyd buys
    //    +0.05). Ground truth: the shared exact-L2 top-k. Floors:
    //    no-collapse vs ×1 and ≥0.75 at the ≥256-cell knee (the
    //    router's 0.8 floor minus the PQ shortlist's measured ≤0.05
    //    composed loss). ───────────────────────────────────────────────
    def ivfPqRecall(corpus: DataFrame, queries: DataFrame, f: Int,
        exact: Map[Long, Set[Long]]): Double = {
      val kk = 10 + f - 1
      val n = corpus.count()
      val (nCells, nProbe) = Similarity.ivfParams(n)
      val (kCw, rer) = Similarity.pqParams(n, kk)
      AR.recallVs(exact, AR.top10L2(Similarity.ivfPqTopK(corpus, queries,
        "vec_id", "embedding", topk = kk, nCells = nCells,
        nProbe = nProbe, m = 16, k = kCw, kmeansIters = 2,
        rerankFactor = rer), f))
    }
    val ivfpq1 = ivfPqRecall(emb, queriesOf(emb, 40), 1, gt1)
    val ivfpqN = timed(s"ivf×pq composed recall ×$fac") {
      ivfPqRecall(embN, queriesOf(embN, 40L * fac), fac, gtN)
    }
    println(f"[pipescale] ivfpq recall ×1=$ivfpq1%.3f ×$fac=$ivfpqN%.3f")
    require(ivfpqN >= ivfpq1 - 0.15,
      f"ivf×pq recall collapsed with scale: ×1=$ivfpq1%.3f ×$fac=$ivfpqN%.3f")
    if (cellsN >= 256)
      require(ivfpqN >= 0.75,
        f"ivf×pq recall $ivfpqN%.3f below the 0.75 floor the composed " +
          s"sizing rules promise at $cellsN cells (probe 1/4, k=$kN)")
    // LSH near-pairs needs scale-sized bands: the band bucket COUNT is
    // 2^bandBits and does not grow with the corpus, so bucket size —
    // and intra-bucket pair work — grows linearly (quadratically) in
    // corpus size. The harness applies the documented sizing rule
    // (Similarity scaladoc / SCALE.md): bandBits ≥ log2(n/200),
    // planes = 4·bandBits (band count per rotation — hence the recall
    // shape — unchanged). Pinned negatives from fixed parameters:
    // 16/4 defaults at ×20 (40k vectors) = 673 s; 32/8 at ×50 (100k
    // vectors) = 423 s where the rule's 36/9 takes 167 s. Replica
    // pairs sit at cos ≈ 1 (p = 1 per band), so the verified pair
    // count is invariant to the sizing — only candidate volume moves.
    val nVec = embN.count()
    val bandBits = math.max(8,
      math.ceil(math.log(nVec / 200.0) / math.log(2)).toInt)
    val lshPairs = timed(s"lsh near-pairs ×$fac (${4 * bandBits}/$bandBits)") {
      Similarity.lshNearPairs(embN, "vec_id", "embedding",
        planes = 4 * bandBits, bandBits = bandBits).count()
    }

    println(s"[pipescale] ALL PASS at ×$fac " +
      s"(exact=${exN.size} groups, keepers=${keepN.size}, " +
      s"flagged=${flN.size}, ivf_recall=$rN, pq_recall=$pqN, " +
      s"ivfpq_recall=$ivfpqN, lsh_pairs=$lshPairs)")
    spark.stop()
  }
}
