package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + testdata table access.
  *
  * Plays the role of the reference's `SessionContext` + `ListingTable`
  * registration (reference: datafusion/core/src/execution/context/mod.rs:457,
  * datafusion/core/src/datasource/listing/table.rs:196). In Spark the
  * catalog, scan planning, predicate pushdown, partition pruning and
  * vectorized parquet reading are native — we only pin the configs that
  * matter for a 1000-executor deployment: AQE on (runtime re-plan, skew
  * join splitting, partition coalescing), shuffle partitions sized to the
  * local parallelism (on a real cluster this would be ~2-3x total cores or
  * left to AQE's coalescing), UTC session time zone for deterministic
  * timestamp semantics.
  */
object Engine {
  /** All driver-provided tables under each /root/testdata/sfN dir. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def session(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      // library extensions are ON for every session: the TopK fusion
      // rule, planner strategy, and graft_* functions see every query,
      // not just the ones that opt in — the oracle gate then re-proves
      // the whole corpus under the custom rules
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // TIMESTAMP(NANOS) parquet (one events testdata generation) surfaces
      // as BIGINT under this conf; table() then truncates to µs. Set once
      // at session build — the read path must not mutate session state.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Parquet scan of one testdata table. Column pruning + filter pushdown
    * reach the scan via Catalyst (verify with .explain: PushedFilters /
    * ReadSchema).
    *
    * events.parquet's `ts` physical type has changed across testdata
    * generations, so branch on the actual schema instead of assuming one:
    *  - TIMESTAMP(NANOS): Spark can't represent sub-µs precision; the
    *    legacy `nanosAsLong` conf surfaces it as BIGINT, which we truncate
    *    to a µs TimestampType — the same truncation DuckDB applies casting
    *    TIMESTAMP_NS → TIMESTAMP, keeping the oracle compare exact.
    *  - TIMESTAMP(MICROS) NTZ (current generation): cast to session-zone
    *    TimestampType (session pinned UTC above) — identical instants to
    *    what DuckDB reads as naive µs timestamps.
    *  - TimestampType: pass through. */
  // Memoized per (session, dir, table): `spark.read.parquet` re-lists
  // files and re-parses footers on every call, which at ~115 queries per
  // Verify/Bench run is pure repeated driver work. The cached DataFrame
  // is an immutable logical plan over immutable files — safe to share.
  // Entries strongly retain the session (DataFrame → QueryExecution →
  // session), so a long-lived multi-session JVM must release them:
  // clearCache(session) drops one session's entries, and table() evicts
  // entries of any already-stopped session as a safety net.
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Drop all cached table plans belonging to `spark` — call at session
    * stop (Verify/Bench do) or before discarding a session object. */
  def clearCache(spark: SparkSession): Unit =
    tableCache.keys.filter(_._1 eq spark).foreach(tableCache.remove)

  private def evictStopped(): Unit =
    tableCache.keys.filter(_._1.sparkContext.isStopped)
      .foreach(tableCache.remove)

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    evictStopped()
    tableCache.getOrElseUpdate((spark, sfDir, name),
      if (name == "events") {
        import org.apache.spark.sql.functions.{col, expr}
        import org.apache.spark.sql.types.{LongType, TimestampNTZType}
        // nanosAsLong is set at session build (session()/Verify/Bench) —
        // reading must not mutate shared session state (r6 verdict #3)
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        raw.schema("ts").dataType match {
          case LongType => // TIMESTAMP(NANOS) surfaced as BIGINT via the conf
            raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case TimestampNTZType => // TIMESTAMP(MICROS) NTZ → session-UTC instant
            raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
      } else spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Register every table as a temp view (SQL entry point parity with the
    * reference's `ctx.register_parquet`). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
