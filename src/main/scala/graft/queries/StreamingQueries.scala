package graft.queries

import graft.{Engine, Q}
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Streaming operator surface, exercised in BATCH mode on the events table
  * (the transforms in graft.streaming.Streaming are mode-agnostic; the
  * stream ≡ batch equivalence is asserted in StreamingSpec with
  * MemoryStream). Oracles re-derive the window semantics in DuckDB SQL:
  * time_bucket for tumbling, the two-bucket expansion for sliding,
  * gaps-and-islands for session windows, interval join for stream-stream.
  */
object StreamingQueries {

  val defs: Map[String, Q] = Map(
    // ── tumbling window aggregate ────────────────────────────────────────
    // Window starts are emitted as epoch-seconds BIGINT: Spark writes
    // tz-aware TIMESTAMP parquet while DuckDB time_bucket returns naive
    // TIMESTAMP, so raw timestamp output would schema-mismatch (Q.scala
    // conventions).
    "stream_tumbling" -> Q("""
      |SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))
      |            AS BIGINT) AS w_start,
      |       event_type, count(*) AS n, round(sum(value), 2) AS v
      |FROM events GROUP BY w_start, event_type ORDER BY w_start, event_type""") { (s, d) =>
      Streaming.tumblingCounts(Engine.table(s, d, "events"))
        .select(unix_timestamp(col("w_start")).as("w_start"),
          col("event_type"), col("n"), col("v"))
        .orderBy(col("w_start"), col("event_type"))
    },

    // ── sliding window aggregate (1h window, 30min slide) ────────────────
    "stream_sliding" -> Q("""
      |SELECT CAST(epoch(w_start) AS BIGINT) AS w_start, count(*) AS n FROM (
      |  SELECT unnest([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
      |                 time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
      |                   - INTERVAL '30 minutes']) AS w_start
      |  FROM events)
      |GROUP BY w_start ORDER BY w_start""") { (s, d) =>
      Streaming.slidingCounts(Engine.table(s, d, "events"))
        .select(unix_timestamp(col("w_start")).as("w_start"), col("n"))
        .orderBy(col("w_start"))
    },

    // ── session windows (10 min gap) via gaps-and-islands oracle ─────────
    "stream_session" -> Q("""
      |WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events),
      |m AS (SELECT user_id, ts,
      |        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                  < INTERVAL '10 minutes' THEN 0 ELSE 1 END AS new_s
      |      FROM e),
      |g AS (SELECT user_id, ts,
      |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                         ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM m)
      |SELECT epoch_us(min(ts)) // 1000000 AS s_start,
      |       epoch_us(max(ts) + INTERVAL '10 minutes') // 1000000 AS s_end,
      |       user_id, count(*) AS n_events
      |FROM g GROUP BY user_id, sid ORDER BY user_id, s_start""") { (s, d) =>
      Streaming.sessionCounts(Engine.table(s, d, "events"))
        .select(unix_timestamp(col("s_start")).as("s_start"),
          unix_timestamp(col("s_end")).as("s_end"),
          col("user_id"), col("n_events"))
        .orderBy(col("user_id"), col("s_start"))
    },

    // ── stream-stream interval join (click → purchase ≤ 30 min) ──────────
    "stream_join" -> Q("""
      |SELECT c.event_id AS c_id, p.event_id AS p_id, c.user_id, p.value
      |FROM events c JOIN events p
      |  ON c.event_type = 'click' AND p.event_type = 'purchase'
      | AND c.user_id = p.user_id
      | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
      | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      |ORDER BY c_id, p_id""") { (s, d) =>
      Streaming.clickToPurchase(Engine.table(s, d, "events"))
        .select(col("c_id"), col("p_id"), col("c_user").as("user_id"),
          col("value"))
        .orderBy(col("c_id"), col("p_id"))
    },

    // ── LEFT OUTER stream-stream interval join: clicks with no purchase
    //    in the window survive with NULLs (watermark-evicted emission in
    //    stream mode — StreamingSpec; plain outer join in batch) ─────────
    "stream_join_outer" -> Q("""
      |SELECT c.event_id AS c_id, p.event_id AS p_id, c.user_id, p.value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
      | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      |ORDER BY c_id, p_id NULLS FIRST""") { (s, d) =>
      Streaming.clickToPurchaseLeftOuter(Engine.table(s, d, "events"))
        .select(col("c_id"), col("p_id"), col("c_user").as("user_id"),
          col("value"))
        .orderBy(col("c_id"), col("p_id").asc_nulls_first)
    },

    // ── RIGHT OUTER stream-stream interval join: purchases with no
    //    click in the preceding 30 min survive with NULL click columns
    //    (mirror of the left-outer eviction rule) ───────────────────────
    "stream_join_right" -> Q("""
      |SELECT c.event_id AS c_id, p.event_id AS p_id, p.user_id, p.value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |RIGHT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
      | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      |ORDER BY p_id, c_id NULLS FIRST""") { (s, d) =>
      Streaming.clickToPurchaseRightOuter(Engine.table(s, d, "events"))
        .select(col("c_id"), col("p_id"), col("p_user").as("user_id"),
          col("value"))
        .orderBy(col("p_id"), col("c_id").asc_nulls_first)
    },

    // ── FULL OUTER stream-stream interval join: unmatched rows from
    //    BOTH sides survive NULL-padded (state-eviction emission in
    //    stream mode — StreamingSpec; plain full join in batch).
    //    user_id coalesces across sides so every row carries it ─────────
    "stream_join_full" -> Q("""
      |SELECT c.event_id AS c_id, p.event_id AS p_id,
      |       coalesce(c.user_id, p.user_id) AS user_id, p.value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
      | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      |ORDER BY c_id NULLS FIRST, p_id NULLS FIRST""") { (s, d) =>
      Streaming.clickToPurchaseFullOuter(Engine.table(s, d, "events"))
        .select(col("c_id"), col("p_id"),
          coalesce(col("c_user"), col("p_user")).as("user_id"),
          col("value"))
        .orderBy(col("c_id").asc_nulls_first, col("p_id").asc_nulls_first)
    },

    // ── streaming dedup (dropDuplicatesWithinWatermark in stream mode,
    //    dropDuplicates in batch — StreamingSpec holds the equivalence).
    //    Output is keyed-only (per-user distinct-type count): which row
    //    survives per key is arbitrary, the surviving KEY SET is not ────
    "stream_dedup" -> Q("""
      |SELECT user_id, count(*) AS n_types FROM (
      |  SELECT DISTINCT user_id, event_type FROM events) d
      |GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      Streaming.dedupStream(Engine.table(s, d, "events"),
          Seq("user_id", "event_type"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_types"))
        .orderBy(col("user_id"))
    }
  )
}
