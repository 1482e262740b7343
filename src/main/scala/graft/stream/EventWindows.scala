package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-time windowing surface (SURVEY.md §2.8 ST1–ST4) in its
  * batch-checkable form: the exact same `window`/`session_window`
  * expressions run under Structured Streaming with a watermark (see
  * graft.stream.StreamingDemo + StreamingSpec); the driver oracle is
  * batch DuckDB, so the registry entries are batch.
  *
  * All window assignment happens on µs-truncated event time (`ts_us`),
  * matching the oracle's make_timestamp(epoch_ns//1000) exactly.
  */
object EventWindows {

  /** ST1: tumbling 1-hour windows per event type. */
  def q30Tumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("w.start").as("hour_start"), col("event_type"),
              col("n"), col("total"))
      .orderBy(col("hour_start"), col("event_type"))

  val o30 = s"""
    SELECT date_trunc('hour', $ORA_TS_US) AS hour_start, event_type,
      COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events GROUP BY hour_start, event_type
    ORDER BY hour_start, event_type"""

  /** ST1: sliding windows — 10 min size, 5 min slide (each event lands in
    * exactly two windows). */
  def q31Sliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts_us"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("w.start").as("win_start"), col("n"), col("total"))
      .orderBy(col("win_start"))

  val o31 = """
    WITH e AS (SELECT epoch_ns(ts)//1000 AS eus, value FROM events),
    w AS (SELECT make_timestamp((eus//300000000)*300000000 - o) AS win_start, value
          FROM e, (VALUES (0::BIGINT), (300000000::BIGINT)) t(o))
    SELECT win_start, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM w GROUP BY win_start ORDER BY win_start"""

  /** ST2: session windows — 5-minute inactivity gap per user. Output keyed
    * on integer µs session start for exact cross-engine compare. */
  def q32Session(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts_us"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("user_id"), unix_micros(col("w.start")).as("sess_start_us"),
              col("n"), col("total"))
      .orderBy(col("user_id"), col("sess_start_us"))

  val o32 = """
    WITH e AS (
      SELECT user_id, epoch_ns(ts)//1000 AS eus, value FROM events),
    m AS (
      SELECT user_id, eus, value,
        CASE WHEN eus - LAG(eus) OVER (PARTITION BY user_id ORDER BY eus)
                  >= 300000000 OR
                  LAG(eus) OVER (PARTITION BY user_id ORDER BY eus) IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM e),
    sess AS (
      SELECT user_id, eus, value,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY eus
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM m)
    SELECT user_id, MIN(eus) AS sess_start_us, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, sess_start_us"""

  /** ST4 batch analogue: deterministic distributed dedup — first event id
    * per (user, type). (dropDuplicates keeps an arbitrary row; min-per-key
    * is the deterministic, shuffle-once formulation that also scales.) */
  def q33EventDedup(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("user_id"), col("event_type"))

  val o33 = """
    SELECT user_id, event_type, MIN(event_id) AS first_id, COUNT(*) AS n_dups
    FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type"""

  /** q73: manual sessionization — the composable form of q32's
    * session_window: a lag gap-flag, a running sum assigning session
    * ids, then per-session stats. One user_id shuffle; everything else
    * is in-partition window math over integer nanoseconds. */
  def q73Sessionize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapNs = 3600L * 1000 * 1000 * 1000 // 60 minutes
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(wOrd) > gapNs
          || lag(col("ts"), 1).over(wOrd).isNull, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        // integer floor division (`div`), matching the oracle's `//` —
        // long/long `/` promotes to double and can round up at large
        // magnitudes, breaking the integer-ns-arithmetic parity rule
        expr("(max(ts) - min(ts)) div 1000000000").as("duration_sec"))
      .filter(col("n_events") >= 3)
      .orderBy(col("user_id"), col("sess_id"))
  }

  val o73 = """
    WITH flagged AS (
      SELECT user_id, event_id, epoch_ns(ts) AS tns,
        CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
             > 3600000000000
             OR LAG(epoch_ns(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
             IS NULL
        THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, tns,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS sess_id
      FROM flagged)
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
      COUNT(*) AS n_events,
      CAST((MAX(tns) - MIN(tns)) // 1000000000 AS BIGINT) AS duration_sec
    FROM sess GROUP BY user_id, sess_id HAVING COUNT(*) >= 3
    ORDER BY user_id, sess_id"""

  /** q74: conversion funnel — users whose first view precedes their
    * first click precedes their first purchase. One aggregation (the
    * per-stage first-timestamp pivot is conditional min), then pure
    * row-local comparisons: the funnel at any scale is a groupBy, not
    * a join chain. */
  def q74Funnel(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
      .withColumn("reached",
        when(col("t_view").isNotNull && col("t_click").isNotNull
            && col("t_buy").isNotNull && col("t_view") <= col("t_click")
            && col("t_click") <= col("t_buy"), "full_funnel")
        .when(col("t_view").isNotNull && col("t_click").isNotNull
            && col("t_view") <= col("t_click"), "view_click")
        .when(col("t_view").isNotNull, "view_only")
        .otherwise("no_view"))
      .groupBy(col("reached"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("reached"))

  val o74 = """
    WITH stages AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
        MIN(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
        MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_buy
      FROM events GROUP BY user_id),
    labeled AS (
      SELECT CASE
        WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_buy IS NOT NULL
             AND t_view <= t_click AND t_click <= t_buy THEN 'full_funnel'
        WHEN t_view IS NOT NULL AND t_click IS NOT NULL
             AND t_view <= t_click THEN 'view_click'
        WHEN t_view IS NOT NULL THEN 'view_only'
        ELSE 'no_view' END AS reached
      FROM stages)
    SELECT reached, COUNT(*) AS n_users FROM labeled
    GROUP BY reached ORDER BY reached"""

  // ---- q101: CDC latest-state compaction ----

  /** q101: compact an append-only change log to its latest state — one
    * row per (user_id, event_type) carrying the most recent version's
    * payload (tie-broken by event_id, so the "latest" is a total
    * order), plus the version count.
    *
    * Scale shape: `max_by(payload, struct(ts, event_id))` is a single
    * MAP-SIDE-COMBINABLE hash aggregate — each partition's partial
    * state is one candidate row per key it has seen, so only |keys|
    * rows per partition ever reach the shuffle, regardless of how many
    * versions the log holds. The textbook window formulation
    * (`row_number() over (partition by key order by ts desc) = 1`)
    * shuffles and sorts EVERY version — at a 100 TB change log with
    * hot keys that is the difference between a compaction that runs
    * and one that spills forever. The oracle deliberately uses the
    * window formulation, so the gate also cross-checks the two. */
  def q101CdcCompact(s: SparkSession, d: String): DataFrame =
    events(s, d)
      // µs-truncated ordering key: the oracle engine reads this nanos
      // column at µs precision, so "latest" must be decided at µs +
      // event_id on both sides or sub-µs ties would diverge
      .withColumn("ts_us", expr("ts div 1000"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        max_by(struct(col("event_id"), col("value"), col("props")),
               struct(col("ts_us"), col("event_id"))).as("last"),
        max(col("ts_us")).as("last_ts_us"),
        count(lit(1)).as("n_versions"))
      .select(col("user_id"), col("event_type"),
        col("last.event_id").as("last_event_id"),
        col("last.value").as("last_value"),
        col("last.props").as("last_props"),
        col("last_ts_us"), col("n_versions"))
      .orderBy(col("user_id"), col("event_type"))

  val o101 = """
    WITH r AS (
      SELECT user_id, event_type, event_id, value, props,
        epoch_us(ts) AS ts_us,
        ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
        COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
      FROM events)
    SELECT user_id, event_type, event_id AS last_event_id,
      value AS last_value, props AS last_props,
      CAST(ts_us AS BIGINT) AS last_ts_us, n_versions
    FROM r WHERE rn = 1 ORDER BY user_id, event_type"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_cdc_compact"    -> (q101CdcCompact _),
    "q30_tumbling_window" -> (q30Tumbling _),
    "q31_sliding_window"  -> (q31Sliding _),
    "q32_session_window"  -> (q32Session _),
    "q33_event_dedup"     -> (q33EventDedup _),
    "q73_sessionize"      -> (q73Sessionize _),
    "q74_funnel"          -> (q74Funnel _))

  val oracles: Map[String, String] = Map(
    "q30_tumbling_window" -> o30, "q31_sliding_window" -> o31,
    "q32_session_window" -> o32, "q33_event_dedup" -> o33,
    "q73_sessionize" -> o73, "q74_funnel" -> o74,
    "q101_cdc_compact" -> o101)
}
