package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Temporal shaping operators: gaps-and-islands interval coverage and
  * slowly-changing-dimension (SCD Type-2) history construction.
  *
  * Reference family context: the OSM wrangling project reasons about
  * contributor activity ("when was this user active, and for how
  * long?") and about attribute history ("what did this tag look like
  * over time?") by ad-hoc scripts over timestamps. q118/q119 are those
  * two questions as engine operators: activity-interval coverage via
  * gaps-and-islands, and a versioned effective-dated dimension built
  * from a change stream.
  */
object Temporal {

  // ---- q118: gaps-and-islands interval merge ----

  /** Each event covers [ts, ts + COVER_US) of its user's activity; 12 h
    * in MICROseconds. Sized against the corpus: the median per-user gap
    * is ~7.7 h (merges) and p90 is ~24 h (splits), so both behaviors
    * are exercised. Interval arithmetic stays in the int64 microsecond
    * domain — exact, overflow-free, and the finest resolution BOTH
    * engines share: DuckDB reads the parquet TIMESTAMP(NANOS) column
    * as µs TIMESTAMP (nanos truncated), so µs is the cross-engine
    * parity domain (the ORA_TS_US stance). Spark derives the same
    * value exactly with integer `ts div 1000`. */
  val COVER_US = 43_200_000_000L

  /** q118: merge each user's overlapping/adjacent coverage intervals
    * into islands; report islands, total covered time, longest island.
    *
    * Scale shape: ONE exchange. The island boundary is found with the
    * classic cumulative-max trick — an event starts a new island iff
    * its start exceeds the running max end of all earlier intervals
    * (`max(end) OVER (... ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)`) —
    * so the whole query is two windows plus two aggregations, ALL
    * partitioned by `user_id`. The windows sort within the user
    * partition and both `groupBy`s cluster on key sets containing
    * `user_id`, so Catalyst reuses the single hash partitioning: no
    * second shuffle (asserted by TemporalSpec's exchange count). Work
    * is parallel across the entity dimension — the standard shape for
    * per-entity series at 100 TB; a hot user bounds a partition at its
    * own event count, never the table's. */
  def q118IntervalMerge(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val prevEnd = max(col("tus") + COVER_US)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    e.withColumn("new_island",
        when(prevEnd.isNull || col("tus") > prevEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("tus")).as("start_us"),
           (max(col("tus")) + COVER_US).as("end_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
           sum(col("end_us") - col("start_us")).as("covered_us"),
           max(col("end_us") - col("start_us")).as("longest_us"))
      .orderBy(col("user_id"))
  }

  val o118 = s"""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id FROM events),
    m AS (
      SELECT user_id, tus,
        CASE WHEN max(tus + $COVER_US) OVER (PARTITION BY user_id
               ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
          OR tus > max(tus + $COVER_US) OVER (PARTITION BY user_id
               ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          THEN 1 ELSE 0 END AS new_island,
        event_id FROM e),
    isl AS (
      SELECT user_id, tus,
        SUM(new_island) OVER (PARTITION BY user_id ORDER BY tus, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM m),
    spans AS (
      SELECT user_id, island, MIN(tus) AS start_us,
        MAX(tus) + $COVER_US AS end_us
      FROM isl GROUP BY user_id, island)
    SELECT user_id, count(*) AS n_islands,
      CAST(SUM(end_us - start_us) AS BIGINT) AS covered_us,
      MAX(end_us - start_us) AS longest_us
    FROM spans GROUP BY user_id ORDER BY user_id"""

  // ---- q119: SCD Type-2 dimension build ----

  /** q119: build a versioned effective-dated dimension from the event
    * stream — per user, the history of `event_type` as
    * [effective_from, effective_to) rows: consecutive duplicates
    * compacted, `effective_to` = next version's `effective_from`
    * (NULL ⇒ current row, flagged `is_current`).
    *
    * Scale shape: one exchange on `user_id`; the duplicate-compaction
    * lag, the version row_number, and the effective_to lead all share
    * one (partition, order) — a single sort serves all three windows.
    * Ordering is by the int64 microsecond timestamp (+ event_id
    * tiebreak) — total, exact-integer, and the parity domain both
    * engines share (see COVER_US). This is the standard
    * CDC→dimension materialization: at 100 TB it is one shuffle of the
    * change stream, never a self-join per version. */
  def q119Scd2Dim(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val e = events(s, d)
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"),
        col("event_type"), col("ts_us"))
    e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("effective_from", col("ts_us"))
      .withColumn("effective_to", lead(col("ts_us"), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select(col("user_id"), col("version"), col("event_type"),
        col("effective_from"), col("effective_to"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val o119 = s"""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type,
        $ORA_TS_US AS ts_us
      FROM events),
    c AS (
      SELECT *, lag(event_type) OVER
          (PARTITION BY user_id ORDER BY tus, event_id) AS prev_type
      FROM e),
    ch AS (
      SELECT * FROM c WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id,
      CAST(row_number() OVER w AS BIGINT) AS version,
      event_type, ts_us AS effective_from,
      lead(ts_us) OVER w AS effective_to,
      lead(ts_us) OVER w IS NULL AS is_current
    FROM ch
    WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ORDER BY user_id, version"""

  // ---- q128: as-of dimension probe (union + LOCF, no range join) ----

  /** q128: resolve each `purchase` event against the q119 dimension —
    * "which version was effective when this purchase happened?" — the
    * point-in-time lookup every feature pipeline and bitemporal audit
    * needs.
    *
    * Scale shape: NOT a range join. Dimension-change rows and probe
    * rows union onto one per-user timeline (change rows sort before
    * probes at equal timestamps via the `kind` column) and the current
    * version is carried forward with `last(..., ignoreNulls)` — one
    * shuffle on `user_id`, one sort, linear in |changes|+|probes|. The
    * range-join formulation explodes each probe against every version
    * interval and re-filters; at 100 TB that's a second shuffle plus a
    * per-user quadratic hazard. The DuckDB oracle RUNS the range-join
    * formulation, so the gate itself proves the two equivalent. */
  def q128DimAsofProbe(s: SparkSession, d: String): DataFrame = {
    val dim = q119Scd2Dim(s, d)
      .select(col("user_id"), unix_micros(col("effective_from")).as("tus"),
        lit(0).as("kind"), lit(null).cast("long").as("event_id"),
        col("version"), col("event_type").as("dim_type"))
    val probes = events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        lit(1).as("kind"), col("event_id"),
        lit(null).cast("long").as("version"),
        lit(null).cast("string").as("dim_type"))
    // Tiebreak covers BOTH row kinds: dim rows (kind=0) carry a null
    // event_id, so `version` orders two SCD versions sharing one
    // microsecond deterministically; probe rows (kind=1) carry a null
    // version, so `event_id` orders them. Without `version` in the sort,
    // equal-timestamp dim rows had no deterministic order and
    // last(version) could carry the stale version.
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus"), col("kind"), col("version"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(probes)
      .withColumn("v", last(col("version"), ignoreNulls = true).over(w))
      .withColumn("t", last(col("dim_type"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(tus)").as("ts_us"),
        col("t").as("dim_type"), col("v").as("version"))
      .orderBy(col("event_id"))
  }

  val o128 = s"""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type
      FROM events),
    c AS (
      SELECT *, lag(event_type) OVER
          (PARTITION BY user_id ORDER BY tus, event_id) AS prev_type
      FROM e),
    dim AS (
      SELECT user_id,
        CAST(row_number() OVER w AS BIGINT) AS version,
        event_type AS dim_type, tus AS ef_us, lead(tus) OVER w AS et_us
      FROM (SELECT * FROM c WHERE prev_type IS NULL OR prev_type <> event_type)
      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
    probes AS (
      SELECT user_id, tus, event_id FROM e WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, make_timestamp(p.tus) AS ts_us,
      d.dim_type, d.version
    FROM probes p JOIN dim d ON p.user_id = d.user_id
      AND d.ef_us <= p.tus AND (d.et_us IS NULL OR p.tus < d.et_us)
    ORDER BY p.event_id"""

  // ---- q147: time-weighted average (step-function integral) ----

  /** q147: per-user time-weighted mean of the event `value` — each
    * reading holds until the user's next event (step-function / LOCF
    * semantics), so TWA = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first). The
    * temporal-database staple (sensor means, position-weighted P&L,
    * average concurrency) that a plain AVG silently gets wrong
    * whenever sampling is irregular.
    *
    * Determinism stance: durations are exact int64 µs; `value` is
    * frozen to decimal(18,6) FIRST (one rounding both engines share),
    * so every product and the per-user sum are exact decimals —
    * no float accumulation, partitioning-free — with ONE IEEE
    * division at the end. Zero-span users (a single event, or all
    * events in the same microsecond) are excluded rather than
    * emitting 0/0.
    *
    * Scale shape: one user-keyed sort window for the `lead`, then a
    * user-keyed aggregate on the same partitioning — the q118/q119
    * single-exchange pattern. */
  def q147TimeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("tus"),
        expr("cast(round(value, 6) as decimal(18,6))").as("v"))
      .withColumn("nxt", lead(col("tus"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("v") * (col("nxt") - col("tus"))).as("wsum"),
           min(col("tus")).as("t0"), max(col("nxt")).as("t1"),
           count(lit(1)).as("n_segments"))
      .filter(col("t1") > col("t0"))
      .select(col("user_id"),
        (col("t1") - col("t0")).as("span_us"),
        col("n_segments"),
        round(col("wsum").cast("double")
          / (col("t1") - col("t0")).cast("double"), 6).as("twa"))
      .orderBy(col("user_id"))
  }

  val o147 = """
    WITH e AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus,
        CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v
      FROM events),
    x AS (
      SELECT *, lead(tus) OVER
        (PARTITION BY user_id ORDER BY tus, event_id) AS nxt
      FROM e)
    SELECT user_id,
      CAST(MAX(nxt) - MIN(tus) AS BIGINT) AS span_us,
      COUNT(*) AS n_segments,
      ROUND(CAST(SUM(v * (nxt - tus)) AS DOUBLE)
        / CAST(MAX(nxt) - MIN(tus) AS DOUBLE), 6) AS twa
    FROM x WHERE nxt IS NOT NULL
    GROUP BY user_id HAVING MAX(nxt) > MIN(tus)
    ORDER BY user_id"""

  // ---- q154: sweep-line maximum interval concurrency ----

  /** q154: peak concurrent open intervals per year — the sweep-line
    * ("how many shipments are in transit at once?") operator behind
    * capacity planning, connection-pool sizing, and overlap billing.
    * Each lineitem opens a half-open interval
    * [shipdate, shipdate + quantity days); intervals are turned into
    * ±1 boundary events ROW-LOCALLY (one scan, explode of a 2-struct
    * array — not a self-union, which would read the fact twice),
    * collapsed to one net delta per DISTINCT DATE, and prefix-summed
    * into the concurrency step function. Concurrency is measured at
    * end-of-day (all of a day's opens and closes applied), which makes
    * the per-date collapse semantics-preserving and order-free.
    *
    * Scale shape: the only data-sized shuffle is the groupBy(date)
    * partial-agg collapse. The running sum then runs over the DATE
    * DOMAIN (~2.5k rows for this corpus, bounded by calendar span, not
    * corpus size) — an unpartitioned window over a domain-bounded
    * aggregate, the documented q122/q126 pattern. For a truly
    * unbounded time domain (microsecond events), swap the window for
    * q151's two-phase bucket-offset rewrite; the per-date collapse and
    * event generation are unchanged. */
  def q154MaxConcurrency(s: SparkSession, d: String): DataFrame = {
    val ev = lineitem(s, d)
      .select(explode(expr(
        """array(
             struct(to_date(l_shipdate) AS t, 1L AS d),
             struct(date_add(to_date(l_shipdate), cast(l_quantity as int)) AS t,
                    -1L AS d))""")).as("e"))
      .select(col("e.t").as("t"), col("e.d").as("d"))
    val byDate = ev.groupBy(col("t")).agg(sum(col("d")).as("dd"))
    val run = byDate.withColumn("conc",
      sum(col("dd")).over(Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("yr", year(col("t")).cast("long"))
    run
      .withColumn("peak", max(col("conc")).over(Window.partitionBy(col("yr"))))
      .filter(col("conc") === col("peak"))
      .groupBy(col("yr"))
      .agg(max(col("conc")).as("peak_conc"),
           date_format(min(col("t")), "yyyy-MM-dd").as("first_peak_date"))
      .orderBy(col("yr"))
  }

  val o154 = """
    WITH iv AS (
      SELECT CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS e
      FROM lineitem),
    ev AS (SELECT s AS t, 1 AS d FROM iv
           UNION ALL SELECT e, -1 FROM iv),
    byt AS (SELECT t, SUM(d) AS dd FROM ev GROUP BY t),
    run AS (SELECT t, SUM(dd) OVER (ORDER BY t) AS conc FROM byt),
    pk AS (SELECT t, conc, CAST(year(t) AS BIGINT) AS yr,
             MAX(conc) OVER (PARTITION BY year(t)) AS peak
           FROM run)
    SELECT yr, CAST(MAX(conc) AS BIGINT) AS peak_conc,
      CAST(MIN(t) AS VARCHAR) AS first_peak_date
    FROM pk WHERE conc = peak GROUP BY yr ORDER BY yr"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_max_concurrency" -> (q154MaxConcurrency _),
    "q118_interval_merge" -> (q118IntervalMerge _),
    "q119_scd2_dim"       -> (q119Scd2Dim _),
    "q128_dim_asof_probe" -> (q128DimAsofProbe _),
    "q147_time_weighted_avg" -> (q147TimeWeightedAvg _))

  val oracles: Map[String, String] = Map(
    "q154_max_concurrency" -> o154,
    "q118_interval_merge" -> o118, "q119_scd2_dim" -> o119,
    "q128_dim_asof_probe" -> o128,
    "q147_time_weighted_avg" -> o147)
}
