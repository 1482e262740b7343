package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Window-function surface (SURVEY.md §2.7 W1–W3, EXT-O3).
  *
  * Scale stance: each query shuffles exactly once, on the window
  * partition key; ordering inside a partition is a local sort. Gap /
  * running-sum arithmetic is done on integer nanoseconds or exact
  * decimals so results are engine- and partitioning-independent.
  */
object Windows {

  /** W1 / EXT-O3: per-group top-k via row_number (plus rank demo). */
  def q27WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(desc("c_acctbal"), col("c_custkey"))
    customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn").cast("long").as("rn"),
              col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  val o27 = """
    SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3 ORDER BY c_mktsegment, rn"""

  /** W2: lag — inter-event gap in whole seconds per user (integer ns
    * arithmetic; no float time math). */
  def q28WindowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events(s, d)
      .withColumn("ts_sec", expr("ts div 1000000000"))
      .withColumn("gap_sec", col("ts_sec") - lag(col("ts_sec"), 1).over(w))
      .filter(col("gap_sec").isNotNull)
      .select(col("event_id"), col("user_id"), col("gap_sec"))
      .orderBy(col("event_id"))
  }

  val o28 = """
    SELECT event_id, user_id, gap_sec FROM (
      SELECT event_id, user_id,
        epoch_ns(ts)//1000000000
          - LAG(epoch_ns(ts)//1000000000) OVER (PARTITION BY user_id ORDER BY event_id) AS gap_sec
      FROM events) t
    WHERE gap_sec IS NOT NULL ORDER BY event_id"""

  /** W3: running sum over an explicit ROWS frame, exact decimal. */
  def q29WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("running", sum(dec2(col("value"))).over(w).cast("double"))
      .filter(col("user_id") < 10)
      .select(col("event_id"), col("user_id"), col("running"))
      .orderBy(col("event_id"))
  }

  val o29 = """
    SELECT event_id, user_id,
      CAST(SUM(CAST(value AS DECIMAL(12,2)))
        OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
    FROM events WHERE user_id < 10 ORDER BY event_id"""

  /** W3 (RANGE frame): per-event count + exact-decimal sum of the same
    * user's events in the trailing 10 minutes — the frame is a VALUE
    * range over raw nanosecond longs, not a row count, so ties and
    * irregular event spacing are handled by definition. */
  def q58RangeFrame(s: SparkSession, d: String): DataFrame = {
    val tenMinNs = 600L * 1000 * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-tenMinNs, 0)
    events(s, d)
      .withColumn("n_10m", count(lit(1)).over(w))
      .withColumn("sum_10m", sum(dec2(col("value"))).over(w).cast("double"))
      .filter(col("user_id") < 20)
      .select(col("event_id"), col("user_id"), col("n_10m"), col("sum_10m"))
      .orderBy(col("event_id"))
  }

  val o58 = """
    SELECT event_id, user_id, n_10m, sum_10m FROM (
      SELECT event_id, user_id,
        COUNT(*) OVER w AS n_10m,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_10m
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
                   RANGE BETWEEN 600000000000 PRECEDING AND CURRENT ROW)) t
    WHERE user_id < 20 ORDER BY event_id"""

  /** W1 distribution functions: ntile / percent_rank / cume_dist. The
    * order key (c_acctbal, c_custkey) is unique, so peer groups are
    * singletons and all three are deterministic. */
  def q66WindowDist(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .filter(col("c_custkey") % 10 === 0)
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  val o66 = """
    SELECT c_mktsegment, c_custkey, quartile, pct_rank, cume FROM (
      SELECT c_mktsegment, c_custkey,
        CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        ROUND(CUME_DIST() OVER w, 6) AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)) t
    WHERE c_custkey % 10 = 0 ORDER BY c_mktsegment, c_custkey"""

  // ---- q110: time-series resampling + forward fill ----

  /** Nanoseconds per day — `events.ts` is a raw-nanos long, so the day
    * bucket is pure integer arithmetic (engine-portable, no timezone
    * or timestamp-precision traps). */
  val NS_PER_DAY = 86400L * 1000 * 1000 * 1000

  /** q110: resample each user's event stream onto a daily grid and
    * forward-fill gaps — the standard time-series regularization pass
    * (metrics pipelines, feature engineering) that turns an irregular
    * event log into an equal-spaced series.
    *
    * Three stages, each scale-shaped:
    *  1. per-(user, day) compaction to the LAST observation — a
    *     map-side-combinable `max_by` keyed on (ts, event_id), q101's
    *     aggregate shape: only |user×day| rows shuffle, however many
    *     raw events a hot day holds;
    *  2. the grid is generated per user from its own [min,max] day
    *     span — `sequence` + `explode` is a row-local fan-out, no
    *     driver-side range or cross join;
    *  3. forward fill is `last(value, ignoreNulls)` over the per-user
    *     day order — partitions by user (parallel across the entity
    *     dimension), local sort within, the canonical window shape
    *     for per-entity series at 100 TB.
    *
    * The first grid day of each user is its first observed day, so the
    * fill never has a leading NULL. `value` is carried, not computed —
    * no float arithmetic anywhere. */
  def q110ResampleFfill(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .withColumn("day", expr(s"ts div $NS_PER_DAY"))
    val lastObs = ev.groupBy(col("user_id"), col("day"))
      .agg(expr("max_by(value, struct(ts, event_id))").as("value"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastObs, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("value"), ignoreNulls = true).over(w).as("value_filled"),
        col("value").isNotNull.as("is_observed"))
      .orderBy(col("user_id"), col("day"))
  }

  val o110 = s"""
    WITH obs AS (
      SELECT user_id, epoch_ns(ts) // $NS_PER_DAY AS day, value,
        ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ns(ts) // $NS_PER_DAY
                           ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
      FROM events),
    last_obs AS (SELECT user_id, day, value FROM obs WHERE rn = 1),
    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
               FROM obs GROUP BY user_id),
    grid AS (SELECT user_id, UNNEST(generate_series(d0, d1)) AS day
             FROM bounds),
    j AS (SELECT g.user_id, g.day, o.value,
            o.value IS NOT NULL AS is_observed
          FROM grid g LEFT JOIN last_obs o
            ON g.user_id = o.user_id AND g.day = o.day)
    SELECT user_id, day,
      last_value(value IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
      is_observed
    FROM j ORDER BY user_id, day"""

  // ---- q115: point-in-time feature join (leakage-safe features) ----

  /** q115: for every order, the customer's history STRICTLY BEFORE that
    * order — prior order count, prior spend, and days since the
    * previous order. This is the feature-store "point-in-time correct"
    * join: a model scoring order N may only see features computed from
    * orders 1..N−1, and the frame `rowsBetween(unboundedPreceding, -1)`
    * encodes exactly that (an `unboundedFollowing`-style or plain
    * group-by feature would leak the label row into its own feature).
    *
    * Scale shape: one shuffle on the entity key (customer), local sort
    * by (date, key) within — the same per-entity window shape as q110;
    * spend travels as exact decimals. Ordering is total (date ties
    * broken by key), so the features are deterministic. */
  def q115PitFeatures(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLag = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        dec2(col("o_totalprice")).as("price"))
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("spend_prior",
        coalesce(sum(col("price")).over(w), lit(0).cast("decimal(12,2)"))
          .cast("double"))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(wLag))
          .cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("n_prior"),
        col("spend_prior"), col("days_since_prev"))
      .orderBy(col("o_orderkey"))
  }

  val o115 = """
    SELECT o_orderkey, o_custkey,
      COUNT(*) OVER w AS n_prior,
      CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w, 0)
           AS DOUBLE) AS spend_prior,
      CAST(date_diff('day',
             LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ORDER BY o_orderkey"""

  // ---- q151: distributed global ranking (two-phase, no global window) ----

  /** Key-range bucket width for q151 (n_chars units): buckets the sort
    * key's VALUE domain, so the offset table is domain-bounded. */
  val RANK_BUCKET = 100L

  /** q151: dense global rank over the whole corpus WITHOUT a
    * single-partition window — THE primitive behind every "give each
    * row its position in a total order" need (leaderboards, stable
    * ids, pagination). `row_number() OVER (ORDER BY ...)` moves the
    * entire dataset through one task; this is the two-phase rewrite
    * the repo's packing (q83) and budget (q98) operators already use,
    * surfaced as an operator in its own right:
    *   1. bucket by the SORT KEY's value range (n_chars div 100) —
    *      within-bucket rank is a bucket-keyed window (distributed);
    *   2. bucket row-counts → running offsets over the domain-bounded
    *      bucket table (broadcast back);
    *   3. global_rank = bucket offset + within-bucket rank.
    * Value-derived buckets (not sampled ranges) keep the plan
    * deterministic and the oracle exact; a skewed key domain wants a
    * finer width or a composite key — the boundaries never affect the
    * RESULT, only balance, because rank(x) = |{y : y < x}| + 1 holds
    * under any partitioning. The oracle IS the naive global
    * row_number, so the gate proves the rewrite every round. */
  def q151GlobalRank(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("bkt", expr(s"n_chars div $RANK_BUCKET"))
    val wIn = Window.partitionBy(col("bkt"))
      .orderBy(col("n_chars"), col("doc_id"))
    val wOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy(col("bkt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("bkt"), col("off"))
    docs
      .withColumn("r_in", row_number().over(wIn))
      .join(broadcast(offsets), Seq("bkt"))
      .select(col("doc_id"), col("n_chars"),
        (col("off") + col("r_in")).cast("long").as("global_rank"))
      .orderBy(col("global_rank"))
  }

  val o151 = """
    SELECT doc_id, n_chars,
      CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
        AS global_rank
    FROM documents ORDER BY global_rank"""

  // ---- q168: rolling exact median over a RANGE frame ----

  /** q168: per-nation daily revenue with the exact rolling median over a
    * 7-day RANGE window (6 preceding days + current). The window
    * quantile is EXACT (`percentile`, not approx): the frame holds ≤ 7
    * rows per (nation, day) regardless of data scale — daily totals are
    * pre-aggregated first — so exactness costs a bounded per-frame sort,
    * not a corpus sort. Revenue is summed in cents (decimal → int64) so
    * the median is k or k+0.5 exactly; both engines interpolate the
    * even-count middle identically in doubles over exact ints.
    *
    * Scale shape: one shuffle to (nation, day) aggregates (map-side
    * combinable), then a |nations|-way window over day-indexed rows —
    * the window input is calendar-bounded (rows = nations × days), not
    * row-count-bounded, so a 100× fact scale-up changes only the first
    * aggregate. */
  def q168RollingMedian(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        datediff(col("o_orderdate").cast("date"),
          lit(java.sql.Date.valueOf("1995-01-01"))).cast("long").as("day_num"))
      .agg(sum(dec2(col("o_totalprice")) * 100).cast("long").as("rev_cents"))
      .filter(col("day_num") < 120)
    val w = Window.partitionBy(col("n_name")).orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("med7_cents", expr("percentile(rev_cents, 0.5D)").over(w))
      .select(col("n_name"), col("day_num"), col("rev_cents"),
        round(col("med7_cents"), 1).as("med7_cents"))
      .orderBy(col("n_name"), col("day_num"))
  }

  val o168 = """
    WITH daily AS (
      SELECT n_name,
        CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
          AS day_num,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
          AS rev_cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2 HAVING day_num < 120)
    SELECT n_name, day_num, rev_cents,
      ROUND(median(rev_cents) OVER (PARTITION BY n_name ORDER BY day_num
        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 1) AS med7_cents
    FROM daily ORDER BY n_name, day_num"""

  // ---- q170: running distinct count (first-occurrence decomposition) ----

  /** q170: cumulative distinct users per event type by day. Neither
    * engine supports COUNT(DISTINCT) OVER a running frame — and at
    * scale a naive one would hold the full user set per frame — so the
    * operator DECOMPOSES: distinct-over-time = first occurrence per
    * (type, user) → daily new-user counts → running sum. State per
    * group collapses from |users| to one long. The same decomposition
    * is how the streaming side would do it (dropDuplicates + windowed
    * count + cumulative sum), so batch and stream agree by
    * construction. */
  def q170RunningDistinct(s: SparkSession, d: String): DataFrame = {
    val firstDay = events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(to_date(col("ts_us"))).as("day"))
    val newPerDay = firstDay.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    newPerDay
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("event_type"), col("day"))
  }

  val o170 = """
    WITH fd AS (
      SELECT event_type, user_id,
        MIN(CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE)) AS day
      FROM events GROUP BY 1, 2),
    npd AS (
      SELECT event_type, day, COUNT(*) AS new_users FROM fd GROUP BY 1, 2)
    SELECT event_type, day, new_users,
      CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_users
    FROM npd ORDER BY event_type, day"""

  // ---- q173: exact EWMA (dyadic-weight exponential smoothing) ----

  /** q173: exponentially weighted moving average of per-nation daily
    * revenue, α = 1/2, over the last 10 days present — exponential
    * smoothing as an EXACT cross-engine operator.
    *
    * The float hazard of EWMA is weight generation: α(1−α)^k in
    * arbitrary α is rounded at every power and the summation order
    * leaks into the result. With α = 1/2 every weight is the dyadic
    * 2^−k, so each product rev_cents·2^−k and every partial sum is an
    * EXACTLY representable double (denominator 2⁹, numerator < 2^53):
    * the left fold `acc/2 + x` over the ordered frame computes
    * Σ x_{n−k}·2^−k with zero rounding, on any engine, in any
    * association order. The single inexact step is the final
    * numerator/denominator division, one IEEE op, then floor(·1e6)
    * micro-units — the q167 fixed-point stance, no ROUND(double)
    * boundary hazard.
    *
    * Scale shape: one map-side-combinable shuffle to (nation, day)
    * daily totals; the EWMA itself is a 10-row ROWS frame over the
    * calendar-bounded daily table (rows = nations × days, independent
    * of fact volume) — `collect_list` over the frame is bounded at 10
    * elements by the frame spec, then folded row-locally by codegen
    * HOFs. The oracle computes the same weights via a rank self-join
    * (pow(2, −gap) — also exact), proving the fold ≡ the closed form. */
  def q173Ewma(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        datediff(col("o_orderdate").cast("date"),
          lit(java.sql.Date.valueOf("1995-01-01"))).cast("long").as("day_num"))
      .agg(sum(dec2(col("o_totalprice")) * 100).cast("long").as("rev_cents"))
      .filter(col("day_num") >= 0 && col("day_num") < 120)
    val w = Window.partitionBy(col("n_name")).orderBy(col("day_num"))
      .rowsBetween(-9, 0)
    daily
      .withColumn("xs", collect_list(col("rev_cents")).over(w))
      .withColumn("ewma_micro", expr("""
        cast(floor(
          aggregate(xs, 0D, (acc, x) -> acc / 2D + cast(x as double)) /
          aggregate(xs, 0D, (acc, x) -> acc / 2D + 1D) * 1e6) as bigint)"""))
      .select(col("n_name"), col("day_num"), col("rev_cents"),
        col("ewma_micro"))
      .orderBy(col("n_name"), col("day_num"))
  }

  val o173 = """
    WITH daily AS (
      SELECT n_name,
        CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
          AS day_num,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
          AS rev_cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2 HAVING day_num >= 0 AND day_num < 120),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY day_num)
        AS rn
      FROM daily)
    SELECT a.n_name, a.day_num, a.rev_cents,
      CAST(FLOOR(SUM(b.rev_cents * pow(2.0, -(a.rn - b.rn))) /
                 SUM(pow(2.0, -(a.rn - b.rn))) * 1e6) AS BIGINT)
        AS ewma_micro
    FROM r a JOIN r b
      ON a.n_name = b.n_name AND b.rn BETWEEN a.rn - 9 AND a.rn
    GROUP BY a.n_name, a.day_num, a.rev_cents
    ORDER BY a.n_name, a.day_num"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q168_rolling_median" -> (q168RollingMedian _),
    "q170_running_distinct" -> (q170RunningDistinct _),
    "q173_ewma"           -> (q173Ewma _),
    "q151_global_rank"    -> (q151GlobalRank _),
    "q110_resample_ffill" -> (q110ResampleFfill _),
    "q115_pit_features"   -> (q115PitFeatures _),
    "q27_window_rank"    -> (q27WindowRank _),
    "q28_window_lag"     -> (q28WindowLag _),
    "q29_window_running" -> (q29WindowRunning _),
    "q58_range_frame"    -> (q58RangeFrame _),
    "q66_window_dist"    -> (q66WindowDist _))

  val oracles: Map[String, String] = Map(
    "q168_rolling_median" -> o168, "q170_running_distinct" -> o170,
    "q173_ewma" -> o173,
    "q27_window_rank" -> o27, "q28_window_lag" -> o28,
    "q29_window_running" -> o29, "q58_range_frame" -> o58,
    "q66_window_dist" -> o66, "q110_resample_ffill" -> o110,
    "q115_pit_features" -> o115, "q151_global_rank" -> o151)
}
