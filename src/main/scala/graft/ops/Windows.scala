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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_window_rank"    -> (q27WindowRank _),
    "q28_window_lag"     -> (q28WindowLag _),
    "q29_window_running" -> (q29WindowRunning _),
    "q58_range_frame"    -> (q58RangeFrame _),
    "q66_window_dist"    -> (q66WindowDist _))

  val oracles: Map[String, String] = Map(
    "q27_window_rank" -> o27, "q28_window_lag" -> o28,
    "q29_window_running" -> o29, "q58_range_frame" -> o58,
    "q66_window_dist" -> o66)
}
