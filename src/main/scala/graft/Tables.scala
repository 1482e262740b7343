package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + oracle-parity helpers shared by every operator module.
  *
  * Scale notes (100 TB design stance):
  *  - All loaders are plain parquet scans: Catalyst pushes filters and
  *    prunes columns into the scan, so downstream operators must express
  *    predicates/projections declaratively (no `.rdd`, no collect).
  *  - Money/quantity arithmetic is done in DECIMAL and only converted to
  *    DOUBLE once, after the (exact) aggregation. This is not just an
  *    oracle-parity trick: at 1000-executor scale, double summation order
  *    is nondeterministic across retries/AQE re-plans; decimal sums are
  *    exact and therefore stable run-to-run.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Data-contract-robust events reader. Upstream writers have produced
    * `events.ts` as BOTH parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * across testdata generations; a 100 TB lake has the same heterogeneity
    * across partitions written by different pipeline versions, so the
    * reader branches on the PHYSICAL schema rather than hard-coding one
    * encoding. Either way the exposed column surface is identical:
    *  - `ts`    BIGINT epoch-nanos (exact integer arithmetic — no double
    *            rounding at 1.7e18 magnitude),
    *  - `ts_us` µs-precision TimestampType for window/session functions.
    * NANOS path: Spark scans the column as a raw nanos LONG under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/
    * tests — required for that encoding to be readable at all).
    * MICROS path: the scan yields a timestamp type (NTZ or LTZ); with the
    * session timezone pinned to UTC the LTZ cast is micros-identity, so
    * `unix_micros * 1000` reproduces the exact same epoch-nanos values.
    * Oracle parity: DuckDB's `epoch_ns(ts)` accepts both TIMESTAMP_NS and
    * TIMESTAMP, so every oracle expression is encoding-independent.
    */
  def events(s: SparkSession, d: String): DataFrame =
    withEventTime(t(s, d, "events"))

  /** Normalize a raw events frame — batch OR streaming (the branch reads
    * only the static schema, so it composes with `readStream`) — to the
    * canonical column surface described above. */
  def withEventTime(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // NTZ→LTZ cast is wall-clock-preserving, so it is micros-identity
        // ONLY under a UTC session. Fail loudly rather than silently
        // shifting every epoch-nano in an ad-hoc non-UTC session.
        require(
          raw.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
          "withEventTime on TIMESTAMP_NTZ events requires " +
            "spark.sql.session.timeZone=UTC (NTZ->LTZ cast shifts otherwise)")
        raw
          .withColumn("ts_us", col("ts").cast(TimestampType))
          .withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ =>
        // timestamp-typed (LTZ) micros: unix_micros reads the instant
        // directly — timezone-independent.
        raw
          .withColumn("ts_us", col("ts").cast(TimestampType))
          .withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }

  /** Exact decimal cast for 2-dp money/quantity columns. Precision 12 keeps
    * products of three factors within DECIMAL(38,_) so Spark never rounds. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum, surfaced as DOUBLE (single, correctly-rounded
    * conversion — deterministic across partitionings and engines). */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact decimal average: exact sum / count in double division. */
  def davg(c: Column): Column = sum(dec2(c)).cast("double") / count(lit(1))

  /** Oracle-side (DuckDB) equivalent of `ts_us`. */
  val ORA_TS_US = "make_timestamp(epoch_ns(ts)//1000)"

  /** Shuffle-partition count with a hardening fallback: platforms may set
    * `spark.sql.shuffle.partitions` to a non-numeric value (e.g. "auto"),
    * where a bare `.toInt` throws; fall back to the context's default
    * parallelism — the same order of magnitude, and the uses of this value
    * (repartition counts, block counts) only need "scales with the
    * cluster", not the exact conf. */
  def shufflePartitions(s: SparkSession): Int =
    scala.util.Try(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(s.sparkContext.defaultParallelism)

  /** The RDDs a `localCheckpoint` persisted for `df`, derived from the
    * DataFrame's own plan (the `LogicalRDD` leaves a checkpoint rewrites
    * the plan to). A global before/after diff of
    * `sc.getPersistentRDDs` — the previous approach — could capture an
    * unrelated RDD persisted concurrently by another thread on the shared
    * context and later unpersist it mid-use; the plan-derived form cannot. */
  def checkpointedRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  private val cycledCheckpoints =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[org.apache.spark.rdd.RDD[_]]]()

  /** localCheckpoint for a plan subtree that is consumed by MULTIPLE
    * downstream operators in one query (materialize once instead of
    * recomputing per consumer), with per-tag cycling: the PREVIOUS
    * invocation's blocks for the same tag are freed when the query is
    * built again (bench reps, repeated verify), so checkpoints never
    * accumulate across a session. The current invocation's blocks must
    * stay persisted — the returned frame's lineage is truncated at the
    * checkpoint. */
  def checkpointCycled(tag: String, df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    // Try-guarded: the displaced entry may belong to a PREVIOUS, now
    // stopped SparkSession (multi-session processes — ClusterSmoke,
    // test harnesses); unpersist on a dead context throws and the
    // blocks are already gone with it.
    Option(cycledCheckpoints.put(tag, checkpointedRdds(out)))
      .foreach(_.foreach(r =>
        scala.util.Try(r.unpersist(blocking = false))))
    out
  }

  /** Free a tag's previously-cycled checkpoint blocks WITHOUT creating a
    * new checkpoint — for code paths that replace a formerly-checkpointed
    * result with a driver-computed LocalRelation (no blocks of its own)
    * but must keep the tag's cycling lifecycle honest: a prior
    * distributed-path invocation's blocks still get freed. */
  def cycleCheckpointTag(tag: String): Unit =
    Option(cycledCheckpoints.put(tag, Seq.empty))
      .foreach(_.foreach(r =>
        scala.util.Try(r.unpersist(blocking = false))))
}
