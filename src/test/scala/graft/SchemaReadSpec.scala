package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-on-read validation (SURVEY.md §1.2: cerberus → StructType
  * enforcement): PERMISSIVE mode routes malformed rows to
  * _corrupt_record; FAILFAST raises on first malformed row. */
class SchemaReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodAndBad = Seq(
    """{"id": 1, "lat": 39.0, "lon": -76.5}""",
    """{"id": "not-a-number", "lat": 1.0, "lon": 2.0}""",
    """{"id": 3, "lat": 38.9, "lon": -76.4}""")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE read keeps valid rows and quarantines corrupt ones") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(goodAndBad.toDS()).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect()
    assert(corrupt.length == 1 && corrupt.head.contains("not-a-number"))
  }

  test("FAILFAST read raises on the malformed row") {
    val ex = intercept[Exception] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST")
        .json(goodAndBad.toDS()).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      ex.getCause != null)
  }

  // --- events data contract: both historical ts encodings normalize to
  // the same surface (round 7 lost 43 queries to a silent NANOS→MICROS
  // testdata switch; Tables.withEventTime must keep both working) ---

  test("withEventTime: raw-nanos LONG ts → canonical (ts nanos, ts_us timestamp)") {
    val nanos = 1704067200123456789L // 2024-01-01 00:00:00.123456789 UTC
    val df = Tables.withEventTime(Seq((1L, nanos)).toDF("event_id", "ts"))
    val r = df.select(col("ts"), unix_micros(col("ts_us"))).head()
    assert(df.schema("ts").dataType == LongType)
    assert(df.schema("ts_us").dataType == TimestampType)
    assert(r.getLong(0) == nanos)
    assert(r.getLong(1) == nanos / 1000) // µs truncation, not rounding
  }

  test("withEventTime: timestamp ts → identical canonical surface") {
    val micros = 1704067200123456L
    val df = Tables.withEventTime(
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts")))
    val r = df.select(col("ts"), unix_micros(col("ts_us"))).head()
    assert(df.schema("ts").dataType == LongType) // normalized back to nanos
    assert(df.schema("ts_us").dataType == TimestampType)
    assert(r.getLong(0) == micros * 1000)
    assert(r.getLong(1) == micros)
  }

  test("withEventTime: TIMESTAMP_NTZ ts → identical canonical surface") {
    // The likelier writer output of a parquet regen (round-7 lesson):
    // a TIMESTAMP_NTZ column reaches withEventTime as TimestampNTZType,
    // a distinct branch from the LTZ case above. Under the UTC session
    // pin the NTZ→LTZ cast is micros-identity.
    val micros = 1704067200123456L
    val df = Tables.withEventTime(
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    val r = df.select(col("ts"), unix_micros(col("ts_us"))).head()
    assert(df.schema("ts").dataType == LongType) // normalized back to nanos
    assert(df.schema("ts_us").dataType == TimestampType)
    assert(r.getLong(0) == micros * 1000)
    assert(r.getLong(1) == micros)
  }

  test("withEventTime: TIMESTAMP_NTZ under a non-UTC session fails loudly") {
    // the NTZ→LTZ cast is wall-clock-preserving, so a non-UTC session
    // would silently shift every epoch-nano; the guard must throw
    // instead of corrupting.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ntz = Seq((1L, 1704067200123456L)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      val ex = intercept[IllegalArgumentException] {
        Tables.withEventTime(ntz)
      }
      assert(ex.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("events loader on the real file matches the canonical surface") {
    val df = Tables.events(spark, TestSpark.SF)
    assert(df.schema("ts").dataType == LongType)
    assert(df.schema("ts_us").dataType == TimestampType)
    val r = df.select(col("ts"), unix_micros(col("ts_us"))).head()
    assert(r.getLong(0) / 1000 == r.getLong(1))
  }
}
