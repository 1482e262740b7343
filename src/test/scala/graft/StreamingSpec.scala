package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** True Structured Streaming execution (SURVEY.md §2.8): the same
  * window expression the batch registry uses, run through readStream →
  * watermark → windowed agg → memory sink, must agree with the batch
  * result. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed tumbling-window counts equal the batch computation") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    // streaming file source needs a directory
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.SF}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val stream = spark.readStream.schema(schema)
      .parquet(dir)
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts_us", "10 minutes")
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("graft_stream_test")
      .select(col("window.start").as("h"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = graft.Tables.events(spark, TestSpark.SF)
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("h"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch && streamed.nonEmpty)
  }
}
