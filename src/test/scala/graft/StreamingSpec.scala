package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** True Structured Streaming execution (SURVEY.md §2.8): the same
  * window expression the batch registry uses, run through readStream →
  * watermark → windowed agg → memory sink, must agree with the batch
  * result. */
case class Ev(user: Long, n: Long)
case class RunningCount(user: Long, total: Long)
case class AEv(user: Long, tus: Long, eid: Long, tpe: String)

/** transformWithState processor: running per-user total in ValueState
  * (Spark 4's arbitrary-state API — the successor to
  * (flat)MapGroupsWithState; requires the RocksDB state store). */
class RunningTotalProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, RunningCount] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var total: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timerValues: TimerValues): Iterator[RunningCount] = {
    val t = (if (total.exists()) total.get() else 0L) + rows.map(_.n).sum
    total.update(t)
    Iterator(RunningCount(key, t))
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ST1 from storage: file-source stream (parquet dir) equals batch agg") {
    // The MemoryStream specs prove semantics; this proves the STORAGE
    // path — readStream over a directory of parquet files (the shape a
    // 100 TB ingest actually has: files landing in object storage),
    // with schema declared up front, checkpointed, drained with
    // Trigger.AvailableNow.
    import org.apache.spark.sql.streaming.Trigger
    val dir = graft.sources.TmpWorkspace.fresh("stream_src")
    val ckpt = graft.sources.TmpWorkspace.fresh("stream_ck")
    val events = graft.Tables.events(spark, TestSpark.SF)
      .select("event_id", "event_type", "ts_us")
    // two separate files, as if two ingest batches landed
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.toString)
    val sdf = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(dir.toString)
      .groupBy(col("event_type"), window(col("ts_us"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = sdf.writeStream
      .format("memory").queryName("file_src_agg")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "file-source stream did not drain in time")
    val streamed = spark.table("file_src_agg")
      .select(col("event_type"), col("window.start").as("ws"), col("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = events
      .groupBy(col("event_type"), window(col("ts_us"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("window.start").as("ws"), col("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("ST5: flatMapGroupsWithState carries state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val counts = input.toDS()
      .groupByKey(_.user)
      .flatMapGroupsWithState[Long, RunningCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + evs.map(_.n).sum
          state.update(total)
          Iterator(RunningCount(user, total))
      }
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("graft_state_test").start()
    try {
      input.addData(Ev(1, 2), Ev(1, 3), Ev(2, 10))
      q.processAllAvailable()
      input.addData(Ev(1, 5), Ev(2, 1)) // second batch: state must persist
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("graft_state_test")
      .as[RunningCount].collect().groupBy(_.user)
      .map { case (u, rs) => u -> rs.map(_.total).toSet }
    assert(rows(1L) == Set(5L, 10L)) // 2+3 then +5
    assert(rows(2L) == Set(10L, 11L))
  }

  test("ST5 (transformWithState): ValueState persists across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val counts = input.toDS().groupByKey(_.user)
        .transformWithState(new RunningTotalProcessor,
          TimeMode.None(), OutputMode.Append())
      val q = counts.writeStream.outputMode("append")
        .format("memory").queryName("graft_tws_test").start()
      try {
        input.addData(Ev(1, 2), Ev(1, 3), Ev(2, 10))
        q.processAllAvailable()
        input.addData(Ev(1, 5), Ev(2, 1))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("graft_tws_test")
        .as[RunningCount].collect().groupBy(_.user)
        .map { case (u, rs) => u -> rs.map(_.total).toSet }
      assert(rows(1L) == Set(5L, 10L))
      assert(rows(2L) == Set(10L, 11L))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("ST4: dropDuplicatesWithinWatermark dedups copies arriving across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = input.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_stream").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 10:$m%02d:00")
    try {
      input.addData((1L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      // duplicate of id=1 in a later batch, within the watermark window
      input.addData((1L, ts(2)), (3L, ts(3)))
      q.processAllAvailable()
      // advance event time far enough to emit everything
      input.addData((99L, ts(59)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("graft_dedup_stream")
      .select("id").as[Long].collect().toSeq
    assert(ids.count(_ == 1L) == 1, s"id=1 must appear once, got $ids")
    assert(ids.toSet == Set(1L, 2L, 3L, 99L))
  }

  test("ST2: streamed session_window agg equals the batch computation") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int, s: Int = 0) =
      java.sql.Timestamp.valueOf(f"2020-01-01 10:$m%02d:$s%02d")
    // user 1: two sessions (gap > 5 min); user 2: one session
    val rows = Seq((1L, ts(0)), (1L, ts(2)), (1L, ts(20)),
                   (2L, ts(1)), (2L, ts(4)))

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessed = input.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n"))
    val q = sessed.writeStream.outputMode("append")
      .format("memory").queryName("graft_session_stream").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((99L, ts(59))) // advance watermark to close sessions
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("graft_session_stream")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val batch = rows.toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(batch.subsetOf(streamed), s"batch=$batch streamed=$streamed")
    assert(streamed.count(_._1 == 1L) == 2) // two closed sessions for user 1
  }

  test("stream-stream interval join: purchases match clicks within 10 minutes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 10:$m%02d:00")

    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val c = clicks.toDS().toDF("c_user", "click_id", "c_ts")
      .withWatermark("c_ts", "30 minutes")
    val b = buys.toDS().toDF("b_user", "buy_id", "b_ts")
      .withWatermark("b_ts", "30 minutes")
    val joined = c.join(b,
      expr("""c_user = b_user AND
              b_ts >= c_ts AND b_ts <= c_ts + interval 10 minutes"""))
      .select(col("click_id"), col("buy_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_ss_join").start()
    try {
      clicks.addData((1L, 100L, ts(0)), (2L, 200L, ts(1)))
      buys.addData((1L, 900L, ts(5))) // within 10m of click 100
      q.processAllAvailable()
      // later batch: a buy matching an EARLIER batch's click (state join),
      // and one outside the interval
      buys.addData((2L, 901L, ts(8)), (1L, 902L, ts(30)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("graft_ss_join")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 900L), (200L, 901L)), s"got $got")
  }

  test("file sink + checkpoint: streamed agg lands in parquet, checkpoint persists") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = graft.sources.TmpWorkspace.fresh("sink_stream").toString

    val input = MemoryStream[Ev]
    val q = input.toDS()
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    try {
      input.addData(Ev(1, 2), Ev(2, 3))
      q.processAllAvailable()
      input.addData(Ev(3, 4))
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(s"$tmp/out").as[Ev].collect().sortBy(_.user)
    assert(back.toSeq == Seq(Ev(1, 2), Ev(2, 3), Ev(3, 4)))
    assert(new java.io.File(s"$tmp/ckpt/offsets").list().nonEmpty) // checkpoint state
  }

  test("streaming corpus curation: quality + lang filters and fingerprint dedup in one stream") {
    // The LLM-pipeline row-local operators (quality score, language-ID,
    // md5 fingerprint) are plain Column expressions, so they lift into
    // Structured Streaming unchanged; exact dedup becomes
    // dropDuplicates on the fingerprint — the streaming form of q39's
    // hash-groupBy. Result must equal the batch curation of the same
    // files.
    import graft.text.TextOps
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = graft.sources.TmpWorkspace.fresh("stream_docs").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.SF}/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))

    // the library transform (stream/StreamingCuration) — same Columns
    // batch or stream; this spec drives it in both modes and compares
    def curate(df: org.apache.spark.sql.DataFrame) =
      graft.stream.StreamingCuration.curate(df)

    val q = curate(spark.readStream.schema(schema).parquet(dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_curate").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("graft_stream_curate")
      .as[(Long, String)].collect()
    val batch = curate(spark.read.schema(schema).parquet(dir))
      .as[(Long, String)].collect()
    // dropDuplicates keeps an arbitrary representative per fingerprint:
    // compare the deduped fingerprint SETS and survivor counts
    assert(streamed.map(_._2).toSet == batch.map(_._2).toSet)
    assert(streamed.length == batch.length && streamed.nonEmpty)
  }

  test("streaming LSH near-dup dedup: stateful band buckets reproduce batch q41") {
    // The scale-path dedup modality, lifted into Structured Streaming:
    // shingle → minhash signature → band keys are row-local codegen
    // expressions (identical Columns to batch q41), and the LSH bucket
    // index becomes streaming STATE — flatMapGroupsWithState keyed by
    // band bucket holds the doc ids seen in that bucket so far and
    // emits candidate pairs (new × seen) as documents arrive. After
    // exact Jaccard verification, the pair set must equal batch q41's
    // over the same corpus. The corpus is split into two files with
    // maxFilesPerTrigger=1, so near-dup pairs spanning the halves are
    // only found if bucket state survives across micro-batches.
    import graft.text.Dedup
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val work = graft.sources.TmpWorkspace.fresh("stream_lsh")
    val dir = s"$work/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val docs = spark.read.schema(schema)
      .parquet(s"${TestSpark.SF}/documents.parquet")
    Seq(0, 1).foreach { half =>
      val tmp = s"$work/half$half"
      docs.filter(col("doc_id") % 2 === half).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$dir/half$half.parquet"))
    }

    // the library's stateful LSH candidate stream (bucket construction
    // identical to batch q41's band keys; per-bucket doc-id state
    // carried across micro-batches) — stream/StreamingCuration
    val cand = graft.stream.StreamingCuration.lshCandidatePairs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))

    val q = cand.writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_lsh").start()
    try q.processAllAvailable() finally q.stop()

    // exact verify of the streamed candidates (same join as batch)
    val arr = Dedup.shingleArrays(spark, TestSpark.SF)
    val streamedPairs = spark.table("graft_stream_lsh").distinct()
      .join(arr.select(col("doc_id").as("i"), col("sgs").as("si")), Seq("i"))
      .join(arr.select(col("doc_id").as("j"), col("sgs").as("sj")), Seq("j"))
      .withColumn("common", size(array_intersect(col("si"), col("sj"))))
      .withColumn("jac", col("common").cast("double")
        / (size(col("si")) + size(col("sj")) - col("common")))
      .filter(col("jac") >= Dedup.JACCARD_THRESHOLD)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet

    val batchPairs = Dedup.q41MinhashLsh(spark, TestSpark.SF)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    assert(streamedPairs == batchPairs && batchPairs.nonEmpty)
    // the halves split even/odd doc ids: a mixed-parity pair can only
    // be found through bucket state carried across micro-batches
    if (batchPairs.exists(p => p._1 % 2 != p._2 % 2))
      assert(streamedPairs.exists(p => p._1 % 2 != p._2 % 2))
  }

  test("streamed tumbling-window counts equal the batch computation") {
    // Schema comes from the file itself (NOT hard-coded): events.ts has
    // been both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across testdata
    // generations; Tables.withEventTime normalizes either encoding.
    val schema = spark.read.parquet(s"${TestSpark.SF}/events.parquet").schema

    // streaming file source needs a directory
    val dir = graft.sources.TmpWorkspace.fresh("stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.SF}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val stream = graft.Tables.withEventTime(
        spark.readStream.schema(schema).parquet(dir))
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

  test("streamed CDC compaction: latest-per-key state survives micro-batches, equals batch q101") {
    // q101's steady-state form: the change log arrives as a stream and
    // the compacted latest-state table is a continuously-updated
    // streaming aggregate — same max_by column over the same (µs,
    // event_id) total order, with the per-key candidate row as
    // operator state. The log is split into two files by event_id
    // parity (versions of one key interleave across the halves) and
    // maxFilesPerTrigger=1, so the streamed result only matches batch
    // q101 if the per-key max state carries across micro-batches.
    import spark.implicits._
    val work = graft.sources.TmpWorkspace.fresh("stream_cdc")
    val dir = s"$work/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // file's own schema; withEventTime below normalizes NANOS vs MICROS
    val ev = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
    Seq(0, 1).foreach { half =>
      val tmp = s"$work/half$half"
      ev.filter(col("event_id") % 2 === half).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$dir/half$half.parquet"))
    }
    val q = graft.Tables.withEventTime(spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
      .withColumn("ts_us", expr("ts div 1000"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        max_by(struct(col("event_id"), col("value"), col("props")),
               struct(col("ts_us"), col("event_id"))).as("last"),
        max(col("ts_us")).as("last_ts_us"),
        count(lit(1)).as("n_versions"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_cdc_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("graft_cdc_stream")
      .select(col("user_id"), col("event_type"),
        col("last.event_id"), col("last.value"), col("last.props"),
        col("last_ts_us"), col("n_versions"))
      .as[(Long, String, Long, Double, String, Long, Long)].collect().toSet
    val batch = graft.stream.EventWindows.q101CdcCompact(spark, TestSpark.SF)
      .as[(Long, String, Long, Double, String, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("q101 max_by compaction equals the window formulation; ties break by event_id") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val agg = graft.stream.EventWindows.q101CdcCompact(spark, TestSpark.SF)
      .as[(Long, String, Long, Double, String, Long, Long)].collect().toSet
    val win = graft.Tables.events(spark, TestSpark.SF)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts_us").desc, col("event_id").desc)))
      .withColumn("n_versions", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("event_type"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), col("props"), col("ts_us"), col("n_versions"))
      .as[(Long, String, Long, Double, String, Long, Long)].collect().toSet
    assert(agg == win && agg.nonEmpty)
    // equal-timestamp fixture: the larger event_id must win
    val tied = Seq((1L, 100L, 7L, "a", 1.0, "{}"), (2L, 100L, 7L, "a", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .groupBy(col("user_id"), col("event_type"))
      .agg(max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("id"))
      .as[(Long, String, Long)].collect()
    assert(tied.toSeq == Seq((7L, "a", 2L)))
  }

  test("streaming last-touch attribution: per-user touch state carries across micro-batches, equals batch q125") {
    // q125's steady-state form: events arrive as a stream in event-time
    // order and each purchase is attributed on arrival from per-user
    // ValueState-like touch state (flatMapGroupsWithState). The stream
    // is split at the median timestamp — a user's touch and its
    // attributed purchase frequently land in DIFFERENT micro-batches,
    // so the streamed counts only match batch q125 if state persists.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext

    val all = Tables.events(spark, TestSpark.SF)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
      .map(r => AEv(r._1, r._2, r._3, r._4))
    val cut = all.map(_.tus).sorted.apply(all.length / 2)

    val input = MemoryStream[(Long, Long, Long, String)]
    val attributions = input.toDS()
      .map(r => AEv(r._1, r._2, r._3, r._4))
      .groupByKey(_.user)
      .flatMapGroupsWithState[(Long, String), (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[AEv], state: GroupState[(Long, String)]) =>
          var touch = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
          evs.toSeq.sortBy(e => (e.tus, e.eid)).foreach { e =>
            if (e.tpe == "purchase")
              out += user -> touch.collect {
                case (tt, ty) if tt >= e.tus - graft.ops.Analytics.WEEK_US => ty
              }.getOrElse("none")
            else touch = Some((e.tus, e.tpe))
          }
          touch.foreach(state.update)
          out.iterator
      }
    val q = attributions.writeStream.outputMode("append")
      .format("memory").queryName("graft_attr_stream").start()
    try {
      input.addData(all.filter(_.tus < cut).map(e => (e.user, e.tus, e.eid, e.tpe)).toSeq: _*)
      q.processAllAvailable()
      input.addData(all.filter(_.tus >= cut).map(e => (e.user, e.tus, e.eid, e.tpe)).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("graft_attr_stream")
      .groupBy(col("_2").as("touch")).agg(count(lit(1)).as("n_conversions"))
      .as[(String, Long)].collect().toMap
    val batch = graft.ops.Analytics.q125LastTouch(spark, TestSpark.SF)
      .as[(String, Long)].collect().toMap
    assert(streamed == batch && streamed.values.sum > 0)
    // State must actually have been exercised across the split.
    val crossBatch = all.filter(e => e.tpe == "purchase" && e.tus >= cut)
    assert(crossBatch.nonEmpty)
  }

  test("stream-stream interval join equals the batch range join") {
    // The last ST surface: two UNBOUNDED streams joined on key +
    // time-interval condition. Views join to the same user's purchases
    // that occur within [view, view + 1h] — each side carries a
    // watermark so the join state is bounded (Spark requires it for
    // correctness AND for state eviction; at 100 TB the watermark IS
    // what keeps stream-stream join state finite). Both sides split
    // into two files by event parity with maxFilesPerTrigger=1, so
    // cross-micro-batch matches exist only if the buffered side's
    // state survives the boundary. The batch oracle is the plain
    // range join over the same parquet.
    import spark.implicits._
    val work = graft.sources.TmpWorkspace.fresh("stream_ssj")
    val dir = s"$work/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // file's own schema; withEventTime below normalizes NANOS vs MICROS
    val ev = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
    Seq(0, 1).foreach { half =>
      val tmp = s"$work/half$half"
      ev.filter(col("event_id") % 2 === half).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$dir/half$half.parquet"))
    }
    def side(tpe: String, idCol: String, tsCol: String) =
      graft.Tables.withEventTime(spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(dir))
        .filter(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idCol),
          col("ts_us").as(tsCol))
        .withWatermark(tsCol, "2 hours")
    val v = side("view", "view_id", "view_ts").alias("v")
    val p = side("purchase", "buy_id", "buy_ts").alias("p")
    val ssj = v.join(p,
      expr("""v.user_id = p.user_id AND
              p.buy_ts >= v.view_ts AND
              p.buy_ts <= v.view_ts + INTERVAL 1 HOUR"""))
      .select(col("v.user_id").as("user_id"), col("v.view_id"),
        col("p.buy_id"))
    val q = ssj.writeStream.outputMode("append")
      .format("memory").queryName("graft_ssj").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("graft_ssj")
      .as[(Long, Long, Long)].collect().toSet
    val evN = graft.Tables.withEventTime(ev)
    val bv = evN.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        expr("ts div 1000").as("vt"))
    val bp = evN.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("buy_id"),
        expr("ts div 1000").as("pt"))
    val batch = bv.join(bp, col("user_id") === col("pu")
        && col("pt") >= col("vt")
        && col("pt") <= col("vt") + expr("3600000000"))
      .select(col("user_id"), col("view_id"), col("buy_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"stream-stream join diverged: ${streamed.size} vs ${batch.size}")
    // cross-parity pairs prove buffered state crossed the micro-batch
    // boundary (views and purchases of one pair landed in different files)
    assert(streamed.exists { case (_, vId, bId) => vId % 2 != bId % 2 })
  }
}
