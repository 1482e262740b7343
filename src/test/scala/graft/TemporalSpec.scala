package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Cleaning, Relational, Temporal}

/** Gaps-and-islands (q118), SCD Type-2 (q119), MAD outliers (q121),
  * share-of-total (q122). The cross-engine values are proven by the
  * DuckDB oracle; these specs pin the structural invariants a hash
  * can't articulate. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q118 islands == naive interval-union per user") {
    val got = Temporal.q118IntervalMerge(spark, TestSpark.SF)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // Naive union of [t, t+L) per user, computed imperatively.
    val raw = Tables.events(spark, TestSpark.SF)
      .selectExpr("user_id", "ts div 1000 as tus").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (u, rows) =>
        val ts = rows.map(_._2).sorted
        val L = Temporal.COVER_US
        var islands = List.empty[(Long, Long)] // (start, end) reversed
        ts.foreach { t =>
          islands match {
            case (s0, e0) :: rest if t <= e0 =>
              islands = (s0, math.max(e0, t + L)) :: rest
            case _ => islands = (t, t + L) :: islands
          }
        }
        val lens = islands.map { case (s0, e0) => e0 - s0 }
        u -> (islands.size.toLong, lens.sum, lens.max)
      }
    assert(got == raw && got.nonEmpty)
    // The 12h cover must exercise BOTH behaviors: some user merges
    // events into one island, some user splits into several.
    assert(got.values.exists(_._1 > 1))
    val nEvents = Tables.events(spark, TestSpark.SF).count()
    assert(got.values.map(_._1).sum < nEvents)
  }

  test("q118 plans a single exchange (windows + aggs share user_id partitioning)") {
    val plan = Temporal.q118IntervalMerge(spark, TestSpark.SF)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("q118 gaps-and-islands == Spark's native session_window semantics") {
    // Two independent formulations of the same operator: an island with
    // 12h coverage is exactly a session with 12h gap — session end =
    // last event + gap = q118's end_us, session start = first event.
    // Cross-validating against the engine-native operator pins the
    // cumulative-max window trick to Spark's own session semantics.
    import org.apache.spark.sql.functions._
    val sessions = Tables.events(spark, TestSpark.SF)
      .groupBy(col("user_id"),
        session_window(col("ts_us"), "12 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        (unix_micros(col("w.end")) - unix_micros(col("w.start"))).as("len_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), sum(col("len_us")).as("covered_us"),
           max(col("len_us")).as("longest_us"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val islands = graft.ops.Temporal.q118IntervalMerge(spark, TestSpark.SF)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(sessions == islands && islands.nonEmpty)
  }

  test("q119 versions are dense, ranges chain, exactly one current row per user") {
    val rows = Temporal.q119Scd2Dim(spark, TestSpark.SF)
      .selectExpr("user_id", "version", "event_type",
        "cast(effective_from as long)", "cast(effective_to as long)",
        "is_current")
      .as[(Long, Long, String, Long, Option[Long], Boolean)].collect()
    rows.groupBy(_._1).foreach { case (u, h) =>
      val byV = h.sortBy(_._2)
      assert(byV.map(_._2).toSeq == (1L to h.length).toSeq, s"user $u versions")
      // effective_to of version k == effective_from of version k+1
      byV.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u chain break at v${a._2}")
          assert(a._3 != b._3, s"user $u uncompacted duplicate at v${a._2}")
        case _ =>
      }
      assert(byV.count(_._6) == 1 && byV.last._6, s"user $u current flag")
      assert(byV.last._5.isEmpty)
    }
    assert(rows.nonEmpty)
  }

  test("q121 MAD fences are robust where z/IQR fences are not (structure)") {
    val mad = Cleaning.q121MadOutliers(spark, TestSpark.SF)
      .selectExpr("event_id", "event_type", "value", "lo", "hi")
      .as[(Long, String, Double, Double, Double)].collect()
    assert(mad.nonEmpty)
    // Every flagged row is genuinely outside its own fence, and fences
    // are per-type constants (one (lo,hi) pair per type).
    mad.foreach { case (_, _, v, lo, hi) => assert(v < lo || v > hi) }
    assert(mad.groupBy(_._2).forall { case (_, g) =>
      g.map(r => (r._4, r._5)).distinct.size == 1 })
  }

  test("q122 shares sum to 1 within each region and globally") {
    val rows = Relational.q122ShareOfTotal(spark, TestSpark.SF)
      .as[(String, String, Double, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (r, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-9, s"region $r") }
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9)
    // share_global <= share_region (region total <= global total).
    rows.foreach(r => assert(r._5 <= r._4 + 1e-12))
  }

  test("q147 TWA == naive per-user replay; diverges from plain AVG on irregular gaps") {
    import org.apache.spark.sql.functions._
    val got = Temporal.q147TimeWeightedAvg(spark, TestSpark.SF)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (u, span, n, twa) => u -> ((span, n, twa)) }.toMap
    // naive replay: sort each user's events, integrate the step function
    val ev = graft.Tables.events(spark, TestSpark.SF)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("tus"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val segs = sorted.zip(sorted.tail)
      if (segs.isEmpty) None
      else {
        val span = sorted.last._3 - sorted.head._3
        if (span <= 0) None
        else {
          val wsum = segs.map { case (a, b) =>
            BigDecimal(a._4).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
              BigDecimal(b._3 - a._3)
          }.sum
          Some(u -> ((span, segs.length.toLong,
            math.rint((wsum / BigDecimal(span)).toDouble * 1e6) / 1e6)))
        }
      }
    }.toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    got.foreach { case (u, (span, n, twa)) =>
      val (espan, en, etwa) = expected(u)
      assert(span == espan && n == en, s"user $u structure mismatch")
      assert(math.abs(twa - etwa) <= 1e-6, s"user $u twa $twa != $etwa")
    }
    // the operator exists because AVG gets irregular sampling wrong:
    // some user must show a material TWA-vs-AVG gap
    val avg = ev.groupBy(_._1).map { case (u, r) =>
      u -> r.map(_._4).sum / r.size }
    assert(got.exists { case (u, (_, _, twa)) =>
      avg.get(u).exists(a => math.abs(a - twa) > 0.1) })
  }
}
