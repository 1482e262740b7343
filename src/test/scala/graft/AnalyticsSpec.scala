package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Analytics

/** Retention cohorts (q124), last-touch attribution (q125), χ²
  * contingency (q126), equi-depth histogram (q127). */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q124 cohort triangle conserves users and offsets are sane") {
    val rows = Analytics.q124RetentionCohorts(spark, TestSpark.SF)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n) => assert(off >= 0 && n > 0) }
    // offset-0 row of each cohort counts every user of that cohort, and
    // no later offset exceeds it (retention can't grow past the cohort).
    val users = Tables.events(spark, TestSpark.SF)
      .select(countDistinct(col("user_id"))).as[Long].head()
    val byCohort = rows.groupBy(_._1)
    assert(byCohort.values.map(g => g.find(_._2 == 0L).get._3).sum == users)
    byCohort.foreach { case (_, g) =>
      val base = g.find(_._2 == 0L).get._3
      g.foreach { case (_, _, n) => assert(n <= base) } }
  }

  test("q125 attribution conserves conversions and matches a naive replay") {
    val got = Analytics.q125LastTouch(spark, TestSpark.SF)
      .as[(String, Long)].collect().toMap
    val events = Tables.events(spark, TestSpark.SF)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    assert(got.values.sum == events.count(_._4 == "purchase"))
    // Naive per-user replay of the last-touch rule.
    val naive = events.groupBy(_._1).toSeq.flatMap { case (_, ev) =>
      val sorted = ev.sortBy(e => (e._2, e._3))
      var lastTouch: Option[(Long, String)] = None
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      sorted.foreach { case (_, tus, _, tpe) =>
        if (tpe == "purchase")
          out += lastTouch.collect {
            case (tt, ty) if tt >= tus - Analytics.WEEK_US => ty
          }.getOrElse("none")
        else lastTouch = Some((tus, tpe))
      }
      out
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == naive)
  }

  test("q126 chi-square marginals: expected counts sum to N like observed") {
    val rows = Analytics.q126ChiSquare(spark, TestSpark.SF)
      .as[(String, String, Long, Double, Double)].collect()
    assert(rows.length == 15) // 5 priorities x 3 statuses
    val n = rows.map(_._3).sum
    assert(math.abs(rows.map(_._4).sum - n) < 1e-3)
    rows.foreach { case (_, _, _, exp, contrib) =>
      assert(exp > 0 && contrib >= 0) }
  }

  test("q135 bootstrap CI brackets the point estimate with sane width") {
    val (n, reps, mean, lo, hi) = Analytics.q135BootstrapCi(spark, TestSpark.SF)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(n > 0 && reps == Analytics.BOOT_REPS)
    assert(lo < hi, s"degenerate interval [$lo, $hi]")
    assert(lo <= mean && mean <= hi,
      s"point estimate $mean outside CI [$lo, $hi]")
    // 95% CI of a mean over n iid rows: width should be a few standard
    // errors, not a constant factor of the mean.
    assert((hi - lo) / mean < 0.2, s"CI implausibly wide: [$lo, $hi] vs $mean")
    // Poisson(1) weights: total resample mass within 5% of n per replicate
    // on average (weak-law sanity of the md5 draw).
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, TestSpark.SF)
    val wsum = li.select(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(expr(s"sequence(0, ${Analytics.BOOT_REPS - 1})")).as("b"))
      .withColumn("u", expr(
        "cast(conv(substr(md5(concat(l_orderkey, '-', l_linenumber, '-', b)),1,8),16,10) as bigint) / 4294967296.0"))
      .withColumn("w",
        expr(s"size(filter(array(${Analytics.POISSON_CDF}), c -> c < u))"))
      .agg(sum(col("w"))).as[Long].head()
    val expected = li.count() * Analytics.BOOT_REPS
    assert(math.abs(wsum - expected).toDouble / expected < 0.05,
      s"total Poisson mass $wsum vs $expected")
  }

  test("q137 lag quantiles are ordered and counts conserve the join") {
    val rows = Analytics.q137ShipLag(spark, TestSpark.SF)
      .as[(String, Long, Int, Double, Double, Int)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, n, mn, p50, p95, mx) =>
      assert(n > 0 && mn <= p50 && p50 <= p95 && p95 <= mx) }
    val joined = Tables.lineitem(spark, TestSpark.SF)
      .join(Tables.orders(spark, TestSpark.SF),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey")).count()
    assert(rows.map(_._2).sum == joined)
  }

  test("q127 buckets are equi-depth (within interpolation slack) and ordered") {
    val rows = Analytics.q127EquidepthHist(spark, TestSpark.SF)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 until Analytics.DEPTH_BUCKETS))
    val total = rows.map(_._2).sum
    val target = total.toDouble / Analytics.DEPTH_BUCKETS
    rows.foreach { case (_, n, _, _) =>
      assert(math.abs(n - target) <= target * 0.02 + 2,
        s"bucket depth $n vs target $target") }
    // Value ranges tile in order: max of bucket k <= min of bucket k+1.
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3)
      case _ =>
    }
  }
}
