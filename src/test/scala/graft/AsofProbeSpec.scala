package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Analytics, Temporal}

/** As-of dimension probe (q128), path trigrams (q129), expectation
  * suite (q130). The oracle already proves q128's union+LOCF equals
  * the range-join formulation cross-engine; these pin the in-Spark
  * invariants. */
class AsofProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q128 resolves every purchase to the version covering its timestamp") {
    val probes = Temporal.q128DimAsofProbe(spark, TestSpark.SF)
      .selectExpr("event_id", "user_id", "cast(ts_us as long)", "dim_type",
        "version")
      .as[(Long, Long, Long, String, Long)].collect()
    val nPurchases = Tables.events(spark, TestSpark.SF)
      .filter("event_type = 'purchase'").count()
    assert(probes.length == nPurchases && probes.nonEmpty)
    // Every probe must land inside its claimed version's interval.
    val dim = Temporal.q119Scd2Dim(spark, TestSpark.SF)
      .selectExpr("user_id", "version", "event_type",
        "cast(effective_from as long)", "cast(effective_to as long)")
      .as[(Long, Long, String, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    probes.foreach { case (eid, u, tus, tpe, v) =>
      val (dimType, from, to) = dim((u, v))
      assert(dimType == tpe, s"probe $eid type mismatch")
      assert(from <= tus && to.forall(tus < _),
        s"probe $eid at $tus outside version [$from, $to)")
    }
  }

  test("q129 trigram counts conserve the lead-window total") {
    val rows = Analytics.q129PathTrigrams(spark, TestSpark.SF)
      .as[(String, String, String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // Each user contributes max(0, n_events - 2) trigrams; the top-10
    // counts can't exceed the global trigram count.
    val perUser = Tables.events(spark, TestSpark.SF)
      .groupBy("user_id").count().as[(Long, Long)].collect()
    val totalTrigrams = perUser.map { case (_, n) => math.max(0L, n - 2) }.sum
    assert(rows.map(_._4).sum <= totalTrigrams)
    rows.foreach { case (a, b, c, n) =>
      assert(n > 0 && Seq(a, b, c).forall(_.nonEmpty)) }
  }

  test("q130 exercises both report outcomes and conserves check counts") {
    val rows = Analytics.q130Expectations(spark, TestSpark.SF)
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.length == 6)
    rows.foreach { case (_, checked, viol, pass) =>
      assert(viol >= 0 && viol <= checked)
      assert(pass == (viol == 0))
    }
    // The acctbal rule must FAIL (negative balances exist in the data);
    // the FK rule must PASS (the generator is referentially intact).
    val byRule = rows.map(r => r._1 -> r._4).toMap
    assert(!byRule("customer_acctbal_nonneg"))
    assert(byRule("lineitem_orderkey_fk"))
  }
}
