package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property checks for the TPC-H-shape batch (q182–q188) beyond registry
  * smoke: per-group minimality (Q2), direction symmetry (Q7), share
  * algebra (Q8), argmax set semantics (Q15), and the decorrelated
  * threshold's agreement with a naive recomputation (Q22). */
class TpchShapesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q182 every surviving offer IS its part's minimum") {
    val rows = ops.TpchShapes.q182MinCostSupplier(spark, TestSpark.SF)
      .select("p_partkey", "offer_cents").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // recompute the per-part min independently from raw lineitem
    val mins = Tables.lineitem(spark, TestSpark.SF)
      .groupBy(col("l_partkey"))
      .agg(min((Tables.dec2(col("l_extendedprice")) * 100).cast("long"))
        .as("m"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (pk, offer) =>
      assert(offer == mins(pk), s"part $pk: $offer != ${mins(pk)}")
    }
  }

  test("q183 both trade directions appear and never a self-pair") {
    val rows = ops.TpchShapes.q183TradeVolume(spark, TestSpark.SF)
      .select("supp_nation", "cust_nation").as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b) => assert(a != b) }
    val dirs = rows.toSet
    assert(dirs.exists(_._1 == ops.TpchShapes.Q7_NATION_A) &&
      dirs.exists(_._1 == ops.TpchShapes.Q7_NATION_B),
      s"expected both directions, got $dirs")
  }

  test("q184 share_micro is exactly target*1e6 div total and ≤ 1e6") {
    val rows = ops.TpchShapes.q184MarketShare(spark, TestSpark.SF)
      .select("target_c4", "total_c4", "share_micro")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, tot, sh) =>
      assert(sh == (BigInt(t) * 1000000 / tot).toLong && sh <= 1000000L,
        s"$t/$tot -> $sh")
    }
  }

  test("q186 result is the FULL argmax set (every max-revenue supplier)") {
    val winners = ops.TpchShapes.q186TopSupplier(spark, TestSpark.SF)
      .select("s_suppkey", "total_rev_c4").as[(Long, Long)].collect()
    assert(winners.nonEmpty)
    val revs = Tables.lineitem(spark, TestSpark.SF)
      .filter(col("l_shipdate") >= ops.TpchShapes.Q15_FROM &&
        col("l_shipdate") < ops.TpchShapes.Q15_TO)
      .groupBy(col("l_suppkey"))
      .agg(sum((Tables.dec2(col("l_extendedprice")) *
        (lit(1) - Tables.dec2(col("l_discount"))) * 10000)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("long")
        .as("r"))
      .as[(Long, Long)].collect()
    val mx = revs.map(_._2).max
    assert(winners.map(_._2).toSet == Set(mx))
    assert(winners.map(_._1).toSet == revs.filter(_._2 == mx).map(_._1).toSet)
  }

  test("q188 integer threshold matches the exact rational mean test") {
    val custs = Tables.customer(spark, TestSpark.SF)
      .select(col("c_custkey"),
        (Tables.dec2(col("c_acctbal")) * 100).cast("long").as("cents"))
      .as[(Long, Long)].collect()
    val pos = custs.map(_._2).filter(_ > 0)
    val (sum0, n0) = (pos.map(BigInt(_)).sum, pos.length)
    // decorrelated test (cents·n > Σ) == exact rational (cents > Σ/n)
    custs.foreach { case (_, c) =>
      assert((BigInt(c) * n0 > sum0) ==
        (BigDecimal(c) > BigDecimal(sum0) / n0))
    }
  }
}
