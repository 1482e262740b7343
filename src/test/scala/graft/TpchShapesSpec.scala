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

  test("q197 integer threshold equals the rational 0.2·avg test per line") {
    val Array((nLines, rev)) = ops.TpchShapes
      .q197SmallQtyRevenue(spark, TestSpark.SF)
      .as[(Long, Long)].collect()
    val brandKeys = Tables.part(spark, TestSpark.SF)
      .filter(col("p_brand") === ops.TpchShapes.Q17_BRAND)
      .select("p_partkey").as[Long].collect().toSet
    val lines = Tables.lineitem(spark, TestSpark.SF)
      .select(col("l_partkey"),
        Tables.dec2(col("l_quantity")).cast("long").as("u"))
      .as[(Long, Long)].collect().filter(r => brandKeys(r._1))
    val byPart = lines.groupBy(_._1)
      .map { case (k, g) => k -> (g.map(_._2).sum, g.length) }
    // integer form (5·q·n < Σ) ⟺ rational form (q < Σ/(5n)) — and the
    // query's count matches the naive per-line evaluation
    val expect = lines.count { case (k, u) =>
      val (sq, nq) = byPart(k)
      assert((5 * u * nq < sq) == (BigDecimal(u) < BigDecimal(sq) / (5 * nq)))
      5 * u * nq < sq
    }
    assert(nLines == expect, s"$nLines vs $expect (rev=$rev)")
  }

  test("q198 manual implied-predicate pushdown loses no rows") {
    val Array((n1, r1)) = ops.TpchShapes.q198DisjunctiveJoin(spark, TestSpark.SF)
      .as[(Long, Long)].collect()
    // naive formulation: full join, disjunction evaluated afterwards
    val units = Tables.dec2(col("l_quantity")).cast("long")
    val arm = ops.TpchShapes.Q19_ARMS.map { case (b, sz, lo, hi) =>
      col("p_brand") === b && col("p_size") <= sz &&
        units >= lo && units <= hi
    }.reduce(_ || _)
    val naive = Tables.lineitem(spark, TestSpark.SF)
      .join(Tables.part(spark, TestSpark.SF),
        col("l_partkey") === col("p_partkey"))
      .filter(arm).count()
    assert(n1 == naive, s"pushdown dropped rows: $n1 vs $naive (rev=$r1)")
  }

  test("q199 csv cells are rank-ordered with non-increasing counts") {
    val rows = ops.TpchShapes.q199TopNationsCsv(spark, TestSpark.SF)
      .as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, csv) =>
      val cells = csv.split(",").map(_.split(":"))
      assert(cells.length <= 3 && cells.forall(_.length == 2))
      val cnts = cells.map(_(1).toLong).toSeq
      assert(cnts == cnts.sortBy(-_), s"not rank-ordered: $csv")
    }
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
