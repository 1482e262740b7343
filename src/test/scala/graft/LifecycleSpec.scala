package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property checks for the lifecycle batch (q200–q202): adoption-curve
  * conservation and monotonicity, gap-fill grid completeness, and RFM
  * partition totality. */
class LifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q200 curve is monotone and conserves the distinct-customer total") {
    val rows = ops.Lifecycle.q200CumulativeUsers(spark, TestSpark.SF)
      .select("n_new", "cum_customers").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val nCust = Tables.orders(spark, TestSpark.SF)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._1).sum == nCust && rows.last._2 == nCust)
    rows.foldLeft(0L) { case (prev, (nNew, cum)) =>
      assert(cum == prev + nNew); cum
    }
  }

  test("q201 grid is exactly |nations| x |span days|; gaps are zero") {
    val df = ops.Lifecycle.q201CalendarFill(spark, TestSpark.SF)
    val rows = df.select(col("n_name"), col("rev_cents"), col("is_gap"))
      .as[(String, Long, Boolean)].collect()
    val nNations = Tables.nation(spark, TestSpark.SF).count()
    val Array((d0, d1)) = Tables.orders(spark, TestSpark.SF)
      .agg(to_date(min(col("o_orderdate"))), to_date(max(col("o_orderdate"))))
      .as[(java.sql.Date, java.sql.Date)].collect()
    val spanDays = (d1.toLocalDate.toEpochDay - d0.toLocalDate.toEpochDay) + 1
    assert(rows.length == nNations * spanDays)
    rows.foreach { case (n, rev, gap) =>
      if (gap) assert(rev == 0L, s"$n gap day with revenue $rev")
      else assert(rev > 0L)
    }
    // conservation: filled grid total == direct fact total
    val gridTotal = rows.map(_._2).sum
    val factTotal = Tables.orders(spark, TestSpark.SF)
      .agg(sum((Tables.dec2(col("o_totalprice")) * 100).cast("long")))
      .as[Long].collect().head
    assert(gridTotal == factTotal)
  }

  test("q202 segments partition all ordering customers; scores in 1..4") {
    val rows = ops.Lifecycle.q202RfmSegments(spark, TestSpark.SF)
      .select("r_score", "f_score", "m_score", "n_customers")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nCust = Tables.orders(spark, TestSpark.SF)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCust)
    rows.foreach { case (r, f, m, _) =>
      assert(Seq(r, f, m).forall(x => x >= 1 && x <= 4))
    }
    // quartile fences must split reasonably: no single cell hogs > 60%
    assert(rows.map(_._4).max <= (nCust * 6) / 10)
  }
}
