package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide smoke: every declared query runs at sf0.001 and every
  * oracle key refers to a declared query. */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("oracleSql keys ⊆ queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q49 HLL sketch stays within 5% of the exact distinct count") {
    val rows = ops.Relational.q49ApproxDistinct(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.SF)
      assert(df.columns.nonEmpty)
      df.count() // materialize; must not throw
    }
  }
}
