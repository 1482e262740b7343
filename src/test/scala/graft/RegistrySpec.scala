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

  test("q49 KMV estimate within 4 sigma; HLL tripwire passes in-query") {
    // Running to completion proves the in-query HLL 3·rsd tripwire held;
    // the output estimate is the KMV one (σ≈12.7% at k=64; fence 4σ).
    val rows = ops.Relational.q49ApproxDistinct(spark, TestSpark.SF)
      .select("exact_users", "approx_users", "err_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (exact, approx, errPpm) =>
      assert(errPpm <= 508000, s"approx $approx vs exact $exact ($errPpm ppm)")
      assert(errPpm == math.abs(approx - exact) * 1000000L / exact)
    }
  }

  test("q75 sample quantile degenerates to exact when n < K; tripwires hold") {
    // sf0.001 groups have ~2k rows < K=4096, so the bottom-K sample IS
    // the full group: sample centi must equal exact centi bit-for-bit
    // (err 0) and sample_n == n. Completion also proves the in-query
    // tripwires: Spark percentile == centi leg to 1e-9 and
    // percentile_approx within 1.0 of exact.
    val rows = ops.Relational.q75ApproxQuantiles(spark, TestSpark.SF)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Long]("sample_n"))
      assert(r.getAs[Long]("p50_err_centi") == 0L)
      assert(r.getAs[Long]("p99_err_centi") == 0L)
      assert(r.getAs[Long]("p50_samp_centi") == r.getAs[Long]("p50_centi"))
      assert(r.getAs[Long]("p99_samp_centi") == r.getAs[Long]("p99_centi"))
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
