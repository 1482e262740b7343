package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Pca

/** q217 fixed-point PCA power iteration. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q217 matches a driver-side BigInt re-derivation from raw floats") {
    val vecs = Tables.embeddings(spark, TestSpark.SF)
      .select(col("embedding")).as[Array[Float]].collect()
    val n = vecs.length
    val dim = Pca.PCA_DIM
    // quantize + mean + covariance, re-derived independently
    val e6 = vecs.map(_.map(x =>
      BigDecimal(x.toDouble * Pca.PCA_SCALE)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val mean = Array.tabulate(dim)(i => e6.map(_(i)).sum / n) // Long / truncates
    val cov = Array.tabulate(dim, dim)((i, j) =>
      e6.map(r => BigInt(r(i) - mean(i)) * BigInt(r(j) - mean(j))).sum)
    var v = Array.tabulate(dim)(i => if (i == 0) BigInt(Pca.PCA_SCALE) else BigInt(0))
    def matvec(x: Array[BigInt]) =
      Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * x(j)).sum)
    for (_ <- 1 to Pca.PCA_ITERS) {
      val u = matvec(v)
      val m = u.map(_.abs).max
      v = u.map(_ * Pca.PCA_SCALE / m)
    }
    val u = matvec(v)
    val lambda = ((0 until dim).map(i => v(i) * u(i)).sum /
                  (0 until dim).map(i => v(i) * v(i)).sum).toLong
    val expect = (0 until dim).map(i => (i.toLong, v(i).toLong, lambda))
    val got = Pca.q217PcaPower(spark, TestSpark.SF)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect)
    // max-norm scaling: some coordinate is exactly ±1e6, none exceeds it
    assert(got.map(_._2.abs).max == Pca.PCA_SCALE)
    // the top eigenvalue of a non-degenerate covariance is positive
    assert(got.head._3 > 0)
  }

  test("q217 direction is a genuine fixed point (Cv ∥ v within quantization)") {
    val rows = Pca.q217PcaPower(spark, TestSpark.SF)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val v = rows.map(_._2.toDouble)
    // one more exact power step in floating point: u = C·v computed from
    // the same corpus via Spark, then compare directions
    val vecs = Tables.embeddings(spark, TestSpark.SF)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val n = vecs.length
    val dim = Pca.PCA_DIM
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      vecs.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum)
    val u = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * v(j)).sum)
    def norm(x: Array[Double]) = math.sqrt(x.map(a => a * a).sum)
    val cos = (0 until dim).map(i => u(i) * v(i)).sum / (norm(u) * norm(v))
    assert(cos > 0.99, s"power-iteration output drifted off the fixed point: cos=$cos")
  }

  test("q218 whitening ledger matches a BigInt mirror of the projection") {
    val fit = Pca.fitPca(spark, TestSpark.SF)
    val den = fit.v.map(x => BigInt(x) * BigInt(x)).sum
    val vecs = Tables.embeddings(spark, TestSpark.SF)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val expect = vecs.map { case (id, xs) =>
      val c = xs.zipWithIndex.map { case (x, i) =>
        BigDecimal(x.toDouble * Pca.PCA_SCALE)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong - fit.mean(i) }
      val p = c.zip(fit.v).map { case (ci, vi) => BigInt(ci) * vi }.sum
      val c2 = c.zip(fit.v).map { case (ci, vi) =>
        ((BigInt(ci) * den - p * vi) / den).toLong }
      val nb = c.map(ci => ci * ci).sum
      val na = c2.map(ci => ci * ci).sum
      val ppm = if (nb == 0) 0L else ((BigInt(nb - na) * 1000000) / nb).toLong
      (id, nb, na, ppm)
    }.sortBy(_._1).toSeq
    val got = Pca.q218PcaWhiten(spark, TestSpark.SF)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
    // removing a direction never increases variance beyond quantization
    // noise, and the top component must carry REAL mass somewhere
    assert(got.forall { case (_, nb, na, _) => na <= nb + 64 })
    assert(got.exists(_._4 > 10000), "top component removed <1% everywhere")
  }

  test("q232 JL audit: sign matrix mirrored, distortion centered at 1") {
    // the JVM sign derivation must equal the SQL form it documents
    val sqlSigns = spark.sql(
      s"""SELECT i, j, CASE WHEN conv(substr(md5(concat(i, ':', j)), 1, 1),
            16, 10) % 2 = 0 THEN 1L ELSE -1L END
          FROM (SELECT explode(sequence(0, ${Pca.PCA_DIM - 1})) AS i)
          LATERAL VIEW explode(sequence(0, ${Pca.JL_K - 1})) t AS j""")
      .as[(Int, Int, Long)].collect()
    sqlSigns.foreach { case (i, j, sgn) =>
      assert(Pca.jlSign(i, j) == sgn, s"sign mismatch at ($i,$j)") }
    val rows = Pca.q232JlAudit(spark, TestSpark.SF)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    // E[ratio] = 1 for a ±1 sign projection: the pair-weighted mean of
    // bucket means must sit near 1e6 (k=16 gives ~±25% sampling noise
    // on this pair count)
    val mean = rows.map(r => r._2 * r._3).sum / n
    assert(mean > 750000L && mean < 1300000L, s"distortion mean off: $mean")
    // concentration: most pairs within ratio [0.5, 1.5]
    val mid = rows.filter(r => r._1 >= 5 && r._1 <= 14).map(_._2).sum
    assert(mid * 2 > n, s"distortion not concentrated: $mid of $n")
  }

  test("q249 isotropy audit: pair math sane, whitening removes norm mass") {
    val rows = Pca.q249IsotropyAudit(spark, TestSpark.SF)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val c = rows("centered"); val w = rows("whitened")
    val nVecs = Tables.embeddings(spark, TestSpark.SF).count()
    assert(c._2 == nVecs && w._2 == nVecs)
    assert(c._3 == nVecs / 2 && w._3 == nVecs / 2)
    // removing a component can only shed norm mass (up to div slack)
    assert(w._4 <= c._4 + 64, s"whitening grew norms: $w vs $c")
    // this corpus's centered embeddings are near-isotropic: the
    // pairwise-dot share stays sub-5% at BOTH stages (the audit's
    // certification; a common-direction corpus would show a large
    // centered share that whitening collapses)
    assert(math.abs(c._6) < 50000L && math.abs(w._6) < 50000L,
      s"unexpected anisotropy: $c / $w")
  }
}
