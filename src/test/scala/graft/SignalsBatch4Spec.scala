package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.CorpusSignals

/** Source calibration (q131), token Gini (q132), shingle novelty
  * (q133): in-Spark invariants behind the oracle hashes. */
class SignalsBatch4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q131 keeps ~top decile of every source, calibrated within source") {
    val kept = CorpusSignals.q131SourceCalibration(spark, TestSpark.SF)
      .as[(Long, String, Double, Double)].collect()
    assert(kept.nonEmpty)
    val all = graft.text.TextOps
      .withQuality(Tables.documents(spark, TestSpark.SF))
      .select(col("doc_id"), col("source"), col("quality"))
      .as[(Long, String, Double)].collect()
    val keptIds = kept.map(_._1).toSet
    kept.groupBy(_._2).foreach { case (src, g) =>
      val pool = all.filter(_._2 == src)
      // Top-set property: no unkept doc of the source out-scores a
      // kept one (ties may straddle the cut only at equal quality).
      val minKept = g.map(_._3).min
      pool.filterNot(r => keptIds(r._1)).foreach { case (id, _, q) =>
        assert(q <= minKept, s"source $src: unkept $id quality $q > $minKept") }
      // And the cut is in the top-decile neighborhood, ties aside.
      assert(g.length <= math.ceil(pool.length * 0.1).toInt + g.count(_._3 == minKept),
        s"source $src kept ${g.length} of ${pool.length}")
      g.foreach { case (_, _, q, p) => assert(p >= 0.9 && q > 0) }
    }
  }

  test("q132 value-run Gini equals the naive ranked formulation") {
    val (n, t, gini) = CorpusSignals.q132TokenGini(spark, TestSpark.SF)
      .as[(Long, Long, Double)].head()
    val counts = Tables.documents(spark, TestSpark.SF)
      .select(size(split(col("text"), " ")).cast("long")).as[Long]
      .collect().sorted
    assert(n == counts.length && t == counts.sum)
    val s = counts.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val naive = (2.0 * s - (n + 1) * t) / (n.toDouble * t)
    assert(math.abs(gini - BigDecimal(naive).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("q136 weighted quantiles: monotone bands, shares bracket targets, doc-quantile differs") {
    val rows = CorpusSignals.q136WeightedQuantiles(spark, TestSpark.SF)
      .as[(Double, Long, Double, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == CorpusSignals.WQ_TARGETS)
    // Bands and cumulative shares are monotone in the target, each
    // share reaches its target, and the previous band (if any) didn't.
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2 && a._6 <= b._6)
      case _ =>
    }
    val docs = graft.text.TextOps
      .withQuality(Tables.documents(spark, TestSpark.SF))
      .select(col("quality"), col("n_tok"))
      .as[(Double, Long)].collect().filter(_._2 > 0)
    val total = docs.map(_._2).sum
    rows.foreach { case (t, band, _, cum, tot, share) =>
      assert(tot == total && share >= t)
      val below = docs.filter(d => math.floor(d._1 * 20).toLong < band)
        .map(_._2).sum
      assert(below < (t * total), s"band $band not minimal for target $t")
      assert(cum == docs.filter(d => math.floor(d._1 * 20).toLong <= band)
        .map(_._2).sum)
    }
  }

  test("q133 novelty: the earliest doc is fully novel, ratios bounded") {
    val rows = CorpusSignals.q133ShingleNovelty(spark, TestSpark.SF)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_._1)
    assert(first._3 == 1.0, "earliest doc's shingles are all first-seen")
    rows.foreach { case (_, nSh, r) =>
      assert(nSh > 0 && r >= 0.0 && r <= 1.0) }
    // Novelty must actually discriminate on this corpus (planted dups).
    assert(rows.exists(_._3 < 1.0))
  }
}
