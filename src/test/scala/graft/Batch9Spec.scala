package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property checks for the round-11 additions: Kneser–Ney estimator
  * identities (q281), OOV-curve monotonicity (q282),
  * sorted-neighborhood candidate physics (q283), and code-switch
  * ledger laws (q284). */
class Batch9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q281 KN bigram: ledger counts, hand-recomputed NLL, and KN != add-one") {
    val rows = text.CorpusSignals.q281KnBigram(spark, TestSpark.SF).collect()
    assert(rows.nonEmpty)
    // n_bigrams must be exactly size(toks) - 1 per surviving doc
    val direct = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("nb"))
      .filter(col("nb") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == direct.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == direct(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("avg_nll_micro") >= 0)
    }
    // hand-recompute the KN score for the first 3 docs from the raw
    // corpus (vocabulary is small enough to model driver-side)
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val allBg = docs.values.flatMap(t => t.zip(t.tail)).toSeq
    val c12 = allBg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val r1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val r2 = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val t = c12.size.toLong
    // interpolated-KN mass conservation: sum over observed continuations
    // of (4*c12-3) plus the discount mass equals 4*c1 exactly
    c1.keys.take(5).foreach { w =>
      val obs = c12.collect { case ((a, _), c) if a == w => 4 * c - 3 }.sum
      assert(obs + 3 * r1(w) == 4 * c1(w), s"KN mass at prefix '$w'")
    }
    rows.take(3).foreach { r =>
      val id = r.getAs[Long]("doc_id"); val toks = docs(id)
      val t7 = toks.zip(toks.tail).map { case (a, b) =>
        val num = (4 * c12((a, b)) - 3) * t + 3 * r1(a) * r2(b)
        val den = 4 * c1(a) * t
        math.floor(math.log(den.toDouble / num.toDouble) * 1e7).toLong
      }.sum
      assert(r.getAs[Long]("avg_nll_micro") == t7 / (10 * (toks.size - 1)),
        s"doc $id hand-recompute")
    }
    // a genuinely different estimator from q215's add-one smoothing
    val laplace = text.CorpusSignals.q215BigramLm(spark, TestSpark.SF)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.exists(r =>
      laplace(r.getAs[Long]("doc_id")) != r.getAs[Long]("avg_nll_micro")))
  }

  test("q282 OOV curve: monotone in V, exact occurrence conservation") {
    val rows = text.CorpusSignals.q282OovCurve(spark, TestSpark.SF).collect()
    assert(rows.map(_.getAs[Long]("v")).toSeq ==
      text.CorpusSignals.OOV_SIZES.map(_.toLong))
    val totalOcc = Tables.documents(spark, TestSpark.SF)
      .agg(sum(size(split(col("text"), " ")))).collect().head.getLong(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_occ") == totalOcc)
      assert(r.getAs[Long]("oov_occ_ppm") ==
        r.getAs[Long]("oov_occ") * 1000000L / totalOcc)
    }
    // a larger vocabulary can only shrink both OOV measures
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("oov_occ") >= b.getAs[Long]("oov_occ"))
      assert(a.getAs[Long]("docs_hit") >= b.getAs[Long]("docs_hit"))
    }
    // this corpus's vocabulary is larger than the smallest V, so the
    // curve is non-degenerate
    assert(rows.head.getAs[Long]("oov_occ") > 0)
  }

  test("q283 SNM: normalized pairs, threshold respected, Jaccard re-verified") {
    val rows = text.Dedup.q283SortedNeighborhood(spark, TestSpark.SF).collect()
    assert(rows.nonEmpty)
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    rows.foreach { r =>
      val a = r.getAs[Long]("a_id"); val b = r.getAs[Long]("b_id")
      assert(a < b, s"pair ($a,$b) not normalized")
      assert(seen.add((a, b)), s"pair ($a,$b) duplicated")
      val j = r.getAs[Long]("jacc_ppm")
      assert(j >= text.Dedup.SNM_MIN_PPM && j <= 1000000L)
      val exact = (docs(a) & docs(b)).size.toLong * 1000000L /
        (docs(a) | docs(b)).size
      assert(j == exact, s"pair ($a,$b): ledger $j vs exact $exact")
    }
    // linear candidate guarantee: ≤ 2 passes · (w-1) · N pairs even
    // BEFORE the similarity threshold, so the verified ledger is far
    // below the all-pairs square
    assert(rows.length <= 2 * (text.Dedup.SNM_WINDOW - 1) * docs.size)
  }

  test("q284 code-switch: segment counts, shares, entropy-zero law") {
    val rows = text.TextOps.q284CodeSwitch(spark, TestSpark.SF).collect()
    val direct = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == direct.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expSegs = (direct(id) - 1) / text.TextOps.SEG_TOKS + 1
      assert(r.getAs[Long]("n_segs") == expSegs, s"doc $id segment count")
      val nl = r.getAs[Long]("n_langs")
      val share = r.getAs[Long]("dom_share_ppm")
      assert(nl >= 1 && share >= 1000000L / math.max(nl, 1) && share <= 1000000L)
      val ent = r.getAs[Long]("ent_micro")
      if (nl == 1) assert(ent == 0 && share == 1000000L, s"doc $id pure")
      else assert(ent > 0, s"doc $id mixed must have entropy")
      val mixed = r.getAs[Long]("mixed")
      assert(mixed == (if (nl >= 2 && share <= 800000L) 1L else 0L))
    }
    // the corpus must exercise both branches
    assert(rows.exists(_.getAs[Long]("n_langs") >= 2))
    assert(rows.exists(_.getAs[Long]("n_langs") == 1))
  }
}
