package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property checks for the round-11 additions q285 (multinomial NB
  * source classifier) and q286 (moment-factorized MMD² two-sample
  * test): both are fully hand-recomputed driver-side from the raw
  * tables with the same exact integer arithmetic, so the specs prove
  * the distributed formulation — not just its shape. */
class Batch10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q285 NB: confusion mass conservation and full driver-side model replay") {
    val rows = text.TrainingSet.q285NbSource(spark, TestSpark.SF).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    // mass conservation: every document lands in exactly one cell
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    val sources = docs.map(_._2).toSet
    rows.foreach { r =>
      assert(sources.contains(r.getAs[String]("source")))
      assert(sources.contains(r.getAs[String]("predicted")))
    }
    // full replay: train the same Laplace-smoothed multinomial NB
    // driver-side with the identical floor(ln·1e7) integer terms
    val occ = docs.flatMap { case (_, s, toks) => toks.map(t => (t, s)) }
    val cnt = occ.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ns = occ.groupBy(_._2).map { case (s, v) => s -> v.size.toLong }
    val ds = docs.groupBy(_._2).map { case (s, v) => s -> v.size.toLong }
    val v = cnt.keys.map(_._1).toSet.size.toLong
    val dd = docs.length.toLong
    def f7(x: Double): Long = math.floor(math.log(x) * 1e7).toLong
    val classes = ns.keys.toSeq.sorted
    val predicted = docs.map { case (id, src, toks) =>
      val best = classes.map { s =>
        val u7 = f7((ns(s) + v).toDouble)
        val nll = toks.map { t =>
          cnt.get((t, s)) match {
            case Some(c) => f7((ns(s) + v).toDouble / (c + 1).toDouble)
            case None    => u7
          }
        }.sum + f7(dd.toDouble / ds(s).toDouble)
        (nll, s)
      }.min // (nll, cls) ordering = the engine's tie-break
      (src, best._2)
    }
    val expConfusion = predicted.groupBy(identity)
      .map { case ((t, p), l) => (t, p) -> l.size.toLong }
    val gotConfusion = rows.map(r => (r.getAs[String]("source"),
      r.getAs[String]("predicted")) -> r.getAs[Long]("n_docs")).toMap
    assert(gotConfusion == expConfusion, "confusion matrix replay")
    // the classifier must be non-trivial: some diagonal mass exists
    assert(predicted.exists { case (t, p) => t == p })
  }

  test("q286 MMD²: pair census, non-negativity, exact BigInt replay") {
    val rows = sim.Similarity.q286MmdTwoSample(spark, TestSpark.SF).collect()
    val vecs = Tables.embeddings(spark, TestSpark.SF)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val labels = vecs.map(_._1).distinct.sorted
    assert(rows.length == labels.length * (labels.length - 1) / 2)
    val nPer = vecs.groupBy(_._1).map { case (l, a) => l -> a.length.toLong }
    rows.foreach { r =>
      assert(r.getAs[Long]("mmd2_micro") >= 0)
      assert(r.getAs[Long]("n_a") == nPer(r.getAs[Int]("label_a")))
      assert(r.getAs[Long]("n_b") == nPer(r.getAs[Int]("label_b")))
    }
    // exact replay of the first three pairs: second-moment matrices in
    // BigInt, the same two integer divisions in the same order
    val scale = sim.Similarity.MMD_SCALE
    def moments(l: Int): Array[BigInt] = {
      val m = Array.fill(64 * 64)(BigInt(0))
      vecs.filter(_._1 == l).foreach { case (_, e) =>
        val q = e.map(x => math.round(x.toDouble * scale))
        for (i <- 0 until 64; j <- 0 until 64)
          m(i * 64 + j) += BigInt(q(i)) * q(j)
      }
      m
    }
    rows.take(3).foreach { r =>
      val la = r.getAs[Int]("label_a"); val lb = r.getAs[Int]("label_b")
      val (ma, mb) = (moments(la), moments(lb))
      val (na, nb) = (BigInt(nPer(la)), BigInt(nPer(lb)))
      val num = (0 until 64 * 64).map { k =>
        val dfx = ma(k) * nb - mb(k) * na; dfx * dfx
      }.sum
      val exp = (num / (na * na * nb * nb)) * 1000000 /
        (BigInt(scale) * scale * scale * scale)
      assert(BigInt(r.getAs[Long]("mmd2_micro")) == exp,
        s"pair ($la,$lb) BigInt replay")
    }
    // distribution-level signal exists: not all pairs identical
    assert(rows.map(_.getAs[Long]("mmd2_micro")).distinct.length > 1)
  }

  test("q287 NB CV: fold census, accuracy identity, full α=1 held-out replay") {
    val rows = text.TrainingSet.q287NbCv(spark, TestSpark.SF).collect()
    val K = text.TrainingSet.CV_FOLDS.toInt
    val alphas = text.TrainingSet.CV_ALPHAS
    assert(rows.length == K * alphas.length)
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    // the md5 fold draw, replayed driver-side
    def fold(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = h.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % K
    }
    val foldCensus = docs.groupBy(d => fold(d._1)).map { case (f, a) =>
      f -> a.length.toLong }
    alphas.foreach { a =>
      val perA = rows.filter(_.getAs[Long]("alpha") == a)
      assert(perA.map(_.getAs[Long]("n_docs")).sum == docs.length)
      perA.foreach { r =>
        assert(r.getAs[Long]("n_docs") == foldCensus(r.getAs[Long]("f")))
        assert(r.getAs[Long]("acc_ppm") ==
          r.getAs[Long]("n_correct") * 1000000L / r.getAs[Long]("n_docs"))
      }
    }
    // full held-out replay at α = 1: per fold, train on the ledger
    // complement and classify the fold's docs with the identical
    // integer arithmetic
    def f7(x: Double): Long = math.floor(math.log(x) * 1e7).toLong
    val withFold = docs.map { case (id, s, t) => (id, fold(id), s, t) }
    val occ = withFold.flatMap { case (id, f, s, toks) =>
      toks.map(t => (t, s, f)) }
    val cellAll = occ.groupBy(o => (o._1, o._2))
      .map { case (k, v) => k -> v.size.toLong }
    val cellByFold = occ.groupBy(o => (o._1, o._2, o._3))
      .map { case (k, v) => k -> v.size.toLong }
    val tokTot = occ.groupBy(_._1).map { case (t, v) => t -> v.size.toLong }
    val tokByFold = occ.groupBy(o => (o._1, o._3))
      .map { case (k, v) => k -> v.size.toLong }
    val nsAll = occ.groupBy(_._2).map { case (s, v) => s -> v.size.toLong }
    val nsByFold = occ.groupBy(o => (o._2, o._3))
      .map { case (k, v) => k -> v.size.toLong }
    val dsAll = withFold.groupBy(_._3).map { case (s, v) => s -> v.size.toLong }
    val dsByFold = withFold.groupBy(w => (w._3, w._2))
      .map { case (k, v) => k -> v.size.toLong }
    val dd = docs.length.toLong
    val dByFold = withFold.groupBy(_._2).map { case (f, v) => f -> v.size.toLong }
    val a1 = 1L
    val correctByFold = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    withFold.foreach { case (id, f, src, toks) =>
      val vTrain = tokTot.count { case (t, c) =>
        c - tokByFold.getOrElse((t, f), 0L) > 0 }.toLong
      val cands = nsAll.keys.toSeq.sorted.filter(s =>
        dsAll(s) - dsByFold.getOrElse((s, f), 0L) > 0)
      val best = cands.map { s =>
        val nsTr = nsAll(s) - nsByFold.getOrElse((s, f), 0L)
        val den = nsTr + a1 * vTrain
        val u7 = f7(den.toDouble / a1.toDouble)
        val nll = toks.map { t =>
          val cTr = cellAll.getOrElse((t, s), 0L) -
            cellByFold.getOrElse((t, s, f), 0L)
          if (cTr > 0) f7(den.toDouble / (cTr + a1).toDouble) else u7
        }.sum + f7((dd - dByFold(f)).toDouble /
          (dsAll(s) - dsByFold.getOrElse((s, f), 0L)).toDouble)
        (nll, s)
      }.min
      if (best._2 == src) correctByFold(f) += 1L
    }
    rows.filter(_.getAs[Long]("alpha") == a1).foreach { r =>
      assert(r.getAs[Long]("n_correct") == correctByFold(r.getAs[Long]("f")),
        s"fold ${r.getAs[Long]("f")} α=1 replay")
    }
  }

  test("q288 DP release: clip law, release identities, exact Laplace replay") {
    val rows = ops.StatShapes.q288DpRelease(spark, TestSpark.SF).collect()
    assert(rows.nonEmpty)
    val clip = ops.StatShapes.DP_CLIP
    val epsInv = ops.StatShapes.DP_EPS_INV
    val truth = Tables.documents(spark, TestSpark.SF)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nd"),
        sum(least(size(split(col("text"), " ")).cast("long"), lit(clip)))
          .as("tc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.length == truth.size)
    def md5k(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map(b => f"$b%02x").mkString, 16) -
        2147483648L
    }
    def noise6(k: Long, b: Long): Long = {
      val mag = math.floor(math.log(2147483648.0 /
        math.max(2147483648L - math.abs(k), 1L).toDouble) * (b * 1e6)).toLong
      java.lang.Long.signum(k) * mag
    }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (nd, tc) = truth(src)
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("tok_clipped") == tc)
      // bounded contribution: the clipped sum can never exceed n·CLIP
      assert(tc <= nd * clip)
      val nD = noise6(md5k(src + ":docs"), epsInv)
      val nT = noise6(md5k(src + ":toks"), clip * epsInv)
      assert(r.getAs[Long]("docs_release_micro") == nd * 1000000L + nD)
      assert(r.getAs[Long]("docs_err_micro") == math.abs(nD))
      assert(r.getAs[Long]("toks_release_micro") == tc * 1000000L + nT)
      assert(r.getAs[Long]("toks_err_micro") == math.abs(nT))
    }
    // the mechanism actually perturbs: some noise is nonzero, and both
    // signs occur across 2·|sources| draws
    val noises = rows.flatMap(r => Seq(
      r.getAs[Long]("docs_release_micro") - r.getAs[Long]("n_docs") * 1000000L,
      r.getAs[Long]("toks_release_micro") - r.getAs[Long]("tok_clipped") * 1000000L))
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
  }

  test("q289 excess mix: source census, per-source replay from the graded LMs, weight laws") {
    val rows = text.CorpusSignals.q289ExcessMix(spark, TestSpark.SF).collect()
    assert(rows.nonEmpty)
    // source census: one row per source, n_docs conserved
    val nBySrc = Tables.documents(spark, TestSpark.SF)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("source")).toSet == nBySrc.keySet)
    rows.foreach(r => assert(r.getAs[Long]("n_docs") ==
      nBySrc(r.getAs[String]("source"))))
    // replay excess_micro from the two graded per-doc LM frames (q281
    // and q215 are independently hash-proven, so joining their outputs
    // driver-side is a ground-truth reconstruction of the gap ledger)
    val kn = text.CorpusSignals.q281KnBigram(spark, TestSpark.SF)
      .select(col("doc_id"), col("avg_nll_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a1 = text.CorpusSignals.q215BigramLm(spark, TestSpark.SF)
      .select(col("doc_id"), col("avg_nll_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcOf = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val excBySrc = srcOf.toSeq.groupBy(_._2).map { case (s, ds) =>
      val tot = ds.map { case (id, _) => math.max(0L, a1(id) - kn(id)) }.sum
      s -> tot / ds.size // BIGINT div = floor for non-negative operands
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("excess_micro") == excBySrc(r.getAs[String]("source")),
        s"excess replay for ${r.getAs[String]("source")}")
    }
    // weight laws: linear weights are a floor-division of a conserved
    // total, so 0 <= mix_ppm, sum <= 1e6 with deficit < |sources|, and
    // ordering by weight == ordering by excess
    val excTot = rows.map(_.getAs[Long]("excess_micro")).sum
    assert(excTot > 0L, "test corpus must show some KN advantage")
    rows.foreach { r =>
      val w = r.getAs[Long]("mix_ppm")
      assert(w >= 0L)
      assert(w == r.getAs[Long]("excess_micro") * 1000000L / excTot)
    }
    val wSum = rows.map(_.getAs[Long]("mix_ppm")).sum
    assert(wSum <= 1000000L && wSum > 1000000L - rows.length)
    val byExc = rows.sortBy(_.getAs[Long]("excess_micro")).map(_.getAs[String]("source"))
    val byW = rows.sortBy(r => (r.getAs[Long]("mix_ppm"), r.getAs[Long]("excess_micro")))
      .map(_.getAs[String]("source"))
    assert(byExc.sameElements(byW), "monotone reweighting")
  }
}
