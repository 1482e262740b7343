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
}
