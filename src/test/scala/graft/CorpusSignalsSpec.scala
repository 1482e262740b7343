package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.CorpusSignals

/** DF-rarity scoring (q120) and stop-token-filtered co-occurrence
  * (q123): the corpus-semantic invariants behind the oracle hashes. */
class CorpusSignalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q120 rare_ratio isolates exactly the docs carrying a rare token") {
    val scored = CorpusSignals.q120TokenRarity(spark, TestSpark.SF)
      .as[(Long, Long, Double, Double)].collect()
    assert(scored.length ==
      Tables.documents(spark, TestSpark.SF).count())
    // Ground truth: docs whose text contains a token with df*10 < nDocs.
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .as[(Long, Seq[String])].collect()
    val n = docs.length
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, g) => t -> g.length }
    val rare = df.filter(_._2 * 10 < n).keySet
    assert(rare.nonEmpty, "corpus should contain at least one rare token")
    val expectRare = docs.filter(_._2.exists(rare)).map(_._1).toSet
    val gotRare = scored.filter(_._4 > 0).map(_._1).toSet
    assert(gotRare == expectRare && gotRare.nonEmpty)
    // mean_df is a weighted mean of dfs: strictly within [min df, max df].
    scored.foreach { case (_, _, meanDf, _) =>
      assert(meanDf >= df.values.min && meanDf <= df.values.max) }
  }

  test("q123 excludes stop tokens and respects pair canonicalization") {
    val pairs = CorpusSignals.q123Cooccur(spark, TestSpark.SF)
      .as[(String, String, Long)].collect()
    assert(pairs.nonEmpty && pairs.length <= 20)
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .as[(Long, Seq[String])].collect()
    val n = docs.length
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, g) => t -> g.length }
    val stop = df.filter { case (_, f) => f * 5 >= n * 4 }.keySet
    pairs.foreach { case (t1, t2, c) =>
      assert(t1 < t2, "pairs must be canonical t1 < t2")
      assert(!stop(t1) && !stop(t2), s"stop token leaked: $t1/$t2")
      // Count matches a direct recount over the raw docs.
      val direct = docs.count { case (_, ts) =>
        val s = ts.toSet; s(t1) && s(t2) }
      assert(c == direct, s"($t1,$t2) count $c != direct $direct")
    }
    // Descending by count with (t1, t2) tiebreak.
    assert(pairs.sliding(2).forall {
      case Array(a, b) => a._3 > b._3 ||
        (a._3 == b._3 && (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)))
      case _ => true
    })
  }

  test("q215 bigram LM matches an independent driver-side mirror") {
    import graft.text.CorpusSignals
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val bg = docs.flatMap { case (id, t) =>
      t.split(" ").sliding(2).filter(_.length == 2)
        .map(p => (id, (p(0), p(1)))).toSeq
    }
    val c12 = bg.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val v = c12.keySet.map(_._1).size.toLong
    val expect = bg.groupBy(_._1).map { case (id, xs) =>
      val t7 = xs.map { case (_, p) =>
        math.floor(math.log((c1(p._1) + v).toDouble / (c12(p) + 1).toDouble)
          * CorpusSignals.BIGRAM_SCALE).toLong
      }.sum
      (id, xs.length.toLong, t7 / (10L * xs.length))
    }.toSeq.sortBy(_._1)
    val got = CorpusSignals.q215BigramLm(spark, TestSpark.SF)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect)
    // add-one smoothing over observed contexts: every ratio > 1, so
    // every per-doc NLL is strictly positive
    assert(got.forall(_._3 > 0))
  }

  test("q237 Zipf fit matches a driver-side BigInt mirror per source") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = text.CorpusSignals.q237ZipfFit(spark, TestSpark.SF)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("source"), col("text")).as[(String, String)].collect()
    def fit(freqs: Seq[Long]): (Long, Long, Long) = {
      val pts = freqs.zipWithIndex.map { case (f, i) =>
        (math.round(math.log((i + 1).toDouble) * 1e6),
         math.round(math.log(f.toDouble) * 1e6)) }
      val n = BigInt(pts.size)
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(p => BigInt(p._2)).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val den = n * sxx - sx * sx
      (pts.size.toLong, ((n * sxy - sx * sy) * 1000000 / den).toLong,
        ((sy * sxx - sx * sxy) / den).toLong)
    }
    val expect = docs.groupBy(_._1).map { case (src, xs) =>
      val freqs = xs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (t, os) => (t, os.length.toLong) }.toSeq
        .sortBy { case (t, f) => (-f, t) }.map(_._2)
      val (n, sl, ic) = fit(freqs)
      (src, n, sl, ic)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expect)
    // rank-frequency is non-increasing, so every fitted slope is <= 0,
    // and the rank-1 intercept sits above zero (ln of the top freq)
    assert(got.forall(r => r._3 <= 0 && r._4 > 0))
  }

  test("q239 PSI matches a driver-side mirror; every term non-negative") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = text.CorpusSignals.q239PsiDrift(spark, TestSpark.SF)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val rows = Tables.documents(spark, TestSpark.SF)
      .select(col("source"), expr("size(split(text, ' ')) div 10"))
      .as[(String, Long)].collect()
    val dom = rows.map(_._2).distinct.sorted
    val nB = dom.length
    val nC = rows.length
    val cb = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val expect = rows.groupBy(_._1).map { case (src, xs) =>
      val ns = xs.length
      val sb = xs.groupBy(_._2).view.mapValues(_.length).toMap
      val psi = dom.map { b =>
        val p = (sb.getOrElse(b, 0) + 1).toDouble / (ns + nB)
        val q = (cb(b) + 1).toDouble / (nC + nB)
        math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong
      }.sum
      (src, psi, nB.toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expect)
    // each PSI term is (p−q)·ln(p/q) ≥ 0, so per-source PSI can dip
    // below zero only by per-band rounding slack
    assert(got.forall(_._2 >= -nB))
  }

  test("q240 nucleus sizes match a per-context driver mirror") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = text.CorpusSignals.q240NucleusSize(spark, TestSpark.SF)
      .as[(Long, Long)].collect().toMap
    val texts = Tables.documents(spark, TestSpark.SF)
      .select("text").as[String].collect()
    val bg = texts.flatMap { t =>
      val tk = t.split(" "); tk.zip(tk.drop(1)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = bg.groupBy(_._1._1).map { case (_, m) =>
      val sorted = m.toSeq.map { case ((_, w2), c) => (c, w2) }
        .sortBy { case (c, w2) => (-c, w2) }
      val total = sorted.map(_._1).sum
      var cum = 0L
      sorted.takeWhile { case (c, _) =>
        val in = cum * text.CorpusSignals.NUCLEUS_DEN <
          total * text.CorpusSignals.NUCLEUS_NUM
        cum += c; in
      }.length.toLong
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expect)
    // every context needs at least one continuation; the histogram
    // covers every context exactly once
    assert(got.keys.forall(_ >= 1L))
    assert(got.values.sum == bg.keys.map(_._1).toSeq.distinct.size.toLong)
  }

  test("q243 KS distance matches an exact driver-side sup computation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = text.CorpusSignals.q243KsDrift(spark, TestSpark.SF)
      .as[(String, Long)].collect().toMap
    val rows = Tables.documents(spark, TestSpark.SF)
      .select(col("source"), expr("size(split(text, ' '))").cast("long"))
      .as[(String, Long)].collect()
    val support = rows.map(_._2).distinct.sorted
    val expect = rows.groupBy(_._1).map { case (src, xs) =>
      val ns = xs.length.toLong
      val rest = rows.filterNot(_._1 == src)
      val nr = rest.length.toLong
      val num = support.map { x =>
        val cs = xs.count(_._2 <= x).toLong
        val cr = rest.count(_._2 <= x).toLong
        math.abs(cs * nr - cr * ns)
      }.max
      src -> num * 1000000L / (ns * nr)
    }
    assert(got == expect)
    // KS lives in [0, 1]
    assert(got.values.forall(v => v >= 0 && v <= 1000000L))
  }

  test("q246 entropy triple: mirror match, KL >= 0, H <= ln(vocab)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = text.CorpusSignals.q246SourceEntropy(spark, TestSpark.SF)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val rows = Tables.documents(spark, TestSpark.SF)
      .select(col("source"), col("text")).as[(String, String)].collect()
    val all = rows.flatMap(_._2.split(" "))
    val cAll = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nAll = all.length.toLong
    val expect = rows.groupBy(_._1).map { case (src, xs) =>
      val terms = xs.flatMap(_._2.split(" "))
      val cs = terms.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nS = terms.length.toLong
      def r6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
      val h = cs.values.map(c =>
        r6(-(c.toDouble / nS) * math.log(c.toDouble / nS))).sum
      val ce = cs.map { case (t, c) =>
        r6(-(c.toDouble / nS) * math.log(cAll(t).toDouble / nAll)) }.sum
      (src, nS, h, ce, ce - h)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expect)
    // Gibbs: KL >= 0 (up to per-term rounding slack); plug-in entropy
    // is bounded by ln |vocab|
    val vocab = cAll.size
    got.foreach { case (src, _, h, _, kl) =>
      assert(kl >= -100L, s"negative KL at $src")
      assert(h <= math.ceil(math.log(vocab.toDouble) * 1e6).toLong + 100,
        s"entropy above ln(vocab) at $src")
    }
  }

  test("q248 source signatures: score formula exact, top list well-formed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = text.CorpusSignals.q248SourceSignature(spark, TestSpark.SF)
      .as[(String, Long, String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val nSrc = Tables.documents(spark, TestSpark.SF)
      .select("source").distinct().count()
    got.foreach { case (_, rank, _, tf, sdf, score) =>
      assert(rank >= 1 && rank <= text.CorpusSignals.SIG_TOP)
      assert(sdf >= 1 && sdf <= nSrc)
      val idf = math.floor(
        math.log((nSrc + 1).toDouble / (sdf + 1)) * 1e6 + 0.5).toLong
      assert(score == tf * idf, s"score formula drifted")
    }
    // every source surfaces a full top list, ranked by score desc
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._2).sorted.toSeq ==
        (1L to text.CorpusSignals.SIG_TOP.toLong), s"bad list for $src")
      val byRank = rows.sortBy(_._2)
      byRank.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._6 > b._6 || (a._6 == b._6 && a._3 <= b._3)) }
    }
    assert(got.groupBy(_._1).size.toLong == nSrc)
  }
}
