package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property checks for the round-9 eval/linkage additions: BLEU
  * clipping invariants (q251), ARI pair-count identities (q252),
  * CCNet bucket physics (q253), and the Fellegi–Sunter linkage
  * census's conservation law (q254). */
class Batch7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q251 BLEU: totals equal lengths, clips never exceed totals") {
    val rows = text.CorpusSignals.q251BleuEval(spark, TestSpark.SF)
      .select("doc_id", "ref_len", "m1", "t1", "m2", "t2", "bleu2sq_ppm2")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, refLen, m1, t1, m2, t2, ppm2) =>
      // substitution preserves length: candidate totals are determined
      assert(t1 == refLen, s"doc $id: t1=$t1 != ref_len=$refLen")
      assert(t2 == math.max(refLen - 1, 0L), s"doc $id: t2=$t2")
      // the clipping rule bounds matches by both sides
      assert(m1 <= t1 && m2 <= t2, s"doc $id: clip exceeded totals")
      assert(ppm2 >= 0 && ppm2 <= 1000000000000L, s"doc $id: ppm2=$ppm2")
      // the planted noise hits ~1/5 of positions: a perfect score on a
      // long doc would mean the corruption never fired
      if (refLen >= 30) assert(m1 < t1, s"doc $id: corruption never fired")
    }
    // the corpus-level signal is meaningfully degraded but nonzero
    val meanPpm2 = rows.map(_._7).sum / rows.length
    assert(meanPpm2 > 100000000000L && meanPpm2 < 990000000000L,
      s"mean bleu2sq_ppm2=$meanPpm2 outside the planted-noise regime")
  }

  test("q252 ARI: pair-count identities and metric bounds hold") {
    val r = sim.Similarity.q252ClusterAri(spark, TestSpark.SF)
      .collect().head
    val n = r.getAs[Long]("n")
    val nEmb = Tables.embeddings(spark, TestSpark.SF).count()
    assert(n == nEmb, s"n=$n != |embeddings|=$nEmb")
    val p = r.getAs[Long]("p_pairs"); val a = r.getAs[Long]("a_pairs")
    val b = r.getAs[Long]("b_pairs"); val t = r.getAs[Long]("t_pairs")
    assert(t == n * (n - 1) / 2)
    // cell pairs are bounded by both marginals, marginals by the total
    assert(p <= a && p <= b, s"p=$p exceeds a=$a or b=$b")
    assert(a <= t && b <= t)
    // ARI identity: num/den reproduce the graded (1+ARI)·1e6 exactly
    val num = r.getAs[Long]("ari_num"); val den = r.getAs[Long]("ari_den")
    assert(num == 2 * (BigInt(t) * p - BigInt(a) * b))
    assert(den == BigInt(t) * (a + b) - 2 * BigInt(a) * b)
    assert(r.getAs[Long]("ari1p_ppm") ==
      ((BigInt(num) + den) * 1000000 / den).toLong)
    // purity: at least the best-single-label floor, at most 1
    val pur = r.getAs[Long]("purity_ppm")
    val nLabels = r.getAs[Long]("n_labels")
    assert(pur >= 1000000 / nLabels && pur <= 1000000, s"purity=$pur")
  }

  test("q253 CCNet buckets: equal-depth, ordered, complete per lang") {
    val rows = text.CorpusSignals.q253CcnetBuckets(spark, TestSpark.SF)
      .select("lang", "bucket", "tier", "n_docs", "nll_lo", "nll_hi")
      .as[(String, Long, String, Long, Long, Long)].collect()
    val eligible = Tables.documents(spark, TestSpark.SF)
      .filter(size(split(col("text"), " ")) >= 2)
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.length == text.CorpusSignals.PPL_BUCKETS, s"$lang buckets")
      // every eligible doc lands in exactly one bucket
      assert(g.map(_._4).sum == eligible(lang), s"$lang doc mass")
      // ntile equal-depth: bucket sizes differ by at most 1
      assert(g.map(_._4).max - g.map(_._4).min <= 1, s"$lang depth")
      // NLL ranges are disjoint and ascending head -> tail
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == Seq("head", "middle", "tail"))
      sorted.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0)._6 <= w(1)._5,
          s"$lang: bucket ${w(0)._2} hi > bucket ${w(1)._2} lo")
      }
    }
  }

  test("q255 medoids: one per bucket, mass conserved, singleton cost 0") {
    val med = sim.Similarity.q255BucketMedoid(spark, TestSpark.SF)
      .select("cluster", "medoid", "n_members", "sum_d2")
      .as[(Long, Long, Long, Long)].collect()
    // exactly one medoid per bucket, buckets distinct
    assert(med.map(_._1).distinct.length == med.length)
    // member mass equals the corpus; bucket count matches q252's view
    // of the SAME partition (shared sketch contract)
    val ari = sim.Similarity.q252ClusterAri(spark, TestSpark.SF).collect().head
    assert(med.map(_._3).sum == ari.getAs[Long]("n"))
    assert(med.length == ari.getAs[Long]("n_clusters").toInt)
    med.foreach { case (cl, _, nm, d2) =>
      assert(nm >= 1 && d2 >= 0, s"bucket $cl")
      if (nm == 1) assert(d2 == 0, s"singleton bucket $cl has cost $d2")
    }
  }

  test("q256 Spearman: exact vs a driver-side recompute per source") {
    val got = text.CorpusSignals.q256SpearmanSignals(spark, TestSpark.SF)
      .select("source", "n", "sum_d2", "den", "rho1p_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.SF)
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect()
    docs.groupBy(_._2).foreach { case (src, g) =>
      val sig = g.map { case (id, _, t) =>
        val toks = t.split(" ", -1)
        (id, toks.length.toLong, toks.distinct.length.toLong)
      }
      val rx = sig.sortBy(r => (r._2, r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1L) }.toMap
      val ry = sig.sortBy(r => (r._3, r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1L) }.toMap
      val sumD2 = sig.map(r => { val d = rx(r._1) - ry(r._1); d * d }).sum
      val n = sig.length.toLong
      val (_, gn, gd2, gden, gppm) = got(src)
      assert(gn == n && gd2 == sumD2, s"$src: d2 $gd2 != $sumD2")
      assert(gden == n * (n * n - 1))
      assert(gppm == (BigInt(2) * gden - 6 * BigInt(sumD2)) * 1000000 / gden)
      // signals genuinely agree on ranking: ρ must be strongly positive
      assert(gppm > 1500000, s"$src: rho1p_ppm=$gppm not > 1.5e6")
    }
  }

  test("q257 retrieval eval: metric bounds + exact recompute for one query") {
    val rows = text.TextOps.q257RetrievalEval(spark, TestSpark.SF)
      .select("term", "n_ranked", "n_rel", "first_rel_rank", "rr_ppm",
        "dcg_micro", "idcg_micro", "ndcg_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == text.TextOps.RET_TERMS.sorted)
    rows.foreach { case (t, nRanked, nRel, frr, rr, dcg, idcg, ndcg) =>
      assert(nRanked >= 1 && nRanked <= text.TextOps.RET_K, s"$t n_ranked")
      assert(frr >= 0 && frr <= nRanked, s"$t first_rel_rank")
      if (frr == 1) assert(rr == 1000000, s"$t rr at rank 1")
      assert(dcg <= idcg, s"$t dcg $dcg > idcg $idcg")
      assert(ndcg >= 0 && ndcg <= 1000000, s"$t ndcg=$ndcg")
      assert(nRel >= 0)
    }
    // exact recompute of MRR + nDCG for one query, driver-side
    val term = "vector"
    val docs = Tables.documents(spark, TestSpark.SF)
      .select("doc_id", "text").as[(Long, String)].collect()
    def disc(r: Long) = math.round(1000000.0 / (math.log(r + 1.0) / math.log(2)))
    val scored = docs.map { case (id, txt) =>
      val toks = txt.toLowerCase.split(" ", -1)
      val h = toks.length / 2
      val tf1 = toks.take(h).count(_ == term).toLong
      val rel = if (toks.drop(h).contains(term)) 1L else 0L
      (id, tf1, rel)
    }
    val top = scored.filter(_._2 > 0).sortBy(r => (-r._2, r._1))
      .take(text.TextOps.RET_K).zipWithIndex
      .map { case ((id, tf1, rel), i) => (id, rel, i + 1L) }
    val expDcg = top.map { case (_, rel, r) => rel * disc(r) }.sum
    val nRel = scored.map(_._3).sum
    val expIdcg = (1L to math.min(nRel, text.TextOps.RET_K.toLong))
      .map(disc).sum
    val got = rows.find(_._1 == term).get
    assert(got._6 == expDcg, s"dcg ${got._6} != $expDcg")
    assert(got._7 == expIdcg, s"idcg ${got._7} != $expIdcg")
    val expFrr = top.find(_._2 == 1).map(_._3).getOrElse(0L)
    assert(got._4 == expFrr)
  }

  test("q258 privacy audit: mass conserved, l and t bounded, exact TVD") {
    val rows = ops.StatShapes.q258LDiversity(spark, TestSpark.SF)
      .select("nat", "band", "k_rows", "l_distinct", "tvd_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    val cust = Tables.customer(spark, TestSpark.SF)
      .select(col("c_nationkey").cast("long"),
        expr("(cast(c_acctbal * 100 as bigint) + 100000L) div 100000L"),
        col("c_mktsegment")).as[(Long, Long, String)].collect()
    assert(rows.map(_._3).sum == cust.length)
    val nSeg = cust.map(_._3).distinct.length
    rows.foreach { case (nat, band, k, l, tvd) =>
      assert(k >= 1 && l >= 1 && l <= math.min(k, nSeg), s"($nat,$band)")
      assert(tvd >= 0 && tvd <= 1000000, s"($nat,$band) tvd=$tvd")
      // an l=1 class concentrates all mass on one segment: its TVD is
      // 1 - m_v/N, necessarily large on a ~5-way-balanced global dist
      if (l == 1) assert(tvd > 500000, s"($nat,$band) l=1 but tvd=$tvd")
    }
    // exact TVD recompute for the largest class
    val (nat, band, k, _, tvd) = rows.maxBy(_._3)
    val n = cust.length.toLong
    val global = cust.groupBy(_._3).map { case (s0, g) => s0 -> g.length.toLong }
    val inCls = cust.filter(c => c._1 == nat && c._2 == band)
      .groupBy(_._3).map { case (s0, g) => s0 -> g.length.toLong }
    val num = global.map { case (s0, mv) =>
      (BigInt(inCls.getOrElse(s0, 0L)) * n - BigInt(mv) * k).abs
    }.sum
    assert(BigInt(tvd) == num * 1000000 / (2 * BigInt(k) * n))
  }

  test("q259 Heaps fit: sublinear growth, totals match exact recounts") {
    val rows = text.CorpusSignals.q259HeapsFit(spark, TestSpark.SF)
      .select("source", "n_docs", "n_tokens", "vocab", "beta_micro")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.SF)
      .select("source", "text").as[(String, String)].collect()
    rows.foreach { case (src, nDocs, nToks, vocab, beta) =>
      val g = docs.filter(_._1 == src)
      assert(nDocs == g.length, s"$src n_docs")
      val toks = g.flatMap(_._2.split(" ", -1))
      assert(nToks == toks.length, s"$src n_tokens")
      assert(vocab == toks.distinct.length, s"$src vocab")
      assert(vocab <= nToks)
      // Heaps' law: sublinear, non-negative. This fixture's ~100-word
      // global vocabulary saturates within a few documents, so β can
      // legitimately truncate to 0 at sf0.001 — assert the bound, not
      // a natural-corpus interior value.
      assert(beta >= 0 && beta < 1000000, s"$src beta_micro=$beta")
    }
  }

  test("q260 top-k overlap: intersections monotone in k, bounded") {
    val rows = text.CorpusSignals.q260TopkOverlap(spark, TestSpark.SF)
      .select("source", "k", "n_src", "inter", "jaccard_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    val bySrc = rows.groupBy(_._1)
    bySrc.foreach { case (src, g) =>
      assert(g.map(_._2).sorted.toSeq ==
        text.CorpusSignals.RBO_KS.map(_.toLong), s"$src depths")
      g.foreach { case (_, k, nSrc, inter, j) =>
        // a source's head list is min(k, |vocab|) long — this tiny
        // fixture's sources have fewer than 50 types
        assert(nSrc >= 1 && nSrc <= k, s"$src@$k n_src=$nSrc")
        assert(inter >= 0 && inter <= math.min(nSrc, k), s"$src@$k inter")
        assert(j >= 0 && j <= 1000000, s"$src@$k jaccard")
      }
      // A_10 ⊆ A_50 and B_10 ⊆ B_50 ⇒ |A_k ∩ B_k| nondecreasing in k
      val byK = g.sortBy(_._2).map(_._4)
      assert(byK.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        s"$src intersections not monotone: ${byK.toSeq}")
    }
  }

  test("q261 Fano: shared span, mass conserved, exact for one type") {
    val rows = ops.Analytics.q261FanoBurstiness(spark, TestSpark.SF)
      .select("event_type", "n_buckets", "n_events", "mean_milli",
        "fano_milli")
      .as[(String, Long, Long, Long, Long)].collect()
    val ev = Tables.events(spark, TestSpark.SF)
      .select(col("event_type"), col("ts")).as[(String, Long)].collect()
    assert(rows.map(_._3).sum == ev.length)
    // zero-fill uses ONE global span: every type sees the same buckets
    assert(rows.map(_._2).distinct.length == 1)
    val hours = ev.map(e => e._2 / ops.Analytics.FANO_BIN_NS)
    assert(rows.head._2 == hours.max - hours.min + 1)
    // exact recompute for the first type
    val (et, nB, nE, mean, fano) = rows.head
    val mine = ev.filter(_._1 == et).map(_._2 / ops.Analytics.FANO_BIN_NS)
    val counts = (hours.min to hours.max).map(h =>
      mine.count(_ == h).toLong)
    val sx = counts.sum; val sxx = counts.map(x => BigInt(x) * x).sum
    assert(nE == sx)
    assert(mean == sx * 1000 / nB)
    assert(BigInt(fano) ==
      (BigInt(nB) * sxx - BigInt(sx) * sx) * 1000 / (BigInt(nB) * sx))
  }

  test("q262 uncertainty batch: margins are the global minimum set") {
    val sel = text.TrainingSet.q262UncertaintySample(spark, TestSpark.SF)
      .select("doc_id", "y", "score", "margin")
      .as[(Long, Long, Long, Long)].collect()
    assert(sel.length == text.TrainingSet.UNC_K)
    sel.foreach { case (_, y, score, margin) =>
      assert(margin == math.abs(score))
      assert(y == 1L || y == -1L)
    }
    // the batch is sorted by (margin, doc_id) and its ceiling bounds
    // every unselected doc: recompute all margins from the final q216
    // weights and compare the k-smallest set
    val wRow = text.TrainingSet.q216PerceptronQuality(spark, TestSpark.SF)
      .orderBy(desc("round")).limit(1)
      .select("w0", "w1", "w2", "w3").as[(Long, Long, Long, Long)]
      .collect().head
    val all = Tables.documents(spark, TestSpark.SF)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, txt) =>
        val toks = txt.split(" ", -1)
        val x = Array(1L, toks.length.toLong, toks.distinct.length.toLong,
          toks.count(Set("the", "a", "of", "and")).toLong)
        val score = wRow._1 * x(0) + wRow._2 * x(1) + wRow._3 * x(2) +
          wRow._4 * x(3)
        (id, math.abs(score))
      }
    val expect = all.sortBy(r => (r._2, r._1)).take(text.TrainingSet.UNC_K)
      .map(_._1).toSet
    assert(sel.map(_._1).toSet == expect, "selected set != exact k-min set")
  }

  test("q263 Mann-Whitney: U identities and CLES anti-symmetry mass") {
    val rows = text.CorpusSignals.q263MannWhitney(spark, TestSpark.SF)
      .select("source", "n1", "n2", "u2", "cles_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    val n = Tables.documents(spark, TestSpark.SF).count()
    rows.foreach { case (src, n1, n2, u2, cles) =>
      assert(n1 + n2 == n, s"$src partition")
      // 0 <= U <= n1*n2, in 2x units
      assert(u2 >= 0 && u2 <= 2 * n1 * n2, s"$src u2=$u2")
      assert(cles >= 0 && cles <= 1000000, s"$src cles=$cles")
      assert(cles == BigInt(u2) * 1000000 / (2 * BigInt(n1) * n2))
    }
    // exact recompute for one source with midranks
    val docs = Tables.documents(spark, TestSpark.SF)
      .select("source", "n_chars").as[(String, Long)].collect()
    val src = rows.head._1
    val sorted = docs.map(_._2).sorted
    def midrank2(x: Long) = {
      val lt = sorted.count(_ < x).toLong
      val eq = sorted.count(_ == x).toLong
      2 * lt + eq + 1
    }
    val mine = docs.filter(_._1 == src).map(_._2)
    val r2 = mine.map(midrank2).sum
    val expU2 = r2 - mine.length.toLong * (mine.length + 1)
    assert(rows.head._4 == expU2, s"u2 ${rows.head._4} != $expU2")
  }

  test("q264 dedup bias: role masses reconcile with q76's clusters") {
    val rows = text.DedupCluster.q264DedupBias(spark, TestSpark.SF)
      .select("source", "role", "n_docs", "n_tokens", "mean_quality_micro")
      .as[(String, String, Long, Long, Long)].collect()
    val nDocs = Tables.documents(spark, TestSpark.SF).count()
    assert(rows.map(_._3).sum == nDocs, "every doc has exactly one role")
    // keepers must equal the number of distinct q76 clusters
    val comp = text.DedupCluster.q76DedupComponents(spark, TestSpark.SF)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    val nKeepers = comp.map(_._2).distinct.length
    assert(rows.filter(_._2 == "keeper").map(_._3).sum == nKeepers)
    rows.foreach { case (src, role, n, toks, q) =>
      assert(n >= 1 && toks >= n, s"$src/$role")
      assert(q >= 0 && q <= 1000000, s"$src/$role quality=$q")
    }
  }

  test("q265 weekly profile: shares sum per type, peaks belong to cells") {
    val rows = ops.Analytics.q265WeeklyProfile(spark, TestSpark.SF)
      .select("event_type", "dow", "n_events", "share_ppm", "peak_hour",
        "peak_hour_n")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val ev = Tables.events(spark, TestSpark.SF)
      .select(col("event_type"), col("ts")).as[(String, Long)].collect()
    assert(rows.map(_._3).sum == ev.length)
    rows.groupBy(_._1).foreach { case (et, g) =>
      assert(g.map(_._2).sorted.toSeq == (0L to 6L), s"$et dows")
      // ppm shares sum to 1e6 within integer-division slack (< 7)
      val tot = g.map(_._4).sum
      assert(tot > 1000000 - 7 && tot <= 1000000, s"$et shares=$tot")
      g.foreach { case (_, dow, n, _, ph, phn) =>
        assert(ph >= 0 && ph <= 23 && phn >= 1 && phn <= n, s"$et/$dow")
        // exact recompute of the peak for this (type, dow)
        val cells = ev.filter(_._1 == et)
          .map(e => ((e._2 / 86400000000000L + 4) % 7,
            (e._2 / 3600000000000L) % 24))
          .filter(_._1 == dow).groupBy(_._2)
          .map { case (h, xs) => (h, xs.size.toLong) }
        val best = cells.toSeq.sortBy { case (h, c) => (-c, h) }.head
        assert((ph, phn) == best, s"$et/$dow peak $ph/$phn != $best")
      }
    }
  }

  test("q266 norm audit: mass conserved, fences bound the extremes") {
    val rows = sim.Similarity.q266NormAudit(spark, TestSpark.SF)
      .select("label", "n_vecs", "med2", "mad4", "min_n2", "max_n2",
        "n_outliers")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum ==
      Tables.embeddings(spark, TestSpark.SF).count())
    rows.foreach { case (l, n, med2, mad4, lo, hi, out) =>
      assert(lo <= med2 / 2 + 1 && med2 / 2 <= hi + 1, s"label $l median")
      assert(mad4 >= 0 && out >= 0 && out <= n, s"label $l")
      // if nothing is flagged, the extremes must sit inside the fence
      if (out == 0) {
        assert(math.abs(2 * lo - med2) * 2 <= 3 * mad4, s"label $l lo")
        assert(math.abs(2 * hi - med2) * 2 <= 3 * mad4, s"label $l hi")
      }
    }
  }

  test("q267 Good-Turing: ledger identities vs q259's exact recounts") {
    val rows = text.CorpusSignals.q267GoodTuring(spark, TestSpark.SF)
      .select("source", "n_tokens", "vocab", "n1", "n2", "gt_missing_ppm",
        "hapax_share_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val heaps = text.CorpusSignals.q259HeapsFit(spark, TestSpark.SF)
      .select("source", "n_tokens", "vocab").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (src, nTok, vocab, n1, n2, gt, hapax) =>
      // totals agree with the independently-derived growth-curve tails
      assert((nTok, vocab) == heaps(src), s"$src totals")
      assert(n1 + n2 <= vocab && n1 >= 0 && n2 >= 0, s"$src freq-of-freq")
      assert(gt == n1 * 1000000 / nTok && hapax == n1 * 1000000 / vocab)
      assert(gt <= 1000000 && hapax <= 1000000)
    }
  }

  test("q268 assortativity: bounded correlation, consistent masses") {
    val r = ops.Graph.q268Assortativity(spark, TestSpark.SF).collect().head
    val nE = r.getAs[Long]("n_edges"); val nV = r.getAs[Long]("n_vertices")
    val a = r.getAs[Long]("assort_milli")
    // symmetric edge list: even count, at least a vertex pair each
    assert(nE > 0 && nE % 2 == 0, s"n_edges=$nE")
    assert(nV >= 2 && nV <= nE, s"n_vertices=$nV")
    assert(a >= -1000 && a <= 1000, s"assort_milli=$a")
  }

  test("q269 bit bias: every bit present, shares consistent, unbiased-ish") {
    val rows = sim.Similarity.q269SketchBitBias(spark, TestSpark.SF)
      .select("bit", "n", "n_ones", "ones_ppm", "bias_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == (0L until 16L))
    val nEmb = Tables.embeddings(spark, TestSpark.SF).count()
    rows.foreach { case (b, n, ones, share, bias) =>
      assert(n == nEmb, s"bit $b n")
      assert(ones >= 0 && ones <= n)
      assert(share == ones * 1000000 / n)
      assert(bias == math.abs(2 * ones - n) * 1000000 / (2 * n))
      // md5-derived hyperplanes over this corpus: no bit should be
      // degenerate (all-zero or all-one)
      assert(ones > 0 && ones < n, s"bit $b degenerate")
    }
  }

  test("q270 CUPED: panel masses, shared theta, exact driver recompute") {
    val rows = ops.Analytics.q270CupedUplift(spark, TestSpark.SF)
      .select("variant", "n_users", "sum_pre", "sum_post",
        "mean_post_milli", "theta_micro", "adj_mean_milli")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(0L, 1L))
    // both variants report the SAME pooled theta
    assert(rows.map(_._6).distinct.length == 1)
    // driver-side exact recompute of the whole estimator
    val ev = Tables.events(spark, TestSpark.SF)
      .select(col("user_id"), col("ts"),
        expr("cast(round(value * 100) as bigint)"))
      .as[(Long, Long, Long)].collect()
    val splitNs = ev.map(_._2).min +
      ops.Analytics.CUPED_PRE_DAYS * 86400000000000L
    val panel = ev.groupBy(_._1).map { case (u, g) =>
      val pre = g.filter(_._2 < splitNs).map(_._3).sum
      val post = g.filter(_._2 >= splitNs).map(_._3).sum
      val variant = BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes).take(2).map("%02x".format(_))
        .mkString, 16).toLong % 2
      (u, pre, post, variant)
    }.toSeq
    val n = panel.length.toLong
    val spre = panel.map(_._2).sum; val spost = panel.map(_._3).sum
    val spp = panel.map(r => BigInt(r._2) * r._3).sum
    val sp2 = panel.map(r => BigInt(r._2) * r._2).sum
    val theta = (n.toDouble * spp.toDouble - spre.toDouble * spost.toDouble) /
      (n.toDouble * sp2.toDouble - spre.toDouble * spre.toDouble)
    rows.foreach { case (v, nu, sp, spo, meanMilli, thetaMicro, adjMilli) =>
      val mine = panel.filter(_._4 == v)
      assert(nu == mine.length && sp == mine.map(_._2).sum
        && spo == mine.map(_._3).sum, s"variant $v panel")
      assert(meanMilli == math.round(spo.toDouble / nu * 10))
      assert(thetaMicro == math.round(theta * 1000000))
      val adj = spo.toDouble / nu -
        theta * (sp.toDouble / nu - spre.toDouble / n.toDouble)
      assert(adjMilli == math.round(adj * 10), s"variant $v adjusted")
    }
    assert(rows.map(_._2).sum == n)
  }

  test("q254 linkage: true links conserved across classes + blocking") {
    val rows = ops.Reconcile.q254RecordLinkage(spark, TestSpark.SF)
      .select("verdict", "n_pairs", "n_true", "precision_ppm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val nCust = Tables.customer(spark, TestSpark.SF).count()
    // conservation: every customer's true link is either found in some
    // class (blocking kept it) or lost because its block key corrupted
    val found = Seq("match", "possible", "nonmatch")
      .map(c => rows.get(c).map(_._3).getOrElse(0L)).sum
    val lost = rows("lost_by_blocking")._3
    assert(found + lost == nCust, s"found=$found lost=$lost n=$nCust")
    // the match class is precision-pure on this weight model: a +40
    // name agreement only happens for the true twin (names are unique)
    assert(rows("match")._4 == 1000000, "match class not pure")
    // nonmatch must contain no true links (its weight floor requires a
    // name disagreement AND balance disagreement, impossible for twins
    // whose jitter is within tolerance)
    assert(rows("nonmatch")._3 == 0, "true link classified nonmatch")
    rows.values.foreach { case (v, np, nt, ppm) =>
      assert(nt <= np && ppm == nt * 1000000 / np, s"$v census arithmetic")
    }
  }
}
