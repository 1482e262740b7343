package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property checks for the stats/planning batch (q189–q193) beyond
  * registry smoke: OLS closed-form agreement with an independent Scala
  * recomputation, quota conservation (Σquota = budget exactly), chunk
  * plan tiling (full coverage, correct overlap, clamped tail), MAD
  * fence membership, and Benford share algebra. */
class StatShapesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q189 slope matches an independent BigInt recomputation") {
    val got = ops.StatShapes.q189OlsTrend(spark, TestSpark.SF)
      .select("n_name", "slope_micro", "icept_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val daily = Tables.orders(spark, TestSpark.SF)
      .join(Tables.customer(spark, TestSpark.SF),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, TestSpark.SF),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        datediff(col("o_orderdate"), lit(ops.StatShapes.OLS_EPOCH)).as("x"))
      .agg(sum((Tables.dec2(col("o_totalprice")) * 100).cast("long")).as("y"))
      .as[(String, Int, Long)].collect()
    assert(daily.nonEmpty)
    daily.groupBy(_._1).foreach { case (nat, pts) =>
      val n = BigInt(pts.length)
      val sx = BigInt(pts.map(_._2.toLong).sum)
      val sy = BigInt(pts.map(_._3).sum)
      val sxy = pts.map(p => BigInt(p._2) * p._3).sum
      val sxx = pts.map(p => BigInt(p._2) * p._2).sum
      val den = n * sxx - sx * sx
      val slope = (n * sxy - sx * sy) * 1000000 / den
      val icept = (sy * sxx - sx * sxy) * 1000000 / den
      assert(got(nat) == (slope.toLong, icept.toLong), s"nation $nat")
    }
  }

  test("q190 quotas sum EXACTLY to the budget and respect ordering") {
    val rows = text.ChunkPlan.q190QuotaAlloc(spark, TestSpark.SF)
      .select("source", "w", "quota").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == text.ChunkPlan.QUOTA_BUDGET)
    // proportionality sanity: every quota within 1 of the real share
    val tw = rows.map(_._2).sum
    rows.foreach { case (src, w, q) =>
      val exact = BigDecimal(w) * text.ChunkPlan.QUOTA_BUDGET / tw
      assert((BigDecimal(q) - exact).abs <= 1, s"$src: $q vs $exact")
    }
  }

  test("q221 temperature mix: exact budget, sqrt-weight shares, boost direction") {
    val rows = text.ChunkPlan.q221TemperatureMix(spark, TestSpark.SF)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == text.ChunkPlan.TEMP_BUDGET)
    // every quota within 1 of the exact sqrt-proportional share
    val w6 = rows.map { case (_, m, _, _) =>
      BigDecimal(math.sqrt(m.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }
    val tw = w6.sum
    rows.zip(w6).foreach { case ((src, _, q, _), w) =>
      val exact = BigDecimal(w) * text.ChunkPlan.TEMP_BUDGET / tw
      assert((BigDecimal(q) - exact).abs <= 1, s"$src: $q vs $exact")
    }
    // temperature upsamples below-average-mass sources and downsamples
    // above-average ones (α = 0.5 crosses 1.0 at the sqrt-mean point)
    val smallest = rows.minBy(_._2)
    val biggest = rows.maxBy(_._2)
    assert(smallest._4 >= biggest._4,
      s"boost must fall with mass: $smallest vs $biggest")
  }

  test("q191 chunks tile each doc: cover [0,n_tok), stride apart, clamped") {
    val rows = text.ChunkPlan.q191ChunkPlan(spark, TestSpark.SF)
      .select("doc_id", "n_tok", "n_chunks", "chunk_idx", "start_tok",
        "end_tok")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._4)
      val (nTok, nChunks) = (sorted.head._2, sorted.head._3)
      assert(sorted.length == nChunks && sorted.map(_._4).toSeq ==
        (0L until nChunks).toSeq, s"doc $id chunk idx gap")
      sorted.foreach { case (_, _, _, i, st, en) =>
        assert(st == i * text.ChunkPlan.CHUNK_S && en ==
          math.min(st + text.ChunkPlan.CHUNK_C, nTok) && en > st)
      }
      // full coverage: last chunk reaches the end; no earlier chunk does
      assert(sorted.last._6 == nTok)
      // a further chunk would add nothing (the plan is minimal)
      assert(nChunks * text.ChunkPlan.CHUNK_S >= nTok - text.ChunkPlan.CHUNK_C)
    }
  }

  test("q192 every group appears, outliers bounded by Chebyshev-ish sanity") {
    val rows = ops.StatShapes.q192MadOutliers(spark, TestSpark.SF)
      .select("o_orderpriority", "n", "n_outliers")
      .as[(String, Long, Long)].collect()
    val nPrio = Tables.orders(spark, TestSpark.SF)
      .select("o_orderpriority").distinct().count()
    assert(rows.length == nPrio, "a zero-outlier group was dropped")
    rows.foreach { case (p, n, o) =>
      assert(o >= 0 && o < n / 2, s"$p: $o of $n flagged — fence broken")
    }
  }

  test("q194 weighted median satisfies its defining inequality exactly") {
    val got = ops.StatShapes.q194WeightedMedian(spark, TestSpark.SF)
      .select("l_returnflag", "total_units", "wmedian_cents")
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val raw = Tables.lineitem(spark, TestSpark.SF)
      .select(col("l_returnflag"),
        (Tables.dec2(col("l_extendedprice")) * 100).cast("long").as("v"),
        Tables.dec2(col("l_quantity")).cast("long").as("w"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (flag, tw, m) =>
      val g = raw.filter(_._1 == flag)
      assert(g.map(_._3).sum == tw)
      val wLe = g.filter(_._2 <= m).map(_._3).sum  // W(≤ m)
      val wLt = g.filter(_._2 < m).map(_._3).sum   // W(< m)
      assert(2 * wLe >= tw, s"$flag: median too small")
      assert(2 * wLt < tw, s"$flag: a smaller value already qualifies")
    }
  }

  test("q195 the <absent> bucket is exactly the pre-evolution generation") {
    val rows = sources.SchemaEvolution.q195SchemaEvolution(spark, TestSpark.SF)
      .select("priority", "n_orders").as[(String, Long)].collect().toMap
    val o = Tables.orders(spark, TestSpark.SF)
    val n95 = o.filter(year(col("o_orderdate")) === 1995).count()
    val n96 = o.filter(year(col("o_orderdate")) === 1996).count()
    assert(rows("<absent>") == n95, "null-fill leaked outside the v1 slice")
    assert(rows.filterNot(_._1 == "<absent>").values.sum == n96)
  }

  test("q196 lift recomputes from raw postings; pairs ordered and supported") {
    val got = text.Cooccur.q196CooccurLift(spark, TestSpark.SF)
      .select("t1", "t2", "n_pair", "df1", "df2", "lift_micro")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val n = docs.length
    val postings = docs.map { case (id, t) => id -> t.split(" ").toSet }
    got.foreach { case (t1, t2, np, df1, df2, lift) =>
      assert(t1 < t2 && np >= text.Cooccur.MIN_SUPPORT)
      assert(df1 == postings.count(_._2.contains(t1)).toLong)
      assert(df2 == postings.count(_._2.contains(t2)).toLong)
      assert(np == postings.count(p => p._2.contains(t1) && p._2.contains(t2)))
      assert(lift ==
        (BigInt(np) * n * 1000000 / (BigInt(df1) * df2)).toLong)
    }
    assert(got.map(_._6).toSeq == got.map(_._6).sortBy(-_).toSeq)
  }

  test("q193 covers all 9 digits, shares sum to ~1e6, Benford consts frozen") {
    val rows = ops.StatShapes.q193BenfordAudit(spark, TestSpark.SF)
      .select("digit", "share_micro", "benford_micro", "dev_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == (1L to 9L).toSet)
    val sumShare = rows.map(_._2).sum
    assert(sumShare > 999990 && sumShare <= 1000000, s"Σshare=$sumShare")
    rows.foreach { case (dg, sh, bf, dv) =>
      assert(bf == ops.StatShapes.BENFORD_MICRO.toMap.apply(dg.toInt))
      assert(dv == sh - bf)
    }
  }

  test("q225 epoch shuffle: partition-total batches, distinct permutations") {
    val docs = Tables.documents(spark, TestSpark.SF).count()
    val rows = text.ChunkPlan.q225EpochShuffle(spark, TestSpark.SF)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == (1L to text.ChunkPlan.SHUFFLE_EPOCHS).toSet)
    byEpoch.foreach { case (e, bs) =>
      // every doc lands in exactly one batch; batches are consecutive,
      // full except the last
      assert(bs.map(_._3).sum == docs, s"epoch $e loses docs")
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until bs.length).toSeq)
      sorted.init.foreach(b =>
        assert(b._3 == text.ChunkPlan.BATCH_DOCS, s"short batch $b"))
    }
    // the keyed hash gives each epoch a DIFFERENT deterministic
    // permutation: first-batch id lists must differ across epochs
    val firstBatches = byEpoch.toSeq.sortBy(_._1)
      .map(_._2.minBy(_._2)._6)
    assert(firstBatches.distinct.size == firstBatches.size,
      "epochs produced identical orderings")
  }

  test("q227 k-anonymity: conservation, k-property, ladder mirror") {
    val K = ops.StatShapes.K_ANON
    val rows = Tables.t(spark, TestSpark.SF, "customer")
      .selectExpr("cast(c_nationkey as long)", "c_mktsegment",
        "(cast(c_acctbal * 100 as bigint) + 100000L) div 100000L")
      .as[(Long, String, Long)].collect()
    // driver-side ladder mirror
    val c0 = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ok0 = c0.filter(_._2 >= K).map { case ((n, s, b), c) =>
      (0L, n, s, b, c) }
    val c1 = c0.filter(_._2 < K).groupBy { case ((n, s, _), _) => (n, s) }
      .view.mapValues(_.values.sum).toMap
    val ok1 = c1.filter(_._2 >= K).map { case ((n, s), c) =>
      (1L, n, s, -1L, c) }
    val c2 = c1.filter(_._2 < K).groupBy(_._1._2)
      .view.mapValues(_.values.sum).toMap
    val ok2 = c2.filter(_._2 >= K).map { case (s, c) => (2L, -1L, s, -1L, c) }
    val supN = c2.filter(_._2 < K).values.sum
    val sup = if (supN > 0) Seq((3L, -1L, "*", -1L, supN)) else Seq()
    val expect = (ok0 ++ ok1 ++ ok2 ++ sup).toSeq
      .sortBy(r => (r._1, r._2, r._3, r._4))
    val got = ops.StatShapes.q227KAnonymity(spark, TestSpark.SF)
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(got == expect)
    // nothing lost: the ledger covers every customer row exactly once
    assert(got.map(_._5).sum == rows.length.toLong)
    // the k-contract: every RELEASED class (level <= 2) clears k
    assert(got.filter(_._1 <= 2).forall(_._5 >= K))
  }

  test("q231 novelty curve: first batch all-novel, vocabulary conserved") {
    val rows = text.ChunkPlan.q231NoveltyCurve(spark, TestSpark.SF)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // batch 0 has nothing before it: everything is novel
    assert(rows.head._4 == 1000000L)
    rows.foreach { case (_, dist, nov, ppm, cum) =>
      assert(nov <= dist && ppm <= 1000000L && cum <= 1000000L)
    }
    // every gram is attributed to exactly one first batch: the novel
    // counts sum to the vocabulary, so the cumulative share ends at 1
    assert(rows.last._5 == 1000000L)
    // cumulative share is non-decreasing
    rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b._5 >= a._5)
    }
  }

  test("q234 padding audit: conserved tokens, bucketing strictly cheaper") {
    val rows = text.ChunkPlan.q234PaddingAudit(spark, TestSpark.SF)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val sh = rows("shuffled")
    val lb = rows("length_bucketed")
    // both strategies batch the same corpus: same batch count, same
    // real token mass; padding only ever adds
    assert(sh._2 == lb._2 && sh._3 == lb._3)
    assert(sh._4 >= sh._3 && lb._4 >= lb._3)
    assert(sh._5 == (sh._4 - sh._3) * 1000000L / sh._4)
    // sorting by length can only tighten batch maxima: bucketed padding
    // is never worse, and on this length-diverse corpus strictly better
    assert(lb._4 < sh._4, s"bucketing did not reduce padding: $lb vs $sh")
  }
}
