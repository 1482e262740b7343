package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Reconcile

/** Snapshot reconciliation (q105), NOT IN null semantics (q106),
  * LATERAL top-k (q107), one-pass correlation matrix (q108), and
  * priority sampling (q109). */
class ReconcileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q105 bucket-pruned diff == direct full-outer diff") {
    // The oracle proves this cross-engine; this spec proves it within
    // Spark with the derived-snapshot code shared, so a future edit to
    // the derivation cannot silently diverge the two formulations.
    val viaB = Reconcile.q105SnapshotDiff(spark, TestSpark.SF)
      .as[(Long, String)].collect().toSet
    val direct = spark.sql(Reconcile.o105
      .replace("FROM orders", s"FROM parquet.`${TestSpark.SF}/orders.parquet`"))
      .as[(Long, String)].collect().toSet
    assert(viaB == direct && direct.nonEmpty)
    // All three change classes must be present for the test to mean much.
    assert(direct.map(_._2) == Set("added", "removed", "modified"))
  }

  test("q105 signature pass prunes buckets (reads only changed ones)") {
    val changed = Reconcile.changedBuckets(spark, TestSpark.SF).count()
    assert(changed > 0 && changed < Reconcile.DIFF_BUCKETS,
      s"expected partial pruning, got $changed/${Reconcile.DIFF_BUCKETS}")
  }

  test("q106 plans a null-aware anti join and drops NULL-probe rows") {
    val df = Reconcile.q106NotInNulls(spark, TestSpark.SF)
    // The NAAJ flag prints as the trailing boolean on the
    // BroadcastHashJoin line: "..., LeftAnti, BuildRight, true".
    val plan = df.queryExecution.executedPlan.toString
    assert("""LeftAnti, BuildRight, true""".r.findFirstIn(plan).isDefined,
      s"expected a null-aware (LeftAnti, BuildRight, true) join in:\n$plan")
    // Three-valued logic: every c_custkey % 7 == 0 row has a NULL probe
    // key and must be absent (NULL NOT IN (non-empty list) is NULL).
    val keys = df.as[(Long, String)].collect().map(_._1)
    assert(keys.nonEmpty && keys.forall(_ % 7 != 0))
  }

  test("q107 LATERAL top-3 == window-rank formulation") {
    val lateral = Reconcile.q107LateralTopk(spark, TestSpark.SF)
      .as[(String, Long, Double)].collect().toSet
    val nation = Tables.nation(spark, TestSpark.SF)
    val cust = Tables.customer(spark, TestSpark.SF)
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val windowed = cust.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_acctbal"))
      .as[(String, Long, Double)].collect().toSet
    assert(lateral == windowed && windowed.nonEmpty)
  }

  test("q108 exact-sum correlations match Spark's corr() builtin") {
    val li = Tables.lineitem(spark, TestSpark.SF)
    val ours = Reconcile.q108CorrMatrix(spark, TestSpark.SF)
      .as[(String, String, Long, Double)].collect()
      .map { case (x, y, _, c) => (x, y) -> c }.toMap
    val pairs = for {
      i <- Reconcile.CORR_COLS.indices
      j <- (i + 1) until Reconcile.CORR_COLS.size
    } yield (Reconcile.CORR_COLS(i), Reconcile.CORR_COLS(j))
    pairs.foreach { case (a, b) =>
      val ref = li.agg(corr(col(a), col(b))).as[Double].head()
      assert(math.abs(ours((a, b)) - ref) < 1e-6,
        s"corr($a,$b): ${ours((a, b))} vs builtin $ref")
    }
  }

  test("q110 grid is gapless and the fill matches the latest observation") {
    val out = graft.ops.Windows.q110ResampleFfill(spark, TestSpark.SF)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.nonEmpty && out.forall(r => !r._3.isNaN))
    // Per user: days form a contiguous range and the first day is observed
    // (no leading NULL for the fill to trip on).
    out.groupBy(_._1).foreach { case (_, rows) =>
      val days = rows.map(_._2).sorted
      assert(days.last - days.head + 1 == days.length, "grid has gaps")
      assert(rows.minBy(_._2)._4, "first grid day must be observed")
    }
    // Forward fill: every unobserved day's value equals the value of the
    // nearest preceding observed day.
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byDay = rows.sortBy(_._2)
      byDay.zipWithIndex.foreach { case ((_, _, v, obs), i) =>
        if (!obs) {
          val prevObs = byDay.take(i).reverse.find(_._4).get
          assert(v == prevObs._3, "fill must carry the last observation")
        }
      }
    }
  }

  test("q111 exact-sum z-scores match Spark's avg/stddev builtins") {
    val ev = Tables.events(spark, TestSpark.SF)
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    val ref = ev.join(stats, Seq("event_type"))
      .select(col("event_id"),
        ((col("value") - col("mu")) / col("sigma")).as("z"))
      .as[(Long, Double)].collect().toMap
    val ours = graft.ops.Cleaning.q111Zscore(spark, TestSpark.SF)
      .as[(Long, String, Double, Double)].collect()
    assert(ours.nonEmpty)
    ours.foreach { case (id, _, _, z) =>
      assert(math.abs(z - ref(id)) < 1e-5, s"event $id: $z vs ${ref(id)}")
    }
  }

  test("q112 merge(base, diff) reconstructs the target snapshot exactly") {
    val merged = Reconcile.q112MergeUpsert(spark, TestSpark.SF)
      .as[(Long, Long, String, Double)].collect().toSet
    val target = spark.sql(Reconcile.o112
      .replace("FROM orders", s"FROM parquet.`${TestSpark.SF}/orders.parquet`"))
      .as[(Long, Long, String, Double)].collect().toSet
    assert(merged == target && target.nonEmpty)
  }

  test("q113 skew metrics are internally consistent") {
    val rows = Reconcile.q113SkewReport(spark, TestSpark.SF)
      .as[(Long, Long, Double, Long, Double)].collect()
    assert(rows.length == 10)
    // skew_ratio = max/mean >= 1 by definition; shares descend with cnt
    // and each is <= the top share.
    assert(rows.forall(_._5 >= 1.0))
    val cnts = rows.map(_._2)
    assert(cnts.sorted.reverse.sameElements(cnts))
    assert(rows.map(_._3).forall(s => s > 0 && s <= rows.head._3))
  }

  test("q114 per-group sample is the per-language priority prefix") {
    val out = graft.text.TrainingSet.q114GroupSample(spark, TestSpark.SF)
      .as[(String, Long, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("lang"), col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long").as("w"))
      .withColumn("u",
        (expr("cast(conv(substr(md5(cast(doc_id as string)),1,8),16,10) as bigint)")
          + lit(1L)) / lit(4294967296.0))
      .withColumn("priority", col("w") / col("u"))
      .as[(String, Long, Long, Double, Double)].collect()
    val byLang = docs.groupBy(_._1)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val expectK = math.min(graft.text.TrainingSet.GROUP_K, byLang(lang).size)
      assert(rows.length == expectK, s"$lang: ${rows.length} != $expectK")
      val sampledIds = rows.map(_._3).toSet
      val (in, outOf) = byLang(lang).partition(r => sampledIds(r._2))
      if (outOf.nonEmpty)
        assert(in.map(_._5).min >= outOf.map(_._5).max,
          s"$lang sample is not a per-group priority prefix")
    }
  }

  test("q115 point-in-time features are leakage-free (== naive recompute)") {
    val orders = Tables.orders(spark, TestSpark.SF)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
    val byCust = orders.groupBy(_._2)
    val out = graft.ops.Windows.q115PitFeatures(spark, TestSpark.SF)
      .as[(Long, Long, Long, Double, Option[Long])].collect()
    assert(out.nonEmpty)
    out.foreach { case (ok, ck, nPrior, spendPrior, _) =>
      val me = orders.find(_._1 == ok).get
      // STRICTLY earlier in the (date, key) total order — the label row
      // must never contribute to its own feature.
      val prior = byCust(ck).filter(o =>
        o._3.getTime < me._3.getTime ||
          (o._3.getTime == me._3.getTime && o._1 < me._1))
      assert(nPrior == prior.length, s"order $ok n_prior")
      val expSpend = prior.map(o => BigDecimal(o._4).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(math.abs(spendPrior - expSpend) < 1e-9, s"order $ok spend")
    }
  }

  test("q116 chi-square drift matches a driver-side recompute") {
    val counts = Tables.documents(spark, TestSpark.SF)
      .groupBy(col("source"), col("lang")).count()
      .as[(String, String, Long)].collect()
    val langs = counts.map(_._2).distinct
    val bySrc = counts.groupBy(_._1).map { case (s0, rows) =>
      val tot = rows.map(_._3).sum.toDouble
      s0 -> langs.map(l =>
        l -> rows.find(_._2 == l).map(_._3).getOrElse(0L) / tot).toMap
    }
    val out = graft.text.CorpusStats.q116SourceDrift(spark, TestSpark.SF)
      .as[(String, String, Double)].collect()
    val srcs = bySrc.keys.toSeq.sorted
    assert(out.length == srcs.combinations(2).size)
    out.foreach { case (a, b, chi2) =>
      val exp = langs.map { l =>
        val (pa, pb) = (bySrc(a)(l), bySrc(b)(l))
        if (pa + pb > 0) (pa - pb) * (pa - pb) / (pa + pb) else 0.0
      }.sum
      assert(math.abs(chi2 - exp) < 1e-6, s"($a,$b): $chi2 vs $exp")
      assert(chi2 >= 0 && chi2 <= 2.0) // χ² symmetric form is bounded by 2
    }
  }

  test("q117 delta-merged aggregate == full recompute over the target") {
    val ivm = Reconcile.q117DeltaAgg(spark, TestSpark.SF)
      .as[(Long, Long, Double)].collect().toSet
    val full = spark.sql(Reconcile.o117
      .replace("FROM orders", s"FROM parquet.`${TestSpark.SF}/orders.parquet`"))
      .as[(Long, Long, Double)].collect().toSet
    assert(ivm == full && full.nonEmpty)
  }

  test("q109 sample satisfies the priority-prefix contract") {
    // Top-k by priority: the smallest sampled priority must be >= the
    // largest excluded priority — the sample is a prefix of the global
    // priority order, which is what makes it a valid priority sample.
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long").as("w"))
      .withColumn("u",
        (expr("cast(conv(substr(md5(cast(doc_id as string)),1,8),16,10) as bigint)")
          + lit(1L)) / lit(4294967296.0))
      .withColumn("priority", col("w") / col("u"))
    val sample = graft.text.TrainingSet.q109PrioritySample(spark, TestSpark.SF)
      .as[(Long, Long, Double)].collect()
    assert(sample.length == graft.text.TrainingSet.PRIORITY_K)
    val sampledIds = sample.map(_._1).toSet
    val minSampled = docs.filter(col("doc_id").isin(sampledIds.toSeq: _*))
      .agg(min(col("priority"))).as[Double].head()
    val maxExcluded = docs.filter(!col("doc_id").isin(sampledIds.toSeq: _*))
      .agg(max(col("priority"))).as[Double].head()
    assert(minSampled >= maxExcluded,
      s"sample is not a priority prefix: $minSampled < $maxExcluded")
    // Heavier docs should be overrepresented: the sample's mean weight
    // must exceed the corpus mean (the point of weighted sampling).
    val corpusMean = docs.agg(avg(col("w"))).as[Double].head()
    val sampleMean = sample.map(_._2).sum.toDouble / sample.length
    assert(sampleMean > corpusMean)
  }
}
