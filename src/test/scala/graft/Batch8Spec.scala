package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property checks for the round-10 additions: Cohen's-kappa
  * identities (q271), permutation-test estimator physics (q272),
  * Simpson-audit partition laws (q273), dupe-inflation ledger
  * conservation (q274), and curriculum-schedule range/mass identities
  * (q275). */
class Batch8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q271 kappa: po/pe/kappa reproduce the exact integer identities") {
    val rows = text.TextOps.q271RaterKappa(spark, TestSpark.SF).collect()
    assert(rows.nonEmpty)
    // independent recount of the agreement numerator per source
    val direct = Tables.documents(spark, TestSpark.SF)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(text.TextOps.langGuess(col("text"))
          === text.TextOps.langVote(col("text")), 1L).otherwise(0L))
          .as("agree"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val n = r.getAs[Long]("n_docs"); val a = r.getAs[Long]("agree")
      assert(direct(src) == ((n, a)), s"$src: cm-ledger vs direct recount")
      assert(r.getAs[Long]("po_ppm") == a * 1000000L / n)
      val pe = r.getAs[Long]("pe_ppm"); val k = r.getAs[Long]("kappa_ppm")
      assert(pe >= 0 && pe <= 1000000, s"$src: pe=$pe")
      // kappa bounds: [-1e6, 1e6]; pe = 1 degenerates to 0 by contract
      assert(k >= -1000000 && k <= 1000000, s"$src: kappa=$k")
      if (pe == 1000000) assert(a == n && k == 0,
        s"$src: pe=1 must mean total one-class agreement, kappa 0")
      // perfect agreement with pe < 1 is exactly kappa = 1
      if (a == n && pe < 1000000) assert(k == 1000000, s"$src: kappa=$k")
    }
  }

  test("q272 permutation test: estimator identity and determinism") {
    val r1 = ops.Analytics.q272PermTest(spark, TestSpark.SF).collect().head
    assert(r1.getAs[Long]("n_perms") == ops.Analytics.PERM_K.toLong)
    val nGe = r1.getAs[Long]("n_ge")
    assert(nGe >= 0 && nGe <= ops.Analytics.PERM_K)
    // Phipson–Smyth add-one estimator, exact integer form
    assert(r1.getAs[Long]("p_value_ppm") ==
      (nGe + 1) * 1000000L / (ops.Analytics.PERM_K + 1))
    assert(r1.getAs[Long]("obs_diff_milli") >= 0)
    // md5 assignments are partitioning-independent: a repartitioned
    // rerun is bit-identical
    val r2 = ops.Analytics.q272PermTest(spark, TestSpark.SF).collect().head
    assert(r1 == r2)
  }

  test("q273 Simpson audit: partition law and flag threshold") {
    val rows = ops.Analytics.q273SimpsonFlip(spark, TestSpark.SF).collect()
    // all unordered segment pairs present exactly once
    val segs = rows.flatMap(r => Seq(r.getAs[String]("seg_a"),
      r.getAs[String]("seg_b"))).distinct.sorted
    assert(rows.length == segs.length * (segs.length - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("seg_a") < r.getAs[String]("seg_b"))
      val ns = r.getAs[Long]("n_strata")
      val agree = r.getAs[Long]("n_agree"); val flip = r.getAs[Long]("n_flip")
      val tied = r.getAs[Long]("n_tied")
      val pd = r.getAs[Long]("pooled_dir")
      assert(pd == 1L || pd == -1L || pd == 0L)
      // with a signed pooled direction, {agree, flip, tied} partition
      // the strata exactly
      if (pd != 0L) assert(agree + flip + tied == ns,
        s"${r.getAs[String]("seg_a")}/${r.getAs[String]("seg_b")}: " +
          s"$agree+$flip+$tied != $ns")
      assert(r.getAs[Boolean]("simpson_flag") == (flip * 2 > ns))
    }
  }

  test("q274 dupe inflation: conservation, ordering, share recompute") {
    val rows = text.DedupCluster.q274DupeInflation(spark, TestSpark.SF)
      .collect()
    assert(rows.nonEmpty)
    val corpusTok = Tables.documents(spark, TestSpark.SF)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    var prev = (Long.MaxValue, Long.MinValue) // (wasted desc, cluster asc)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i + 1)
      assert(r.getAs[Long]("cluster_size") >= 2)
      assert(r.getAs[Long]("n_sources") >= 1
        && r.getAs[Long]("n_sources") <= r.getAs[Long]("cluster_size"))
      val w = r.getAs[Long]("wasted_tokens")
      assert(w >= 0 && w < r.getAs[Long]("total_tokens"),
        "keeper must retain at least one token")
      val cid = r.getAs[Long]("cluster_id")
      assert(w < prev._1 || (w == prev._1 && cid > prev._2),
        s"rank ${i + 1} breaks (wasted desc, cluster_id asc) order")
      prev = (w, cid)
      assert(r.getAs[Long]("waste_share_ppm") ==
        (BigInt(w) * 1000000 / corpusTok).toLong)
    }
  }

  test("q275 curriculum: ranges partition the corpus, shares sum to ~1") {
    val rows = text.TrainingSet.q275CurriculumSchedule(spark, TestSpark.SF)
      .collect()
    val nDocs = Tables.documents(spark, TestSpark.SF).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val byPhase = rows.groupBy(_.getAs[Long]("phase")).toSeq.sortBy(_._1)
    var nextStart = 1L
    byPhase.foreach { case (ph, rs) =>
      val starts = rs.map(_.getAs[Long]("phase_start")).distinct
      val ends = rs.map(_.getAs[Long]("phase_end")).distinct
      assert(starts.length == 1 && ends.length == 1,
        s"phase $ph: inconsistent range")
      // phases tile [1, nDocs] contiguously in phase order
      assert(starts.head == nextStart, s"phase $ph starts at ${starts.head}")
      assert(ends.head - starts.head + 1 == rs.map(_.getAs[Long]("n_docs")).sum,
        s"phase $ph: range width != doc mass")
      nextStart = ends.head + 1
      // exact floor-division shares under-shoot by < 1 ppm each
      val share = rs.map(_.getAs[Long]("tok_share_ppm")).sum
      assert(share > 1000000 - rs.length && share <= 1000000,
        s"phase $ph: shares sum to $share")
    }
    assert(nextStart == nDocs + 1)
  }
}
