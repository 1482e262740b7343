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
