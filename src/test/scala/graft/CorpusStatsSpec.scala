package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.CorpusStats

/** Corpus statistics (q94 source-overlap matrix, q95 Misra–Gries). */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q94 overlap is bounded by the smaller span vocabulary") {
    val rows = CorpusStats.q94SourceOverlap(spark, TestSpark.SF)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    // recompute per-source vocab sizes independently (doc-level spans)
    val sizes = Tables.documents(spark, TestSpark.SF)
      .select(col("source"), explode(graft.functions.ShingleSet
        .shingle_set(col("text"), graft.text.Dedup.SPAN)).as("span"))
      .select(col("source"), md5(col("span")).as("h")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (a, b, shared, j) =>
      assert(a < b, "pairs must be canonically ordered")
      assert(shared >= 1 && shared <= math.min(sizes(a), sizes(b)))
      val expected = shared.toDouble / (sizes(a) + sizes(b) - shared)
      assert(math.abs(j - expected) < 1e-12, s"jaccard at ($a,$b)")
    }
  }

  test("q95 at registered capacity (no eviction) equals exact counts") {
    val exact = Tables.documents(spark, TestSpark.SF)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val sketch = CorpusStats.q95HeavyHitters(spark, TestSpark.SF)
      .as[(String, Long)].collect().toMap
    assert(sketch == exact && exact.size < CorpusStats.MG_CAPACITY)
  }

  test("q95 under-capacity sketch honors the N/(k+1) guarantee") {
    val k = 8
    val words = Tables.documents(spark, TestSpark.SF)
      .select(explode(split(col("text"), " ")).as("w"))
    val n = words.count()
    val exact = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val slack = n / (k + 1)
    // both parallelisms: merge order must not break the bound
    Seq(2, 32).foreach { parts =>
      val mg = udaf(new CorpusStats.MisraGries(k))
      val est = words.repartition(parts)
        .agg(mg(col("w")).as("s")).select(explode(col("s")))
        .as[(String, Long)].collect().toMap
      assert(est.size <= k)
      est.foreach { case (w, e) =>
        assert(e <= exact(w) && exact(w) - e <= slack,
          s"bound violated for $w at parts=$parts")
      }
      exact.foreach { case (w, c) =>
        if (c > slack)
          assert(est.contains(w), s"heavy word $w missing at parts=$parts")
      }
    }
  }

  test("q144 CMS: never underestimates, collides at width 8, partition-invariant") {
    import graft.text.CorpusStats
    val toks = Tables.documents(spark, TestSpark.SF)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("t"))
      .as[(String, Long)].collect().toMap
    def estimates(width: Int, parts: Int): Map[String, Long] = {
      val sk = CorpusStats.cmsSketch(toks.repartition(parts), 4, width)
      toks.distinct()
        .select(col("w"), explode(expr(
          s"transform(sequence(0, 3), i -> " +
            s"struct(i AS i, pmod(xxhash64(i, w), $width) AS h))")).as("c"))
        .select(col("w"), col("c.i").as("i"), col("c.h").as("h"))
        .join(sk, Seq("i", "h"))
        .groupBy(col("w")).agg(min(col("cnt")).as("est"))
        .as[(String, Long)].collect().toMap
    }
    // collision regime: universal lower bound holds, and width 8 with a
    // ~31-token vocabulary MUST collide somewhere (pigeonhole)
    val tight = estimates(8, 8)
    tight.foreach { case (w, e) =>
      assert(e >= exact(w), s"CMS underestimated $w: $e < ${exact(w)}") }
    assert(tight.exists { case (w, e) => e > exact(w) },
      "width-8 sketch reported no collision on a 31-token vocabulary")
    // estimates are a pure function of the data, not its partitioning
    assert(estimates(8, 3) == tight)
    // registered geometry: collision-free, exact
    val wide = estimates(CorpusStats.CMS_WIDTH, 8)
    wide.foreach { case (w, e) =>
      assert(e == exact(w), s"width-${CorpusStats.CMS_WIDTH} diverged on $w") }
  }

  test("q238 dataset card cross-checks against independent aggregates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val card = CorpusStats.q238DatasetCard(spark, TestSpark.SF)
      .as[(String, Long)].collect().toMap
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("text"), col("source"), col("lang"))
      .as[(String, String, String)].collect()
    assert(card("n_docs") == docs.length.toLong)
    val toks = docs.map(_._1.split(" ").length.toLong)
    assert(card("n_tokens") == toks.sum)
    assert(card("min_doc_tokens") == toks.min)
    assert(card("max_doc_tokens") == toks.max)
    assert(card("mean_doc_tokens") == toks.sum / toks.length)
    assert(card("vocab_size") ==
      docs.flatMap(_._1.split(" ")).distinct.length.toLong)
    assert(card("n_sources") == docs.map(_._2).distinct.length.toLong)
    assert(card("n_langs") == docs.map(_._3).distinct.length.toLong)
    assert(card("dup_doc_ppm") ==
      (docs.length - docs.map(_._1).distinct.length).toLong * 1000000L /
        docs.length)
    assert(card.keySet.size == 11)
  }
}
