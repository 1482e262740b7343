package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions.cosine_sim
import graft.sim.Similarity

/** Vector similarity: custom expression correctness + ANN recall. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CosineSimilarity matches hand computation and handles edge cases") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),          // orthogonal
      (Seq(1f, 2f), Seq(2f, 4f), 1.0),          // parallel
      (Seq(1f, 0f), Seq(1f, 1f), 1.0 / math.sqrt(2)),
      (Seq(0f, 0f), Seq(1f, 1f), 0.0)           // zero vector → 0 by convention
    ).toDF("a", "b", "expected")
    val got = df.select(cosine_sim(col("a"), col("b")).as("s"), col("expected"))
      .as[(Double, Double)].collect()
    got.foreach { case (s, e) => assert(math.abs(s - e) < 1e-12, s"$s vs $e") }
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.1f, 0.9f)))
      .toDF("a", "b")
    val viaExpr = df.select(cosine_sim(col("a"), col("b"))).as[Double].head()
    // reference computation in plain Scala (same accumulation order)
    val (a, b) = (Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.1f, 0.9f))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.zip(b).foreach { case (x, y) =>
      dot += x.toDouble * y.toDouble; na += x.toDouble * x.toDouble
      nb += y.toDouble * y.toDouble
    }
    assert(viaExpr == dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("LSH-bucketed ANN has bounded loss vs brute force (same bucket ⇒ same top-1)") {
    val bf = Similarity.q43KnnBruteForce(spark, TestSpark.SF)
      .filter(col("rank") === 1)
      .select("qid", "sim").as[(Long, Double)].collect().toMap
    val lsh = Similarity.q44KnnLshBucketed(spark, TestSpark.SF)
      .filter(col("rank") === 1)
      .select("qid", "sim").as[(Long, Double)].collect().toMap
    // every query answered, and bucketed top-1 never beats exact top-1
    assert(lsh.keySet.subsetOf(bf.keySet))
    lsh.foreach { case (q, s) => assert(s <= bf(q) + 1e-9) }
    // recall@1: fraction of queries whose candidate set contains the true
    // top-1 (multi-table LSH; this corpus has no planted near-dups, so the
    // top-1 angle is wide and recall is bounded by the table count)
    val recall = lsh.count { case (q, s) => math.abs(s - bf(q)) < 1e-9 }.toDouble / bf.size
    assert(recall >= 0.5, s"recall@1 $recall below multi-table expectation")
  }

  test("IVF-probed ANN: valid results and plausible recall vs brute force") {
    val bf = Similarity.q43KnnBruteForce(spark, TestSpark.SF)
      .filter(col("rank") === 1)
      .select("qid", "sim").as[(Long, Double)].collect().toMap
    val ivf = Similarity.q55KnnIvf(spark, TestSpark.SF)
      .filter(col("rank") === 1)
      .select("qid", "sim").as[(Long, Double)].collect().toMap
    assert(ivf.nonEmpty && ivf.keySet.subsetOf(bf.keySet))
    ivf.foreach { case (q, s) => assert(s <= bf(q) + 1e-9) }
    val recall = ivf.count { case (q, s) => math.abs(s - bf(q)) < 1e-9 }.toDouble / bf.size
    assert(recall >= 0.15, s"recall@1 $recall implausibly low for ${Similarity.N_PROBE}/${Similarity.N_CELLS} probes")
  }
}
