package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.VectorFunctions.cosine_sim

/** Approximate-nearest-neighbor surface over the `embeddings` table
  * (north star: similarity search over an Array[Float] column).
  *
  * q43 is the exact baseline: broadcast the (small) query set against the
  * full base — at cluster scale the base stays partitioned, queries are
  * broadcast, and the per-partition top-k is merged by the final window
  * (classic map-side top-k; no all-pairs shuffle).
  *
  * q44 is the scale path: random-hyperplane LSH bucketing — vectors are
  * hashed to sign-pattern buckets, search only touches the query's
  * bucket. Recall vs. the exact baseline is asserted in SimilaritySpec;
  * the bucketed query itself is rows-only checked (deterministic but not
  * SQL-expressible).
  */
object Similarity {

  val TOP_K = 5
  val N_QUERIES = 50

  /** q43: exact brute-force cosine top-k via the codegen'd
    * CosineSimilarity expression. Rounded to 6 dp before ranking so the
    * ordering is reproducible across engines. */
  def q43KnnBruteForce(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val base = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("sim"), col("nid"))
    broadcast(q).join(base, col("qid") =!= col("nid"))
      .withColumn("sim", round(cosine_sim(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TOP_K)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  val o43 = s"""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < $N_QUERIES),
    b AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv FROM embeddings),
    sims AS (
      SELECT qid, nid,
        ROUND(list_dot_product(qv, nv)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))),
          6) AS sim
      FROM q, b WHERE qid <> nid),
    ranked AS (
      SELECT qid, nid, sim,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
      FROM sims)
    SELECT qid, rank, nid, sim FROM ranked
    WHERE rank <= $TOP_K ORDER BY qid, rank"""

  // ---- q44: random-hyperplane LSH bucketing ----
  val N_PLANES = 4 // 16 buckets

  /** Deterministic Gaussian hyperplanes (seeded; java.util.Random's
    * algorithm is specified, so this is stable across JVMs). */
  lazy val planes: Seq[Array[Double]] = {
    val rnd = new java.util.Random(42L)
    Seq.fill(N_PLANES)(Array.fill(64)(rnd.nextGaussian()))
  }

  private def bucketCol(v: String): org.apache.spark.sql.Column =
    (0 until N_PLANES).map { p =>
      val dot = expr(
        s"""aggregate(zip_with($v, pl$p, (x, y) -> CAST(x AS DOUBLE) * y),
            0D, (acc, z) -> acc + z)""")
      when(dot >= 0, lit(1 << p)).otherwise(0)
    }.reduce(_ + _)

  /** q44: ANN restricted to the query's LSH bucket — the plan that holds
    * at 100 TB (bucket id is a shuffle key; each bucket is searched
    * independently). Rows-only checked; recall asserted in tests. */
  def q44KnnLshBucketed(s: SparkSession, d: String): DataFrame = {
    val withPlanes = planes.zipWithIndex.foldLeft(embeddings(s, d)) {
      case (df, (pl, i)) => df.withColumn(s"pl$i", typedLit(pl.toSeq))
    }
    val bucketed = withPlanes
      .withColumn("bucket", bucketCol("embedding"))
      .select(col("vec_id"), col("embedding"), col("bucket"))
    val q = bucketed.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket"))
    val base = bucketed
      .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("sim"), col("nid"))
    broadcast(q).join(base, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", round(cosine_sim(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TOP_K)
      .select(col("qid"), col("rank"), col("nid"), col("sim"), col("bucket"))
      .orderBy(col("qid"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_knn_bruteforce"  -> (q43KnnBruteForce _),
    "q44_knn_lsh_bucketed" -> (q44KnnLshBucketed _))

  val oracles: Map[String, String] = Map(
    "q43_knn_bruteforce" -> o43)
}
