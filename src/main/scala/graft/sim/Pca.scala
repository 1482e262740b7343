package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Fixed-point PCA via power iteration over the embedding corpus — the
  * dimensionality-reduction primitive an embedding pipeline runs before
  * IVF/PQ indexing (q55/q162) or for whitening/visualization.
  *
  * Everything that crosses the engine boundary is INTEGER: embeddings
  * quantize row-locally to 1e-6 fixed point, the mean and covariance are
  * exact int64 sums, and the power iteration renormalizes by max-|u|
  * with integer division (truncation toward zero — Spark `div`, Scala
  * BigInt `/` and DuckDB `//` all agree) instead of the L2 norm, so no
  * sqrt/float ever participates. Power iteration converges to the top
  * eigenvector under ANY per-round rescaling; the max-norm variant keeps
  * the whole k-round trace exact and hash-checkable, and the Rayleigh
  * quotient λ = (vᵀCv) div (vᵀv) comes out as one exact integer
  * division at the end.
  *
  * Scale shape: quantization and the D×D per-row outer product are
  * row-local (the pair expansion happens INSIDE each row and map-side
  * combines straight to D² = 4,096 keys — no self-join, no corpus-sized
  * shuffle beyond that one aggregate). The D²-entry covariance and the
  * k×D iteration are driver-side BigInt — bounded by the embedding
  * DIMENSION, never the corpus (the k-means/PQ-LUT precedent); at 100 TB
  * only the covariance aggregate grows, and its int64 partials hold to
  * ~10^12 rows at this quantization (decimal(38,0) swap-in beyond).
  */
object Pca {

  /** Embedding dimensionality (the dataset contract — asserted at run
    * time), fixed-point scale, and the iteration count. */
  val PCA_DIM = 64
  val PCA_SCALE = 1000000L
  val PCA_ITERS = 5

  /** q217: top principal component of the centered embedding corpus —
    * per-dimension eigenvector coordinates in 1e-6 fixed point (max-norm
    * scaled: the largest |coordinate| is exactly ±1e6) plus the Rayleigh
    * eigenvalue in (1e-6·x)² units, constant across rows. */
  def q217PcaPower(s: SparkSession, d: String): DataFrame = {
    val e6 = embeddings(s, d).select(
      expr(s"transform(embedding, x -> cast(round(cast(x as double) * $PCA_SCALE) as bigint))")
        .as("e6"))
    // D-row mean (exact truncating division), read once driver-side
    // (k-bounded) and injected back as an array LITERAL so centering
    // stays row-local with no join.
    val meanRows = e6
      .select(posexplode(col("e6")).as(Seq("i", "v")))
      .groupBy(col("i")).agg(expr("sum(v) div count(1)").as("m6"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(meanRows.size == PCA_DIM,
      s"embedding dim ${meanRows.size} != PCA_DIM $PCA_DIM")
    val meanLit = array((0 until PCA_DIM).map(i => lit(meanRows(i))): _*)
    // Row-local centered outer product → ONE map-side-combined aggregate
    // down to D² keys: the only corpus-sized work in the query.
    val covRows = e6
      .select(zip_with(col("e6"), meanLit, (x, m) => x - m).as("c"))
      .select(explode(expr(
        s"flatten(transform(sequence(0, ${PCA_DIM - 1}), i -> " +
          s"transform(sequence(0, ${PCA_DIM - 1}), j -> " +
          "named_struct('i', i, 'j', j, 'p', c[i] * c[j]))))")).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("cij"))
      .collect()
    val cov = Array.ofDim[BigInt](PCA_DIM, PCA_DIM)
    covRows.foreach(r => cov(r.getInt(0))(r.getInt(1)) = BigInt(r.getLong(2)))
    // Driver-side exact power iteration (D-bounded, never corpus-sized).
    var v = Array.tabulate(PCA_DIM)(i => if (i == 0) BigInt(PCA_SCALE) else BigInt(0))
    def matvec(x: Array[BigInt]): Array[BigInt] =
      Array.tabulate(PCA_DIM)(i =>
        (0 until PCA_DIM).map(j => cov(i)(j) * x(j)).sum)
    for (_ <- 1 to PCA_ITERS) {
      val u = matvec(v)
      val m = u.map(_.abs).max
      require(m > 0, "degenerate covariance: zero matvec in power iteration")
      v = u.map(ui => ui * PCA_SCALE / m) // BigInt / truncates toward zero
    }
    val u = matvec(v)
    val num = (0 until PCA_DIM).map(i => v(i) * u(i)).sum
    val den = (0 until PCA_DIM).map(i => v(i) * v(i)).sum
    val lambda = (num / den).toLong
    import s.implicits._
    (0 until PCA_DIM).map(i => (i.toLong, v(i).toLong, lambda))
      .toDF("dim", "v6", "lambda_e12")
      .orderBy(col("dim"))
  }

  /** Unrolled-iteration oracle: DuckDB re-derives the quantization, the
    * exact covariance, all PCA_ITERS max-norm power rounds and the
    * Rayleigh quotient in HUGEINT — a drift anywhere in the Spark-side
    * fixed-point pipeline (or the driver-side BigInt loop) diverges. */
  val o217: String = {
    val sb = new StringBuilder(s"""
    WITH e AS (
      SELECT vec_id, i,
        CAST(ROUND(CAST(embedding[i + 1] AS DOUBLE) * $PCA_SCALE) AS BIGINT) AS e6
      FROM embeddings, unnest(range(0, $PCA_DIM)) u(i)),
    m AS (SELECT i, CAST(SUM(e6) // COUNT(*) AS BIGINT) AS m6
          FROM e GROUP BY i),
    c AS (SELECT vec_id, e.i AS i, e6 - m6 AS c
          FROM e JOIN m USING (i)),
    cov AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.c * b.c) AS HUGEINT) AS cij
      FROM c a JOIN c b USING (vec_id) GROUP BY 1, 2),
    v0 AS (SELECT i, CAST(CASE WHEN i = 0 THEN $PCA_SCALE ELSE 0 END AS HUGEINT) AS v
           FROM m)""")
    for (r <- 1 to PCA_ITERS) {
      sb.append(s""",
    u$r AS (SELECT cov.i AS i, CAST(SUM(cij * v.v) AS HUGEINT) AS u
            FROM cov JOIN v${r - 1} v ON v.i = cov.j GROUP BY 1),
    n$r AS (SELECT MAX(ABS(u)) AS mx FROM u$r),
    v$r AS (SELECT i, (u * $PCA_SCALE) // mx AS v FROM u$r, n$r)""")
    }
    sb.append(s""",
    uf AS (SELECT cov.i AS i, CAST(SUM(cij * v.v) AS HUGEINT) AS u
           FROM cov JOIN v$PCA_ITERS v ON v.i = cov.j GROUP BY 1),
    ray AS (
      SELECT CAST(SUM(v.v * uf.u) // (SELECT SUM(v * v) FROM v$PCA_ITERS)
        AS BIGINT) AS lambda_e12
      FROM v$PCA_ITERS v JOIN uf USING (i))
    SELECT CAST(v.i AS BIGINT) AS dim, CAST(v.v AS BIGINT) AS v6, lambda_e12
    FROM v$PCA_ITERS v, ray ORDER BY dim""")
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q217_pca_power" -> (q217PcaPower _))

  val oracles: Map[String, String] = Map(
    "q217_pca_power" -> o217)
}
