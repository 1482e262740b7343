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
  /** Half-away-from-zero rounding — the ROUND both engines apply (JVM
    * Math.round is half-toward-+∞, which differs at negative .5). */
  private[sim] def roundHalfAway(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  /** Fitted fixed-point PCA: the per-dimension truncated mean, the
    * max-norm top component (1e-6 scale), and the Rayleigh eigenvalue. */
  case class PcaModel(mean: Array[Long], v: Array[Long], lambda: Long)

  /** Fit cache, keyed per (application, dataset) — the train-once /
    * apply-many lifecycle (the BPE-merge / ANN-index stance): q217 IS
    * the training run, q218 applies the component. The fit is built
    * OUTSIDE the map lock (get/putIfAbsent — it runs a Spark job). */
  private val fitCache =
    new java.util.concurrent.ConcurrentHashMap[String, PcaModel]()

  private[graft] def fitPca(s: SparkSession, d: String): PcaModel = {
    val key = s"${s.sparkContext.applicationId}|$d|$PCA_DIM|$PCA_ITERS"
    val cached = fitCache.get(key)
    if (cached != null) return cached
    val fit = fitPcaUncached(s, d)
    val prev = fitCache.putIfAbsent(key, fit)
    if (prev != null) prev else fit
  }

  private def fitPcaUncached(s: SparkSession, d: String): PcaModel = {
    // ONE partition-wise pass accumulates the exact raw moments
    // (n, S_i = Σe6_i, P_ij = Σe6_i·e6_j) in tight JVM loops — a
    // Catalyst HOF outer-product expansion here costs 20M interpreted
    // lambda calls at sf0.1 (measured 4.1 s vs ~0.4 s for this shape),
    // and a separate mean pass would rescan the corpus. The centered
    // covariance then derives algebraically driver-side:
    //   C_ij = P_ij − m_i·S_j − m_j·S_i + n·m_i·m_j,  m = S div n
    // — EXACT integer identity, so the oracle's two-pass centered-sum
    // formulation produces bit-identical C. Only #partitions moment
    // blocks (D² + D + 1 longs each) leave the executors; int64
    // addition is associative/commutative, so the partition-order-free
    // reduction is exact.
    val moments = {
      import s.implicits._
      val dim = PCA_DIM
      embeddings(s, d).select(col("embedding")).as[Array[Float]]
        .mapPartitions { it =>
          val p = new Array[Long](dim * dim)
          val sums = new Array[Long](dim)
          val e = new Array[Long](dim)
          var n = 0L
          while (it.hasNext) {
            val x = it.next()
            require(x.length == dim, s"embedding dim ${x.length} != $dim")
            var i = 0
            while (i < dim) {
              e(i) = roundHalfAway(x(i).toDouble * PCA_SCALE)
              sums(i) += e(i)
              i += 1
            }
            i = 0
            while (i < dim) {
              val ei = e(i); val base = i * dim
              var j = 0
              while (j < dim) { p(base + j) += ei * e(j); j += 1 }
              i += 1
            }
            n += 1
          }
          Iterator.single((n, sums, p))
        }
        .collect()
    }
    val n = moments.map(_._1).sum
    require(n > 0, "empty embeddings table")
    val sums = Array.tabulate(PCA_DIM)(i => moments.map(_._2(i)).sum)
    val mean = sums.map(_ / n) // Long division truncates toward zero
    val cov = Array.tabulate(PCA_DIM, PCA_DIM) { (i, j) =>
      val pij = moments.map(_._3(i * PCA_DIM + j)).sum
      BigInt(pij) - BigInt(mean(i)) * sums(j) - BigInt(mean(j)) * sums(i) +
        BigInt(n) * mean(i) * mean(j)
    }
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
    PcaModel(mean, v.map(_.toLong), lambda)
  }

  def q217PcaPower(s: SparkSession, d: String): DataFrame = {
    val fit = fitPca(s, d)
    import s.implicits._
    (0 until PCA_DIM).map(i => (i.toLong, fit.v(i), fit.lambda))
      .toDF("dim", "v6", "lambda_e12")
      .orderBy(col("dim"))
  }

  // ---- q218: all-but-the-top embedding post-processing ----

  /** q218: remove the fitted top principal component from every
    * embedding (Mu et al. 2018, "All-but-the-Top" — the standard
    * post-processing that strips the dominant common direction so
    * cosine similarity stops being swamped by it; run before q44/q55/
    * q162 indexing). Per vector: center, project onto v, subtract —
    * all in exact integer arithmetic (the projection stays rational:
    * c' = (c·den − p·v) div den with den = vᵀv, computed in
    * decimal(38,0) since c·den overflows int64). Output is the exact
    * variance ledger per vector: ‖c‖², ‖c'‖², and the removed fraction
    * in ppm — the number that tells a pipeline how dominant the top
    * direction actually was, vector by vector.
    *
    * Scale shape: the fit comes from the cache (train-once/apply-many;
    * the training pass is q217's one-scan moment aggregate) and enters
    * the plan as LITERALS, so application is a pure row-local
    * projection — no join, no shuffle except the presentation sort.
    * Exactly how a 100 TB corpus applies a trained whitening: broadcast
    * the D+D²-sized model, map the rows. */
  def q218PcaWhiten(s: SparkSession, d: String): DataFrame = {
    val fit = fitPca(s, d)
    val den = fit.v.map(x => BigInt(x) * BigInt(x)).sum
    require(den > 0 && den <= BigInt(Long.MaxValue), s"bad vtv $den")
    val mArr = fit.mean.mkString("array(", ",", ")")
    val vArr = fit.v.mkString("array(", ",", ")")
    embeddings(s, d)
      .select(col("vec_id"),
        expr(s"transform(embedding, x -> cast(round(cast(x as double) * $PCA_SCALE) as bigint))")
          .as("e6"))
      .withColumn("c", expr(s"zip_with(e6, $mArr, (x, m) -> x - m)"))
      // projection coefficient c·v — fits int64 (|c| ≲ 2e6 · |v| ≤ 1e6 · D)
      .withColumn("p", expr(
        s"aggregate(zip_with(c, $vArr, (ci, vi) -> ci * vi), 0L, (a, x) -> a + x)"))
      // c'_i = (c_i·den − p·v_i) div den — c_i·den overflows int64, so the
      // numerator runs in decimal(38,0); div truncates toward zero in
      // both engines (Spark IntegralDivide, DuckDB //, BigInt /)
      .withColumn("c2", expr(
        s"zip_with(c, $vArr, (ci, vi) -> " +
          s"cast((cast(ci as decimal(38,0)) * $den - cast(p as decimal(38,0)) * vi) div $den as bigint))"))
      .select(col("vec_id"),
        expr("aggregate(c, 0L, (a, x) -> a + x * x)").as("norm2_before"),
        expr("aggregate(c2, 0L, (a, x) -> a + x * x)").as("norm2_after"))
      .withColumn("removed_ppm", expr(
        "case when norm2_before = 0 then 0L else " +
          "cast((cast(norm2_before - norm2_after as decimal(38,0)) * 1000000)" +
          " div norm2_before as bigint) end"))
      .orderBy(col("vec_id"))
  }

  /** The shared unrolled-fit CTE chain (quantize → mean → center →
    * covariance → PCA_ITERS max-norm power rounds, HUGEINT throughout),
    * consumed by o217 (reads the final v + Rayleigh) and o218 (applies
    * the projection) — both oracles RE-FIT from scratch, so a drift
    * anywhere in the Spark-side fixed-point pipeline (or the cached
    * driver-side BigInt loop) diverges. The bpeCtes precedent. */
  private def pcaCtes: String = {
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
    sb.toString
  }

  val o217: String = pcaCtes + s""",
    uf AS (SELECT cov.i AS i, CAST(SUM(cij * v.v) AS HUGEINT) AS u
           FROM cov JOIN v$PCA_ITERS v ON v.i = cov.j GROUP BY 1),
    ray AS (
      SELECT CAST(SUM(v.v * uf.u) // (SELECT SUM(v * v) FROM v$PCA_ITERS)
        AS BIGINT) AS lambda_e12
      FROM v$PCA_ITERS v JOIN uf USING (i))
    SELECT CAST(v.i AS BIGINT) AS dim, CAST(v.v AS BIGINT) AS v6, lambda_e12
    FROM v$PCA_ITERS v, ray ORDER BY dim"""

  val o218: String = pcaCtes + s""",
    den AS (SELECT SUM(v * v) AS den FROM v$PCA_ITERS),
    p AS (SELECT c.vec_id, CAST(SUM(c.c * v.v) AS HUGEINT) AS p
          FROM c JOIN v$PCA_ITERS v USING (i) GROUP BY c.vec_id),
    cp AS (SELECT c.vec_id, c.c AS c1,
             (CAST(c.c AS HUGEINT) * den - p.p * v.v) // den AS c2
           FROM c JOIN v$PCA_ITERS v USING (i) JOIN p USING (vec_id)
           CROSS JOIN den),
    led AS (SELECT vec_id,
             CAST(SUM(c1 * c1) AS BIGINT) AS norm2_before,
             CAST(SUM(c2 * c2) AS BIGINT) AS norm2_after
            FROM cp GROUP BY vec_id)
    SELECT vec_id, norm2_before, norm2_after,
      CAST(CASE WHEN norm2_before = 0 THEN 0
        ELSE (CAST(norm2_before - norm2_after AS HUGEINT) * 1000000)
             // norm2_before END AS BIGINT) AS removed_ppm
    FROM led ORDER BY vec_id"""

  // ---- q232: Johnson–Lindenstrauss projection distortion audit ----

  /** Target dimension for the ±1 random-sign projection (D=$PCA_DIM→16:
    * a 4× ANN-index compression). */
  val JL_K = 16

  /** Deterministic ±1 sign for matrix cell (i, j): parity of the first
    * hex digit of md5("i:j") — byte-identical to the oracle's
    * ('0x'||substr(md5(i||':'||j),1,1))::INT % 2. */
  private[graft] def jlSign(i: Int, j: Int): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((digest(0) >> 4) & 0x1) == 0) 1L else -1L
  }

  /** q232: JL random-projection audit — project every (1e-6-quantized)
    * embedding through a deterministic D×$JL_K ±1 sign matrix and
    * measure, over the disjoint (even, even+1) pair sample, the squared
    * -distance distortion ratio d²_proj·1e6 / (k·d²_orig) (E[ratio] = 1
    * for a sign matrix — the JL/Achlioptas guarantee). The output is
    * the distortion histogram (0.1-wide ratio buckets with counts and
    * integer mean ppm): the table that justifies shipping the 4×-
    * compressed index to ANN (q44/q55/q162) instead of full vectors.
    *
    * Scale shape: quantization + projection are ONE partition-local
    * JVM pass (the q217 HOF lesson — k·D multiply-adds per row in a
    * tight loop, signs materialized once per partition, never a nested
    * Catalyst lambda); the pair join is a single equi-join on the
    * derived pair key; distances are row-local zip_with folds over
    * 2(D+k) ints; the histogram is a bucket-count aggregate. Numerators
    * run in decimal(38,0) where d²·1e6 exceeds int64. */
  /** Quantized coords + JL projection per vector — the shared
    * (vec_id, c[D], y[JL_K]) frame q232 audits and q236's SRP-LSH
    * sketches from. One partition-local JVM pass; signs materialized
    * once per partition. */
  private[sim] def jlProjected(s: SparkSession, d: String): DataFrame =
    jlProjectFrame(embeddings(s, d)
      .select(col("vec_id"), expr(
        s"transform(embedding, x -> cast(round(cast(x as double) * $PCA_SCALE) as bigint))")
        .as("c")))

  /** JL-project any (vec_id, c: array<bigint>) frame — appends the
    * JL_K-value projection `y` in one partition-local JVM pass (signs
    * materialized per partition). */
  private[sim] def jlProjectFrame(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val D = PCA_DIM
    df.select(col("vec_id"), col("c")).as[(Long, Seq[Long])]
      .mapPartitions { it =>
        val signs = Array.tabulate(D, JL_K)((i, j) => jlSign(i, j))
        it.map { case (id, cs) =>
          val c = cs.toArray
          val y = Array.tabulate(JL_K) { j =>
            var a = 0L; var i = 0
            while (i < D) { a += signs(i)(j) * c(i); i += 1 }
            a
          }
          (id, c, y)
        }
      }.toDF("vec_id", "c", "y")
  }

  def q232JlAudit(s: SparkSession, d: String): DataFrame = {
    val proj = jlProjected(s, d)
    val a = proj.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("pair_id"), col("c").as("ca"),
        col("y").as("ya"))
    val b = proj.filter(col("vec_id") % 2 === 1)
      .select((col("vec_id") - 1).as("pair_id"), col("c").as("cb"),
        col("y").as("yb"))
    a.join(b, Seq("pair_id"))
      .withColumn("d2o", expr(
        "aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
      .withColumn("d2p", expr(
        "aggregate(zip_with(ya, yb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
      .withColumn("ratio_ppm", expr(
        s"""case when d2o = 0 then 0L
            else cast((cast(d2p as decimal(38,0)) * 1000000)
                 div (cast($JL_K as decimal(38,0)) * d2o) as bigint) end"""))
      .groupBy(expr("ratio_ppm div 100000").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(ratio_ppm) div count(1)").as("mean_ratio_ppm"))
      .orderBy(col("bucket"))
  }

  val o232 = s"""
    WITH e AS (
      SELECT vec_id, i,
        CAST(ROUND(CAST(embedding[i + 1] AS DOUBLE) * $PCA_SCALE) AS BIGINT) AS c
      FROM embeddings, unnest(range(0, $PCA_DIM)) u(i)),
    sg AS (
      SELECT i, j,
        CASE WHEN ('0x' || substr(md5(i || ':' || j), 1, 1))::INT % 2 = 0
          THEN 1 ELSE -1 END AS s
      FROM unnest(range(0, $PCA_DIM)) a(i), unnest(range(0, $JL_K)) b(j)),
    y AS (
      SELECT vec_id, j, CAST(SUM(s * c) AS BIGINT) AS y
      FROM e JOIN sg USING (i) GROUP BY 1, 2),
    d2o AS (
      SELECT a.vec_id AS pair_id, SUM((a.c - b.c) * (a.c - b.c)) AS d2o
      FROM e a JOIN e b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
      WHERE a.vec_id % 2 = 0 GROUP BY 1),
    d2p AS (
      SELECT a.vec_id AS pair_id, SUM((a.y - b.y) * (a.y - b.y)) AS d2p
      FROM y a JOIN y b ON b.vec_id = a.vec_id + 1 AND b.j = a.j
      WHERE a.vec_id % 2 = 0 GROUP BY 1),
    r AS (
      SELECT pair_id,
        CASE WHEN d2o = 0 THEN 0
          ELSE CAST((CAST(d2p AS HUGEINT) * 1000000) // ($JL_K * d2o)
               AS BIGINT) END AS ratio_ppm
      FROM d2o JOIN d2p USING (pair_id))
    SELECT ratio_ppm // 100000 AS bucket,
      CAST(COUNT(*) AS BIGINT) AS n_pairs,
      CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS mean_ratio_ppm
    FROM r GROUP BY 1 ORDER BY bucket"""

  // ---- q249: isotropy audit (before/after all-but-the-top) ----

  /** q249: embedding isotropy audit — mean squared norm and the mean
    * pairwise dot (over the disjoint even/odd pair sample) of the
    * CENTERED corpus, before and after removing the fitted top
    * component (the q218 whitening). The anisotropy share
    * sum_dot·1e6 div (n_pairs·mean_norm2) ≈ ‖μ-direction mass‖²/E‖c‖²
    * is the number Mu et al.'s all-but-the-top targets. On THIS corpus
    * the centered embeddings are already near-isotropic (sub-1% share,
    * both stages — the audit certifies it), and the ledger shows what
    * whitening does here: the norm mass drops by exactly the q218
    * removed share while the pairwise-dot share stays noise-level —
    * fit → apply → measure, closed loop. All exact: int64 norms/dots,
    * decimal(38,0) numerators, truncating division in both engines.
    *
    * Scale shape: centering and the projection enter as literals from
    * the cached fit (train-once/apply-many); per-vector norms are
    * row-local; the pair dot is one equi-join on the derived pair key;
    * the ledger is 2 rows. */
  def q249IsotropyAudit(s: SparkSession, d: String): DataFrame = {
    val fit = fitPca(s, d)
    val den = fit.v.map(x => BigInt(x) * BigInt(x)).sum
    require(den > 0 && den <= BigInt(Long.MaxValue), s"bad vtv $den")
    val mArr = fit.mean.mkString("array(", ",", ")")
    val vArr = fit.v.mkString("array(", ",", ")")
    val frames = embeddings(s, d)
      .select(col("vec_id"),
        expr(s"transform(embedding, x -> cast(round(cast(x as double) * $PCA_SCALE) as bigint))")
          .as("e6"))
      .withColumn("c", expr(s"zip_with(e6, $mArr, (x, m) -> x - m)"))
      .withColumn("p", expr(
        s"aggregate(zip_with(c, $vArr, (ci, vi) -> ci * vi), 0L, (a, x) -> a + x)"))
      .withColumn("c2", expr(
        s"zip_with(c, $vArr, (ci, vi) -> " +
          s"cast((cast(ci as decimal(38,0)) * $den - cast(p as decimal(38,0)) * vi) div $den as bigint))"))
      .select(col("vec_id"), col("c"), col("c2"))
    def stats(colName: String, tag: String): DataFrame = {
      val n2 = frames.select(col("vec_id"),
        expr(s"aggregate($colName, 0L, (a, x) -> a + x * x)").as("n2"),
        col(colName).as("v"))
      val a = n2.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("pk"), col("v").as("va"))
      val b = n2.filter(col("vec_id") % 2 === 1)
        .select((col("vec_id") - 1).as("pk"), col("v").as("vb"))
      val dots = a.join(b, Seq("pk"))
        .select(expr(
          "aggregate(zip_with(va, vb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("dot"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("dot")).as("sum_dot"))
      n2.agg(count(lit(1)).as("n_vecs"),
        expr("sum(n2) div count(1)").as("mean_norm2"))
        .crossJoin(broadcast(dots))
        .select(lit(tag).as("stage"), col("n_vecs"), col("n_pairs"),
          col("mean_norm2"), col("sum_dot"),
          expr("""cast((cast(sum_dot as decimal(38,0)) * 1000000)
                  div (cast(n_pairs as decimal(38,0)) * mean_norm2)
                  as bigint)""").as("aniso_ppm"))
    }
    stats("c", "centered").unionAll(stats("c2", "whitened"))
      .orderBy(col("stage"))
  }

  val o249: String = pcaCtes + s""",
    den AS (SELECT SUM(v * v) AS den FROM v$PCA_ITERS),
    p AS (SELECT c.vec_id, CAST(SUM(c.c * v.v) AS HUGEINT) AS p
          FROM c JOIN v$PCA_ITERS v USING (i) GROUP BY c.vec_id),
    cp AS (SELECT c.vec_id, c.i, c.c AS c1,
             CAST((CAST(c.c AS HUGEINT) * den - p.p * v.v) // den
               AS BIGINT) AS c2
           FROM c JOIN v$PCA_ITERS v USING (i) JOIN p USING (vec_id)
           CROSS JOIN den),
    nn AS (SELECT vec_id, SUM(c1 * c1) AS r, SUM(c2 * c2) AS w
           FROM cp GROUP BY 1),
    dots AS (
      SELECT SUM(a.c1 * b.c1) AS dr, SUM(a.c2 * b.c2) AS dw,
        COUNT(DISTINCT a.vec_id) AS n_pairs
      FROM cp a JOIN cp b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
      WHERE a.vec_id % 2 = 0),
    ms AS (SELECT COUNT(*) AS n_vecs, SUM(r) // COUNT(*) AS mr,
            SUM(w) // COUNT(*) AS mw FROM nn)
    SELECT stage, CAST(n_vecs AS BIGINT) AS n_vecs,
      CAST(n_pairs AS BIGINT) AS n_pairs,
      CAST(mn AS BIGINT) AS mean_norm2, CAST(sd AS BIGINT) AS sum_dot,
      CAST((CAST(sd AS HUGEINT) * 1000000)
        // (CAST(n_pairs AS HUGEINT) * mn) AS BIGINT) AS aniso_ppm
    FROM (
      SELECT 'centered' AS stage, n_vecs, n_pairs, mr AS mn, dr AS sd
      FROM ms, dots
      UNION ALL
      SELECT 'whitened', n_vecs, n_pairs, mw, dw FROM ms, dots)
    ORDER BY stage"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q217_pca_power"  -> (q217PcaPower _),
    "q218_pca_whiten" -> (q218PcaWhiten _),
    "q232_jl_audit"   -> (q232JlAudit _),
    "q249_isotropy_audit" -> (q249IsotropyAudit _))

  val oracles: Map[String, String] = Map(
    "q217_pca_power"  -> o217,
    "q218_pca_whiten" -> o218,
    "q232_jl_audit"   -> o232,
    "q249_isotropy_audit" -> o249)
}
