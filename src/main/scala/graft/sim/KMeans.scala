package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dot_const

/** Distributed Lloyd's k-means over an `array<float>` embedding column —
  * the trainable half of the IVF index (q55's coarse quantizer).
  *
  * Shape per iteration (the classic train loop as DataFrame ops):
  *   assign: argmin over k codegen'd DotWithConst projections — row-local,
  *           centroids ride along as broadcast constants;
  *   update: posexplode(embedding) → groupBy(cell, dim) avg → collect
  *           k·dim cells to the driver (k rows of state — the
  *           train-then-broadcast pattern, not a data collect).
  *
  * Deterministic by construction: init is the first k vectors by id
  * (no RNG), ties in assignment break toward the lower cell id, and
  * the mean update uses one double sum per (cell, dim) whose input
  * order Spark's partial aggregation fixes only up to partitioning —
  * so assignments (integer argmins over well-separated projections)
  * are stable run-to-run even though centroid doubles may differ in
  * the last ulp. */
object KMeans {

  /** Squared-L2 argmin assignment: for unit-free argmin it is enough to
    * maximize 2·c·x − |c|² over centroids c (|x|² is constant per row).
    * Implemented as array_position(scores, array_max(scores)) rather
    * than greatest() over (score, cid) structs: the struct comparison
    * codegen emits one unsplittable method that blows the JVM's 64 KB
    * limit once several multi-centroid assignments share a projection
    * (q162 encodes 16 subspaces in one select), while the array scan
    * splits fine. Ties break toward the lower cell id in both forms
    * (first occurrence of the max). */
  def assignCol(cents: Seq[(Int, Array[Double])],
                v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val scores = array(cents.map { case (_, c) =>
      dot_const(v, c.map(_ * 2.0)) - lit(c.map(x => x * x).sum)
    }: _*)
    // 1-based first-max position → index into the cid list.
    element_at(lit(cents.map(_._1).toArray),
      array_position(scores, array_max(scores)).cast("int"))
  }

  /** One assignment pass: adds a `cell` column. */
  def assign(df: DataFrame, cents: Seq[(Int, Array[Double])],
             vecCol: String = "embedding"): DataFrame =
    df.withColumn("cell", assignCol(cents, col(vecCol)).cast("int"))

  /** Fit k centroids with `iters` Lloyd iterations. Returns
    * (cellId, centroid) pairs; empty cells keep their previous
    * centroid. */
  def fit(df: DataFrame, k: Int, iters: Int,
          vecCol: String = "embedding", idCol: String = "vec_id")
      : Seq[(Int, Array[Double])] = {
    var cents: Seq[(Int, Array[Double])] = df
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol), col(vecCol)).collect().toSeq
      .zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Number](1).map(_.doubleValue).toArray)
      }
    for (_ <- 1 to iters) {
      val updated = assign(df, cents, vecCol)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCell = updated.groupBy(_.getInt(0))
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val c = old.clone()
            rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
            (cid, c)
          case None => (cid, old) // empty cell: keep previous centroid
        }
      }
    }
    cents
  }

  /** Integer-exact Lloyd fit over `scale`-quantized coords (half-away
    * rounding — the ROUND both engines apply), driver-local on the
    * BOUNDED training sample: FIT_SAMPLE × dim longs ≈ 0.5 MB, the same
    * bounded-ledger class as the k×dim centroid collect the double fit
    * already does (an IVF quantizer trains on a sample by design — the
    * 100 TB corpus never participates). Exactness is the point: int64
    * sums are associative, so the fit is bit-identical across
    * partitionings and CPU counts, which is what lets the trained
    * centroids be frozen as DuckDB oracle literals (q55's hash-green
    * contract). Assignment maximizes 2·cq·xq − |cq|² (ties → lower cell,
    * matching TopCellsInt); the update is floorDiv(Σ xq, n) per dim;
    * empty cells keep their previous centroid. */
  def fitQuantized(df: DataFrame, k: Int, iters: Int, scale: Long,
                   vecCol: String = "embedding", idCol: String = "vec_id")
      : Seq[(Int, Array[Long])] = {
    val sample: Array[Array[Long]] = df
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val xs = r.getSeq[Number](1)
        val q = new Array[Long](xs.length)
        var i = 0
        while (i < q.length) {
          val v = xs(i).doubleValue * scale
          q(i) = (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
          i += 1
        }
        q
      }
    require(sample.length >= k, s"fit sample ${sample.length} < k=$k")
    val dim = sample(0).length
    var cents: Array[Array[Long]] = sample.take(k).map(_.clone())
    for (_ <- 1 to iters) {
      val bias = cents.map(c => c.map(v => v * v).sum)
      val sums = Array.fill(k)(new Array[Long](dim))
      val counts = new Array[Long](k)
      sample.foreach { x =>
        var best = 0
        var bestScore = Long.MinValue
        var ki = 0
        while (ki < k) {
          val c = cents(ki)
          var dot = 0L
          var i = 0
          while (i < dim) { dot += x(i) * c(i); i += 1 }
          val s = 2L * dot - bias(ki)
          if (s > bestScore) { bestScore = s; best = ki }
          ki += 1
        }
        counts(best) += 1
        val acc = sums(best)
        var i = 0
        while (i < dim) { acc(i) += x(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, ki) =>
        if (counts(ki) == 0) old
        else Array.tabulate(dim)(i => Math.floorDiv(sums(ki)(i), counts(ki)))
      }
    }
    cents.zipWithIndex.map { case (c, ki) => (ki, c) }.toSeq
  }

  /** Mean squared distance of each row to its assigned centroid —
    * the quantity Lloyd's iterations are guaranteed not to increase. */
  def inertia(df: DataFrame, cents: Seq[(Int, Array[Double])],
              vecCol: String = "embedding"): Double = {
    val assigned = assign(df, cents, vecCol)
    def term(c: Array[Double]) =
      -lit(2.0) * dot_const(col(vecCol), c) + lit(c.map(x => x * x).sum)
    val dist2 = cents.tail.foldLeft(
      when(col("cell") === cents.head._1, term(cents.head._2))) {
      case (acc, (cid, c)) => acc.when(col("cell") === cid, term(c))
    }
    val selfDot = graft.functions.VectorFunctions
      .dot_product(col(vecCol), col(vecCol))
    assigned.select(avg(selfDot + dist2)).head().getDouble(0)
  }
}
