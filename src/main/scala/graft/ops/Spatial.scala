package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Grid-binned spatial epsilon-join — the bounded-key candidate pattern
  * for "all pairs within distance r" over point data (station joins,
  * geo dedup, 2-D embedding neighborhoods).
  *
  * The naive formulation is an all-pairs distance filter (Θ(n²) rows
  * through a nested-loop join — a scale-killer). The operator bins
  * points into r×r grid cells and joins LEFT-side points, each exploded
  * to its 3×3 neighbor-cell keys, against RIGHT-side points on the cell
  * key: every true pair lands in exactly the candidate set of the left
  * point's neighborhood (|dx|,|dy| ≤ r ⇒ cells differ by ≤ 1 per
  * axis), so candidates shrink from n² to Σ_cell 9·|cell|² — an
  * equi-join on a bounded, data-density-determined key, shuffle-
  * partitionable like any other join. Coordinates and distances stay
  * in INT arithmetic (dist² vs r², no sqrt) so the result is exact and
  * engine-portable.
  *
  * Points are doc-keyed deterministic coordinates (x = 37·k mod 1000,
  * y = 91·k mod 1000 over part keys) — the driver corpus has no real
  * geo columns; the arithmetic derivation keeps the oracle able to
  * re-derive every point, which is the point of the gate.
  */
object Spatial {

  val GRID_R = 25L // radius; also the cell edge

  /** q169: all part-point pairs within GRID_R, via the 9-cell candidate
    * join; top-20 closest (ties → key order) plus the exact total pair
    * count so the limit hides nothing. */
  def q169GridNeighbors(s: SparkSession, d: String): DataFrame = {
    val r2 = GRID_R * GRID_R
    val pts = part(s, d).select(
      col("p_partkey").as("k"),
      (col("p_partkey") * 37 % 1000).as("x"),
      (col("p_partkey") * 91 % 1000).as("y"))
    val binned = pts
      .withColumn("cx", expr(s"x div $GRID_R"))
      .withColumn("cy", expr(s"y div $GRID_R"))
    // Left side: each point exploded to its 9 neighbor cells; right
    // side: points keyed by home cell only — each true pair is found
    // once from the left point's neighborhood.
    val offs = Seq(-1L, 0L, 1L)
    val left = binned.withColumn("nc", explode(array(
        (for (dx <- offs; dy <- offs) yield
          struct((col("cx") + dx).as("ccx"), (col("cy") + dy).as("ccy"))): _*)))
      .select(col("k").as("ka"), col("x").as("xa"), col("y").as("ya"),
        col("nc.ccx").as("cx"), col("nc.ccy").as("cy"))
    val right = binned.select(col("k").as("kb"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val pairs = left.join(right, Seq("cx", "cy"))
      .filter(col("ka") < col("kb"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r2)
      .select(col("ka"), col("kb"), col("dist2"))
    val total = pairs.agg(count(lit(1)).as("n_pairs"))
    pairs.crossJoin(broadcast(total))
      .orderBy(col("dist2"), col("ka"), col("kb"))
      .limit(20)
  }

  val o169 = s"""
    WITH pts AS (
      SELECT p_partkey AS k, p_partkey * 37 % 1000 AS x,
             p_partkey * 91 % 1000 AS y
      FROM part),
    pairs AS (
      SELECT a.k AS ka, b.k AS kb,
        (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      FROM pts a JOIN pts b ON a.k < b.k
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= ${GRID_R * GRID_R})
    SELECT ka, kb, dist2, (SELECT COUNT(*) FROM pairs) AS n_pairs
    FROM pairs ORDER BY dist2, ka, kb LIMIT 20"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q169_grid_neighbors" -> (q169GridNeighbors _))

  val oracles: Map[String, String] = Map(
    "q169_grid_neighbors" -> o169)
}
