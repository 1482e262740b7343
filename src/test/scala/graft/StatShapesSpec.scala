package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property checks for the stats/planning batch (q189–q193) beyond
  * registry smoke: OLS closed-form agreement with an independent Scala
  * recomputation, quota conservation (Σquota = budget exactly), chunk
  * plan tiling (full coverage, correct overlap, clamped tail), MAD
  * fence membership, and Benford share algebra. */
class StatShapesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q189 slope matches an independent BigInt recomputation") {
    val got = ops.StatShapes.q189OlsTrend(spark, TestSpark.SF)
      .select("n_name", "slope_micro", "icept_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val daily = Tables.orders(spark, TestSpark.SF)
      .join(Tables.customer(spark, TestSpark.SF),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, TestSpark.SF),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        datediff(col("o_orderdate"), lit(ops.StatShapes.OLS_EPOCH)).as("x"))
      .agg(sum((Tables.dec2(col("o_totalprice")) * 100).cast("long")).as("y"))
      .as[(String, Int, Long)].collect()
    assert(daily.nonEmpty)
    daily.groupBy(_._1).foreach { case (nat, pts) =>
      val n = BigInt(pts.length)
      val sx = BigInt(pts.map(_._2.toLong).sum)
      val sy = BigInt(pts.map(_._3).sum)
      val sxy = pts.map(p => BigInt(p._2) * p._3).sum
      val sxx = pts.map(p => BigInt(p._2) * p._2).sum
      val den = n * sxx - sx * sx
      val slope = (n * sxy - sx * sy) * 1000000 / den
      val icept = (sy * sxx - sx * sxy) * 1000000 / den
      assert(got(nat) == (slope.toLong, icept.toLong), s"nation $nat")
    }
  }

  test("q190 quotas sum EXACTLY to the budget and respect ordering") {
    val rows = text.ChunkPlan.q190QuotaAlloc(spark, TestSpark.SF)
      .select("source", "w", "quota").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == text.ChunkPlan.QUOTA_BUDGET)
    // proportionality sanity: every quota within 1 of the real share
    val tw = rows.map(_._2).sum
    rows.foreach { case (src, w, q) =>
      val exact = BigDecimal(w) * text.ChunkPlan.QUOTA_BUDGET / tw
      assert((BigDecimal(q) - exact).abs <= 1, s"$src: $q vs $exact")
    }
  }

  test("q191 chunks tile each doc: cover [0,n_tok), stride apart, clamped") {
    val rows = text.ChunkPlan.q191ChunkPlan(spark, TestSpark.SF)
      .select("doc_id", "n_tok", "n_chunks", "chunk_idx", "start_tok",
        "end_tok")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._4)
      val (nTok, nChunks) = (sorted.head._2, sorted.head._3)
      assert(sorted.length == nChunks && sorted.map(_._4).toSeq ==
        (0L until nChunks).toSeq, s"doc $id chunk idx gap")
      sorted.foreach { case (_, _, _, i, st, en) =>
        assert(st == i * text.ChunkPlan.CHUNK_S && en ==
          math.min(st + text.ChunkPlan.CHUNK_C, nTok) && en > st)
      }
      // full coverage: last chunk reaches the end; no earlier chunk does
      assert(sorted.last._6 == nTok)
      // a further chunk would add nothing (the plan is minimal)
      assert(nChunks * text.ChunkPlan.CHUNK_S >= nTok - text.ChunkPlan.CHUNK_C)
    }
  }

  test("q192 every group appears, outliers bounded by Chebyshev-ish sanity") {
    val rows = ops.StatShapes.q192MadOutliers(spark, TestSpark.SF)
      .select("o_orderpriority", "n", "n_outliers")
      .as[(String, Long, Long)].collect()
    val nPrio = Tables.orders(spark, TestSpark.SF)
      .select("o_orderpriority").distinct().count()
    assert(rows.length == nPrio, "a zero-outlier group was dropped")
    rows.foreach { case (p, n, o) =>
      assert(o >= 0 && o < n / 2, s"$p: $o of $n flagged — fence broken")
    }
  }

  test("q193 covers all 9 digits, shares sum to ~1e6, Benford consts frozen") {
    val rows = ops.StatShapes.q193BenfordAudit(spark, TestSpark.SF)
      .select("digit", "share_micro", "benford_micro", "dev_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == (1L to 9L).toSet)
    val sumShare = rows.map(_._2).sum
    assert(sumShare > 999990 && sumShare <= 1000000, s"Σshare=$sumShare")
    rows.foreach { case (dg, sh, bf, dv) =>
      assert(bf == ops.StatShapes.BENFORD_MICRO.toMap.apply(dg.toInt))
      assert(dv == sh - bf)
    }
  }
}
