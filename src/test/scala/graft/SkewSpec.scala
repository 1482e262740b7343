package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Join-size estimation (q166): the histogram formula Σ cA(k)·cB(k)
  * must equal the ACTUAL join output cardinality — the whole point of
  * the operator is that the cheap per-key aggregate prices the join
  * exactly, not approximately. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q166 estimate == actual self-join cardinality, shares sum ≤ 1") {
    val d = TestSpark.SF
    val ev = graft.Tables.events(spark, d).select("user_id")
    val actual = ev.join(ev.withColumnRenamed("user_id", "u2"),
      col("user_id") === col("u2")).count()
    val rows = Skew.q166JoinSizeEst(spark, d)
      .select("user_id", "freq", "pairs_contrib", "est_total_rows", "share")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 5)
    rows.foreach { case (_, f, pc, est, share) =>
      assert(pc == f * f)
      assert(est == actual, s"estimated $est, actual join produced $actual")
      assert(math.abs(share - math.rint(pc.toDouble / est * 1e6) / 1e6) < 1e-12)
    }
    // top-5 shares are a partition of ≤ the whole
    assert(rows.map(_._5).sum <= 1.0 + 1e-9)
    // descending by contribution
    val pcs = rows.map(_._3)
    assert(pcs.zip(pcs.tail).forall { case (a, b) => a >= b })
  }

  test("q241 consistent hashing: moves only to the new node, beats modulo") {
    val rows = ops.Skew.q241ConsistentHash(spark, TestSpark.SF)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val docs = Tables.documents(spark, TestSpark.SF).count()
    // conservation under both ring sizes
    assert(rows.map(_._2).sum == docs && rows.map(_._3).sum == docs)
    assert(rows.map(_._5).sum == docs)
    val newNode = s"n${ops.Skew.CH_NODES}"
    rows.foreach { case (node, before, after, chGain, _, _) =>
      if (node == newNode) {
        assert(before == 0L && chGain == after,
          "everything on the new node must be a move")
      } else assert(chGain == 0L,
        s"consistent hashing moved docs to OLD node $node")
    }
    // movement: CH ~ 1/(N+1) of the corpus; modulo ~ N/(N+1). Assert
    // the directional contract, not the exact fractions.
    val chMoves = rows.map(_._4).sum
    val modMoves = rows.map(_._6).sum
    assert(chMoves > 0 && chMoves * 2 < docs, s"CH moved $chMoves of $docs")
    assert(modMoves > chMoves * 2, s"modulo ($modMoves) should dwarf CH ($chMoves)")
  }

  /** The runtime half of the skew story beside q57's manual salting:
    * AQE's OptimizeSkewedJoin must (a) actually FIRE on a hot-key join
    * (the executed plan carries the skew=true marker) and (b) return
    * exactly the rows the salted mitigation returns — proving the two
    * mitigations are interchangeable on semantics and the engine can
    * rely on AQE first, salting only when one key overwhelms even a
    * split partition (see docs/SCALE.md §Skew). */
  test("AQE skew-join fires on a hot key and matches the salted join") {
    // Dedicated session: the skew thresholds are session-wide SQLConf
    // and must not leak into other suites sharing the context.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    // hot key 0 carries 50k of 55k rows; 50 cold keys carry 100 each
    val big = s2.range(0, 55000).select(
      when(col("id") < 50000, 0L)
        .otherwise(pmod(col("id"), lit(50L)) + 1).as("k"),
      col("id").as("v"))
    val small = s2.range(0, 51).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    val plain = big.join(small, "k")
    val got = plain.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val plan = plain.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("skew=true"),
      "AQE did not mark the hot-key join skewed:\n" + plan.take(3000))
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "w").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.length == 55000 && (got sameElements salted),
      s"AQE rows ${got.length} vs salted ${salted.length}")
  }
}
