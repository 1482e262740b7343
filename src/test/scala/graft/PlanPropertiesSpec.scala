package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale-critical physical-plan
  * properties that bench numbers depend on, asserted as tests so a
  * regression fails CI instead of only showing up as a slow round.
  * (Counterpart of docs/PLANS.md, which records the full audit.) */
class PlanPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def executedPlan(df: DataFrame): String = {
    df.collect() // AQE-final plan only materializes on the same QueryExecution
    df.queryExecution.executedPlan.toString
  }

  test("q03: dimension build side stays broadcast (AQE once picked the fact side)") {
    val plan = executedPlan(
      ops.Relational.q03RevenueByNation(spark, TestSpark.SF))
    assert(plan.contains("BroadcastHashJoin"), s"broadcast pin lost:\n$plan")
  }

  test("q19: parquet filter pushdown reaches the scan") {
    val plan = ops.Cleaning.queries("q19_postcode")(spark, TestSpark.SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"),
      s"no pushed filters in scan:\n$plan")
  }

  test("q40: postings shuffle keeps its explicit partition count (AQE-coalesce exempt)") {
    // REPARTITION_BY_NUM must survive into the plan — if the explicit
    // repartition(N, sg) is ever dropped, AQE coalesces the tiny-bytes
    // postings shuffle to 1 partition and serializes the quadratic
    // output stage (measured 4.6s vs 0.9s).
    val df = text.Dedup.q40NgramJaccard(spark, TestSpark.SF)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"explicit repartition gone from q40:\n$plan")
  }

  test("q47: block-pair join is an equi-join, never a nested loop") {
    val plan = executedPlan(sim.Similarity.q47EmbedNearDup(spark, TestSpark.SF))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q47 degenerated to a nested loop:\n$plan")
  }

  test("q82: fact scan carries a dynamicpruning partition filter") {
    val df = sources.PartitionedScan.queries("q82_dynamic_pruning")(spark, TestSpark.SF)
    val plan = executedPlan(df)
    assert(plan.contains("dynamicpruning"),
      s"join-driven partition pruning did not plan:\n${plan.take(3000)}")
  }

  test("q134: bucketed join is a SortMergeJoin with no exchange on either join key") {
    val df = sources.PartitionedScan.queries("q134_bucketed_join")(spark, TestSpark.SF)
    val plan = executedPlan(df)
    assert(plan.contains("SortMergeJoin"),
      s"expected SortMergeJoin over bucketed tables:\n${plan.take(3000)}")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey")
        && !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed layout must satisfy the join distribution (no key exchange):\n${plan.take(3000)}")
  }

  test("q65: bloom probe is the native might_contain expression, not a Scala udf") {
    val df = ops.Relational.queries("q65_bloom_join")(spark, TestSpark.SF)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"native bloom probe missing:\n${plan.take(2000)}")
    assert(!plan.contains("ScalaUDF"), "q65 must not probe through a udf")
  }

  test("q06: top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = ops.Relational.queries("q06_top_brands")(spark, TestSpark.SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k full-sorts:\n$plan")
  }

  test("q27: per-group top-k keeps the partial WindowGroupLimit below the exchange") {
    val plan = executedPlan(ops.Windows.queries("q27_window_rank")(spark, TestSpark.SF))
    assert(plan.contains("WindowGroupLimit"), s"window limit pushdown lost:\n$plan")
  }

  test("q143: date filter is pushed into the sorted-layout scan") {
    val plan = sources.PartitionedScan.queries("q143_sorted_scan")(spark, TestSpark.SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)")
        || plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"no pushed date filter on sorted scan:\n${plan.take(2000)}")
  }

  test("no graded plan contains a CartesianProduct node") {
    // Standing tripwire over the WHOLE registry: every intentional
    // cross join in the codebase is broadcast(tiny), which plans as
    // BroadcastNestedLoopJoin — a CartesianProduct anywhere means an
    // un-broadcast all-pairs join slipped in (the canonical 100 TB
    // scale-killer). Plan-only check (no execution): CartesianProduct
    // is a static planning decision, so sparkPlan suffices.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, TestSpark.SF).queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct planned in: $offenders")
  }
}
