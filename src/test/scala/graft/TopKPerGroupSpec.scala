package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TopKPerGroup, TopKPerGroupExec}

/** Custom plan node: correctness vs the window formulation + physical
  * shape (partial heaps below the exchange, final above). */
class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(desc("value"), col("event_id"))
    Tables.events(spark, TestSpark.SF)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .select("user_id", "event_id", "value")
  }

  test("TopKPerGroup equals the window formulation") {
    for (k <- Seq(1, 3, 10)) {
      val custom = TopKPerGroup(
        Tables.events(spark, TestSpark.SF),
        Seq("user_id"),
        Seq("value" -> true, "event_id" -> false), k)
        .select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().sorted.toSeq
      val viaWindow = windowTopK(k)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(custom == viaWindow, s"k=$k")
    }
  }

  test("plans a partial stage below the exchange and a final stage above") {
    val df = TopKPerGroup(Tables.events(spark, TestSpark.SF),
      Seq("user_id"), Seq("value" -> true, "event_id" -> false), 2)
    df.collect()
    // AQE wraps stages, so inspect the final formatted plan text
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val stages = "TopKPerGroup".r.findAllIn(plan).size
    assert(stages >= 2, s"expected partial+final TopKPerGroup stages in:\n$plan")
    assert(plan.contains("Exchange"), "expected a clustered exchange between stages")
  }

  test("TopKRewrite rule replaces window+filter+prune with the custom plan") {
    graft.plans.TopKRewrite.enable(spark)
    val rewritten = windowTopK(3)
    val optimized = rewritten.queryExecution.optimizedPlan
    assert(optimized.collect { case p: graft.plans.TopKPerGroupPlan => p }.nonEmpty,
      s"expected TopKPerGroupPlan in:\n$optimized")
    assert(optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty,
      "window node should be eliminated")
    // and the rewritten plan still computes the right rows
    val viaCustom = TopKPerGroup(Tables.events(spark, TestSpark.SF),
      Seq("user_id"), Seq("value" -> true, "event_id" -> false), 3)
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(rewritten.as[(Long, Long, Double)].collect().sorted.toSeq == viaCustom)
  }

  test("TopKRewrite leaves the plan alone when the row number is projected") {
    graft.plans.TopKRewrite.enable(spark)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(desc("value"), col("event_id"))
    val keepsRn = Tables.events(spark, TestSpark.SF)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "rn") // rn survives → no rewrite
    val optimized = keepsRn.queryExecution.optimizedPlan
    assert(optimized.collect { case p: graft.plans.TopKPerGroupPlan => p }.isEmpty)
    assert(optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.nonEmpty)
  }

  test("TopKRewrite skips unpartitioned windows (global top-k still works)") {
    graft.plans.TopKRewrite.enable(spark)
    val w = Window.orderBy(desc("value"), col("event_id")) // no partitionBy
    val globalTop = Tables.events(spark, TestSpark.SF)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .select("event_id", "value")
    // must not rewrite into TopKPerGroupPlan(Nil, ...) — that distribution
    // is unplannable; the query must still execute
    assert(globalTop.queryExecution.optimizedPlan.collect {
      case p: graft.plans.TopKPerGroupPlan => p }.isEmpty)
    assert(globalTop.count() == 5)
  }

  test("handles ties and groups smaller than k") {
    val df = Seq((1L, 5.0, 1L), (1L, 5.0, 2L), (1L, 5.0, 3L), (2L, 1.0, 4L))
      .toDF("g", "v", "id")
    val got = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 2)
      .select("g", "id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 4L))) // tie broken by id; group 2 has 1 row
  }
}
