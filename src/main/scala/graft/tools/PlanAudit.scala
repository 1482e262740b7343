package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale audit: dumps the formatted physical plan of every registry
  * query and greps for the properties that must hold at 100 TB —
  * parquet filter pushdown, column-pruned ReadSchema, broadcast joins
  * for small dims, TakeOrderedAndProject for top-k, whole-stage codegen
  * coverage. Run: sbt "runMain graft.tools.PlanAudit [sfDir]" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // optional name filter: any non-flag arg past the sfDir restricts
    // the audit to the named queries (incremental re-audit after a
    // registry addition)
    val only = args.drop(1).filterNot(_.startsWith("--")).toSet
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      // execute this exact plan so AQE finalizes and codegen ids
      // appear (.count()/.write wrap it in a different QueryExecution)
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
      val bhj = plan.contains("BroadcastHashJoin")
      val smj = plan.contains("SortMergeJoin")
      val topk = plan.contains("TakeOrderedAndProject")
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
      val codegen = "\\[codegen id : \\d+\\]".r.findAllIn(plan)
        .map(identity).toSet.size
      // runtime-filter markers: join-driven dynamic partition pruning
      // (q82) and the native bloom probe (q65) must be visible in the
      // executed plan — flagged here so the doc carries the evidence
      val dpp = plan.contains("dynamicpruning")
      val bloom = plan.toLowerCase.contains("might_contain")
      val extras = (if (dpp) " dpp=true" else "") +
        (if (bloom) " bloom=true" else "")
      println(f"$name%-24s exchanges=$exchanges%-3d codegenSpans=$codegen%-3d " +
        f"pushdown=$pushed%-5s bhj=$bhj%-5s smj=$smj%-5s topk=$topk$extras")
      if (args.contains("--full")) println(plan)
    }
    spark.stop()
  }
}
