package graft.tools

import org.apache.spark.sql.SparkSession

/** Exchange/codegen audit for a few named queries (PlanAudit filtered). */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val ex = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
      println(s"[plan] $name exchanges=$ex")
    }
    spark.stop()
  }
}
