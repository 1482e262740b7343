package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the AQE-final formatted plan of one registry query.
  * Run: sbt "runMain graft.tools.PlanProbe q40_ngram_jaccard" */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      System.err.println(
        "usage: runMain graft.tools.PlanProbe <query-name> (e.g. q40_ngram_jaccard)")
      sys.exit(2)
    }
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.collect()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
