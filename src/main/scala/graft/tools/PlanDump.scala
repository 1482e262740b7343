package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the compile-time formatted physical plan of named queries to
  * plans/<round>/<query>_<suffix>.txt — the before/after evidence files
  * the optimization rounds commit (compile-time form, the one that
  * exposes duplicated subtrees that AQE-final plans re-plan lazily).
  * Usage: runMain graft.tools.PlanDump <round> <suffix> <query>...
  * (e.g. `PlanDump r17 before q287_nb_cv`). Plan-only: nothing executes,
  * so it is safe to run next to a live bench. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val round = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val dir = new java.io.File(s"plans/$round")
    dir.mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val ex = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
      val scans = "Scan parquet".r.findAllIn(plan).size
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/$round/${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] $name $suffix exchanges=$ex parquetScans=$scans")
    }
    spark.stop()
  }
}
