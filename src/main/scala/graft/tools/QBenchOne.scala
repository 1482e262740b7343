package graft.tools
import org.apache.spark.sql.SparkSession
/** Bench-config (local[4], shuffle=4) min-of-N timing for one query. */
object QBenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q287_nb_cv")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    if (sys.env.contains("QB_EXPLAIN")) fn(spark, sf).explain("formatted")
    fn(spark, "/root/testdata/sf0.001").count() // warmup
    val reps = sys.env.getOrElse("QB_REPS","5").toInt
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); fn(spark, sf).count(); (System.nanoTime()-t0)/1e9 }
    println(f"[qbench] $name min ${ts.min}%.3f s  all ${ts.map(t=>f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
