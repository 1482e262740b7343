package graft.tools

import org.apache.spark.sql.SparkSession

/** Min-of-N per-query timing probe — robust to machine noise, unlike a
  * single bench pass. Args: [reps] [query names...]; no names = all.
  * Run: sbt "runMain graft.tools.PerfProbe 5 q03_revenue_by_nation ..."
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    // first arg is the rep count only if numeric; otherwise everything
    // is query names and reps defaults to 5
    val repsGiven = args.headOption.exists(_.forall(_.isDigit))
    val reps = if (repsGiven) args.head.toInt else 5
    val rest = if (repsGiven) args.drop(1).toSeq else args.toSeq
    val names = if (rest.nonEmpty) rest
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM/codegen paths on the smallest SF
    names.foreach(n => graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    for (n <- names) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n%-28s min ${times.min}%6.2f  med ${times.sorted.apply(reps / 2)}%6.2f  max ${times.max}%6.2f")
    }
    spark.stop()
  }
}
