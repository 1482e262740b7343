package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timings for q217 (scan vs array decode vs full query) — used to
  * adjudicate whether q217 cost is the moment pass or host/job overhead.
  * Run: sbt "runMain graft.tools.PcaProbe" */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(l: String)(f: => Any): Unit =
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        println(f"$l ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    import spark.implicits._
    time("scan+count      ")(graft.Tables.embeddings(spark, d).count())
    time("decode arrays   ")(graft.Tables.embeddings(spark, d)
      .select(col("embedding")).as[Array[Float]]
      .mapPartitions(it => Iterator.single(it.size)).collect())
    time("full q217       ")(graft.sim.Pca.q217PcaPower(spark, d).count())
    spark.stop()
  }
}
