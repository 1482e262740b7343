package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** One-off recall/cost probe for q162 PQ (dev tool). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact = pairs(Similarity.q43KnnBruteForce(spark, d))
      for (rerank <- Seq(32, 64, 128)) {
        val t0 = System.nanoTime()
        val pq = pairs(Similarity.pqTopK(spark, d, rerank))
        val sec = (System.nanoTime() - t0) / 1e9
        val rec = (exact & pq).size.toDouble / exact.size
        println(f"$d rerank=$rerank recall=$rec%.3f time=$sec%.2fs")
      }
    }
    spark.stop()
  }
}
