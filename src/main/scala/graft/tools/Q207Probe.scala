package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round stage probe for q207 (BPE training). */
object Q207Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.text.Scrub.q207BpeTrain(spark, sf).count() // warm
    val docs = graft.Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("toks"))
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q207] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    t("docs count") { docs.count() }
    t("pairs count agg + top1") {
      docs.filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2)," +
            " i -> named_struct('w1', toks[i], 'w2', toks[i + 1]))")).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(1).collect()
    }
    val n = docs.selectExpr("sum(size(toks))").collect()(0)
    println(s"[q207] total tokens = $n")
    val t0 = System.nanoTime()
    graft.text.Scrub.q207BpeTrain(spark, sf).count()
    println(f"[q207] full train ${(System.nanoTime()-t0)/1e9}%6.2f s")
    spark.stop()
  }
}
