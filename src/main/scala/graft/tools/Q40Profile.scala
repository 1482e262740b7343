package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Stage-level profile of q40 (n-gram Jaccard join): is the floor the
  * scan/shingle side or the pair aggregation? Also measures the
  * config-gated stop-shingle candidate path and checks it is lossless
  * on this corpus. Run: sbt "runMain graft.tools.Q40Profile" */
object Q40Profile {
  def minOf(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup
    Dedup.q40NgramJaccard(spark, sf).count()

    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val tScan = minOf(5) { Dedup.shingleArrays(spark, sf).count() }
    val tExplode = minOf(5) { Dedup.shingles(spark, sf).count() }
    val sh = Dedup.shingleArrays(spark, sf)
      .select(col("doc_id"), explode(col("sgs")).as("sg"))
      .repartition(n, col("sg"))
    val tPairAgg = minOf(5) {
      sh.as("a").join(sh.as("b"),
          col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
        .count()
    }
    val tFull = minOf(5) { Dedup.q40NgramJaccard(spark, sf).count() }
    println(f"[q40] shingle-arrays scan      ${tScan}%6.2f s")
    println(f"[q40] + explode to postings    ${tExplode}%6.2f s")
    println(f"[q40] postings join + pair agg ${tPairAgg}%6.2f s")
    println(f"[q40] full query               ${tFull}%6.2f s")

    // stop-shingle path: candidates only from shingles with df <= cutoff,
    // verified against full arrays. Lossless iff every output pair shares
    // a rare shingle.
    for (cutoff <- Seq(50, 200, 1000)) {
      spark.conf.set(Dedup.STOP_SHINGLE_CONF, cutoff.toString)
      val tStop = minOf(5) { Dedup.q40NgramJaccard(spark, sf).count() }
      val stopSet = Dedup.q40NgramJaccard(spark, sf)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.unset(Dedup.STOP_SHINGLE_CONF)
      val exactSet = Dedup.q40NgramJaccard(spark, sf)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lossless = stopSet == exactSet
      println(f"[q40] stop-shingle df<=$cutoff%-5d   ${tStop}%6.2f s  lossless=$lossless")
    }
    spark.stop()
  }
}
