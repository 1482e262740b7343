package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Stage-level profile of q80 (PPJoin prefix-filtered Jaccard): where
  * does the time go — prefix construction, candidate generation,
  * dedup of candidates, or exact verification — and how selective is
  * the prefix filter on this corpus? Run:
  * sbt "runMain graft.tools.Q80Profile" */
object Q80Profile {
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Dedup.ppjoinJaccard(spark, sf).count() // warmup

    val sh = Dedup.shingles(spark, sf)
    val docFreq = sh.groupBy(col("sg")).agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("sg"))
    val prefixes = sh.join(docFreq, Seq("sg"))
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("n_sg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <=
        col("n_sg") - ceil(col("n_sg") * lit(Dedup.JACCARD_THRESHOLD)) + 1)
      .select(col("doc_id"), col("sg"), col("pos"), col("n_sg"))
    val nDocs = Dedup.shingleArrays(spark, sf).count()
    val nPostings = sh.count()
    val nPrefix = prefixes.count()
    // mirror of ppjoinJaccard's candidate pipeline, stage by stage:
    // raw prefix-collision pairs → +length filter → distinct pairs →
    // +positional filter (the set the exact verify actually sees)
    val tau = Dedup.JACCARD_THRESHOLD
    val pp = prefixes.withColumn("pos", col("pos")) // keep schema explicit
    val joined = pp.select(col("doc_id").as("i"), col("sg"),
        col("pos").as("pi"), col("n_sg").as("ni"))
      .join(pp.select(col("doc_id").as("j"), col("sg"),
        col("pos").as("pj"), col("n_sg").as("nj")), Seq("sg"))
      .filter(col("i") < col("j"))
    val lenFiltered = joined.filter(least(col("ni"), col("nj"))
      >= greatest(col("ni"), col("nj")) * lit(tau))
    val posFiltered = lenFiltered
      .groupBy(col("i"), col("j"), col("ni"), col("nj"))
      .agg(count(lit(1)).as("cnt"),
           max(col("pi")).as("mpi"), max(col("pj")).as("mpj"))
      .filter(col("cnt")
          + least(col("ni") - col("mpi"), col("nj") - col("mpj"))
        >= ceil(lit(tau / (1 + tau)) * (col("ni") + col("nj"))))
    val nCandRaw = joined.count()
    val nLen = lenFiltered.count()
    val nPos = posFiltered.count()
    val nOut = Dedup.ppjoinJaccard(spark, sf).count()
    println(f"[q80] docs=$nDocs postings=$nPostings prefix-postings=$nPrefix")
    println(f"[q80] cand-raw=$nCandRaw after-len=$nLen after-pos=$nPos " +
      f"out=$nOut allpairs=${nDocs * (nDocs - 1) / 2}")

    val tPrefix = minOf(5) { prefixes.count() }
    val tCand = minOf(5) { posFiltered.count() }
    val tFull = minOf(5) { Dedup.ppjoinJaccard(spark, sf).count() }
    println(f"[q80] prefix build               ${tPrefix}%6.2f s")
    println(f"[q80] + filtered candidates      ${tCand}%6.2f s")
    println(f"[q80] full query (exact verify)  ${tFull}%6.2f s")
  }
}
