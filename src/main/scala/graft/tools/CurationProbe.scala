package graft.tools

import org.apache.spark.sql.SparkSession

/** Head-to-head timing of the q78 curation near-dup stage: LSH-banded
  * candidates vs the exact inverted-index pair join, plus stage splits
  * (pairs only / pairs+CC / full q78). Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.CurationProbe" */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.text.{CorpusPipeline, Dedup}
    import graft.Tables._

    def time(label: String)(f: => Long): Unit = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[cur] $label%-28s min ${times.map(_._1).min}%6.2f  rows ${times.head._2}")
    }

    val docs = documents(spark, d)
    val survivors = graft.text.TextOps.withQuality(docs)
      .filter(graft.text.TextOps.langGuess(col("text")) === "en"
        && col("quality") >= CorpusPipeline.QUALITY_FLOOR)
      .select(col("doc_id"), col("text"))
    val arr = survivors
      .select(col("doc_id"),
        graft.functions.ShingleSet.shingle_set(col("text")).as("sgs"))
      .filter(size(col("sgs")) > 0)

    // warmup
    Dedup.lshVerifiedPairs(spark, arr).count()
    Dedup.jaccardPairs(spark, arr).count()

    val pairsCached = Dedup.lshVerifiedPairs(spark, arr)
      .select(col("i"), col("j")).localCheckpoint()
    time("cc on cached pairs")(
      graft.text.DedupCluster.connectedComponents(pairsCached).count())
    time("pairs exact")(Dedup.jaccardPairs(spark, arr).count())
    time("pairs lsh")(Dedup.lshVerifiedPairs(spark, arr).count())
    time("survivors only")(survivors.count())
    spark.conf.set(CorpusPipeline.CURATION_LSH_CONF, "false")
    time("q78 exact")(CorpusPipeline.q78CorpusPipeline(spark, d).count())
    spark.conf.unset(CorpusPipeline.CURATION_LSH_CONF)
    time("q78 lsh")(CorpusPipeline.q78CorpusPipeline(spark, d).count())
    spark.stop()
  }
}
