package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q86's wall-clock go? Splits the composed train-set build
  * into its stage materializations (curation keepers / contamination
  * probe / mixture+pack action) under the bench config, plus a per-job
  * timeline of one full invocation. */
object Q86Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("q86_trainset_build")
    fn(spark, "/root/testdata/sf0.001").count() // warmup
    // build (checkpointCycled barriers) vs action split
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = fn(spark, sf)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"[q86] rep $i build ${(t1 - t0) / 1e9}%6.2f s  action ${(t2 - t1) / 1e9}%6.2f s")
    }
    // per-job timeline for one invocation
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new scala.collection.concurrent.TrieMap[Int, (Double, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")
            .take(60)))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobs.get(j.jobId)).foreach { case (t0, d) =>
          done.put(j.jobId, ((System.nanoTime() - t0) / 1e9, d)) }
    })
    fn(spark, sf).count()
    Thread.sleep(300)
    done.toSeq.sortBy(_._1).foreach { case (id, (sec, desc)) =>
      println(f"[q86] job $id%3d ${sec}%6.2f s  $desc")
    }
    println(f"[q86] total jobs ${done.size}  sum ${done.values.map(_._1).sum}%6.2f s")
    // piece timings of the keeper build (mirrors curatedKeepers)
    import graft.Tables._
    import graft.text.{Dedup, DedupCluster, TextOps}
    def t[A](tag: String)(mk: => A): A = {
      val t0 = System.nanoTime()
      val out = mk
      println(f"[q86] piece $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      out
    }
    for (_ <- 1 to 2) {
      val docs = documents(spark, sf)
      val survivors = t("survivors") {
        val s0 = TextOps.withQuality(docs)
          .filter(TextOps.langGuess(col("text")) === "en"
            && col("quality") >= graft.text.CorpusPipeline.QUALITY_FLOOR)
          .select(col("doc_id"), col("text"), col("lang"), col("n_tok"), col("quality"))
          .localCheckpoint()
        s0
      }
      val arr = survivors
        .select(col("doc_id"),
          graft.functions.ShingleSet.shingle_set(col("text")).as("sgs"))
        .filter(size(col("sgs")) > 0)
      val pairs = t("lsh-pairs") {
        Dedup.lshVerifiedPairs(spark, arr).select(col("i"), col("j"))
          .localCheckpoint()
      }
      println(s"[q86] n_pairs=${pairs.count()} n_surv=${survivors.count()}")
      val labels = t("cc") {
        DedupCluster.connectedComponents(pairs, tag = "cc-probe")
      }
      println(s"[q86] n_labels=${labels.count()}")
    }
    spark.stop()
  }
}
