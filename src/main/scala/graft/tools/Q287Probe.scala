package graft.tools

import org.apache.spark.sql.SparkSession

/** Where does q287's wall-clock go? checkpointCycled executes during
  * DataFrame CONSTRUCTION (localCheckpoint is eager), so splitting
  * build-time from action-time separates the materialization jobs +
  * planning cost from the final execution. */
object Q287Probe {
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
    val fn = graft.SparkEntry.queries("q287_nb_cv")
    // warmup
    fn(spark, "/root/testdata/sf0.001").count()
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = fn(spark, sf)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"[q287] rep $i build ${(t1 - t0) / 1e9}%6.2f s  action ${(t2 - t1) / 1e9}%6.2f s")
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
    Thread.sleep(500)
    done.toSeq.sortBy(_._1).foreach { case (id, (sec, desc)) =>
      println(f"[q287] job $id%3d ${sec}%6.2f s  $desc")
    }
    println(f"[q287] total jobs ${done.size}  sum ${done.values.map(_._1).sum}%6.2f s")
    // micro-timings of the constituent materializations
    import org.apache.spark.sql.functions._
    def t(tag: String)(mk: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val t0 = System.nanoTime()
      val out = mk.localCheckpoint()
      println(f"[q287] piece $tag%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      out
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val foldE = expr("cast(conv(substr(md5(cast(doc_id as string)),1,8),16,10) as bigint)") % 5
    for (_ <- 1 to 2) {
      val docTok = t("docTok")(docs
        .select(col("doc_id"), foldE.as("f"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("f"), col("source"), col("tok"))
        .agg(count(lit(1)).as("n")))
      val cellF = t("cellF")(docTok
        .groupBy(col("tok"), col("source").as("cls"), col("f"))
        .agg(sum(col("n")).as("cf")))
      val folds = spark.range(5).select(col("id").as("f"))
      val seen1 = t("seen1-like")(docTok
        .join(broadcast(cellF.withColumnRenamed("cf", "n7")), Seq("tok", "f"))
        .groupBy(col("doc_id"), col("cls"))
        .agg(sum(col("n") * col("n7")).as("s7"), sum(col("n")).as("n_seen")))
      val _ = folds.count()
    }
    spark.stop()
  }
}
