package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.cosine_sim

/** Micro-benchmarks for the custom operators vs their built-in
  * formulations, on generated data large enough to expose the
  * asymptotics. Run: sbt "runMain graft.tools.MicroBench" */
object MicroBench {
  def time[A](label: String)(f: => A): Double = {
    val t0 = System.nanoTime(); f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"$label%-40s ${s}%8.2f s")
    s
  }

  /** Total shuffle-write bytes during `f` (SparkListener accumulation) —
    * the quantity TopKPerGroup is designed to reduce. */
  def shuffleBytes[A](spark: SparkSession)(f: => A): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        acc.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try { f; Thread.sleep(500) } // let the listener bus drain
    finally spark.sparkContext.removeSparkListener(listener)
    acc.get()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- per-group top-k: 20M rows, 100k groups, k=3 ----
    val big = spark.range(20000000L)
      .select((col("id") % 100000).as("g"),
              (col("id") * 2654435761L % 1000003).as("v"), col("id"))
    big.write.mode("overwrite").format("noop").save() // materialize-cost floor
    val w = Window.partitionBy(col("g")).orderBy(desc("v"), col("id"))
    // warmup both
    graft.plans.TopKPerGroup(big.limit(1000).toDF(), Seq("g"),
      Seq("v" -> true, "id" -> false), 3).count()
    big.limit(1000).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).count()

    var shWin = 0L; var shCustom = 0L
    val tWin = time("topk via window row_number") {
      shWin = shuffleBytes(spark) {
        big.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select("g", "id").write.mode("overwrite").format("noop").save()
      }
    }
    val tCustom = time("topk via TopKPerGroup operator") {
      shCustom = shuffleBytes(spark) {
        graft.plans.TopKPerGroup(big.toDF(), Seq("g"),
          Seq("v" -> true, "id" -> false), 3)
          .select("g", "id").write.mode("overwrite").format("noop").save()
      }
    }
    println(f"shuffle bytes: window ${shWin / 1e6}%.1f MB vs TopKPerGroup ${shCustom / 1e6}%.1f MB (${shWin.toDouble / math.max(shCustom, 1)}%.1fx less)")

    // ---- cosine: 4M pairs of 64-dim float vectors ----
    val vecs = spark.range(2000)
      .select(col("id").as("vid"),
        expr("transform(sequence(0, 63), i -> cast(pmod(id * 131 + i * 7, 97) as float) / 97.0F)").as("v"))
    val pairs = vecs.select(col("vid").as("i"), col("v").as("va"))
      .crossJoin(vecs.select(col("vid").as("j"), col("v").as("vb")))
    pairs.write.mode("overwrite").format("noop").save()
    val lambda = expr(
      """aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, z) -> a + z)
         / (sqrt(aggregate(transform(va, x -> CAST(x AS DOUBLE) * x), 0D, (a, z) -> a + z))
          * sqrt(aggregate(transform(vb, x -> CAST(x AS DOUBLE) * x), 0D, (a, z) -> a + z)))""")
    val tLambda = time("cosine via zip_with/aggregate lambdas") {
      pairs.select(sum(lambda)).collect()
    }
    val tExpr = time("cosine via codegen CosineSimilarity") {
      pairs.select(sum(cosine_sim(col("va"), col("vb")))).collect()
    }
    println(f"speedups: topk ${tWin / tCustom}%.2fx, cosine ${tLambda / tExpr}%.2fx")
    spark.stop()
  }
}
