package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.{KMeans, Similarity}
import graft.Tables.embeddings

/** Stage probe for q204 (SemDeDup): where does the time go —
  * assignment, cell pair join, checkpoint, evidence, or verdict? */
object Q204Probe {
  def minOf(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

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
    import graft.functions.VectorFunctions.dot_product

    Similarity.q204SemDedup(spark, sf).count() // warm + fit cache

    val e = embeddings(spark, sf)
    val cents = KMeans.fit(e.filter(col("vec_id") < Similarity.FIT_SAMPLE),
      Similarity.SEM_CELLS, Similarity.KMEANS_ITERS)
    val tFit = minOf(3) {
      KMeans.fit(e.filter(col("vec_id") < Similarity.FIT_SAMPLE),
        Similarity.SEM_CELLS, Similarity.KMEANS_ITERS)
    }
    val assigned = e
      .withColumn("nrm", sqrt(dot_product(col("embedding"), col("embedding"))))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(graft.functions.VectorFunctions.top_cells(
          col("embedding"), cents, Similarity.SEM_PROBE)).as("cell"))
    val tAssign = minOf(5) { assigned.count() }
    val aS = assigned.select(col("cell"), col("vec_id").as("i"),
      col("embedding").as("va"), col("nrm").as("na"))
    val bS = assigned.select(col("cell"), col("vec_id").as("j"),
      col("embedding").as("vb"), col("nrm").as("nb"))
    val pairsPlan = aS.join(bS, Seq("cell")).filter(col("i") < col("j"))
      .withColumn("sim",
        when(col("na") === 0.0 || col("nb") === 0.0, 0.0)
          .otherwise(dot_product(col("va"), col("vb"))
                     / (col("na") * col("nb"))))
      .filter(col("sim") >= Similarity.NEAR_DUP_TAU)
      .select(col("i"), col("j")).distinct()
    val tPairs = minOf(5) { pairsPlan.count() }
    val tCkpt = minOf(5) { pairsPlan.localCheckpoint().count() }
    val tEvid = minOf(5) {
      Similarity.exactNearDupPairs(spark,
        e.filter(col("vec_id") % 5 === 0)).count()
    }
    val tFull = minOf(5) { Similarity.q204SemDedup(spark, sf).count() }
    println(f"[q204] kmeans fit        ${tFit}%6.2f s")
    println(f"[q204] assignment        ${tAssign}%6.2f s")
    println(f"[q204] cell pair join    ${tPairs}%6.2f s")
    println(f"[q204] + localCheckpoint ${tCkpt}%6.2f s")
    println(f"[q204] evidence exact    ${tEvid}%6.2f s")
    println(f"[q204] full              ${tFull}%6.2f s")
  }
}
