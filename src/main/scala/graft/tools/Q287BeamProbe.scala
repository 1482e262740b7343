package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off audit of q287's beam approximation: runs the CV sweep with
  * the graded beam (CV_BEAM) and with beam ≥ |cls| (the EXACT joint
  * sweep — every class survives the prescreen), and prints the per-
  * (alpha, fold) acc_ppm delta. The beamed definition is mirrored in
  * the DuckDB oracle, so the correctness gate proves engine/oracle
  * agreement but not closeness to the exact sweep — this probe is
  * that missing evidence; its numbers go in docs/SCALE.md.
  *
  * Run: sbt "runMain graft.tools.Q287BeamProbe" [sfDir]
  */
object Q287BeamProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TrainingSet
    val nCls = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    // COLLECT each variant before constructing the next: both runs
    // cycle the same checkpointCycled tags, so the second construction
    // unpersists blocks the first DataFrame still references.
    def run(beam: Long): Map[(Long, Long), (Long, Long, Long)] =
      TrainingSet.q287NbCvBeam(spark, sf, beam).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val beamed = run(TrainingSet.CV_BEAM)
    val exact = run(nCls)
    println(f"[q287-beam] sf=$sf beam=${TrainingSet.CV_BEAM} exact_beam=$nCls (= |cls|)")
    println("[q287-beam] alpha  fold  n_docs  acc_beam_ppm  acc_exact_ppm  delta_ppm")
    var maxAbs = 0L
    beamed.keys.toSeq.sorted.foreach { case (a, f) =>
      val (n, _, ab) = beamed((a, f))
      val ae = exact((a, f))._3
      val d = ab - ae
      if (math.abs(d) > maxAbs) maxAbs = math.abs(d)
      println(f"[q287-beam] $a%5d  $f%4d  $n%6d  $ab%12d  $ae%13d  $d%9d")
    }
    println(s"[q287-beam] max |delta| = $maxAbs ppm across ${beamed.size} (alpha, fold) cells")
    spark.stop()
  }
}
