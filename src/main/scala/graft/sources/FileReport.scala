package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6: artifact file-size report (SURVEY.md §2.1 — the reference
  * family's report prints `os.path.getsize` per produced artifact;
  * previously the one §2 row with no code).
  *
  * Metadata listing is a driver-side FileSystem operation by nature
  * (NameNode/object-store RPC, not a data scan) — recursing a
  * directory tree of job artifacts is O(#files) tiny metadata, never
  * file contents. The result becomes an ordinary DataFrame so it can
  * join/aggregate with everything else. */
object FileReport {

  def report(s: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def walk(d: Path): Unit =
      fs.listStatus(d).sortBy(_.getPath.getName).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else files += ((st.getPath.getName,
          Option(st.getPath.getParent).map(_.getName).getOrElse(""),
          st.getLen))
      }
    walk(p)
    import s.implicits._
    files.toSeq.toDF("file", "parent", "bytes")
  }

  /** q77: size report over artifacts the pipeline itself PRODUCED —
    * the reference family prints `os.path.getsize` per file it wrote,
    * so the faithful shape is: write a sink, stat it, report. HASH-GREEN
    * as of r14: the artifact is a header-less CSV of a deterministic
    * 25-row dim (nation⋈region, all fields quote-free), so the data
    * file's byte size is CONTENT-DERIVED — DuckDB reproduces it as
    * Σ octet_length(row)+1 over the same join, making the oracle a
    * genuinely independent check of the Hadoop stat (not a golden
    * constant). Part-file names carry a writer UUID → normalized to a
    * stable artifact label; `.crc` client checksums are excluded (the
    * Hadoop hidden-file convention), `_SUCCESS` is reported
    * deliberately (it IS a produced artifact; its size pins to 0).
    *
    * Scale shape: the listing is O(#files) driver-side metadata RPC
    * (never contents); the sink write is the data-sized part and uses
    * one writer task because the dim is 25 rows (writer parallelism
    * tracks data size, not cluster size — q62's stance). */
  def q77FileSizes(s: SparkSession, d: String): DataFrame = {
    val dim = graft.Tables.nation(s, d)
      .join(graft.Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val base = TmpWorkspace.dir("file_report", d)
    dim.coalesce(1).write.mode("overwrite").csv(base + "/csv")
    report(s, base + "/csv")
      .filter(!col("file").startsWith("."))
      .select(
        when(col("file").rlike("^part-.*\\.csv$"), lit("part.csv"))
          .otherwise(col("file")).as("artifact"),
        col("bytes"))
      .groupBy(col("artifact"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"))
      .orderBy(col("artifact"))
  }

  val o77 = """
    SELECT '_SUCCESS' AS artifact, CAST(1 AS BIGINT) AS n_files,
      CAST(0 AS BIGINT) AS bytes
    UNION ALL
    SELECT 'part.csv', CAST(1 AS BIGINT),
      CAST(SUM(octet_length(CAST(n_nationkey::VARCHAR || ',' || n_name
        || ',' || r_name AS BLOB)) + 1) AS BIGINT)
    FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY artifact"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_file_sizes" -> (q77FileSizes _))

  val oracles: Map[String, String] = Map(
    "q77_file_sizes" -> o77)
}
