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

  /** q77: size report over the SF directory's parquet tables —
    * deterministic (driver-generated fixed files), rows-only checked
    * (DuckDB cannot stat files, so no SQL oracle). */
  def q77FileSizes(s: SparkSession, d: String): DataFrame =
    report(s, d)
      .filter(col("file").endsWith(".parquet"))
      .select(col("file"), col("bytes"))
      .orderBy(col("file"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_file_sizes" -> (q77FileSizes _))

  val oracles: Map[String, String] = Map.empty
}
