package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** S3 (CSV sink) / S4 (JSON sink) under the driver's oracle gate — the
  * reference's DictWriter-CSV and per-element-JSON outputs re-expressed
  * as `df.write.csv/json` plus schema-explicit reads.
  *
  * The query round-trips a dimension through BOTH formats and joins the
  * two read-backs before aggregating, so a row lost or mangled by either
  * sink/source path breaks the hash match against the direct-SQL oracle.
  * Reads use explicit schemas (schema-on-read, no inference) — the only
  * scale-safe way to read text formats: inference is a second full scan
  * and can flip types between runs. */
object SinkRoundtrip {

  def q62CsvJsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dim = nation(s, d)
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    // TmpWorkspace: path-keyed + pid-suffixed (parallel JVMs never race
    // on overwrite-then-read) and deleted at JVM exit. Unlike q81/q82
    // the write happens on EVERY invocation — writing the sinks IS this
    // operator, not its input layout.
    val base = TmpWorkspace.dir("sink_roundtrip", d)
    // 25-row dim: one output file per format, not one per core — at real
    // scale the writer parallelism should track data size, not cluster
    // size (the small-files problem in reverse).
    val dim1 = dim.coalesce(1)
    dim1.write.mode("overwrite").option("header", true).csv(base + "/csv")
    dim1.write.mode("overwrite").json(base + "/json")
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("r_name", StringType)))
    val fromCsv = s.read.option("header", true).schema(schema).csv(base + "/csv")
    val fromJson = s.read.schema(schema).json(base + "/json")
    fromCsv
      .join(fromJson.select(col("n_nationkey").as("k2"), col("r_name").as("r2")),
            col("n_nationkey") === col("k2"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_nation"))
      .orderBy(col("r_name"))
  }

  val o62 = """
    SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name"""

  /** q89: ORC round-trip — the binary-columnar sink/source counterpart
    * of q62's text formats (Spark's native ORC writer/reader; schema
    * travels in the file, so the read-back needs no explicit schema —
    * the opposite contract from text formats, exercised deliberately).
    * Decimal survives ORC as decimal: the s_acctbal aggregate uses the
    * same exact-decimal-then-double discipline as every money sum. */
  def q89OrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dim = supplier(s, d)
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
              col("s_acctbal"))
    val base = TmpWorkspace.dir("orc_roundtrip", d)
    dim.coalesce(1).write.mode("overwrite").orc(base + "/orc")
    s.read.orc(base + "/orc")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
           dsum(col("s_acctbal")).as("total_acctbal"),
           min(col("s_name")).as("first_supplier"))
      .orderBy(col("n_name"))
  }

  val o89 = """
    SELECT n_name, COUNT(*) AS n_suppliers,
      CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
      MIN(s_name) AS first_supplier
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_sink_roundtrip" -> (q62CsvJsonRoundtrip _),
    "q89_orc_roundtrip"  -> (q89OrcRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q62_sink_roundtrip" -> o62,
    "q89_orc_roundtrip"  -> o89)
}
