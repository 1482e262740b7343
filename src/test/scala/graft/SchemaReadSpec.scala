package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-on-read validation (SURVEY.md §1.2: cerberus → StructType
  * enforcement): PERMISSIVE mode routes malformed rows to
  * _corrupt_record; FAILFAST raises on first malformed row. */
class SchemaReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodAndBad = Seq(
    """{"id": 1, "lat": 39.0, "lon": -76.5}""",
    """{"id": "not-a-number", "lat": 1.0, "lon": 2.0}""",
    """{"id": 3, "lat": 38.9, "lon": -76.4}""")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE read keeps valid rows and quarantines corrupt ones") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(goodAndBad.toDS()).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect()
    assert(corrupt.length == 1 && corrupt.head.contains("not-a-number"))
  }

  test("FAILFAST read raises on the malformed row") {
    val ex = intercept[Exception] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST")
        .json(goodAndBad.toDS()).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      ex.getCause != null)
  }
}
