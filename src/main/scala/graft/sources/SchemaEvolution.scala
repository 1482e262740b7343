package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** q195: schema-evolution read — the source-side capability every
  * long-lived 100 TB table needs: files written before a column existed
  * must still be readable in one scan, with the missing column
  * null-filled.
  *
  * The fixture (written once per process via [[TmpWorkspace]], like
  * q81/q82 — the layout IS the operator's input) appends two parquet
  * generations into ONE directory: a v1 slice of orders (1995) without
  * `o_orderpriority`, then a v2 slice (1996) with it. The query reads
  * the directory with `mergeSchema=true` — Spark's footer-union schema
  * reconciliation — and aggregates by priority with the v1 rows
  * surfacing as a `<absent>` bucket, proving the null-fill is total and
  * confined to the old generation.
  *
  * Scale shape: schema merge is a footer-only planning step (no data
  * read); the scan itself stays one pass with pushdown intact. The
  * oracle recomputes the same report from the ORIGINAL orders table —
  * if merge dropped rows, mixed generations, or nulled the wrong slice,
  * the hash diverges. */
object SchemaEvolution {

  def q195SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val base = TmpWorkspace.dir("schema_evo", d)
    TmpWorkspace.once(base) {
      val o = orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_totalprice"))
        .coalesce(1).write.mode("overwrite").parquet(base + "/data")
      o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
        .coalesce(1).write.mode("append").parquet(base + "/data")
    }
    s.read.option("mergeSchema", "true").parquet(base + "/data")
      .groupBy(coalesce(col("o_orderpriority"), lit("<absent>"))
        .as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum((dec2(col("o_totalprice")) * 100).cast("long")).as("cents"))
      .orderBy(col("priority"))
  }

  val o195 = """
    SELECT CASE WHEN year(o_orderdate) = 1995 THEN '<absent>'
                ELSE o_orderpriority END AS priority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
        AS cents
    FROM orders
    WHERE year(o_orderdate) IN (1995, 1996)
    GROUP BY 1 ORDER BY priority"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q195_schema_evolution" -> (q195SchemaEvolution _))

  val oracles: Map[String, String] = Map(
    "q195_schema_evolution" -> o195)
}
