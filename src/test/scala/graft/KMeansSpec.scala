package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.KMeans

/** Distributed k-means: Lloyd's invariants + assignment exactness. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embeddings = Tables.t(spark, TestSpark.SF, "embeddings")

  test("inertia is non-increasing across Lloyd iterations") {
    val df = embeddings.filter(col("vec_id") < 500)
    val i0 = KMeans.inertia(df, KMeans.fit(df, 8, 0))
    val i1 = KMeans.inertia(df, KMeans.fit(df, 8, 1))
    val i2 = KMeans.inertia(df, KMeans.fit(df, 8, 2))
    assert(i1 <= i0 + 1e-9 && i2 <= i1 + 1e-9, s"$i0 -> $i1 -> $i2")
    assert(i2 < i0, "two iterations should strictly improve on init here")
  }

  test("assign() picks the exact nearest centroid (squared-L2)") {
    val df = embeddings.filter(col("vec_id") < 200)
    val cents = KMeans.fit(df, 4, 1)
    val got = KMeans.assign(df, cents)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](2).map(_.toDouble).toArray
      val best = cents.minBy { case (cid, c) =>
        (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }._1
      assert(r.getInt(1) == best, s"vec ${r.getLong(0)}")
    }
  }

  test("fit is deterministic for a fixed input") {
    val df = embeddings.filter(col("vec_id") < 300)
    val a = KMeans.fit(df, 4, 2).map { case (c, arr) => (c, arr.toSeq) }
    val b = KMeans.fit(df, 4, 2).map { case (c, arr) => (c, arr.toSeq) }
    assert(a == b)
  }
}
