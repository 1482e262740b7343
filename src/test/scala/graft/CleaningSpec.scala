package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ops.Cleaning

/** Golden + property tests for the OSM-semantics cleaning operators
  * (SURVEY.md §5: FIXTURES.md §B fixture tables, hand-computed outputs).
  */
class CleaningSpec extends AnyFunSuite {
  // scalatestplus isn't on the offline classpath; drive Gen directly
  private def forAll[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(body)
  private def forAllCollect[A](gen: Gen[A], n: Int = 100): Seq[A] =
    Iterator.continually(gen.sample).flatten.take(n).toSeq
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // FIXTURES.md §B representative tag keys
  lazy val tagsFixture = Seq(
    (1L, "addr:street", "Main St"), (1L, "amenity", "restaurant"),
    (2L, "gnis:feature_id", "12345"), (2L, "name with space", "x"),
    (3L, "Brand", "y"), (3L, "addr:postcode", "MD 21401-1234"),
    (4L, "highway", "residential"), (4L, "addr:street", "Elm Ave")
  ).toDF("id", "key", "value")

  test("P3 key classifier matches hand-computed classes") {
    val got = tagsFixture
      .select(col("key"), Cleaning.keyType(col("key")).as("cls"))
      .as[(String, String)].collect().toMap
    assert(got("addr:street") == "lower_colon")
    assert(got("amenity") == "lower")
    assert(got("gnis:feature_id") == "lower_colon")
    assert(got("name with space") == "problemchars")
    assert(got("Brand") == "other")
    assert(got("highway") == "lower")
  }

  test("P3 classes form a partition (exactly one class per key)") {
    forAll(Gen.asciiPrintableStr.suchThat(_.nonEmpty)) { k =>
      val cls = spark.range(1).select(Cleaning.keyType(lit(k)).as("c"))
        .as[String].head()
      assert(Set("lower", "lower_colon", "problemchars", "other")(cls))
    }
  }

  test("P4 split on ':' with 'regular' default") {
    val got = tagsFixture.select(col("key"),
        Cleaning.tagType(col("key")).as("t"), Cleaning.tagSubkey(col("key")).as("k"))
      .as[(String, String, String)].collect()
      .map { case (k, t, sk) => k -> ((t, sk)) }.toMap
    assert(got("addr:street") == ("addr", "street"))
    assert(got("amenity") == ("regular", "amenity"))
    assert(got("gnis:feature_id") == ("gnis", "feature_id"))
  }

  test("P6/P7 street-type extract + normalize via mapping join") {
    val streets = Seq("Main St", "Elm Ave.", "Oak Street").toDF("text")
    val mapping = Seq("St" -> "Street", "St." -> "Street", "Ave" -> "Avenue",
      "Ave." -> "Avenue", "Rd" -> "Road").toDF("suffix", "canonical")
    val got = streets
      .withColumn("last_tok", Cleaning.lastToken(col("text")))
      .join(broadcast(mapping), col("last_tok") === col("suffix"), "left")
      .withColumn("norm", coalesce(col("canonical"), col("last_tok")))
      .select("text", "norm").as[(String, String)].collect().toMap
    assert(got("Main St") == "Street")
    assert(got("Elm Ave.") == "Avenue")
    assert(got("Oak Street") == "Street")
  }

  test("P7 normalization is idempotent (property)") {
    val canon = Cleaning.suffixMapping.map(_._2).toSet
    forAll(Gen.oneOf(Cleaning.suffixMapping.map(_._1) ++ canon)) { suffix =>
      val m = Cleaning.suffixMapping.toMap
      val once = m.getOrElse(suffix, suffix)
      val twice = m.getOrElse(once, once)
      assert(once == twice) // canonical forms are fixed points
    }
  }

  test("P8 zip5 total on arbitrary strings: empty or exactly 5 digits (property)") {
    val strs = forAllCollect(Gen.asciiPrintableStr, 200)
    val got = strs.toDF("v").select(Cleaning.zip5(col("v")))
      .as[String].collect()
    got.foreach { z =>
      assert(z.isEmpty || (z.length == 5 && z.forall(_.isDigit)), s"'$z'")
    }
  }

  test("P9 phone normalizer total: result is always bare digits (property)") {
    val strs = forAllCollect(Gen.asciiPrintableStr, 200)
    val got = strs.toDF("v").select(Cleaning.normalizePhone(col("v")))
      .as[String].collect()
    got.foreach { p => assert(p.forall(_.isDigit), s"'$p'") }
  }

  test("P8 zip5 extracts trailing 5-digit codes") {
    val got = Seq("21401", "MD 21401", "21401-1234", "no digits")
      .toDF("v").select(col("v"), Cleaning.zip5(col("v")).as("z"))
      .as[(String, String)].collect().toMap
    assert(got("21401") == "21401")
    assert(got("MD 21401") == "21401")
    assert(got("21401-1234") == "21401")
    assert(got("no digits") == "")
  }

  test("S2 sampler keeps exactly ids ≡ 0 (mod k)") {
    val got = spark.range(100).toDF("id").filter(col("id") % 10 === 0)
      .as[Long].collect().sorted
    assert(got.sameElements(Array(0L, 10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L)))
  }

  test("J2 way→node resolution round-trips posexplode order") {
    val ways = Seq((100L, Seq(7L, 3L, 9L))).toDF("id", "node_refs")
    val waysNodes = ways.select(col("id"), posexplode(col("node_refs"))
      .as(Seq("position", "node_id")))
    val back = waysNodes
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(position, node_id))), x -> x.node_id)").as("refs"))
      .as[(Long, Seq[Long])].head()
    assert(back == ((100L, Seq(7L, 3L, 9L))))
  }

  test("q103 returns exactly the fence violators (sound and complete)") {
    val got = Cleaning.q103IqrOutliers(spark, TestSpark.SF)
      .as[(Long, String, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, v, lo, hi) => v < lo || v > hi })
    // completeness: re-derive the fences independently and check no
    // violator was missed
    val ev = graft.Tables.events(spark, TestSpark.SF)
    val fences = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25)").as("q1"),
           expr("percentile(value, 0.75)").as("q3"))
      .as[(String, Double, Double)].collect()
      .map { case (t, q1, q3) =>
        t -> (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5) }.toMap
    val all = ev.select(col("event_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val expectedIds = all.collect { case (id, t, v)
      if v < fences(t)._1 || v > fences(t)._2 => id }.toSet
    assert(got.map(_._1).toSet == expectedIds)
  }

  test("q104 profile equals per-column independent computations") {
    val got = Cleaning.q104ProfileColumns(spark, TestSpark.SF)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val o = graft.Tables.t(spark, TestSpark.SF, "orders")
    val n = o.count()
    Cleaning.PROFILE_COLS.foreach { c =>
      val (nr, nn, nd) = got(c)
      assert(nr == n)
      assert(nn == o.filter(col(c).isNotNull).count())
      assert(nd == o.select(col(c)).na.drop().distinct().count())
    }
  }
}
