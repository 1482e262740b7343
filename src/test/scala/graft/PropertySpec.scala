package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingHash
import graft.text.Dedup

/** Randomized / invariant checks across operators. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TopKPerGroup equals window formulation on randomized datasets") {
    val gen = Gen.listOfN(300, Gen.zip(
      Gen.choose(0L, 10L), Gen.choose(0L, 20L), Gen.choose(0L, 1000000L)))
    val seen = scala.collection.mutable.Set[Long]()
    Iterator.continually(gen.sample).flatten.take(5).zipWithIndex.foreach {
      case (rows, trial) =>
        // make ids unique so the tiebreak is total
        val data = rows.zipWithIndex.map { case ((g, v, _), i) => (g, v, i.toLong) }
        val df = data.toDF("g", "v", "id")
        val k = 1 + trial % 4
        val custom = graft.plans.TopKPerGroup(df, Seq("g"),
          Seq("v" -> true, "id" -> false), k)
          .select("g", "v", "id").as[(Long, Long, Long)].collect().sorted.toSeq
        val w = Window.partitionBy(col("g")).orderBy(desc("v"), col("id"))
        val win = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).select("g", "v", "id")
          .as[(Long, Long, Long)].collect().sorted.toSeq
        assert(custom == win, s"trial $trial k=$k")
        seen += data.size.toLong
    }
    assert(seen.nonEmpty)
  }

  test("packSequences equals scala reference packing on randomized inputs") {
    import graft.text.TrainingSet
    val gen = Gen.listOfN(200, Gen.choose(0L, 40L))
    Iterator.continually(gen.sample).flatten.take(5).zipWithIndex.foreach {
      case (lens, trial) =>
        // sparse, shuffled-looking doc ids: exercises bucket boundaries
        val docs = lens.zipWithIndex.map { case (n, i) => (i * 7L + 3, n) }
        val got = TrainingSet.packSequences(docs.toDF("doc_id", "n_tok"))
          .as[(Long, Long, Long)].collect().toSet
        // reference: sequential scala fold over doc_id order
        val B = TrainingSet.SEQ_BUDGET
        var off = 0L
        val want = docs.sortBy(_._1).flatMap { case (id, n) =>
          val rows = if (n <= 0) Seq.empty else
            (off / B to (off + n - 1) / B).map { c =>
              (c, id, math.min(off + n, (c + 1) * B) - math.max(off, c * B)) }
          off += math.max(n, 0L)
          rows
        }.toSet
        assert(got == want, s"trial $trial")
    }
  }

  test("q40 output invariants: 0 < J <= 1, common <= min(ni,nj), i < j") {
    val rows = Dedup.q40NgramJaccard(spark, TestSpark.SF)
      .select("i", "j", "common", "ni", "nj", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (i, j, c, ni, nj, jac) =>
      assert(i < j)
      assert(c >= 1 && c <= math.min(ni, nj))
      assert(jac > 0.0 && jac <= 1.0)
      assert(math.abs(jac - c.toDouble / (ni + nj - c)) < 1e-5)
    }
  }

  test("q90 mergeability: union of per-group sketches == one-pass global sketch") {
    // THE property that makes sketches the 100 TB distinct-count: the
    // estimate from unioning per-group sketches must equal the estimate
    // of a single sketch built over all the data in one pass
    // (DataSketches HLL union at the same lgK loses nothing).
    val ev = Tables.events(spark, TestSpark.SF)
    val viaUnion = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .as[Double].head()
    val onePass = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))"))
      .as[Double].head()
    assert(viaUnion == onePass && onePass > 0)
    // and the graded query's tripwire passes (materializes without throwing)
    assert(graft.ops.Relational.q90HllMergeable(spark, TestSpark.SF).count() > 0)
  }

  test("rolling hash: range bound and no collisions across the corpus") {
    val hs = Tables.documents(spark, TestSpark.SF)
      .select(RollingHash.rolling_hash(col("text"))).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < RollingHash.MOD))
    assert(hs.distinct.length == hs.length) // 500 docs, 61-bit space
  }

  test("rolling hash mulMod agrees with BigInt arithmetic (random)") {
    val gen = Gen.zip(Gen.choose(0L, RollingHash.MOD - 1), Gen.choose(0L, RollingHash.MOD - 1))
    Iterator.continually(gen.sample).flatten.take(200).foreach { case (a, b) =>
      val expected = (BigInt(a) * BigInt(b) % BigInt(RollingHash.MOD)).toLong
      assert(RollingHash.mulMod(a, b) == expected, s"$a * $b")
    }
  }

  test("CDC chunking is insertion-local: edits shift at most a window of boundaries") {
    import org.apache.spark.unsafe.types.UTF8String
    def lens(s: String): Seq[Long] =
      graft.functions.CdcChunks.chunks(UTF8String.fromString(s), 16, 6)
        .toLongArray().toSeq
    // seeded varied text — repeated/periodic text can legitimately have
    // no boundaries at all (the window hash cycles)
    val rnd = new scala.util.Random(7)
    def words(n: Int) = Seq.fill(n)(rnd.nextInt(1 << 20).toString).mkString(" ")
    val a = words(30)
    val b = words(120)
    val ins = "INSERTED TEXT "
    val l1 = lens(a + b)
    val l2 = lens(a + ins + b)
    // exact guarantee: every boundary at/after the first boundary past
    // the edit's influence (edit end + window) is preserved, because a
    // boundary depends only on the trailing window bytes. So the chunk
    // sequences share a common suffix from that resync point on.
    val insEnd = a.length + ins.length + 16
    val ends2 = l2.scanLeft(0L)(_ + _).tail
    val resync = ends2.find(_ >= insEnd).getOrElse(ends2.last)
    val common = l1.reverse.zip(l2.reverse).takeWhile { case (x, y) => x == y }
    assert(common.map(_._1).sum >= ends2.last - resync,
      s"resync too late: $l1 vs $l2")
    assert(common.nonEmpty, "no shared suffix at all")
    // and chunk lengths always partition the input exactly
    assert(l1.sum == (a + b).length && l2.sum == (a + ins + b).length)
  }

  test("OsmShape routes null-lat/lon nodes to corrupt, never drops them") {
    import java.sql.Timestamp
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("type", StringType), StructField("id", LongType),
      StructField("lat", DoubleType), StructField("lon", DoubleType),
      StructField("user", StringType), StructField("uid", LongType),
      StructField("version", StringType), StructField("changeset", LongType),
      StructField("timestamp", TimestampType),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("k", StringType), StructField("v", StringType))))),
      StructField("nds", ArrayType(LongType))))
    val ts = Timestamp.valueOf("2020-01-01 00:00:00")
    val elems = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("node", 1L, null, 10.0, "a", 5L, "1", 1L, ts, Seq(), null),
      Row("node", 2L, 10.0, null, "b", 5L, "1", 1L, ts, Seq(), null),
      Row("node", 3L, null, null, "c", 5L, "1", 1L, ts, Seq(), null),
      Row("node", 4L, 10.0, 10.0, "d", 5L, "1", 1L, ts, Seq(), null),
      Row("way", 5L, null, null, "e", 5L, "1", 1L, ts, Seq(), null))), schema)
    // every row lands in exactly one of valid/corrupt (audit-trail contract)
    assert(graft.ops.OsmShape.corrupt(elems).collect()
      .map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(graft.ops.OsmShape.shapeNodes(elems).collect()
      .map(_.getLong(0)).toSeq == Seq(4L))
    assert(graft.ops.OsmShape.shapeWays(elems).count() == 1)
  }

  test("OsmShape routes null-uid and null-timestamp elements to corrupt") {
    import java.sql.Timestamp
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("type", StringType), StructField("id", LongType),
      StructField("lat", DoubleType), StructField("lon", DoubleType),
      StructField("user", StringType), StructField("uid", LongType),
      StructField("version", StringType), StructField("changeset", LongType),
      StructField("timestamp", TimestampType),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("k", StringType), StructField("v", StringType))))),
      StructField("nds", ArrayType(LongType))))
    val ts = Timestamp.valueOf("2020-01-01 00:00:00")
    val elems = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("node", 1L, 10.0, 10.0, "a", null, "1", 1L, ts, Seq(), null),
      Row("node", 2L, 10.0, 10.0, "b", 5L, "1", 1L, null, Seq(), null),
      Row("node", 3L, 10.0, 10.0, "c", 6L, "1", 1L, ts, Seq(), null))), schema)
    assert(graft.ops.OsmShape.corrupt(elems).collect()
      .map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
    assert(graft.ops.OsmShape.shapeNodes(elems).count() == 1)
  }

  test("q102 window chunks equal a naive scala chunker over the corpus") {
    import graft.text.TextOps.{CHUNK_W, CHUNK_STRIDE}
    val got = graft.text.TextOps.q102WindowChunks(spark, TestSpark.SF)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val expected = graft.Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        if (t.isEmpty) Nil
        else (1 to t.length by CHUNK_STRIDE).zipWithIndex.map { case (s0, i) =>
          val chunk = t.slice(s0 - 1, math.min(s0 - 1 + CHUNK_W, t.length))
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(chunk.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, i.toLong, s0.toLong, chunk.length.toLong, md)
        }
      }.toSet
    assert(got == expected && got.nonEmpty)
    // coverage: strides tile every token; consecutive windows overlap
    // by W − stride except at the tail
    val byDoc = got.groupBy(_._1)
    assert(byDoc.forall { case (_, cs) =>
      cs.toSeq.sortBy(_._2).sliding(2).forall {
        case Seq(a, b) => b._3 - a._3 == CHUNK_STRIDE
        case _ => true
      }
    })
  }
}
