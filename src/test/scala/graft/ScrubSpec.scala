package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Scrub

/** Scrub surface (q91 PII redaction, q92 URL domains, q93 BPE pairs). */
class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q91 redacted text contains zero residual PII matches") {
    val residual = Tables.documents(spark, TestSpark.SF)
      .select(Scrub.redact(
        Scrub.piiText(col("doc_id"), col("text"))).as("red"))
      .select(
        sum(regexp_count(col("red"), lit(Scrub.EMAIL_RE))).as("e"),
        sum(regexp_count(col("red"), lit(Scrub.IP_RE))).as("i"),
        sum(regexp_count(col("red"), lit(Scrub.PHONE_RE))).as("p"))
      .as[(Long, Long, Long)].head()
    assert(residual == ((0L, 0L, 0L)))
  }

  test("q91 per-category counts match the injection schedule exactly") {
    // The corpus itself contains no PII, so the only matches are the
    // injected ones: one email iff doc_id%3==0, one IP iff %4==0, one
    // phone iff %5==0. This pins the regexes to the fixture 1:1 (no
    // accidental cross-category matches, e.g. the phone pattern firing
    // inside an email's digits).
    val rows = Scrub.q91PiiRedact(spark, TestSpark.SF)
      .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, e, i, p) =>
      assert(e == (if (id % 3 == 0) 1L else 0L), s"email count at $id")
      assert(i == (if (id % 4 == 0) 1L else 0L), s"ip count at $id")
      assert(p == (if (id % 5 == 0) 1L else 0L), s"phone count at $id")
    }
  }

  test("q92 domain totals account for every injected URL") {
    val docs = Tables.documents(spark, TestSpark.SF).count()
    val even = Tables.documents(spark, TestSpark.SF)
      .filter(col("doc_id") % 2 === 0).count()
    val agg = Scrub.q92UrlDomains(spark, TestSpark.SF)
      .agg(sum(col("n_urls")), count(lit(1))).as[(Long, Long)].head()
    // one https URL per doc + one http URL per even doc; 60 site
    // domains (doc_id mod lcm(20,3)=60 combos) + 5 cdn domains.
    assert(agg._1 == docs + even)
    assert(agg._2 == math.min(60L, docs) + math.min(5L, even))
  }

  test("q93 row-local pair transform == positional self-join formulation") {
    // The scale form generates pairs inside each row; the naive form
    // (mirroring the oracle) posexplodes to (doc_id, pos, tok) and
    // self-joins on pos+1. Same top-20 under the total order.
    val toks = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "tok")
    val naive = toks.as("a")
      .join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.tok").as("w1"), col("b.tok").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(20)
      .as[(String, String, Long)].collect().toSeq
    val fast = Scrub.q93BpePairs(spark, TestSpark.SF)
      .as[(String, String, Long)].collect().toSeq
    assert(fast == naive && fast.size == 20)
  }

  test("q93 plan: no join, no global sort (TakeOrderedAndProject)") {
    val physical = Scrub.q93BpePairs(spark, TestSpark.SF)
      .queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), "pair generation must be row-local")
    assert(physical.contains("TakeOrderedAndProject"),
      "top-k must be a per-partition heap, not a global sort")
  }

  test("q207 BPE training: nested merges, lexical tie-break, greedy overlap") {
    import spark.implicits._
    // (a,b) and (b,c) both count 3 → lexical tie-break picks (a,b);
    // round 2 must then merge the SYMBOL "a b" with c — vocabulary
    // induction, not bigram counting.
    val corpus = Seq("a b c a b c", "a b c").toDF("text")
      .select(split(col("text"), " ").as("toks"))
    val m = Scrub.bpeTrain(corpus, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == (1L, "a", "b", 3L))
    assert(m(1) == (2L, "a b", "c", 3L))
    // greedy leftmost non-overlap: "a a a a a" under (a,a) merges twice
    // (positions 0-1, 2-3), leaving ["a a","a a","a"] — round 2 sees
    // ("a a","a a") and ("a a","a") both once; lexical tie-break on w2
    // picks ("a a","a").
    val run = Seq("a a a a a").toDF("text")
      .select(split(col("text"), " ").as("toks"))
    val m2 = Scrub.bpeTrain(run, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m2(0) == (1L, "a", "a", 4L))
    assert(m2(1) == (2L, "a a", "a", 1L))
  }

  test("q209 ledger: merges only shrink, savings equal applied merge mass") {
    val led = Scrub.q209BpeApply(spark, TestSpark.SF).collect()
    assert(led.nonEmpty)
    led.foreach { r =>
      val (before, after) = (r.getLong(2), r.getLong(3))
      assert(after <= before, s"merges must never grow a sequence: $r")
      assert(r.getLong(4) == after * 1000000L / before)
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q212 line dedup matches an independent driver-side mirror") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val lines = docs.map { case (id, t) =>
      id -> t.split(" ").grouped(Scrub.LINE_TOKS).map(_.mkString(" ")).toVector }
    val census = lines.flatMap { case (id, ls) => ls.distinct.map(l => (l, id)) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val expect = lines.map { case (id, ls) =>
      val kept = ls.filter(l => census(l) < Scrub.LINE_DUP_MIN)
      (id, ls.size.toLong, kept.size.toLong, md5hex(kept.mkString(" ")))
    }.sortBy(_._1).toSeq
    val got = Scrub.q212LineDedup(spark, TestSpark.SF)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == expect)
    // the scrub must have real work at this SF (some boilerplate dropped)
    // and must never drop everything from every document
    assert(got.exists { case (_, nl, nk, _) => nk < nl })
    assert(got.exists { case (_, _, nk, _) => nk > 0 })
  }

  test("q214 domain filter: ledger matches mirror, verdict ⟺ threshold") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // mirror derives the domain ARITHMETICALLY (the injection schedule),
    // independently of the query's regex extraction path
    val perDoc = docs.map { case (id, t) =>
      val toks = t.split(" ")
      (s"site${id % 20}.example${id % 3}.org",
       toks.distinct.length.toLong * 1000000L / toks.length)
    }
    val led = perDoc.groupBy(_._1).map { case (dom, xs) =>
      (dom, xs.length.toLong, xs.map(_._2).sum) }.toSeq
    val grand = led.map(_._3).sum / led.map(_._2).sum
    val expect = led.map { case (dom, n, s) =>
      (dom, n, s / n, grand, if (s / n >= grand) "keep" else "filter")
    }.sortBy(_._1)
    val got = Scrub.q214DomainFilter(spark, TestSpark.SF)
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(got == expect)
    // the gate must actually split: both verdicts present
    assert(got.exists(_._5 == "keep") && got.exists(_._5 == "filter"))
  }

  test("q222 planted duplicate: copy scrubbed, first occurrence intact") {
    // doc 0: 8 shared tokens + unique tail; doc 1: the same 8 tokens +
    // a different unique tail; doc 2: an exact copy of doc 0.
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (0L, s"$shared a1 a2 a3"),
      (1L, s"$shared b1 b2 b3"),
      (2L, s"$shared a1 a2 a3")).toDF("doc_id", "text")
    val got = Scrub.selfspanScrub(docs)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 0 holds every first occurrence: fully kept.
    assert(got(0) == ((0L, 11L, 11L, 1000000L,
      md5hex(s"$shared a1 a2 a3"))))
    // doc 1: only its window 0 (the 8 shared tokens) duplicates doc 0;
    // windows 1-3 include b-tokens and are unique. Tokens 0-7 scrubbed.
    assert(got(1) == ((1L, 11L, 3L, 272727L, md5hex("b1 b2 b3"))))
    // doc 2: every window duplicates doc 0 -> fully scrubbed, row present.
    assert(got(2) == ((2L, 11L, 0L, 0L, md5hex(""))))
  }

  test("q222 corpus run: ledger is total, bounded, and non-vacuous") {
    val docs = Tables.documents(spark, TestSpark.SF)
    val got = Scrub.q222SelfspanScrub(spark, TestSpark.SF)
    assert(got.count() == docs.count())
    val bad = got.filter(col("n_kept") > col("n_tokens")
      || col("kept_ppm") < 0 || col("kept_ppm") > 1000000L).count()
    assert(bad == 0L)
    // the synthetic corpus genuinely shares 8-token spans across docs:
    // the operator must find real work (and some doc keeps everything)
    val scrubbed = got.filter(col("n_kept") < col("n_tokens")).count()
    val intact = got.filter(col("n_kept") === col("n_tokens")).count()
    assert(scrubbed > 0L && intact > 0L)
  }

  test("q223 pseudonymization matches mirror; surrogates consistent, no residual PII") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def inject(id: Long, t: String): String = t +
      (if (id % 3 == 0) s" contact u$id@mail${id % 7}.example.com" else "") +
      (if (id % 4 == 0) s" from 10.${id % 256}.${(id * 7) % 256}.${id % 100}" else "") +
      (if (id % 5 == 0) f" call 555-${id % 10000}%04d" else "") +
      (if (id % 6 == 0) s" escalate to ${Scrub.SHARED_EMAIL}" else "")
    def fold(cat: String, re: String, orig: String, acc0: String): String =
      re.r.findAllIn(orig).toVector.foldLeft(acc0)((acc, e) =>
        acc.replace(e, s"<$cat:${md5hex(e).take(8)}>"))
    val mirror = docs.map { case (id, t0) =>
      val t = inject(id, t0)
      val p = fold("PHONE", Scrub.PHONE_RE,  t,
                fold("IP", Scrub.IP_RE, t,
                  fold("EMAIL", Scrub.EMAIL_RE, t, t)))
      (id, p)
    }
    val expect = mirror.map { case (id, p) => (id, md5hex(p)) }.sortBy(_._1).toSeq
    val got = Scrub.q223Pseudonymize(spark, TestSpark.SF)
      .select(col("doc_id"), col("pseudo_md5"))
      .as[(Long, String)].collect().toSeq
    assert(got == expect)
    // By mirror equality the two assertions below hold for the query's
    // output string too. (1) referential consistency: every sixth doc
    // carries the ONE shared-entity surrogate, byte-identical everywhere;
    val surrogate = s"<EMAIL:${md5hex(Scrub.SHARED_EMAIL).take(8)}>"
    mirror.filter(_._1 % 6 == 0).foreach { case (id, p) =>
      assert(p.contains(surrogate), s"shared surrogate missing in doc $id") }
    // (2) zero residual PII in any pseudonymized string.
    mirror.foreach { case (id, p) =>
      Seq(Scrub.EMAIL_RE, Scrub.IP_RE, Scrub.PHONE_RE).foreach { re =>
        assert(re.r.findFirstIn(p).isEmpty, s"residual PII in doc $id") } }
  }

  test("q244 canonical forms are normalized and the collapse is real") {
    val rows = Scrub.q244UrlCanonical(spark, TestSpark.SF)
      .as[(String, Long, Long)].collect()
    val docs = Tables.documents(spark, TestSpark.SF).count()
    assert(rows.map(_._2).sum == docs)
    rows.foreach { case (canon, nDocs, nRaw) =>
      // every normalization rule held: lowercase, no default port, no
      // fragment, no tracking params, no trailing slash, sorted query
      assert(canon == canon.toLowerCase, s"case survived: $canon")
      assert(!canon.contains(":80") && !canon.contains("#")
        && !canon.contains("utm_"), s"noise survived: $canon")
      assert(!canon.stripPrefix("https://").stripPrefix("http://")
        .endsWith("/"), s"trailing slash survived: $canon")
      if (canon.contains("?")) {
        val ps = canon.split("\\?")(1).split("&").toSeq
        assert(ps == ps.sorted, s"params unsorted: $canon")
      }
      assert(nRaw >= 1 && nDocs >= nRaw)
    }
    // distinct raw variants genuinely collapse onto shared canonicals
    assert(rows.exists(_._3 >= 2), "no variant collapse observed")
  }
}
