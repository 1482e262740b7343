package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** OSM-wrangling operator surface (SURVEY.md §2 P1–P11, A1–A7, J1, S2)
  * re-expressed Spark-first over the driver tables.
  *
  * The reference family's cleaning funcs (`key_type`, `update_name`,
  * postcode fix) are pure per-row string ops — here they are codegen'd
  * built-in expression pipelines (`rlike`/`regexp_extract`/`when`), never
  * UDFs, so whole-stage codegen keeps them inside the scan stage, and
  * the tiny canonicalization dimension is a broadcast join (no shuffle).
  */
object Cleaning {

  // ---- P3: tag-key classifier (reference `tags.py` key_type) ----
  // Class check order matches the reference: lower, lower_colon,
  // problemchars (search, unanchored), else other.
  val LOWER = "^[a-z_]*$"
  val LOWER_COLON = "^[a-z_]*:[a-z_]*$"
  val PROBLEM = """[=+/&<>;'"?%#$@,. \t\r\n]"""

  def keyType(k: Column): Column =
    when(k.rlike(LOWER), "lower")
      .when(k.rlike(LOWER_COLON), "lower_colon")
      .when(k.rlike(PROBLEM), "problemchars")
      .otherwise("other")

  // ---- P4: split key on ':' into (type, subkey), default 'regular' ----
  def tagType(k: Column): Column =
    when(k.contains(":"), split(k, ":", 2).getItem(0)).otherwise("regular")
  def tagSubkey(k: Column): Column =
    when(k.contains(":"), split(k, ":", 2).getItem(1)).otherwise(k)

  // ---- P6: street-type extract (last token, reference `\b\S+\.?$`) ----
  def lastToken(c: Column): Column = regexp_extract(c, "(\\S+)$", 1)

  // ---- P7: suffix canonicalization mapping (reference `update_name`) ----
  val suffixMapping: Seq[(String, String)] = Seq(
    "agg" -> "aggregate", "dup" -> "duplicate", "big" -> "large",
    "fast" -> "quick", "val" -> "value")

  def normalizeLast(df: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    val m = broadcast(suffixMapping.toDF("suffix", "canonical"))
    df.withColumn("last_tok", lastToken(col("text")))
      .join(m, col("last_tok") === col("suffix"), "left")
      .withColumn("normalized", coalesce(col("canonical"), col("last_tok")))
  }

  // ---- P8: 5-digit postcode extraction (first 5-digit run: strips a
  // state prefix like 'MD 21401' and a '-1234' suffix) ----
  def zip5(c: Column): Column = regexp_extract(c, "([0-9]{5})", 1)

  // ---- P9: phone canonicalization — strip punctuation, drop a US
  // country prefix, keep the 10-digit national number ----
  def normalizePhone(c: Column): Column = {
    val digits = regexp_replace(c, "[^0-9]", "")
    when(length(digits) === 11 && digits.startsWith("1"), digits.substr(2, 10))
      .otherwise(digits)
  }

  /** A long-format (id, key, value) tag table derived from `part` — the
    * same shape as the reference's nodes_tags/ways_tags, with keys chosen
    * to exercise all four P3 classes. stack() is a Generator: one pass,
    * no shuffle. */
  def partTags(s: SparkSession, d: String): DataFrame =
    part(s, d).selectExpr("p_partkey AS id",
      """stack(4,
         'name', p_name,
         'Brand', p_brand,
         'part:type', p_type,
         'part size', CAST(p_size AS STRING)) AS (key, value)""")

  val ORA_PART_TAGS = """
    SELECT p_partkey AS id, 'name' AS key, p_name AS value FROM part
    UNION ALL SELECT p_partkey, 'Brand', p_brand FROM part
    UNION ALL SELECT p_partkey, 'part:type', p_type FROM part
    UNION ALL SELECT p_partkey, 'part size', CAST(p_size AS VARCHAR) FROM part"""

  /** A2: histogram of P3 key classes over the long tag table. */
  def q16TagClassify(s: SparkSession, d: String): DataFrame =
    partTags(s, d)
      .groupBy(keyType(col("key")).as("key_class"))
      .agg(count(lit(1)).as("n"), countDistinct(col("key")).as("n_keys"))
      .orderBy(col("key_class"))

  val o16 = s"""
    WITH tags AS ($ORA_PART_TAGS)
    SELECT CASE
        WHEN regexp_matches(key, '^[a-z_]*$$') THEN 'lower'
        WHEN regexp_matches(key, '^[a-z_]*:[a-z_]*$$') THEN 'lower_colon'
        WHEN regexp_matches(key, '[=+/&<>;''"?%#$$@,. \t\r\n]') THEN 'problemchars'
        ELSE 'other' END AS key_class,
      COUNT(*) AS n, COUNT(DISTINCT key) AS n_keys
    FROM tags GROUP BY key_class ORDER BY key_class"""

  /** P4/P5: split keys on ':', drop problem-char keys, histogram by type. */
  def q17KeySplit(s: SparkSession, d: String): DataFrame =
    partTags(s, d)
      .filter(!col("key").rlike(PROBLEM))
      .select(tagType(col("key")).as("tag_type"), tagSubkey(col("key")).as("subkey"))
      .groupBy(col("tag_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("subkey")).as("n_subkeys"))
      .orderBy(col("tag_type"))

  val o17 = s"""
    WITH tags AS ($ORA_PART_TAGS)
    SELECT CASE WHEN contains(key, ':') THEN split_part(key, ':', 1) ELSE 'regular' END AS tag_type,
      COUNT(*) AS n,
      COUNT(DISTINCT CASE WHEN contains(key, ':')
        THEN substr(key, length(split_part(key, ':', 1)) + 2) ELSE key END) AS n_subkeys
    FROM tags WHERE NOT regexp_matches(key, '[=+/&<>;''"?%#$$@,. \t\r\n]')
    GROUP BY tag_type ORDER BY tag_type"""

  /** P6+P7+A4 shape: extract trailing token of each document, canonicalize
    * via broadcast mapping join, count per normalized form. */
  def q18StreetNormalize(s: SparkSession, d: String): DataFrame =
    normalizeLast(documents(s, d), s)
      .groupBy(col("normalized"))
      .agg(count(lit(1)).as("n"), countDistinct(col("last_tok")).as("n_raw_forms"))
      .orderBy(col("normalized"))

  val o18 = """
    SELECT COALESCE(m.canonical, t.last_tok) AS normalized, COUNT(*) AS n,
      COUNT(DISTINCT t.last_tok) AS n_raw_forms
    FROM (SELECT regexp_extract(text, '(\S+)$', 1) AS last_tok FROM documents) t
    LEFT JOIN (VALUES ('agg','aggregate'), ('dup','duplicate'), ('big','large'),
               ('fast','quick'), ('val','value')) m(suffix, canonical)
      ON t.last_tok = m.suffix
    GROUP BY normalized ORDER BY normalized"""

  /** P8: postcode-style 5-digit extraction, row-level sample. */
  def q19Postcode(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_custkey") % 37 === 0)
      .select(col("c_custkey"), zip5(col("c_name")).as("zip5"))
      .orderBy(col("c_custkey"))

  val o19 = """
    SELECT c_custkey, regexp_extract(c_name, '([0-9]{5})', 1) AS zip5
    FROM customer WHERE c_custkey % 37 = 0 ORDER BY c_custkey"""

  /** P10: timestamp part extraction + grouped counts. */
  def q20TimeParts(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
               month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("y"), col("m"))

  val o20 = """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(MONTH FROM o_orderdate) AS m,
      COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY y, m ORDER BY y, m"""

  /** S2: systematic k-th element sampler (deterministic variant). */
  def q21Sampler(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_id") % 97 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  val o21 = """
    SELECT event_id, user_id, event_type, value FROM events
    WHERE event_id % 97 = 0 ORDER BY event_id"""

  /** A5: top-10 contributors. */
  def q22TopContributors(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy(desc("n"), col("user_id"))
      .limit(10)

  val o22 = """
    SELECT user_id, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10"""

  /** A6: number of single-event users (nested aggregation). */
  def q23SingleEventUsers(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") === 1)
      .agg(count(lit(1)).as("n_single_users"))

  val o23 = """
    SELECT COUNT(*) AS n_single_users FROM (
      SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) = 1) t"""

  /** A4: grouped set-collect (defaultdict(set) shape) — sorted for
    * determinism; scalars alongside the array. */
  def q24GroupedCollect(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("user_id") < 20)
      .groupBy(col("event_type"))
      .agg(concat_ws(",", array_sort(collect_set(col("user_id")))).as("users"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  val o24 = """
    SELECT event_type,
      array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
      COUNT(DISTINCT user_id) AS n_users
    FROM events WHERE user_id < 20
    GROUP BY event_type ORDER BY event_type"""

  /** J1 semi-join chain (the "religion of worship places" pattern):
    * purchases of users that appear in the signup stream. */
  def q25SemiChain(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id")).distinct()
    e.filter(col("event_type") === "purchase")
      .join(signups, Seq("user_id"), "left_semi")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("total"))
      .orderBy(col("user_id"))
  }

  val o25 = """
    SELECT user_id, COUNT(*) AS n_purchases,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events WHERE event_type = 'purchase'
      AND user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
    GROUP BY user_id ORDER BY user_id"""

  /** EXT-P12: JSON field extraction from `events.props`. */
  def q26JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
           count(when(col("k") > 50, 1)).as("n_hi"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val o26 = """
    SELECT event_type, CAST(SUM(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      COUNT(CASE WHEN CAST(props::JSON->>'k' AS BIGINT) > 50 THEN 1 END) AS n_hi,
      COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** P9 under the oracle: phone canonicalization. No phone column
    * exists in the driver tables, so both engines deterministically
    * synthesize the same raw strings from c_custkey (two formats: a
    * "+1 (AAA) MMM-LLLL" international form and a dotted national
    * form), then normalize — strip punctuation, drop the US country
    * prefix, keep the 10-digit national number. */
  def q69PhoneNormalize(s: SparkSession, d: String): DataFrame = {
    val area = lpad((col("c_custkey") % 700 + 200).cast("string"), 3, "0")
    val mid  = lpad((col("c_custkey") % 900 + 100).cast("string"), 3, "0")
    val last = lpad((col("c_custkey") % 10000).cast("string"), 4, "0")
    val raw = when(col("c_custkey") % 2 === 0,
        concat(lit("+1 ("), area, lit(") "), mid, lit("-"), last))
      .otherwise(concat(area, lit("."), mid, lit("."), last))
    customer(s, d)
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey"), raw.as("raw_phone"),
              normalizePhone(raw).as("phone"))
      .orderBy(col("c_custkey"))
  }

  val o69 = """
    WITH raw AS (
      SELECT c_custkey,
        CASE WHEN c_custkey % 2 = 0 THEN
          '+1 (' || lpad(CAST(c_custkey % 700 + 200 AS VARCHAR), 3, '0') || ') '
            || lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0') || '-'
            || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
        ELSE
          lpad(CAST(c_custkey % 700 + 200 AS VARCHAR), 3, '0') || '.'
            || lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0') || '.'
            || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
        END AS raw_phone
      FROM customer WHERE c_custkey <= 300),
    dig AS (SELECT c_custkey, raw_phone,
              regexp_replace(raw_phone, '[^0-9]', '', 'g') AS digits FROM raw)
    SELECT c_custkey, raw_phone,
      CASE WHEN length(digits) = 11 AND digits LIKE '1%'
           THEN substr(digits, 2, 10) ELSE digits END AS phone
    FROM dig ORDER BY c_custkey"""

  // ---- q103: IQR outlier detection ----

  /** q103: per-event-type Tukey-fence outliers — rows whose value falls
    * outside [q1 − 1.5·IQR, q3 + 1.5·IQR] of their type. The standard
    * numeric-cleaning pass before training-metric aggregation.
    *
    * Scale shape: two-pass train-then-broadcast — the quantile agg
    * reduces to |types| rows (exact `percentile` here; at 100 TB swap
    * in `percentile_approx`, whose sketch is mergeable map-side, and
    * the fence arithmetic is unchanged), which broadcast-join back
    * against the unshuffled fact scan. The fact table never shuffles;
    * the only exchange is the |types|-row aggregate and the output
    * sort. */
  def q103IqrOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    // Fences rounded to 6 dp BEFORE the comparison (q127 lesson): the
    // two engines' quantile interpolation can differ in the final ulp,
    // and a data row exactly on an unrounded fence would flip sides.
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25)").as("q1"),
           expr("percentile(value, 0.75)").as("q3"))
      .withColumn("lo", round(col("q1") - (col("q3") - col("q1")) * 1.5, 6))
      .withColumn("hi", round(col("q3") + (col("q3") - col("q1")) * 1.5, 6))
      .select(col("event_type"), col("lo"), col("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .filter(col("value") < col("lo") || col("value") > col("hi"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
      .orderBy(col("event_id"))
  }

  val o103 = """
    WITH b AS (
      SELECT event_type, quantile_cont(value, 0.25) AS q1,
        quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type),
    f AS (
      SELECT event_type, ROUND(q1 - (q3 - q1) * 1.5, 6) AS lo,
        ROUND(q3 + (q3 - q1) * 1.5, 6) AS hi
      FROM b)
    SELECT e.event_id, e.event_type, e.value,
      ROUND(f.lo, 6) AS lo, ROUND(f.hi, 6) AS hi
    FROM events e JOIN f USING (event_type)
    WHERE e.value < f.lo OR e.value > f.hi
    ORDER BY e.event_id"""

  // ---- q104: column profiling report ----

  /** q104: one-pass data-profiling over `orders` — per column: row
    * count, non-null count, exact distinct count. The PROFILE/ANALYZE
    * primitive every warehouse exposes, in long form (one row per
    * column) so it unions across tables.
    *
    * Scale shape: a single aggregate; the multiple exact
    * COUNT(DISTINCT)s plan as one Expand (rows × |cols| map-side, each
    * tagged with its grouping id) feeding one partial+final agg — one
    * scan, one shuffle of distinct keys. At 100 TB swap
    * `approx_count_distinct` (HLL partials, no Expand) — the report
    * schema is unchanged. */
  val PROFILE_COLS = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  def q104ProfileColumns(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val aggs = count(lit(1)).as("n_rows") +:
      PROFILE_COLS.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")))
    val one = o.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(PROFILE_COLS.map(c =>
        struct(lit(c).as("column"), col("n_rows"),
          col(s"nn_$c").as("n_nonnull"),
          col(s"nd_$c").as("n_distinct"))): _*)).as("r"))
      .select(col("r.column"), col("r.n_rows"), col("r.n_nonnull"),
        col("r.n_distinct"))
      .orderBy(col("column"))
  }

  val o104 = PROFILE_COLS.map(c => s"""
    SELECT '$c' AS "column", COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
      COUNT(DISTINCT $c) AS n_distinct FROM orders""")
    .mkString("", " UNION ALL ", """ ORDER BY "column"""")

  // ---- q111: z-score standardization ----

  /** q111: per-event-type standardization — z = (x − μ)/σ with μ, σ
    * learned from the data itself, the feature-scaling pass that
    * precedes distance-based anything (q43/q47 cosine, k-means). Same
    * train-then-broadcast shape as q103: the moment aggregate reduces
    * to |types| rows of EXACT decimal sums (Σx, Σx² — map-side
    * combinable, order-independent where raw double sums would drift),
    * broadcast back against the unshuffled scan. The z arithmetic then
    * runs in double on identical inputs in both engines (sample
    * std, n−1). */
  def q111Zscore(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sx"),
        sum(dec2(col("value")) * dec2(col("value"))).cast("double").as("sxx"))
      .select(col("event_type"), (col("sx") / col("n")).as("mu"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("sigma"))
    ev.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mu")) / col("sigma"), 6).as("z"))
      .filter(abs(col("z")) > 2.0)
      .orderBy(col("event_id"))
  }

  val o111 = """
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(value AS DECIMAL(12,2))
               * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sxx
      FROM events GROUP BY event_type),
    m AS (
      SELECT event_type, sx / n AS mu,
        sqrt((sxx - sx * sx / n) / (n - 1)) AS sigma
      FROM s)
    SELECT e.event_id, e.event_type, e.value,
      ROUND((e.value - m.mu) / m.sigma, 6) AS z
    FROM events e JOIN m USING (event_type)
    WHERE abs(ROUND((e.value - m.mu) / m.sigma, 6)) > 2.0
    ORDER BY e.event_id"""

  // ---- q121: MAD robust outlier detection ----

  /** q121: median-absolute-deviation outliers per event type — rows
    * where |x − median| > 4.4478·MAD (the 3σ-equivalent under the
    * 1.4826 normal-consistency factor). The robust counterpart to
    * q103's Tukey fences and q111's z-scores: a few extreme values
    * cannot drag the fence, because both the center and the spread are
    * medians. The 4.4478 multiplier is written as ONE literal in both
    * engines — `3 * 1.4826` folded at different times could differ in
    * the last ulp.
    *
    * Scale shape: two train-then-broadcast passes over the unshuffled
    * fact scan — medians reduce to |types| rows (exact `percentile`
    * here; `percentile_approx`'s mergeable sketch at 100 TB), the
    * deviation median reuses the same shape on |x − med|, and the
    * final filter probes a broadcast |types|-row fence table. The fact
    * table is scanned, never shuffled. */
  def q121MadOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val fences = ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"),
           expr("percentile(abs(value - med), 0.5)").as("mad"))
      // Rounded before comparison — the q127 cross-engine tie lesson.
      .select(col("event_type"),
        round(col("med") - col("mad") * 4.4478, 6).as("lo"),
        round(col("med") + col("mad") * 4.4478, 6).as("hi"))
    ev.join(broadcast(fences), Seq("event_type"))
      .filter(col("value") < col("lo") || col("value") > col("hi"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
      .orderBy(col("event_id"))
  }

  val o121 = """
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    f AS (
      SELECT e.event_type, any_value(m.med) AS med,
        quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN m USING (event_type) GROUP BY e.event_type),
    b AS (
      SELECT event_type, ROUND(med - mad * 4.4478, 6) AS lo,
        ROUND(med + mad * 4.4478, 6) AS hi
      FROM f)
    SELECT e.event_id, e.event_type, e.value,
      ROUND(b.lo, 6) AS lo, ROUND(b.hi, 6) AS hi
    FROM events e JOIN b USING (event_type)
    WHERE e.value < b.lo OR e.value > b.hi
    ORDER BY e.event_id"""

  // ---- q180: winsorized robust aggregation ----

  /** q180: per-type winsorized mean — values clamped to the exact
    * [p05, p95] fences before aggregating, the standard robust
    * alternative to DROPPING outliers (q103 flags them; training
    * pipelines usually clamp features instead, keeping the row).
    *
    * Determinism chain: fences are rounded to 6 dp BEFORE the clamp
    * (the q103/q127 ulp lesson); each clamped double is frozen to
    * decimal(18,6) BEFORE summation (the q147 stance — decimal sums
    * are exact and association-order-free, which double sums across
    * 1000 executors are NOT), and only the final mean is one IEEE
    * division surfaced as double.
    *
    * Scale shape: exact p05/p95 over raw values costs a per-group
    * sort; at 100 TB swap the fence computation for the q149-style
    * value-run quantile (frequency-collapsed) or q75's sketch with a
    * fence-stability check — the clamp+sum pass is unchanged either
    * way (one map-side-combinable aggregate). */
  def q180Winsorize(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val fences = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.05)").as("p05"),
           expr("percentile(value, 0.95)").as("p95"))
      .select(col("event_type"),
        round(col("p05"), 6).as("lo"), round(col("p95"), 6).as("hi"))
    ev.join(broadcast(fences), Seq("event_type"))
      .withColumn("w", least(greatest(col("value"), col("lo")), col("hi"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("value") < col("lo"), 1L).otherwise(0L))
             .as("n_clamped_lo"),
           sum(when(col("value") > col("hi"), 1L).otherwise(0L))
             .as("n_clamped_hi"),
           (sum(col("w")).cast("double") / count(lit(1))).as("wmean"))
      .orderBy(col("event_type"))
  }

  val o180 = """
    WITH f AS (
      SELECT event_type,
        ROUND(quantile_cont(value, 0.05), 6) AS lo,
        ROUND(quantile_cont(value, 0.95), 6) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type, COUNT(*) AS n,
      CAST(SUM(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clamped_lo,
      CAST(SUM(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clamped_hi,
      CAST(SUM(CAST(LEAST(GREATEST(e.value, f.lo), f.hi)
        AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS wmean
    FROM events e JOIN f USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q180_winsorize"       -> (q180Winsorize _),
    "q121_mad_outliers"    -> (q121MadOutliers _),
    "q111_zscore"          -> (q111Zscore _),
    "q103_iqr_outliers"    -> (q103IqrOutliers _),
    "q104_profile_columns" -> (q104ProfileColumns _),
    "q69_phone_normalize"  -> (q69PhoneNormalize _),
    "q16_tag_classify"     -> (q16TagClassify _),
    "q17_key_split"        -> (q17KeySplit _),
    "q18_street_normalize" -> (q18StreetNormalize _),
    "q19_postcode"         -> (q19Postcode _),
    "q20_time_parts"       -> (q20TimeParts _),
    "q21_sampler"          -> (q21Sampler _),
    "q22_top_contributors" -> (q22TopContributors _),
    "q23_single_event_users" -> (q23SingleEventUsers _),
    "q24_grouped_collect"  -> (q24GroupedCollect _),
    "q25_semi_chain"       -> (q25SemiChain _),
    "q26_json_extract"     -> (q26JsonExtract _))

  val oracles: Map[String, String] = Map(
    "q180_winsorize" -> o180,
    "q16_tag_classify" -> o16, "q17_key_split" -> o17,
    "q18_street_normalize" -> o18, "q19_postcode" -> o19,
    "q20_time_parts" -> o20, "q21_sampler" -> o21,
    "q22_top_contributors" -> o22, "q23_single_event_users" -> o23,
    "q24_grouped_collect" -> o24, "q25_semi_chain" -> o25,
    "q26_json_extract" -> o26, "q69_phone_normalize" -> o69,
    "q103_iqr_outliers" -> o103, "q104_profile_columns" -> o104,
    "q111_zscore" -> o111, "q121_mad_outliers" -> o121)
}
