package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** TPC-H relational-completeness batch (q182–q188).
  *
  * The reference family's workload is OLAP over a star schema; rounds 1–5
  * covered Q1/Q5/Q18/Q21 shapes. This module adds the remaining canonical
  * TPC-H access patterns — min-per-group join-back (Q2), bidirectional
  * dimension-pair volume (Q7), conditional-aggregate market share (Q8),
  * top-k by filtered revenue (Q10), argmax-over-aggregate-view (Q15),
  * excluded-set distinct census (Q16), scalar-avg + anti-join (Q22) —
  * adapted to the driver schema (no partsupp table; lineitem plays the
  * part-supplier offer relation, s_acctbal<0 plays the complaint flag).
  *
  * House arithmetic stance: money is summed as DECIMAL (exact, order-
  * independent — stable under AQE re-plans and retries at 1000-executor
  * scale) and surfaced either as integer cents / hundredth-cents (c4) or
  * as one final decimal→double conversion; ratios are int64 millionths
  * via integral division, never a float divide of floats.
  */
object TpchShapes {

  /** extendedprice·(1−discount) in exact hundredths of a cent (the 2dp×2dp
    * product has exactly 4 decimal places, so ·10⁴ is integral). Kept in
    * DECIMAL(38,0) through the aggregate: at 100 TB the corpus-wide sum
    * exceeds int64 (~1e9 per row × 1e12 rows), and Spark long-sum overflow
    * wraps silently. */
  private val revC4: org.apache.spark.sql.Column =
    (dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))) * 10000)
      .cast(DecimalType(38, 0))

  private val ORA_REV_C4 =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT)"

  // ---- q182: min-cost supplier per part (TPC-H Q2 shape) ----

  /** Parts this size and under are "small-lot" — the Q2-style selective
    * part predicate. */
  val Q2_MAX_SIZE = 10

  /** q182: for every small part, the supplier(s) quoting the minimum
    * offer price, where an offer is a supplier's cheapest historical
    * line price for that part.
    *
    * Q2's correlated `WHERE cost = (SELECT min(cost) … WHERE pk = outer.pk)`
    * is decorrelated into one per-(part,supplier) aggregate, a per-part
    * min re-aggregate, and an equi-join-back — the oracle RUNS the
    * correlated form, proving the rewrite. Scale shape: the selective
    * part filter is broadcast INTO the fact scan (2 joins before any
    * shuffle prune ~80% of lineitem), so the only wide exchanges are the
    * two keyed aggregates; the min table is a per-part sliver that AQE
    * broadcasts back onto the offers. */
  def q182MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val smallParts = part(s, d).filter(col("p_size") <= Q2_MAX_SIZE)
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    val offers = lineitem(s, d)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_brand"), col("p_type"),
        col("l_suppkey"))
      .agg(min((dec2(col("l_extendedprice")) * 100).cast("long"))
        .as("offer_cents"))
    val best = offers.groupBy(col("p_partkey").as("bk"))
      .agg(min(col("offer_cents")).as("best_cents"))
    offers
      .join(best, col("p_partkey") === col("bk") &&
        col("offer_cents") === col("best_cents"))
      .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("s_name"),
        col("offer_cents"))
      .orderBy(desc("offer_cents"), col("p_partkey"), col("s_name"))
      .limit(100)
  }

  val o182 = s"""
    WITH offers AS (
      SELECT p_partkey, p_brand, p_type, l_suppkey,
        CAST(min(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT)
          AS offer_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= $Q2_MAX_SIZE
      GROUP BY 1, 2, 3, 4)
    SELECT o.p_partkey, o.p_brand, o.p_type, s_name, o.offer_cents
    FROM offers o JOIN supplier ON o.l_suppkey = s_suppkey
    WHERE o.offer_cents = (SELECT min(o2.offer_cents) FROM offers o2
                           WHERE o2.p_partkey = o.p_partkey)
    ORDER BY o.offer_cents DESC, o.p_partkey, s_name LIMIT 100"""

  // ---- q183: bidirectional nation-pair trade volume (TPC-H Q7 shape) ----

  /** Chosen so both trade directions are populated even at sf0.001 (the
    * supplier table has only 10 rows there, so most nation pairs have
    * flow in at most one direction). */
  val Q7_NATION_A = "NATION_18"
  val Q7_NATION_B = "NATION_19"

  /** q183: shipped revenue between a nation pair, both directions, by
    * ship year — supplier nation on one leg, customer nation via orders
    * on the other.
    *
    * Scale shape: each dimension chain (supplier→nation, customer→nation)
    * is pre-filtered to the two named nations and broadcast, so lineitem
    * is cut to the matching-supplier sliver BEFORE the only wide join
    * (l_orderkey = o_orderkey against similarly-filtered orders); the
    * pair-direction predicate is applied post-join row-locally. One fact
    * shuffle, one aggregate. */
  def q183TradeVolume(s: SparkSession, d: String): DataFrame = {
    val natPair = nation(s, d)
      .filter(col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
    val supp = supplier(s, d)
      .join(broadcast(natPair), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer(s, d)
      .join(broadcast(natPair), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = orders(s, d)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    lineitem(s, d)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum(revC4).cast("long").as("rev_c4"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  val o183 = s"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      CAST(SUM($ORA_REV_C4) AS BIGINT) AS rev_c4,
      COUNT(*) AS n_lines
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('$Q7_NATION_A', '$Q7_NATION_B')
      AND cn.n_name IN ('$Q7_NATION_A', '$Q7_NATION_B')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // ---- q184: regional market share of one supplier nation (Q8 shape) ----

  val Q8_REGION = "ASIA"
  val Q8_SUPP_NATION = "NATION_2"

  /** q184: per order year, the share (int64 millionths) of ASIA-customer
    * revenue supplied from NATION_2.
    *
    * The textbook form joins twice and divides two float aggregates;
    * here both numerator and denominator come out of ONE conditional
    * aggregate over the region-filtered fact slice (`sum(when(supp=…))`),
    * so the fact table is scanned and shuffled once. Sums stay
    * DECIMAL(38,0) (int64 would wrap at 100 TB); the share is integral
    * division in decimal, exact on both engines (DuckDB's HUGEINT sum
    * mirrors the 38-digit headroom). */
  def q184MarketShare(s: SparkSession, d: String): DataFrame = {
    val regionCust = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === Q8_REGION)
      .select(col("c_custkey"))
    val suppNation = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = orders(s, d)
      .join(regionCust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("order_year"))
    lineitem(s, d)
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("order_year").cast("long").as("order_year"))
      .agg(
        sum(when(col("supp_nation") === Q8_SUPP_NATION, revC4)
          .otherwise(lit(0).cast(DecimalType(38, 0)))).as("target_c4"),
        sum(revC4).as("total_c4"))
      .select(col("order_year"),
        col("target_c4").cast("long").as("target_c4"),
        col("total_c4").cast("long").as("total_c4"),
        expr("cast((target_c4 * 1000000) div total_c4 as bigint)")
          .as("share_micro"))
      .orderBy(col("order_year"))
  }

  val o184 = s"""
    SELECT CAST(order_year AS BIGINT) AS order_year,
      CAST(target_c4 AS BIGINT) AS target_c4,
      CAST(total_c4 AS BIGINT) AS total_c4,
      CAST(target_c4 * 1000000 // total_c4 AS BIGINT) AS share_micro
    FROM (
      SELECT year(o_orderdate) AS order_year,
        SUM(CASE WHEN sn.n_name = '$Q8_SUPP_NATION' THEN $ORA_REV_C4
                 ELSE 0 END) AS target_c4,
        SUM($ORA_REV_C4) AS total_c4
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
      WHERE r_name = '$Q8_REGION'
      GROUP BY 1)
    ORDER BY order_year"""

  // ---- q185: returned-item revenue ranking (TPC-H Q10 shape) ----

  val Q10_FROM = "1997-01-01"
  val Q10_TO   = "1997-07-01"

  /** q185: top 20 customers by revenue on returned lines (flag 'R') for
    * orders placed in 1997H1.
    *
    * Scale shape: both fact-side filters (return flag on lineitem, date
    * window on orders) are pushed to their scans — `PushedFilters` shows
    * both — so the l_orderkey join moves ~1/6 × ~1/12 of each table;
    * customer+nation broadcast onto the aggregate's output (|customers
    * with returns in the window|, not |lineitem|). Revenue is the exact
    * c4 integer; ties broken by custkey for stable top-20. */
  def q185ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val windowOrders = orders(s, d)
      .filter(col("o_orderdate") >= Q10_FROM && col("o_orderdate") < Q10_TO)
      .select(col("o_orderkey"), col("o_custkey"))
    val returned = lineitem(s, d).filter(col("l_returnflag") === "R")
    returned
      .join(windowOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(revC4).cast("long").as("rev_c4"), count(lit(1)).as("n_lines"))
      .join(broadcast(customer(s, d)
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("rev_c4"),
        col("n_lines"))
      .orderBy(desc("rev_c4"), col("c_custkey"))
      .limit(20)
  }

  val o185 = s"""
    SELECT c_custkey, c_name, n_name,
      CAST(SUM($ORA_REV_C4) AS BIGINT) AS rev_c4, COUNT(*) AS n_lines
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '$Q10_FROM'
      AND o_orderdate <  TIMESTAMP '$Q10_TO'
    GROUP BY 1, 2, 3
    ORDER BY rev_c4 DESC, c_custkey LIMIT 20"""

  // ---- q186: supplier(s) with maximum quarterly revenue (Q15 shape) ----

  val Q15_FROM = "1997-01-01"
  val Q15_TO   = "1997-04-01"

  /** q186: the supplier(s) whose 1997Q1 shipped revenue equals the global
    * maximum — Q15's argmax-over-an-aggregate-view.
    *
    * Scale shape: the revenue view is one keyed aggregate of the date-
    * pruned fact slice; the global max is a 1-row aggregate of that view
    * broadcast back for the equality join (NOT an unpartitioned window
    * over the view — rank() over () would serialize |suppliers| rows
    * through one task at scale). Exact c4 integers make "equals max"
    * well-defined — with float revenue the argmax set itself would be
    * engine-dependent. */
  def q186TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= Q15_FROM && col("l_shipdate") < Q15_TO)
      .groupBy(col("l_suppkey"))
      .agg(sum(revC4).cast("long").as("total_rev_c4"))
    val mx = rev.agg(max(col("total_rev_c4")).as("max_rev_c4"))
    rev
      .join(broadcast(mx), col("total_rev_c4") === col("max_rev_c4"))
      .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_c4"))
      .orderBy(col("s_suppkey"))
  }

  val o186 = s"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM($ORA_REV_C4) AS BIGINT) AS total_rev_c4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '$Q15_FROM'
        AND l_shipdate <  TIMESTAMP '$Q15_TO'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_rev_c4
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev_c4 = (SELECT max(total_rev_c4) FROM rev)
    ORDER BY s_suppkey"""

  // ---- q187: supplier census per part class (TPC-H Q16 shape) ----

  val Q16_EXCLUDED_BRANDS = Seq("Brand#1", "Brand#2")

  /** q187: distinct suppliers per (brand, type, size) over small parts,
    * excluding two brands and any supplier with a negative account
    * balance (the schema's stand-in for Q16's complaint filter).
    *
    * Scale shape: lineitem collapses to DISTINCT (partkey, suppkey)
    * FIRST (one shuffle on the pair key, map-side combine does most of
    * the work) — the part attributes and the excluded-supplier anti-join
    * are broadcast onto that collapsed pair set, never onto raw
    * lineitem. The final distinct-count aggregate reuses the pair
    * exchange via partial aggregation. */
  def q187SupplierCensus(s: SparkSession, d: String): DataFrame = {
    val pairs = lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val keptParts = part(s, d)
      .filter(!col("p_brand").isin(Q16_EXCLUDED_BRANDS: _*) &&
        col("p_size") <= Q2_MAX_SIZE)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complained = supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    pairs
      .join(broadcast(complained), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(keptParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val o187 = s"""
    SELECT p_brand, p_type, p_size,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      JOIN part ON l_partkey = p_partkey
    WHERE p_brand NOT IN (${Q16_EXCLUDED_BRANDS.map("'" + _ + "'").mkString(", ")})
      AND p_size <= $Q2_MAX_SIZE
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  // ---- q188: dormant high-balance customers (TPC-H Q22 shape) ----

  val Q22_CUTOFF = "2000-02-01"

  /** q188: customers whose balance exceeds the average positive balance
    * and who placed no order on/after the cutoff, bucketed by the last
    * digit of their name (the schema's stand-in for Q22's phone country
    * code): bucket count + exact balance cents.
    *
    * Scale shape: the scalar average is a 1-row aggregate broadcast into
    * the customer filter (Q22's correlated scalar subquery,
    * decorrelated); the "no recent order" NOT EXISTS is a left-anti
    * against orders pre-collapsed to DISTINCT o_custkey of the date
    * slice (the date filter is scan-pushed, and the collapse means the
    * anti-join probes |active customers| keys, not |orders| rows).
    * The `bal > avg` threshold is evaluated as `bal_cents · n > Σcents`
    * — all-int64, because DuckDB's avg(DECIMAL) is DOUBLE while Spark's
    * stays DECIMAL, and a boundary balance within double-rounding of the
    * exact mean would make the two engines disagree. (Headroom: cents
    * ≤1e6 × n ≤1e9 customers = 1e15, well inside int64.) */
  def q188DormantRich(s: SparkSession, d: String): DataFrame = {
    val cents = (dec2(col("c_acctbal")) * 100).cast("long")
    val avgPos = customer(s, d).filter(col("c_acctbal") > 0)
      .agg(sum(cents).as("pos_cents"), count(lit(1)).as("n_pos"))
    val recentCust = orders(s, d)
      .filter(col("o_orderdate") >= Q22_CUTOFF)
      .select(col("o_custkey")).distinct()
    customer(s, d)
      .join(broadcast(avgPos))
      .filter(cents * col("n_pos") > col("pos_cents"))
      .join(recentCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(substring(col("c_name"), -1, 1).as("name_bucket"))
      .agg(count(lit(1)).as("n_cust"),
        sum((dec2(col("c_acctbal")) * 100).cast("long")).as("bal_cents"))
      .orderBy(col("name_bucket"))
  }

  val o188 = s"""
    SELECT name_bucket, COUNT(*) AS n_cust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS bal_cents
    FROM (
      SELECT substring(c_name, length(c_name), 1) AS name_bucket, c_acctbal
      FROM customer
      WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) *
          (SELECT count(*) FROM customer WHERE c_acctbal > 0) >
          (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT)
           FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '$Q22_CUTOFF'))
    GROUP BY 1 ORDER BY name_bucket"""

  // ---- q197: small-quantity-order revenue (TPC-H Q17 shape) ----

  val Q17_BRAND = "Brand#3"

  /** q197: revenue from lines of one brand whose quantity is below 20%
    * of that part's average line quantity — Q17's correlated-average
    * threshold.
    *
    * The correlated `< 0.2·avg` is decorrelated into one per-part
    * (Σqty, n) aggregate joined back, and the threshold is evaluated as
    * `5·qty·n < Σqty` — all-integer (an 0.2·avg float threshold could
    * flip a boundary line between engines; the oracle RUNS the
    * correlated form, in the same integer algebra, proving both the
    * decorrelation and the arithmetic agree). Scale shape: the brand
    * filter broadcasts into BOTH the aggregate build and the probe, so
    * the per-part stats are computed only for the ~1/25 brand slice;
    * one fact shuffle for the aggregate, and the (part → stats) sliver
    * broadcasts back onto the probe. */
  def q197SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val units = dec2(col("l_quantity")).cast("long")
    val brandParts = part(s, d).filter(col("p_brand") === Q17_BRAND)
      .select(col("p_partkey"))
    val stats = lineitem(s, d)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("sk"))
      .agg(sum(units).as("sq"), count(lit(1)).as("nq"))
    lineitem(s, d)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(stats), col("l_partkey") === col("sk"))
      .filter(units * 5 * col("nq") < col("sq"))
      .agg(count(lit(1)).as("n_lines"), sum(revC4).cast("long").as("rev_c4"))
  }

  val o197 = s"""
    SELECT COUNT(*) AS n_lines,
      CAST(COALESCE(SUM($ORA_REV_C4), 0) AS BIGINT) AS rev_c4
    FROM lineitem l JOIN part ON l_partkey = p_partkey
    WHERE p_brand = '$Q17_BRAND'
      AND CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) * 5 *
          (SELECT COUNT(*) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey) <
          (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS BIGINT)
           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"""

  // ---- q198: disjunctive predicate join (TPC-H Q19 shape) ----

  /** (brand, max p_size, qty lo, qty hi) arms of the OR. */
  val Q19_ARMS = Seq(("Brand#11", 5, 1L, 11L), ("Brand#22", 10, 10L, 20L),
    ("Brand#3", 15, 20L, 30L))

  /** q198: revenue matching an OR-of-ANDs predicate that spans both
    * sides of the part join — Q19's shape, the classic test of whether
    * an engine degrades to evaluate-nothing-until-joined.
    *
    * Catalyst does not infer the implied union predicates from a
    * disjunction, so they are stated explicitly: brand ∈ {arms} and
    * size ≤ max(arm sizes) prune the part scan, qty ≤ max(arm his)
    * prunes the fact scan (both visible as PushedFilters), the
    * surviving part sliver broadcasts, and the full disjunction then
    * evaluates row-locally post-join. Same answer, but the join moves
    * the ~arm-selectivity slice instead of whole tables. */
  def q198DisjunctiveJoin(s: SparkSession, d: String): DataFrame = {
    val units = dec2(col("l_quantity")).cast("long")
    val brands = Q19_ARMS.map(_._1)
    val maxSize = Q19_ARMS.map(_._2).max
    val maxQty = Q19_ARMS.map(_._4).max
    val parts = part(s, d)
      .filter(col("p_brand").isin(brands: _*) && col("p_size") <= maxSize)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val arm = Q19_ARMS.map { case (b, sz, lo, hi) =>
      col("p_brand") === b && col("p_size") <= sz &&
        units >= lo && units <= hi
    }.reduce(_ || _)
    lineitem(s, d)
      .filter(units <= maxQty)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .filter(arm)
      .agg(count(lit(1)).as("n_lines"), sum(revC4).cast("long").as("rev_c4"))
  }

  val o198 = {
    val arms = Q19_ARMS.map { case (b, sz, lo, hi) =>
      s"""(p_brand = '$b' AND p_size <= $sz
         AND CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT)
           BETWEEN $lo AND $hi)"""
    }.mkString(" OR ")
    s"""
    SELECT COUNT(*) AS n_lines,
      CAST(COALESCE(SUM($ORA_REV_C4), 0) AS BIGINT) AS rev_c4
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE $arms"""
  }

  // ---- q199: deterministic grouped string aggregation ----

  /** q199: per market segment, the top-3 nations by customer count as
    * one "nation:count" CSV cell — the LISTAGG/string_agg export shape.
    *
    * `collect_list` order is partitioning-dependent, so the house rule
    * applies doubly here: the list is built from (rank, string) structs
    * and `sort_array`-ed BEFORE `concat_ws`, making the cell
    * byte-identical across partitionings (the determinism sweep would
    * catch anything less); the oracle's `string_agg(… ORDER BY)` is the
    * same contract. Scale shape: two keyed aggregates + a top-k window
    * over the (segment × nation) aggregate — domain-bounded; the csv
    * cell concatenates ≤ 3 elements per group. */
  def q199TopNationsCsv(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("c_mktsegment"))
        .orderBy(desc("cnt"), col("n_name"))))
      .filter(col("rk") <= 3)
      .groupBy(col("c_mktsegment"))
      .agg(concat_ws(",", transform(
        sort_array(collect_list(struct(col("rk"),
          concat_ws(":", col("n_name"), col("cnt")).as("cell")))),
        x => x.getField("cell"))).as("top_nations"))
      .orderBy(col("c_mktsegment"))
  }

  val o199 = """
    WITH counts AS (
      SELECT c_mktsegment, n_name, count(*) AS cnt
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT c_mktsegment, n_name, cnt, row_number() OVER (
        PARTITION BY c_mktsegment ORDER BY cnt DESC, n_name) AS rk
      FROM counts)
    SELECT c_mktsegment,
      string_agg(n_name || ':' || cnt, ',' ORDER BY rk) AS top_nations
    FROM ranked WHERE rk <= 3
    GROUP BY 1 ORDER BY c_mktsegment"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_small_qty_revenue" -> (q197SmallQtyRevenue _),
    "q198_disjunctive_join"  -> (q198DisjunctiveJoin _),
    "q199_top_nations_csv"   -> (q199TopNationsCsv _),
    "q182_min_cost_supplier" -> (q182MinCostSupplier _),
    "q183_trade_volume"      -> (q183TradeVolume _),
    "q184_market_share"      -> (q184MarketShare _),
    "q185_returned_items"    -> (q185ReturnedItems _),
    "q186_top_supplier"      -> (q186TopSupplier _),
    "q187_supplier_census"   -> (q187SupplierCensus _),
    "q188_dormant_rich"      -> (q188DormantRich _))

  val oracles: Map[String, String] = Map(
    "q197_small_qty_revenue" -> o197,
    "q198_disjunctive_join"  -> o198,
    "q199_top_nations_csv"   -> o199,
    "q182_min_cost_supplier" -> o182,
    "q183_trade_volume"      -> o183,
    "q184_market_share"      -> o184,
    "q185_returned_items"    -> o185,
    "q186_top_supplier"      -> o186,
    "q187_supplier_census"   -> o187,
    "q188_dormant_rich"      -> o188)
}
