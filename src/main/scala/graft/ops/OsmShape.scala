package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's E2 ETL pipeline (SURVEY.md §3.1: `shape_element` →
  * validate → 5 relational tables) re-expressed as one declarative
  * Spark job per output table.
  *
  * Input: an "elements" DataFrame shaped like the XML stream —
  * `type` ('node'|'way'), scalar attributes, `tags array<struct<k,v>>`,
  * `nds array<long>` (ordered way members). Output: the SQL-track
  * tables `nodes`, `nodes_tags`, `ways`, `ways_tags`, `ways_nodes`.
  *
  * The reference fused cleaning into one hand-written per-element pass;
  * here each rule is a Column expression, so Catalyst fuses them into
  * a single codegen stage per output — same one-pass execution, but
  * derived by the optimizer instead of by hand, and distributed.
  * Validation is the cerberus analogue: a declarative predicate that
  * routes rows to the valid or corrupt side (no exceptions, no driver
  * round-trips).
  */
object OsmShape {

  val NODE_FIELDS: Seq[String] =
    Seq("id", "lat", "lon", "user", "uid", "version", "changeset", "timestamp")
  val WAY_FIELDS: Seq[String] =
    Seq("id", "user", "uid", "version", "changeset", "timestamp")

  /** Cerberus-style structural validation predicate. Null-safe: a NULL
    * lat/lon (or any three-valued-logic NULL) coerces to invalid, so
    * every row lands in exactly one of valid/corrupt — nothing is
    * silently dropped by a NULL predicate. */
  def isValid(elemType: Column): Column = {
    val base = col("id").isNotNull && col("uid").isNotNull &&
      col("timestamp").isNotNull
    val geo = coalesce(
      col("lat").between(-90, 90) && col("lon").between(-180, 180),
      lit(false))
    when(elemType === "node", base && geo).otherwise(base)
  }

  def shapeNodes(elements: DataFrame): DataFrame =
    elements.filter(col("type") === "node" && isValid(col("type")))
      .select(NODE_FIELDS.map(col): _*)

  def shapeWays(elements: DataFrame): DataFrame =
    elements.filter(col("type") === "way" && isValid(col("type")))
      .select(WAY_FIELDS.map(col): _*)

  /** Rows that fail validation — kept, not dropped (audit trail). */
  def corrupt(elements: DataFrame): DataFrame =
    elements.filter(!isValid(col("type")))

  /** Tags long table with the cleaning rules fused in:
    * P5 problem-char keys dropped, P4 colon split into (type, key),
    * P7 street-name canonicalization applied to addr:street values. */
  def shapeTags(elements: DataFrame, elemType: String,
                streetMapping: Map[String, String] = Map.empty): DataFrame = {
    val exploded = elements
      .filter(col("type") === elemType && isValid(col("type")))
      .select(col("id"), explode(col("tags")).as("t"))
      .select(col("id"), col("t.k").as("k"), col("t.v").as("v"))
      .filter(!col("k").rlike(Cleaning.PROBLEM))
    val mapped = streetMapping.foldLeft(
      when(lit(false), col("v"))) { case (acc, (from, to)) =>
        acc.when(Cleaning.lastToken(col("v")) === from,
          concat(regexp_replace(col("v"), "(\\S+)$", ""), lit(to)))
      }.otherwise(col("v"))
    exploded.select(
      col("id"),
      Cleaning.tagSubkey(col("k")).as("key"),
      when(Cleaning.tagType(col("k")) === "addr" &&
           Cleaning.tagSubkey(col("k")) === "street", mapped)
        .otherwise(col("v")).as("value"),
      Cleaning.tagType(col("k")).as("type"))
  }

  /** Ordered way membership via posexplode (position preserved). */
  def shapeWayNodes(elements: DataFrame): DataFrame =
    elements.filter(col("type") === "way" && isValid(col("type")))
      .select(col("id"), posexplode(col("nds")).as(Seq("position", "node_id")))
      .select(col("id"), col("node_id"), col("position"))

  /** Ordered, TYPED relation membership via posexplode: (relation id,
    * member type, member ref, role, position). The relation analogue of
    * `shapeWayNodes` — position preserves the member sequence, mtype and
    * role preserve the typed-membership semantics `<member>` carries
    * beyond a way's bare `<nd ref>`. */
  def shapeRelationMembers(elements: DataFrame): DataFrame =
    elements.filter(col("type") === "relation" && isValid(col("type")))
      .select(col("id"), posexplode(col("members")).as(Seq("position", "m")))
      .select(col("id"), col("m.mtype").as("member_type"),
        col("m.ref").as("member_ref"), col("m.role").as("role"),
        col("position"))

  /** The full E2 pipeline: one scan, five outputs. */
  def shapeAll(elements: DataFrame,
               streetMapping: Map[String, String] = Map.empty)
      : Map[String, DataFrame] = Map(
    "nodes"      -> shapeNodes(elements),
    "nodes_tags" -> shapeTags(elements, "node", streetMapping),
    "ways"       -> shapeWays(elements),
    "ways_tags"  -> shapeTags(elements, "way", streetMapping),
    "ways_nodes" -> shapeWayNodes(elements))
}
