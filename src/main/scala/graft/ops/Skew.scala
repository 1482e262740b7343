package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / builder scale mandate).
  *
  * AQE's skew-join split handles most hot keys at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even
  * split partitions overwhelm a task, or when the shuffle must be
  * pre-balanced (e.g., before a stateful window). The salted join is
  * semantically identical to the plain equi-join (asserted in
  * ScaleSpec): the probe side scatters each row to one of `salts`
  * sub-keys, the build side replicates across all of them.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side scattered over
    * `salts` sub-partitions per key and the small side replicated. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // Only semantics-preserving when unmatched SMALL rows are never
    // emitted: right/full outer would emit each unmatched small row
    // once per salt replica. Fail fast on misuse; accept every Spark
    // spelling of the safe left-ish types.
    val normalized = joinType.toLowerCase.replace("_", "").replace(" ", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti").contains(normalized),
      s"saltedJoin does not preserve semantics for joinType=$joinType " +
        "(replicated small side would duplicate unmatched rows)")
    val bigS = big.withColumn("__salt",
      pmod((rand(42) * salts).cast("int"), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency table — the detection half of skew handling:
    * feed its top rows into a salts decision or a broadcast list. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("key")).limit(topN)
}
