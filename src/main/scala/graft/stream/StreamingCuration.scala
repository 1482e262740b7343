package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.text.{CorpusPipeline, Dedup, TextOps}

/** The corpus-curation operators lifted into Structured Streaming — the
  * ingest-time form of the batch pipeline (q78/q39/q41): documents
  * arrive as files in object storage, micro-batches curate and dedup
  * them incrementally with state carried across batches.
  *
  * Row-local stages (quality score, language-ID, fingerprint) are the
  * SAME Column expressions as batch — they lift unchanged. The two
  * stateful stages differ by design:
  *  - exact dedup: `dropDuplicates("fp")` — streaming state keyed by
  *    fingerprint (bounded by |distinct docs|; at 100 TB use
  *    `dropDuplicatesWithinWatermark` to bound it by time instead).
  *  - near-dup: the LSH bucket index becomes streaming STATE —
  *    `flatMapGroupsWithState` keyed by band bucket holds the doc ids
  *    seen per bucket and emits candidate pairs (new × seen) as docs
  *    arrive; candidates then exact-verify exactly like batch q41.
  *    State per bucket is the bucket's collision list — the same
  *    object a persisted LSH index stores, so RocksDB-backed state IS
  *    the index at scale.
  *
  * StreamingSpec proves both paths equal their batch counterparts on
  * a two-file split where cross-file pairs exist only if state
  * survives micro-batch boundaries; `tools.StreamGate` runs the same
  * end-to-end on RocksDB + a real file sink each round and commits
  * the row-count + checksum artifact. */
object StreamingCuration {

  /** Quality + language filter + exact fingerprint dedup — batch or
    * stream (all stages are engine-agnostic Column transforms). */
  def curate(df: DataFrame): DataFrame =
    TextOps.withQuality(df)
      .filter(TextOps.langGuess(col("text")) === "en"
        && col("quality") >= CorpusPipeline.QUALITY_FLOOR)
      .withColumn("fp", md5(lower(col("text"))))
      .dropDuplicates("fp")
      .select(col("doc_id"), col("fp"))

  /** Banded MinHash bucket keys as strings — identical band contents
    * to batch q41's `bandBuckets` (same codegen signature expression),
    * string-keyed so the stream can group on one column. */
  def bucketKeys(df: DataFrame): DataFrame = {
    val sigs = df
      .select(col("doc_id"),
        graft.functions.ShingleSet.shingle_set(col("text")).as("sgs"))
      .filter(size(col("sgs")) > 0)
      .select(col("doc_id"), graft.functions.MinhashSig
        .minhash_sig(col("sgs"), Dedup.NUM_HASHES).as("sig"))
    val keys = (0 until Dedup.BANDS).map { b =>
      val hs = (0 until Dedup.ROWS_PER_BAND).map(r =>
        element_at(col("sig"), b * Dedup.ROWS_PER_BAND + r + 1))
      concat_ws(":", (lit(b) +: hs): _*)
    }
    sigs.select(col("doc_id"), explode(array(keys: _*)).as("bk"))
  }

  /** Stateful LSH candidate generation over a STREAMING (doc_id, text)
    * frame: per-bucket doc-id state emits (i, j) candidate pairs with
    * i < j as new docs collide with previously-seen ones. Candidates
    * are a superset of the true pairs — run them through the same
    * exact verification as batch q41 (`Dedup` join) downstream. */
  def lshCandidatePairs(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    bucketKeys(df)
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[(Long, Long)]
          rows.map(_._1).toSeq.distinct.foreach { id =>
            if (!seen.contains(id)) {
              seen.foreach(o =>
                out += ((math.min(id, o), math.max(id, o))))
              seen = seen :+ id
            }
          }
          state.update(seen)
          out.result().iterator
      }.toDF("i", "j")
  }
}
