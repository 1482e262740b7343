package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing (north star): media payloads as opaque
  * `binary` columns with typed metadata, decode/feature-extract as
  * partition-wise transforms.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`decodeStub`): it derives fake
  * dimensions from the payload bytes. Everything around it — binary
  * schema, batch shape, partition-wise execution, metadata struct — is
  * the real plumbing a codec-backed decoder would drop into (swap
  * `fakeDecode` for the JNI/FFI call; the Spark plan is unchanged).
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       format: String)

  /** DETERMINISTIC FAKE of a media decode — stands in for e.g. libjpeg.
    * Derives stable pseudo-dimensions from payload length and first
    * bytes; a real build replaces only this function. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val head = if (payload.nonEmpty) payload(0) & 0xff else 0
    MediaMeta(docId, n, (64 + n % 512).toInt, (64 + (n * 7 + head) % 512).toInt,
      if (n % 2 == 0) "png" else "jpeg")
  }

  /** Partition-wise decode over a binary column — the Scala analogue of a
    * `mapInPandas` decode UDF: one iterator pass per partition, no
    * per-row task overhead, codec state reusable across rows. */
  def decodeStub(df: DataFrame)(implicit s: SparkSession): Dataset[MediaMeta] = {
    import s.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => fakeDecode(id, bytes) } }
  }

  /** Frame sampling over a binary payload: every k-th fixed-size block
    * (the video-frame-subsample shape — deterministic, pure expression,
    * no data leaves the executor). */
  def frameSample(payload: org.apache.spark.sql.Column, blockSize: Int,
                  everyK: Int): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0),
        greatest((length(payload) / blockSize).cast("int") - 1, lit(0)),
        lit(everyK)),
      i => payload.substr(i * blockSize + 1, lit(blockSize)))

  /** Resize stub: recompute the fake dimensions to a bounded box,
    * preserving the deterministic contract of `fakeDecode`. */
  def resizeStub(m: MediaMeta, maxSide: Int): MediaMeta = {
    val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
    m.copy(width = math.max(1, (m.width * scale).toInt),
           height = math.max(1, (m.height * scale).toInt))
  }

  /** Feature extraction over a binary payload: L1-normalized byte
    * histogram as an Array[Float] embedding — the partition-wise
    * "model inference" slot (swap for an ONNX/codec call; schema,
    * batch shape and downstream ANN compatibility stay identical). */
  def byteHistogram(payload: Array[Byte], bins: Int = 64): Array[Float] = {
    val h = new Array[Float](bins)
    var i = 0
    while (i < payload.length) { h((payload(i) & 0xff) % bins) += 1f; i += 1 }
    if (payload.length > 0) {
      var j = 0
      while (j < bins) { h(j) /= payload.length; j += 1 }
    }
    h
  }

  /** Binary column → embedding column, partition-wise (mapInPandas
    * analogue), ready for graft.sim ANN operators. */
  def embedStub(df: DataFrame, bins: Int = 64)
               (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, byteHistogram(bytes, bins)) })
      .toDF("doc_id", "embedding")
  }

  /** q45: binary payload + metadata extraction, SQL-expressible part.
    * (The decodeStub path is exercised in MultimodalSpec; the registry
    * query keeps to expressions both engines can hash-match.) */
  def q45MultimodalMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        (lit(64) + length(col("payload")) % 512).cast("long").as("width"),
        (lit(64) + (length(col("payload")) * 7) % 512).cast("long").as("height"))
      .orderBy(col("doc_id"))

  val o45 = """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      md5(text) AS digest,
      CAST(64 + strlen(text) % 512 AS BIGINT) AS width,
      CAST(64 + (strlen(text) * 7) % 512 AS BIGINT) AS height
    FROM documents ORDER BY doc_id"""

  /** q71: frame sampling under the oracle. The Spark side materializes
    * the sampled frames (every 4th 16-byte block) and measures them;
    * the oracle derives the same frame count and first/last lengths
    * arithmetically — any off-by-one in the sampling expression breaks
    * the hash match. */
  val FRAME_BLOCK = 16
  val FRAME_EVERY = 4
  def q71FrameStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        frameSample(col("payload"), FRAME_BLOCK, FRAME_EVERY).as("frames"),
        length(col("payload")).as("b"))
      .select(col("doc_id"),
        size(col("frames")).cast("long").as("n_frames"),
        length(element_at(col("frames"), 1)).cast("long").as("first_len"),
        length(element_at(col("frames"), -1)).cast("long").as("last_len"),
        col("b").cast("long").as("n_bytes"))
      .orderBy(col("doc_id"))

  val o71 = s"""
    SELECT doc_id,
      top // $FRAME_EVERY + 1 AS n_frames,
      LEAST($FRAME_BLOCK, b) AS first_len,
      LEAST($FRAME_BLOCK, b - (top // $FRAME_EVERY * $FRAME_EVERY) * $FRAME_BLOCK)
        AS last_len,
      b AS n_bytes
    FROM (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS b,
        GREATEST(CAST(length(text) AS BIGINT) // $FRAME_BLOCK - 1, 0) AS top
      FROM documents)
    ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_multimodal_meta" -> (q45MultimodalMeta _),
    "q71_frame_stats"     -> (q71FrameStats _))

  val oracles: Map[String, String] = Map(
    "q45_multimodal_meta" -> o45, "q71_frame_stats" -> o71)
}
