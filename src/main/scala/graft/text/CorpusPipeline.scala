package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The end-to-end corpus-curation composition an LLM training-data
  * pipeline actually runs (north star capstone): language filter →
  * quality floor → near-dup clustering → keeper selection. Each stage
  * is an operator already under the oracle (q35/q36/q40/q76); this
  * query proves they COMPOSE — one declarative plan, filters running
  * row-local in the scan stage before any shuffle, dedup clustering
  * only over the surviving subset.
  *
  * Scale order matters and is encoded here: the cheap row-local
  * predicates (lang heuristic, quality score) run first so the
  * expensive similarity join shingles only survivors — at 100 TB the
  * survivor filter is what keeps the inverted index buildable. */
object CorpusPipeline {

  val QUALITY_FLOOR = 0.5

  /** q78: curated corpus — predicted-English documents above the
    * quality floor, one keeper per near-dup cluster (the cluster's min
    * doc_id), with the per-doc quality evidence kept as columns. */
  def q78CorpusPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val survivors = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        size(expr("filter(toks, t -> t IN ('the','a','of','and'))")).cast("long"))
      .withColumn("quality", round(
        (lit(1.0) - col("n_stop").cast("double") / col("n_tok"))
          * least(col("n_tok"), lit(100)).cast("double") / 100.0, 6))
      .filter(TextOps.langGuess(col("text")) === "en"
        && col("quality") >= QUALITY_FLOOR)
      .select(col("doc_id"), col("text"), col("n_tok"), col("quality"))
    // dedup over survivors only: shingle AFTER the cheap filters
    val arr = survivors
      .select(col("doc_id"),
        graft.functions.ShingleSet.shingle_set(col("text")).as("sgs"))
      .filter(size(col("sgs")) > 0)
    val pairs = Dedup.jaccardPairs(s, arr).select(col("i"), col("j"))
    val labels = DedupCluster.connectedComponents(pairs)
      .withColumnRenamed("node", "doc_id")
    survivors
      .join(labels, Seq("doc_id"), "left")
      .filter(coalesce(col("root"), col("doc_id")) === col("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("quality"))
      .orderBy(col("doc_id"))
  }

  val o78 = s"""
    WITH RECURSIVE surv AS (
      SELECT doc_id, text, n_tok, quality FROM (
        SELECT doc_id, text,
          CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
          ROUND((1.0 - CAST(len(list_filter(string_split(text,' '),
                  t -> t IN ('the','a','of','and'))) AS DOUBLE)
                  / len(string_split(text,' ')))
            * CAST(least(len(string_split(text,' ')), 100) AS DOUBLE) / 100.0,
            6) AS quality,
          CASE
            WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
            WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
            WHEN regexp_matches(text, '\\b(el|la|los|las)\\b') THEN 'es'
            WHEN regexp_matches(text, '\\b(der|die|das|und)\\b') THEN 'de'
            WHEN regexp_matches(text, '\\b(le|les|des|une)\\b') THEN 'fr'
            WHEN regexp_matches(text, '\\b(the|a|of|and)\\b') THEN 'en'
            ELSE 'unknown' END AS lang_pred
        FROM documents)
      WHERE lang_pred = 'en' AND quality >= ${QUALITY_FLOOR}),
    ${Dedup.ORA_PAIR_CTES},
    pr AS (
      SELECT i, j FROM jac
      WHERE jac >= ${Dedup.JACCARD_THRESHOLD}
        AND i IN (SELECT doc_id FROM surv)
        AND j IN (SELECT doc_id FROM surv)),
    edges AS (SELECT i AS a, j AS b FROM pr UNION SELECT j, i FROM pr),
    reach(n, r) AS (
      SELECT a, b FROM edges
      UNION
      SELECT e.a, r.r FROM edges e JOIN reach r ON r.n = e.b),
    lab AS (SELECT n, MIN(r) AS mr FROM reach GROUP BY n)
    SELECT s.doc_id, s.n_tok, s.quality
    FROM surv s LEFT JOIN lab ON lab.n = s.doc_id
    WHERE COALESCE(LEAST(lab.mr, s.doc_id), s.doc_id) = s.doc_id
    ORDER BY s.doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_corpus_pipeline" -> (q78CorpusPipeline _))

  val oracles: Map[String, String] = Map(
    "q78_corpus_pipeline" -> o78)
}
