package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus-level token statistics as per-document quality signals:
  * document-frequency rarity scoring (q120) and stop-token-filtered
  * co-occurrence mining (q123).
  *
  * Both operators share the two-phase vocabulary shape that the TF-IDF
  * (q63) and BPE (q93) passes established: a corpus-wide
  * document-frequency aggregate (vocabulary-sized — millions of rows at
  * 100 TB, never driver-resident) joined back against the per-document
  * token stream. All scoring arithmetic is exact-integer until a single
  * final IEEE division, so results are partitioning-independent and
  * engine-portable (the q109 determinism stance).
  */
object CorpusSignals {

  /** Per-document token occurrences (with multiplicity). Whitespace
    * tokenization — the corpus contract shared with q34/q63. */
  private def occurrences(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  /** Document frequency per token: |docs containing tok|. */
  private def docFreq(s: SparkSession, d: String): DataFrame =
    occurrences(s, d).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))

  // ---- q120: document-frequency rarity scoring ----

  /** q120: score each document by how rare its tokens are in the
    * corpus — mean document frequency over token occurrences, and the
    * fraction of occurrences whose token appears in fewer than 10% of
    * documents (`df·10 < n_docs`, exact integer comparison — no
    * floating threshold). On this corpus the planted `dup` marker
    * (df=25 of 500) is the only rare token, so the signal separates
    * the planted near-duplicate family from the background.
    *
    * Scale shape: the df table is vocabulary-sized; the join back is a
    * token-keyed shuffle join at 100 TB (here Catalyst broadcasts the
    * 31-row vocab — both plans are correct, the choice is size-driven).
    * The corpus-size scalar is a 1-row aggregate broadcast into the
    * plan, not a driver-side `.count()`. Per-doc scoring is then a
    * doc-keyed aggregate: one scan, two bounded exchanges. */
  def q120TokenRarity(s: SparkSession, d: String): DataFrame = {
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    occurrences(s, d)
      .join(docFreq(s, d), Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           (sum(col("df")).cast("double") / count(lit(1))).as("mean_df"),
           (sum(when(col("df") * 10 < col("n_docs"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("rare_ratio"))
      .orderBy(col("doc_id"))
  }

  val o120 = """
    WITH occ AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    df AS (
      SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM occ)
      GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT occ.doc_id, count(*) AS n_tokens,
      CAST(SUM(df.df) AS DOUBLE) / count(*) AS mean_df,
      CAST(SUM(CASE WHEN df.df * 10 < n.n_docs THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*) AS rare_ratio
    FROM occ JOIN df USING (tok) CROSS JOIN n
    GROUP BY occ.doc_id
    ORDER BY occ.doc_id"""

  // ---- q123: stop-token-filtered co-occurrence mining ----

  /** q123: the most frequent token pairs co-occurring within documents,
    * after excluding corpus-wide stop tokens (df·5 ≥ n_docs·4, i.e.
    * tokens in ≥ 80% of documents — exact integer comparison). The
    * collocation-mining primitive behind phrase detection and
    * concept-graph construction in corpus curation.
    *
    * Scale shape: the stop-token exclusion is the fan-out bound — pair
    * generation is quadratic in the *filtered* distinct tokens per
    * document, and the df cutoff removes exactly the tokens that would
    * make it quadratic in document length (the q40/q79 df-cutoff
    * stance applied to pairs). At 100 TB you would additionally cap
    * filtered-tokens-per-doc (keep the k rarest); on this corpus the
    * cap would never bind (≤ 31 distinct). The pair count then flows
    * through one (t1,t2)-keyed aggregate into a
    * TakeOrderedAndProject — per-partition heaps, 20 rows to the
    * driver, no global sort. */
  def q123Cooccur(s: SparkSession, d: String): DataFrame = {
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val kept = occurrences(s, d).distinct()
      .join(docFreq(s, d), Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 5 < col("n_docs") * 4)
      .select(col("doc_id"), col("tok"))
    kept.select(col("doc_id"), col("tok").as("t1"))
      .join(kept.select(col("doc_id"), col("tok").as("t2")), Seq("doc_id"))
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_docs_together"))
      .orderBy(desc("n_docs_together"), col("t1"), col("t2"))
      .limit(20)
  }

  val o123 = """
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    df AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    kept AS (
      SELECT dt.doc_id, dt.tok FROM dt JOIN df USING (tok) CROSS JOIN n
      WHERE df.df * 5 < n.n_docs * 4)
    SELECT a.tok AS t1, b.tok AS t2, count(*) AS n_docs_together
    FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
    GROUP BY a.tok, b.tok
    ORDER BY n_docs_together DESC, t1, t2
    LIMIT 20"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_token_rarity" -> (q120TokenRarity _),
    "q123_cooccur"      -> (q123Cooccur _))

  val oracles: Map[String, String] = Map(
    "q120_token_rarity" -> o120, "q123_cooccur" -> o123)
}
