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

  /** Candidate-generation strategy for the curation near-dup stage.
    * Default ON: LSH-banded candidates (q41's machinery) + exact
    * verify — linear in survivors, the 100 TB path, and output-
    * identical to the exact inverted-index join under the corpus
    * margin DedupSpec asserts (the oracle below stays the EXACT pair
    * join, so the gate re-proves the equality every round). Set to
    * false to force the exact join (the right call only when the
    * corpus has near-threshold pairs LSH could miss). */
  val CURATION_LSH_CONF = "spark.graft.curation.lshCandidates"

  /** Curation keeper set with the columns downstream stages consume
    * (doc_id, text, lang, n_tok, quality) — the shared core of q78 and
    * the composed train-set build (q86). Unsorted: each caller orders
    * (or doesn't) per its own contract. */
  private[graft] def curatedKeepers(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val survivors = TextOps.withQuality(docs)
      .filter(TextOps.langGuess(col("text")) === "en"
        && col("quality") >= QUALITY_FLOOR)
      .select(col("doc_id"), col("text"), col("lang"), col("n_tok"), col("quality"))
    // dedup over survivors only: shingle AFTER the cheap filters
    val arr = survivors
      .select(col("doc_id"),
        graft.functions.ShingleSet.shingle_set(col("text")).as("sgs"))
      .filter(size(col("sgs")) > 0)
    val useLsh = s.conf.getOption(CURATION_LSH_CONF).forall(_.toBoolean)
    val pairs = (if (useLsh) Dedup.lshVerifiedPairs(s, arr)
                 else Dedup.jaccardPairs(s, arr))
      .select(col("i"), col("j"))
    // TAG-REUSE CONTRACT: connectedComponents(tag = "cc-curation") cycles
    // the PREVIOUS same-tag invocation's localCheckpoint blocks, and the
    // returned frame's lineage is truncated at that checkpoint — so a
    // result from an earlier call must NOT be held across a later call
    // (it would fail at execution once its blocks are freed). Every
    // caller of curatedKeepers builds-then-immediately-executes, which
    // satisfies the contract; keep it that way.
    val labels = DedupCluster.connectedComponents(pairs, tag = "cc-curation")
      .withColumnRenamed("node", "doc_id")
    survivors
      .join(labels, Seq("doc_id"), "left")
      .filter(coalesce(col("root"), col("doc_id")) === col("doc_id"))
  }

  /** q78: curated corpus — predicted-English documents above the
    * quality floor, one keeper per near-dup cluster (the cluster's min
    * doc_id), with the per-doc quality evidence kept as columns. */
  def q78CorpusPipeline(s: SparkSession, d: String): DataFrame =
    curatedKeepers(s, d)
      .select(col("doc_id"), col("n_tok"), col("quality"))
      .orderBy(col("doc_id"))

  /** Shared curation CTEs: survivors (with text/lang kept for composed
    * downstream stages) → survivor-restricted pairs → CC labels. Callers
    * open with WITH RECURSIVE; the keeper predicate is
    * `COALESCE(LEAST(lab.mr, doc_id), doc_id) = doc_id`. */
  val ORA_CURATE_CTES = s"""surv AS (
      SELECT doc_id, text, lang, n_tok, quality FROM (
        SELECT doc_id, text, lang,
          ${TextOps.ORA_N_TOK} AS n_tok,
          ${TextOps.ORA_QUALITY} AS quality,
          ${TextOps.ORA_LANG_CASE} AS lang_pred
        FROM documents)
      WHERE lang_pred = 'en' AND quality >= ${QUALITY_FLOOR}),
    ${Dedup.ORA_PAIR_CTES},
    pr AS (
      SELECT i, j FROM jac
      WHERE jac >= ${Dedup.JACCARD_THRESHOLD}
        AND i IN (SELECT doc_id FROM surv)
        AND j IN (SELECT doc_id FROM surv)),
    ${Dedup.ORA_CC_CTES}"""

  val o78 = s"""
    WITH RECURSIVE $ORA_CURATE_CTES
    SELECT s.doc_id, s.n_tok, s.quality
    FROM surv s LEFT JOIN lab ON lab.n = s.doc_id
    WHERE COALESCE(LEAST(lab.mr, s.doc_id), s.doc_id) = s.doc_id
    ORDER BY s.doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_corpus_pipeline" -> (q78CorpusPipeline _))

  val oracles: Map[String, String] = Map(
    "q78_corpus_pipeline" -> o78)
}
