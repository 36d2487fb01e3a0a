package graft.ml

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TokenOps

/** Persisted unigram language model — the CCNet/KenLM-shaped perplexity
  * filter as a learn→serve loop (the `HashedLogReg.save/load` /
  * `BpeTrainer.save/load` discipline applied to the LM family): FIT pays
  * one tokenize+count pass over a reference corpus and persists the
  * vocabulary-sized count table; SERVE scores any later batch — a delta
  * ingest, a streaming trigger, a candidate corpus — against the FROZEN
  * model without ever re-reading the reference text. That split is the
  * production shape of perplexity filtering (CCNet trains on Wikipedia
  * once, then filters Common Crawl snapshots for years); the inline
  * `q_text_heldout_ppl` computes the same statistic but re-derives the
  * LM per query.
  *
  * The scoring kernel is BIT-IDENTICAL to the oracle-graded
  * [[graft.queries.TextQueries.heldoutOf]]: both sides evaluate the
  * SAME shared expression strings (`HeldoutInVocabSql`/`HeldoutOovSql`/
  * `HeldoutDocAggSql` — add-one smoothing over the trained vocabulary,
  * one OOV surprisal for unseen terms, floor-millinat quantization per
  * TERM TYPE, exact-integer per-doc mean), and parquet round-trips the
  * BIGINT counts exactly — so model-served scores hash-match the graded
  * query (pinned in `NgramLmSpec`, and graded directly by
  * `q_text_ppl_served`, which shares `q_text_heldout_ppl`'s oracle).
  *
  * Layout: `uni/` (term, cnt) — vocabulary-sized, DISTRIBUTED state
  * (unlike the O(B) logreg weights, a corpus vocabulary outgrows the
  * driver; it stays a parquet-backed frame end to end) — and `meta/`
  * (ONE row: t_total, v_size). [[load]] cross-checks the tables —
  * row count vs the explicit v_size AND Σcnt vs the explicit t_total —
  * so a torn store (lost part-files) fails loudly instead of serving a
  * silently-sharper LM (the explicit-width rule from the logreg store).
  *
  * Scale shape: fit is one explode + hash-count (map-side combined,
  * vocabulary-sized output — Heaps-sublinear in the corpus); scoring a
  * batch is one tokenize of THE BATCH + a vocabulary join (AQE
  * broadcasts the type table when small) + a doc-keyed aggregation.
  * Nothing scales with the reference corpus after fit. */
object NgramLm {

  /** Fit on a reference corpus and persist under `dir`. Meta is written
    * AFTER uni from the same checkpointed counts, so `load`'s
    * cross-checks catch any torn combination. */
  def fit(docs: DataFrame, textCol: String, dir: String): Unit = {
    val uni = graft.queries.Tables.fanout(docs)
      .select(explode(TokenOps.terms(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // uni write + meta aggregate read it once
    uni.write.mode(SaveMode.Overwrite).parquet(s"$dir/uni")
    uni.agg(sum("cnt").as("t_total"), count(lit(1)).as("v_size"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
  }

  /** Load with torn-store verification (both invariants, see class
    * doc). The checks are vocabulary-sized aggregates — model-state
    * cost, not corpus cost. */
  def load(spark: SparkSession, dir: String): Model = {
    val metaRows = spark.read.parquet(s"$dir/meta").collect()
    require(metaRows.length == 1,
      s"LM store at $dir has ${metaRows.length} meta rows (want 1)")
    val tTotal = metaRows.head.getAs[Long]("t_total")
    val vSize = metaRows.head.getAs[Long]("v_size")
    val check = spark.read.parquet(s"$dir/uni")
      .agg(count(lit(1)).as("n"), sum("cnt").as("s")).head()
    require(check.getLong(0) == vSize,
      s"LM store at $dir is torn: ${check.getLong(0)} vocab rows " +
        s"for declared v_size $vSize")
    require(check.getLong(1) == tTotal,
      s"LM store at $dir is torn: token sum ${check.getLong(1)} " +
        s"for declared t_total $tTotal")
    new Model(spark, dir)
  }

  /** A verified handle; construct via [[load]]. */
  final class Model private[NgramLm] (spark: SparkSession, dir: String) {

    /** The persisted vocabulary (term, cnt). */
    def vocab(): DataFrame = spark.read.parquet(s"$dir/uni")

    private def meta: DataFrame = spark.read.parquet(s"$dir/meta")

    /** Score a batch under the frozen LM: (doc_id, n_tokens, n_oov,
      * heldout_mb) — the `q_text_heldout_ppl` output contract, unsorted
      * (callers order). Only the BATCH is tokenized. */
    def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
      val tf = docs
        .select(col(idCol).as("doc_id"),
          explode(TokenOps.terms(col(textCol))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("k"))
      val lmQ = vocab().crossJoin(broadcast(meta))
        .select(col("term"),
          expr(graft.queries.TextQueries.HeldoutInVocabSql).as("mln"))
      tf.join(lmQ, Seq("term"), "left_outer")
        .crossJoin(broadcast(meta))
        .withColumn("mln_eff",
          coalesce(col("mln"), expr(graft.queries.TextQueries.HeldoutOovSql)))
        .groupBy("doc_id")
        .agg(sum("k").as("n_tokens"),
          sum(when(col("mln").isNull, col("k")).otherwise(0L)).as("n_oov"),
          expr(graft.queries.TextQueries.HeldoutDocAggSql).as("heldout_mb"))
    }

    /** The CCNet-style gate: keep docs at or below `maxMb` mean
      * surprisal (high-surprisal docs read as gibberish/OCR noise under
      * the reference LM). Shingle-level subtlety inherited from the
      * score contract: a doc with NO tokens produces no tf rows and no
      * verdict — compose with the length gates that already screen
      * empty docs. */
    def gate(docs: DataFrame, idCol: String, textCol: String,
        maxMb: Long): DataFrame =
      score(docs, idCol, textCol)
        .withColumn("decision",
          when(col("heldout_mb") <= maxMb, "keep").otherwise("drop"))
  }
}
