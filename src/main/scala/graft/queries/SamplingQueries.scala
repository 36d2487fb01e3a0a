package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Tables.{t, Q}

/** Deterministic sampling / split operators for a training-data pipeline
  * (builder brief: the operations a large-scale corpus pipeline needs
  * beyond the reference's own surface).
  *
  * Everything is keyed on `md5(doc_id)` — a pure map-side expression, so
  * a split is reproducible across engines, runs, clusters, and corpus
  * repartitions (unlike `rand(seed)`, whose draw order depends on
  * partitioning, or `TABLESAMPLE`, which is engine-specific). Buckets come
  * from the last two hex digits (256 buckets); the same expression text is
  * generated for the DuckDB oracle, so the two sides cannot drift.
  *
  * At 100 TB: no shuffle, no state, no coordination — the split predicate
  * rides the parquet scan and prunes before anything downstream.
  */
object SamplingQueries {

  /** train gets buckets [0, 205) ≈ 80%, val [205, 230) ≈ 10%, test the
    * rest — the conventional 80/10/10. */
  private[queries] val TrainUpper = 205
  private[queries] val ValUpper   = 230
  /** ~10% sample: buckets [0, 26) of 256. */
  private val SampleUpper = 26

  private val Hex = "0123456789abcdef"

  /** 0..16^digits−1 from the last `digits` md5 hex digits of the row key —
    * `instr` into the hex alphabet is the hex-digit parse both engines
    * share (neither Spark's `conv` nor DuckDB's `unhex` exists on the
    * other side). */
  private[queries] def hexBucketSql(key: String, digits: Int): String = {
    val h = s"md5(CAST($key AS STRING))"
    (0 until digits).map { i =>
      val pos = 33 - digits + i
      val scale = Seq.fill(digits - 1 - i)(16L).product
      s"$scale * (instr('$Hex', substring($h, $pos, 1)) - 1)"
    }.mkString(" + ")
  }

  /** 0..255 — the split/sample bucket form. */
  private[queries] def bucketSql(key: String): String = hexBucketSql(key, 2)

  /** The one split-assignment implementation: `bucket` (0..255) and
    * `split` columns from the row key. Shared by [[sampleSplit]] and the
    * curation pipeline so the two can never assign differently. */
  private[queries] def withSplit(df: org.apache.spark.sql.DataFrame,
                                 keyCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("bucket", expr(s"CAST(${bucketSql(keyCol)} AS INT)"))
      .withColumn("split",
        when(col("bucket") < TrainUpper, "train")
          .when(col("bucket") < ValUpper, "val")
          .otherwise("test"))

  /** Deterministic 80/10/10 train/val/test assignment (the split a
    * fine-tuning pipeline ships with the corpus — stable under
    * re-ingestion, so no example ever migrates between splits). */
  private val sampleSplit: Q = (s, dir) =>
    withSplit(t(s, dir, "documents"), "doc_id")
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy("doc_id")

  /** Deterministic ~10% sample with per-stratum counts: the hash predicate
    * samples uniformly WITHIN every lang stratum (md5 is independent of
    * lang), so strata keep their corpus proportions without any per-group
    * state — the scale-safe form of `sampleBy`. */
  private val sampleStratified: Q = (s, dir) =>
    t(s, dir, "documents")
      .where(expr(s"${bucketSql("doc_id")} < $SampleUpper"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"), min("doc_id").as("first_doc"))
      .orderBy("lang")

  /** Weight denominator for [[sampleWeighted]]: p = min(1, n_chars/1000),
    * so a 1000-char doc is always kept and a 100-char doc keeps 10% — the
    * token-budget-proportional rate a mixture pipeline wants. */
  private val WeightDenom = 1000L

  /** Deterministic length-weighted Poisson sampling: each doc is kept with
    * probability ∝ its size (how pretraining mixtures weight sources by
    * token budget, not doc count). The draw is the doc's md5 bucket over
    * 16⁴ compared against a per-doc integer threshold — pure map-side
    * integer arithmetic, reproducible across engines and repartitions,
    * no global state, no second pass. Emitting (wbucket, thr) makes the
    * decision itself auditable, not just the surviving rows. */
  private val sampleWeighted: Q = (s, dir) =>
    t(s, dir, "documents")
      .withColumn("wbucket", expr(s"CAST(${hexBucketSql("doc_id", 4)} AS BIGINT)"))
      .withColumn("thr", expr(
        s"least(CAST(65536 AS BIGINT), n_chars * 65536 DIV $WeightDenom)"))
      .where(col("wbucket") < col("thr"))
      .select(col("doc_id"), col("n_chars"), col("wbucket"), col("thr"))
      .orderBy("doc_id")

  val queries: Seq[(String, Q)] = Seq(
    "q_sample_split" -> sampleSplit,
    "q_sample_strat" -> sampleStratified,
    "q_sample_weighted" -> sampleWeighted
  )

  /** DuckDB mirror of the `split` column in [[withSplit]] — shared with
    * the curation-pipeline oracle (same no-drift contract as the Spark
    * side). */
  private[queries] def duckSplitSql(key: String): String =
    s"""CASE WHEN ${bucketSql(key)} < $TrainUpper THEN 'train'
       |      WHEN ${bucketSql(key)} < $ValUpper THEN 'val'
       |      ELSE 'test' END""".stripMargin

  val oracles: Seq[(String, String)] = Seq(
    "q_sample_split" ->
      s"""SELECT doc_id,
         | CAST(${bucketSql("doc_id")} AS INTEGER) AS bucket,
         | ${duckSplitSql("doc_id")} AS split
         | FROM documents ORDER BY doc_id""".stripMargin,
    "q_sample_strat" ->
      s"""SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
         | FROM documents WHERE ${bucketSql("doc_id")} < $SampleUpper
         | GROUP BY lang ORDER BY lang""".stripMargin,
    "q_sample_weighted" ->
      s"""SELECT doc_id, n_chars,
         | CAST(${hexBucketSql("doc_id", 4)} AS BIGINT) AS wbucket,
         | CAST(least(65536, n_chars * 65536 // $WeightDenom) AS BIGINT) AS thr
         | FROM documents
         | WHERE ${hexBucketSql("doc_id", 4)} < least(65536, n_chars * 65536 // $WeightDenom)
         | ORDER BY doc_id""".stripMargin
  )
}
