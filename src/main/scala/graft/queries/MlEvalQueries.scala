package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{PrefixOps, TextOps, TokenOps}
import graft.queries.Tables.Q

/** Distributed model-evaluation metrics — the eval harness a curation
  * pipeline runs after every scorer change: ROC AUC, the full
  * precision/recall curve, and a reliability (calibration) table.
  *
  * The evaluated pair is the English-stop-word ratio (`stopword_bp`
  * from `q_text_quality`) as a detector for the gold label
  * `lang = 'en'` — the quality family's own heuristic graded against
  * the labeled column. On TESTDATA the label is drawn independently of
  * the text, so the true AUC is 0.5 — and a correct estimator must SAY
  * so (tie-dropping or tie-double-counting implementations drift,
  * amplified by the heavy bp-score ties; `MlEvalQueriesSpec` pins both
  * the chance band here and exact hand-graded values on toys).
  *
  * Scale shape — the part worth grading: NONE of these metrics uses a
  * global sort or a single-partition rank window, the textbook AUC
  * formulation that dies first at 100 TB. Scores are integer basis
  * points, so the stream collapses to a per-score-VALUE frame (one hash
  * aggregate, ≤ 10 001 rows here, O(distinct scores) in general); the
  * cumulative negatives-below / predicted-positive-above counts come
  * from [[PrefixOps]] two-phase prefix sums over that frame — parallel
  * at any score cardinality, bit-identical to the sorted form because
  * score values are distinct by construction (no boundary ties). The
  * Mann-Whitney identity
  *
  *   AUC = [Σ_v pos_v · (neg_below_v + neg_v / 2)] / (n_pos · n_neg)
  *
  * turns rank-sum AUC into Σ over that frame; the ×2-scaled integer form
  * (2·concordant + ties) keeps it division-free until one final integral
  * divide. The numerator is bounded by 2·n_pos·n_neg ~ n², past int64 at
  * ~3·10⁹ rows — summed as DECIMAL(38,0) (matching the oracle's
  * 128-bit HUGEINT sums), with `div` (IntegralDivide → BIGINT) for the
  * exact floor quotient. tp/fp in the PR curve are plain counts ≤ n, so
  * int64 is exact there.
  */
object MlEvalQueries {

  /** Fixed-width calibration bins over the [0, 10000] bp score. */
  private val CalibBins = 10

  /** The eval family's per-doc token accounting, session-shared
    * (Tables.sharedFrame — the established serve-many convention): nine
    * metric queries below derive their (score, y) pairs from exactly
    * these integer counts, and each re-running the corpus regex
    * tokenize was the dominant per-query cost (~0.5 s each at sf0.1,
    * r15). The frame is a deterministic derivation of `documents` —
    * exact integer counts, parquet round-trips them losslessly — so
    * every consumer is bit-identical to its former inline form and the
    * oracles are unchanged. This is also the production shape: an eval
    * pipeline scores the corpus once and computes all metrics off the
    * scored table. */
  private def evalBase(s: SparkSession, dir: String): DataFrame =
    Tables.sharedFrame(s, dir, "mleval_base") {
      Tables.fanout(Tables.t(s, dir, "documents"))
        .withColumn("toks_all",
          filter(split(TextOps.cleanText(col("text")), " "), w => w =!= ""))
        .withColumn("toks", TokenOps.terms(col("text")))
        .select(col("doc_id"), col("source"), col("lang"),
          length(col("text")).as("n_chars_raw"),
          length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("n_alpha"),
          size(col("toks_all")).cast("long").as("n_all"),
          size(col("toks")).cast("long").as("n_terms"))
    }

  /** Per-doc (score, y): stop-word ratio in basis points vs the labeled
    * `lang = 'en'`. Empty-token docs are excluded (the ratio is
    * undefined); the oracle applies the same guard. */
  private def scored(s: SparkSession, dir: String): DataFrame =
    evalBase(s, dir)
      .where(col("n_all") > 0)
      .select(
        expr("CAST(10000 * (n_all - n_terms) DIV n_all AS BIGINT)")
          .as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))

  /** Per-score-value class counts — the frame every metric below reads.
    * One hash aggregate; rows = distinct score values, never docs. */
  private def perValue(sc: DataFrame): DataFrame =
    sc.groupBy("score")
      .agg(sum("y").as("pos"), sum(expr("1L - y")).as("neg"))

  /** ROC AUC via the Mann-Whitney rank-sum identity over the per-value
    * frame: negatives strictly below each value from a [[PrefixOps]]
    * prefix sum (asc score), then one single-row aggregate. Takes any
    * (score: long, y: 0/1 long) frame — the spec feeds hand-graded toys
    * through the same plan the graded query runs. */
  private[graft] def aucOf(sc: DataFrame): DataFrame = {
    val pref = PrefixOps.withPrefixOffsets(
      perValue(sc), Nil, Seq(col("score")), Seq("negb" -> col("neg")))
    val wLoc = Window.partitionBy(col(PrefixOps.PidCol)).orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    pref
      .withColumn("negb",
        col("negb_off") + coalesce(sum("neg").over(wLoc), lit(0L)))
      .agg(
        sum("pos").as("n_pos"), sum("neg").as("n_neg"),
        sum((col("pos") * (lit(2L) * col("negb") + col("neg")))
          .cast("decimal(38,0)")).as("num2"))
      .select(col("n_pos"), col("n_neg"),
        expr("""CAST((CAST(10000 AS DECIMAL(38,0)) * num2)
               |  div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)"""
          .stripMargin).as("auc_bp"))
  }

  private val auc: Q = (s, dir) => aucOf(scored(s, dir))

  /** PER-SLICE AUC — the fairness/robustness cut every eval harness
    * needs next to the corpus number ("the scorer is 0.71 overall but
    * 0.55 on source 3"): the same Mann-Whitney identity, with the slice
    * key carried through every stage. The per-value frame groups by
    * (slice, score); the cumulative negatives-below ride the SAME
    * [[PrefixOps]] machinery in its GROUPED form (range partitioning on
    * (slice, score) keeps slices contiguous, subtotal frame ≤ parts +
    * slices rows) — so a 10 TB slice is still processed at full
    * parallelism, where `Window.partitionBy(slice)` would funnel it
    * through one task. Degenerate slices (a single class present — AUC
    * undefined) are dropped by the same guard in both engines. */
  private[graft] def aucBy(sc: DataFrame, slice: String): DataFrame =
    aucByFromPerValue(
      sc.groupBy(slice, "score")
        .agg(sum("y").as("pos"), sum(expr("1L - y")).as("neg")), slice)

  /** The per-slice estimator over an ALREADY-AGGREGATED
    * (slice, score, pos, neg) frame — split out so consumers that
    * derive per-value counts arithmetically (the jackknife complements)
    * skip the doc-level pass. */
  private[graft] def aucByFromPerValue(pv: DataFrame, slice: String)
      : DataFrame = {
    val pref = PrefixOps.withPrefixOffsets(
      pv, Seq(slice), Seq(col("score")), Seq("negb" -> col("neg")))
    val wLoc = Window.partitionBy(col(slice), col(PrefixOps.PidCol))
      .orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    pref
      .withColumn("negb",
        col("negb_off") + coalesce(sum("neg").over(wLoc), lit(0L)))
      .groupBy(slice)
      .agg(
        sum("pos").as("n_pos"), sum("neg").as("n_neg"),
        sum((col("pos") * (lit(2L) * col("negb") + col("neg")))
          .cast("decimal(38,0)")).as("num2"))
      .where(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col(slice), col("n_pos"), col("n_neg"),
        expr("""CAST((CAST(10000 AS DECIMAL(38,0)) * num2)
               |  div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)"""
          .stripMargin).as("auc_bp"))
      .orderBy(slice)
  }

  private val JkGroups = 20

  /** JACKKNIFE confidence interval for the corpus AUC — the error bar a
    * model card needs next to the point estimate (is 0.71-vs-0.69 a
    * real improvement or noise?): delete-one-GROUP jackknife over
    * [[JkGroups]] deterministic hash groups (Efron & Stein 1981's
    * grouped form — the resampling scheme that works distributed,
    * because each leave-one-out estimate is pure ARITHMETIC on
    * per-group per-value counts: complement = total − group, never a
    * data re-shuffle, never RNG). All G estimates ride ONE grouped
    * prefix-sum pass (the [[aucBy]] machinery on a G×V-row frame);
    * variance is the closed form (G−1)·(G·Σθ² − (Σθ)²)/G² in
    * DECIMAL(38,0); the only non-integer step is floor(sqrt) for the
    * SE, safe in both engines (integers ≪ 2⁵², and a non-square's root
    * is ≥ ~1e−4 from the nearest integer while double error is ~1e−16).
    * Degenerate leave-one-out estimates (single-class complement) drop
    * under the same guard in both engines and G_n records the survivor
    * count. Output is one row. */
  private[graft] def aucJackknifeOf(sc: DataFrame): DataFrame = {
    // ONE corpus-level aggregate (G×V rows out, checkpointed for its
    // three consumers); totals, complements, and the full-corpus
    // estimate all derive ARITHMETICALLY from it — the tokenize/score
    // pass never reruns.
    val pvG = sc.groupBy("g", "score")
      .agg(sum("y").as("posg"), sum(expr("1L - y")).as("negg"))
      .localCheckpoint(true)
    val pvTot = pvG.groupBy("score")
      .agg(sum("posg").as("pos"), sum("negg").as("neg"))
    val compl = pvG.select("g").distinct()
      .crossJoin(pvTot)
      .join(pvG, Seq("g", "score"), "left_outer")
      .select(col("g"), col("score"),
        (col("pos") - coalesce(col("posg"), lit(0L))).as("pos"),
        (col("neg") - coalesce(col("negg"), lit(0L))).as("neg"))
    val perG = aucByFromPerValue(compl, "g")
    val stats = perG.agg(count(lit(1)).as("g_n"),
      sum("auc_bp").as("s1"),
      sum((col("auc_bp") * col("auc_bp")).cast("decimal(38,0)")).as("s2"))
    aucByFromPerValue(pvTot.withColumn("all", lit(0L)), "all").drop("all")
      .crossJoin(stats)
      .withColumn("jk_var_bp2", expr(
        """CAST((CAST(g_n AS DECIMAL(38,0)) - 1)
          |  * (CAST(g_n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)
          |  DIV (CAST(g_n AS DECIMAL(38,0)) * g_n) AS BIGINT)"""
          .stripMargin.replace("\n", " ")))
      .withColumn("jk_se_bp",
        expr("CAST(floor(sqrt(CAST(jk_var_bp2 AS DOUBLE))) AS BIGINT)"))
      .select(col("n_pos"), col("n_neg"), col("auc_bp"), col("g_n"),
        col("jk_var_bp2"), col("jk_se_bp"),
        expr("auc_bp - (196 * jk_se_bp) DIV 100").as("ci_lo_bp"),
        expr("auc_bp + (196 * jk_se_bp) DIV 100").as("ci_hi_bp"))
  }

  private val aucJackknife: Q = (s, dir) =>
    aucJackknifeOf(evalBase(s, dir)
      .where(col("n_all") > 0)
      .select(col("doc_id"),
        expr("CAST(10000 * (n_all - n_terms) DIV n_all AS BIGINT)")
          .as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .withColumn("g", expr(
        s"CAST(conv(substring(md5(concat('jk#', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % $JkGroups")))

  /** The graded slice: per-source AUC of the same stopword-ratio /
    * lang=en pair as [[auc]] — one extra carried column. */
  private def scoredBySource(s: SparkSession, dir: String): DataFrame =
    evalBase(s, dir)
      .where(col("n_all") > 0)
      .select(col("source"),
        expr("CAST(10000 * (n_all - n_terms) DIV n_all AS BIGINT)")
          .as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))

  private val aucSliced: Q = (s, dir) => aucBy(scoredBySource(s, dir), "source")

  /** Precision/recall/F1 at EVERY distinct score threshold (predict
    * positive when score ≥ t): cumulative tp/fp from a desc-ordered
    * prefix sum over the per-value frame; recall's denominator rides the
    * same pass as the `_tot` column — no second scan, no global sort. */
  private[graft] def prCurveOf(sc: DataFrame): DataFrame = {
    val pref = PrefixOps.withPrefixOffsets(
      perValue(sc), Nil, Seq(col("score").desc),
      Seq("tp" -> col("pos"), "fp" -> col("neg")))
    val wLoc = Window.partitionBy(col(PrefixOps.PidCol))
      .orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pref
      .withColumn("tp", col("tp_off") + sum("pos").over(wLoc))
      .withColumn("fp", col("fp_off") + sum("neg").over(wLoc))
      .select(
        col("score").as("threshold"), col("tp"), col("fp"),
        expr("10000 * tp DIV (tp + fp)").as("precision_bp"),
        expr("10000 * tp DIV tp_tot").as("recall_bp"),
        // F1 = 2pr/(p+r) clears to 2·tp / (2·tp + fp + fn); fn = n_pos − tp.
        expr("20000 * tp DIV (tp + fp + tp_tot)").as("f1_bp"))
      .orderBy(col("threshold").desc)
  }

  private val prCurve: Q = (s, dir) => prCurveOf(scored(s, dir))

  /** AVERAGE PRECISION (the PR-AUC scalar) — the single number the PR
    * curve collapses to when positives are rare and ROC AUC flatters:
    * AP = Σ_thresholds ΔR_k·P_k over the same desc-ordered per-value
    * prefix frame as [[prCurveOf]] — one more aggregate, no extra scan.
    * Each term pos_k·tp_k/((tp_k+fp_k)·n_pos) is quantized to floor ppm
    * PER TERM (the defined statistic — terms have coprime denominators,
    * so a global clearing does not exist; both engines floor the same
    * integers so the sum is engine-exact), with DECIMAL(38,0)/HUGEINT
    * products since pos·tp ≈ 10²² at corpus scale. */
  private[graft] def apOf(sc: DataFrame): DataFrame = {
    val pref = PrefixOps.withPrefixOffsets(
      perValue(sc), Nil, Seq(col("score").desc),
      Seq("tp" -> col("pos"), "fp" -> col("neg")))
    val wLoc = Window.partitionBy(col(PrefixOps.PidCol))
      .orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pref
      .withColumn("tp", col("tp_off") + sum("pos").over(wLoc))
      .withColumn("fp", col("fp_off") + sum("neg").over(wLoc))
      .agg(max("tp_tot").as("n_pos"),
        sum(expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * pos * tp)
            | DIV ((CAST(tp AS DECIMAL(38,0)) + fp) * tp_tot) AS BIGINT)"""
            .stripMargin.replace("\n", " "))).as("ap_ppm"))
      .select(col("n_pos"), col("ap_ppm"))
  }

  private val ap: Q = (s, dir) => apOf(scored(s, dir))

  /** BRIER SCORE — the calibration family's proper scoring rule (the
    * mean squared error of the bp-scale predicted probability against
    * the outcome), EXACT integers end to end: Σ(score − 10⁴·y)² in
    * DECIMAL(38,0), one integral divide to floor ppm of the [0,1]
    * Brier. Lower is better; 250000 ppm (=0.25) is the uninformative
    * coin. One aggregate, one row. */
  private[graft] def brierOf(sc: DataFrame): DataFrame =
    sc.agg(count(lit(1)).as("n"),
        sum(((col("score") - lit(10000L) * col("y")) *
          (col("score") - lit(10000L) * col("y"))).cast("decimal(38,0)"))
          .as("se"))
      .select(col("n"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * se)
               |  DIV (CAST(n AS DECIMAL(38,0)) * 100000000) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("brier_ppm"))

  private val brier: Q = (s, dir) => brierOf(scored(s, dir))

  /** Reliability table: [[CalibBins]] fixed-width bins over the bp score
    * — per-bin count, corpus share, mean predicted bp, observed positive
    * rate bp, |gap|. The per-bin frame is O(bins); its total-count
    * window runs over those ≤ [[CalibBins]] aggregated rows (already
    * grouped — the exempt pattern), never the doc stream. ECE is
    * Σ share·gap over this output, derivable by the consumer. */
  private[graft] def calibrationOf(sc: DataFrame): DataFrame =
    sc
      .withColumn("bin", least(expr("score DIV 1000"), lit(CalibBins - 1L)))
      .groupBy("bin")
      .agg(count(lit(1L)).as("n"), sum("score").as("score_sum"),
        sum("y").as("pos"))
      .withColumn("n_all", sum("n").over(Window.partitionBy()))
      .select(
        col("bin"), col("n"),
        expr("10000 * n DIV n_all").as("share_bp"),
        expr("score_sum DIV n").as("pred_bp"),
        expr("10000 * pos DIV n").as("obs_bp"),
        abs(expr("score_sum DIV n") - expr("10000 * pos DIV n")).as("gap_bp"))
      .orderBy("bin")

  private val calibration: Q = (s, dir) => calibrationOf(scored(s, dir))

  /** EXPECTED CALIBRATION ERROR — the reliability table collapsed to the
    * one number a model card quotes: ECE = Σ_b (n_b/n)·|gap_b|, the
    * doc-weighted mean absolute predicted-vs-observed gap. Rides the
    * SAME [[calibrationOf]] frame as the graded table (composed, not
    * re-derived, so the two cannot disagree), and the weighted mean
    * clears to one integral divide over exact integer bin counts. */
  private val ece: Q = (s, dir) =>
    calibrationOf(scored(s, dir))
      .agg(sum("n").as("n_docs"), count(lit(1)).as("n_bins"),
        sum(col("n") * col("gap_bp")).as("wgap"))
      .select(col("n_docs"), col("n_bins"),
        expr("wgap DIV n_docs").as("ece_bp"))

  // ---- gate agreement (Cohen's kappa) -------------------------------------

  /** COHEN'S KAPPA between the two shipped quality gates — the heuristic
    * rule set (`q_text_filter`) and the hashed linear classifier
    * (`q_text_classify`): agreement beyond chance, the number that says
    * whether the cheap gate can stand in for the expensive one (raw
    * agreement alone flatters any pair when one class dominates). The
    * 2×2 confusion cells are one aggregate over an inner join of the
    * two verdict frames; kappa clears to EXACT integer arithmetic —
    * kappa_bp = 10⁴·(n·(a+d) − (a+b)(a+c) − (c+d)(b+d))
    *                 DIV (n² − (a+b)(a+c) − (c+d)(b+d)),
    * both engines truncating toward zero (negative kappa safe). The
    * products run as DECIMAL(38,0) (the AUC-sums convention): n² and the
    * marginal products outgrow int64 past n ≈ 3×10⁹ — at corpus scale
    * the BIGINT form would wrap (non-ANSI) or raise (ANSI). Undefined
    * when the chance term saturates (both gates constant) — that
    * degenerate case raises loudly under ANSI instead of emitting a
    * silent 0. */
  private val kappa: Q = (s, dir) => {
    val f = TextQueries.filterVerdicts(s, dir).select(col("doc_id"),
      (col("verdict") === "keep").as("k1"))
    val c = TextQueries.classifyFrame(s, dir).select(col("doc_id"),
      (col("label") === "keep").as("k2"))
    kappaFromCounts(f.join(c, Seq("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("k1") && col("k2"), 1L).otherwise(0L)).as("a"),
        sum(when(col("k1") && !col("k2"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("k1") && col("k2"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("k1") && !col("k2"), 1L).otherwise(0L)).as("d")))
  }

  /** Kappa arithmetic over a (n, a, b, c, d) confusion frame — split out
    * so the spec can drive it with counts past the int64 product ceiling
    * (n > 3×10⁷ makes n·(a+d) alone exceed 2⁶³ when widened naively). */
  private[graft] def kappaFromCounts(cells: DataFrame): DataFrame =
    cells.select(col("n"),
      col("a").as("n_both_keep"), col("b").as("n_filter_only"),
      col("c").as("n_clf_only"), col("d").as("n_both_drop"),
      expr("CAST(10000 * (CAST(a AS DECIMAL(38,0)) + d) DIV n AS BIGINT)")
        .as("agree_bp"),
      expr("""CAST((CAST(10000 AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * (a + d)
             |    - (CAST(a AS DECIMAL(38,0)) + b) * (CAST(a AS DECIMAL(38,0)) + c)
             |    - (CAST(c AS DECIMAL(38,0)) + d) * (CAST(b AS DECIMAL(38,0)) + d)))
             |  DIV (CAST(n AS DECIMAL(38,0)) * n
             |    - (CAST(a AS DECIMAL(38,0)) + b) * (CAST(a AS DECIMAL(38,0)) + c)
             |    - (CAST(c AS DECIMAL(38,0)) + d) * (CAST(b AS DECIMAL(38,0)) + d)) AS BIGINT)"""
        .stripMargin.replace("\n", " ")).as("kappa_bp"))

  /** FLEISS' KAPPA across the three binary "keep" raters the engine
    * ships — heuristic gate, hashed classifier, language gate
    * (lang = 'en') — the multi-rater generalization of [[kappa]]: one
    * number for "do the gates constitute a consistent labeling policy",
    * where the three pairwise kappas can disagree. With n = 3 raters and
    * 2 categories the statistic clears to EXACT integers: per doc,
    * k ∈ {0..3} keep votes; over N docs with K = Σk and
    * S = Σ(k² + (3−k)²),
    *   κ_F = (3N·(S−3N) − 2·(K² + D²)) / (2·(9N² − K² − D²)),  D = 3N−K
    * (both engines truncating toward zero via DIV; DECIMAL(38,0) /
    * HUGEINT arithmetic since N² products outgrow int64 at corpus
    * scale). One aggregate pass over the joined verdict frames; output
    * is one row. Undefined when every doc is unanimous in the SAME
    * direction (chance saturates) — raises loudly, never a silent 0. */
  private val fleiss: Q = (s, dir) => {
    val f = TextQueries.filterVerdicts(s, dir).select(col("doc_id"),
      when(col("verdict") === "keep", 1L).otherwise(0L).as("v1"))
    val c = TextQueries.classifyFrame(s, dir).select(col("doc_id"),
      when(col("label") === "keep", 1L).otherwise(0L).as("v2"))
    val l = Tables.t(s, dir, "documents").select(col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(0L).as("v3"))
    fleissFromVotes(f.join(c, Seq("doc_id")).join(l, Seq("doc_id"))
      .select((col("v1") + col("v2") + col("v3")).as("k")))
  }

  /** κ_F arithmetic over a (k = keep votes of 3) frame — split out so
    * the spec can feed hand-voted toys and ceiling-scale counts. */
  private[graft] def fleissFromVotes(votes: DataFrame): DataFrame =
    votes
      .agg(count(lit(1)).as("n_docs"), sum("k").as("votes_keep"),
        sum(col("k") * col("k") +
          (lit(3L) - col("k")) * (lit(3L) - col("k"))).as("ss"))
      .select(col("n_docs"), col("votes_keep"),
        expr("""CAST((CAST(10000 AS DECIMAL(38,0)) *
               |   (CAST(3 AS DECIMAL(38,0)) * n_docs * (ss - 3 * n_docs)
               |    - 2 * (CAST(votes_keep AS DECIMAL(38,0)) * votes_keep
               |      + (CAST(3 AS DECIMAL(38,0)) * n_docs - votes_keep)
               |        * (CAST(3 AS DECIMAL(38,0)) * n_docs - votes_keep))))
               | DIV (CAST(2 AS DECIMAL(38,0)) *
               |   (CAST(9 AS DECIMAL(38,0)) * n_docs * n_docs
               |    - CAST(votes_keep AS DECIMAL(38,0)) * votes_keep
               |    - (CAST(3 AS DECIMAL(38,0)) * n_docs - votes_keep)
               |      * (CAST(3 AS DECIMAL(38,0)) * n_docs - votes_keep))) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("fleiss_bp"))

  /** McNEMAR'S PAIRED TEST between the two quality gates against the
    * language label as ground truth — the question [[kappa]] does NOT
    * answer: kappa says whether the gates AGREE; McNemar says whether
    * their ACCURACIES differ (a gate pair can agree at chance yet be
    * equally accurate, or agree often while one is strictly better).
    * Only the discordant cells matter: b = heuristic right ∧ classifier
    * wrong, c = the reverse; the χ² statistic (b−c)²/(b+c) is exact
    * integer ppm (3.841·10⁶/10⁶ is the 95% line for 1 df), and the
    * continuity-corrected form (|b−c|−1)² is emitted next to it.
    * One aggregate over the joined verdict frames; one row out;
    * DECIMAL(38,0) products for corpus scale. Degenerate b+c = 0
    * (gates never disagree) raises loudly under ANSI. */
  private val mcnemar: Q = (s, dir) => {
    val gold = Tables.t(s, dir, "documents").select(col("doc_id"),
      (col("lang") === "en").as("truth"))
    val f = TextQueries.filterVerdicts(s, dir).select(col("doc_id"),
      (col("verdict") === "keep").as("k1"))
    val c = TextQueries.classifyFrame(s, dir).select(col("doc_id"),
      (col("label") === "keep").as("k2"))
    f.join(c, Seq("doc_id")).join(gold, Seq("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("k1") === col("truth") && col("k2") =!= col("truth"), 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("k1") =!= col("truth") && col("k2") === col("truth"), 1L)
          .otherwise(0L)).as("c"))
      .select(col("n"), col("b").as("n_h_only_right"),
        col("c").as("n_clf_only_right"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * (b - c) * (b - c))
               |  DIV (CAST(b AS DECIMAL(38,0)) + c) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("chi2_ppm"),
        // |b−c| ≤ 1 clamps the corrected numerator to 0: the correction
        // must never report MORE evidence of a difference than the
        // uncorrected χ², and at b = c the statistic is exactly 0.
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0))
               |  DIV (CAST(b AS DECIMAL(38,0)) + c) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("chi2_cc_ppm"))
  }

  // ---- rank correlation ---------------------------------------------------

  /** SPEARMAN rank correlation between two scorers — the "do my two
    * quality signals agree" diagnostic run before swapping one filter
    * for a cheaper one. Both rankings are TOTAL orders (score, then
    * doc_id — the deterministic tie-break is the grading convention;
    * with distinct ranks 1..n the classic 1 − 6Σd²/(n(n²−1)) identity
    * is EXACT, where the average-rank variant would put fractional
    * arithmetic on both engines). Each global rank rides
    * [[PrefixOps.withGlobalRowNumber]] — two range exchanges, never a
    * single-partition ORDER BY window; Σd² is summed as DECIMAL(38,0)
    * (Σd² ≤ n³/3 outgrows int64 near n ≈ 3M — which is also why the raw
    * sum is NOT an output column: a BIGINT surface would go null/raise
    * past that, and a DECIMAL surface would put engine-specific decimal
    * rendering into the graded hash; ρ carries the information) and ρ is
    * one integral divide in micro-units at the end. Output is one row. */
  private[graft] def rankCorrOf(sc: DataFrame, c1: String, c2: String)
      : DataFrame = {
    val r1 = PrefixOps.withGlobalRowNumber(sc,
      Seq(col(c1).asc, col("doc_id").asc), "r1")
    val r2 = PrefixOps.withGlobalRowNumber(r1,
      Seq(col(c2).asc, col("doc_id").asc), "r2")
    r2.agg(count(lit(1)).as("n"),
        sum(((col("r1") - col("r2")) * (col("r1") - col("r2")))
          .cast("decimal(38,0)")).as("d2"))
      .select(col("n"),
        expr("""CAST(1000000 - (CAST(6000000 AS DECIMAL(38,0)) * d2)
               |  div (CAST(n AS DECIMAL(38,0)) * n * n - n) AS BIGINT)"""
          .stripMargin).as("rho_ppm"))
  }

  /** The graded pair: alpha-character ratio vs stop-word ratio — two
    * independent quality-family signals over the same docs. */
  private def twoScores(s: SparkSession, dir: String): DataFrame =
    evalBase(s, dir)
      .where(col("n_all") > 0 && col("n_chars_raw") > 0)
      .select(col("doc_id"),
        expr("CAST(10000 * n_alpha DIV n_chars_raw AS BIGINT)")
          .as("alpha_bp"),
        expr("CAST(10000 * (n_all - n_terms) DIV n_all AS BIGINT)")
          .as("stop_bp"))

  private val rankCorr: Q = (s, dir) =>
    rankCorrOf(twoScores(s, dir), "alpha_bp", "stop_bp")

  // ---- ranked-retrieval eval (NDCG@K / RR@K) ------------------------------

  /** The evaluated query set — mirrors the `q_text_bm25` keyword set, so
    * the eval grades the ranking family the engine actually serves. */
  private val NdcgTerms = Seq("hash", "vector", "window")
  private val NdcgK     = 10

  /** Rank discounts 1/log₂(1+r), r = 1..K, pre-quantized ONCE in Scala
    * to floor micro-units and embedded as the same literals in both
    * engines — the metric's only irrational constants never touch
    * either engine's floating point. dm(1) = 10⁶ exactly. */
  private val DiscountMicro: Seq[Long] =
    (1 to NdcgK).map(r =>
      math.floor(1e6 * math.log(2) / math.log(r + 1.0)).toLong)

  /** Shared SQL fragments (valid verbatim in Spark SQL and DuckDB). */
  private def dmSql(rank: String): String =
    s"CASE $rank " + DiscountMicro.zipWithIndex.map { case (d, i) =>
      s"WHEN ${i + 1} THEN $d" }.mkString(" ") + " ELSE 0 END"
  private def gainSql(rel: String): String =
    s"CASE $rel WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END"
  /** Graded relevance from the term's FIRST occurrence position: rel 3 if
    * it appears in the first quarter of the doc, 2 in the first half, 1
    * in the third quarter, 0 if only in the tail or absent — a
    * deterministic qrel that is NOT the ranking signal (tf), so ranked
    * docs can be irrelevant (tail-only mention): NDCG < ideal and MRR
    * measure real disagreement instead of degenerating to 1. */
  private def relSql(tf: String, fpos: String, dl: String): String =
    s"""CASE WHEN $tf = 0 THEN 0 WHEN 4 * $fpos <= $dl THEN 3
       | WHEN 2 * $fpos <= $dl THEN 2
       | WHEN 4 * $fpos <= 3 * $dl THEN 1 ELSE 0 END""".stripMargin
      .replace("\n", "")

  /** NDCG@K + reciprocal rank@K per query — the ranked-retrieval eval
    * (the metric pair behind every retrieval/RAG quality gate; Järvelin
    * & Kekäläinen 2002). Ranking: tf desc (dl, doc_id tie-break);
    * qrels: [[relSql]]. DCG and the ideal DCG are exact integer sums of
    * gain·[[DiscountMicro]]; NDCG is one integral divide at the end.
    *
    * Scale shape: per-(query, doc) scores come from one narrow map pass
    * (corpus text never shuffles; the query dimension is a size-|Q|
    * in-row explode); BOTH rankings — actual (by score) and ideal (by
    * rel) — go through the bounded-heap [[graft.plans.TopKPerKey]]
    * operator, never a per-query sort of the corpus; the rank windows
    * then run over the ≤ |Q|·K survivor frame (grouped-exempt). Output
    * is O(|Q|). */
  private[graft] def ndcgOf(perQ: DataFrame): DataFrame = {
    // Materialized once: the judged counts, the score ranking, and the
    // ideal ranking all read this narrow O(|Q|·docs) frame — unshared,
    // the tokenize pass would run three times.
    val rel = perQ.withColumn("rel",
      expr(relSql("tf", "fpos", "dl")).cast("int"))
      .localCheckpoint(true)
    val judged = rel.where(col("rel") > 0)
      .groupBy("qterm").agg(count(lit(1L)).as("n_judged"))
    def ranksOf(in: DataFrame, order: Seq[(String, Boolean)]): DataFrame = {
      val sortCols = order.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc }
      graft.plans.GraftOps.topKPerKey(in, keyCols = Seq("qterm"),
          orderBy = order, k = NdcgK)
        .withColumn("rank", row_number().over(
          Window.partitionBy("qterm").orderBy(sortCols: _*)))
    }
    val ranked = ranksOf(rel.where(col("tf") > 0),
      Seq("tf" -> false, "dl" -> true, "doc_id" -> true))
    val ideal = ranksOf(rel.where(col("rel") > 0),
      Seq("rel" -> false, "doc_id" -> true))
    val dcg = ranked.groupBy("qterm").agg(
      sum(expr(s"CAST((${gainSql("rel")}) * (${dmSql("rank")}) AS BIGINT)"))
        .as("dcg_micro"),
      min(when(col("rel") > 0, col("rank"))).cast("long").as("first_rel"))
    val idcg = ideal.groupBy("qterm").agg(
      sum(expr(s"CAST((${gainSql("rel")}) * (${dmSql("rank")}) AS BIGINT)"))
        .as("idcg_micro"))
    judged.join(dcg, Seq("qterm")).join(idcg, Seq("qterm"))
      .select(col("qterm"), col("n_judged"),
        col("dcg_micro"), col("idcg_micro"),
        expr("10000 * dcg_micro DIV idcg_micro").as("ndcg_bp"),
        expr("CAST(coalesce(1000000 DIV first_rel, 0) AS BIGINT)")
          .as("rr_micro"))
      .orderBy("qterm")
  }

  /** Per-(query, doc) scoring frame: dl, tf, first-occurrence position —
    * one tokenize pass, the query dimension an in-row array explode. */
  private def ndcgScored(s: SparkSession, dir: String): DataFrame = {
    val termStructs = NdcgTerms.map(t =>
      s"""struct('$t' AS qterm,
         | CAST(size(filter(toks, w -> w = '$t')) AS BIGINT) AS tf,
         | CAST(array_position(toks, '$t') AS BIGINT) AS fpos)"""
        .stripMargin.replace("\n", "")).mkString(", ")
    Tables.fanout(Tables.t(s, dir, "documents"))
      .withColumn("toks", TokenOps.terms(col("text")))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(expr(s"array($termStructs)")).as("q"))
      .select(col("doc_id"), col("dl"), col("q.qterm").as("qterm"),
        col("q.tf").as("tf"), col("q.fpos").as("fpos"))
  }

  private val ndcg: Q = (s, dir) => ndcgOf(ndcgScored(s, dir))

  val queries: Seq[(String, Q)] = Seq(
    "q_ml_auc" -> auc,
    "q_ml_pr_curve" -> prCurve,
    "q_ml_calibration" -> calibration,
    "q_ml_auc_sliced" -> aucSliced,
    "q_ml_rankcorr" -> rankCorr,
    "q_ml_kappa" -> kappa,
    "q_ml_fleiss" -> fleiss,
    "q_ml_ece" -> ece,
    "q_ml_ndcg" -> ndcg,
    "q_ml_auc_jackknife" -> aucJackknife,
    "q_ml_ap" -> ap,
    "q_ml_brier" -> brier,
    "q_ml_mcnemar" -> mcnemar
  )

  /** DuckDB-side (score, y) frame, generated from the same clean/stop
    * constants as the Spark plan (see TextQueries.duckClean/duckTerms). */
  private def duckScored: String =
    s"""SELECT CAST(10000 * (len(toks_all) - len(toks)) // len(toks_all) AS BIGINT) AS score,
       |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       | FROM (SELECT lang,
       |   list_filter(string_split(${TextQueries.duckClean("text")}, ' '), w -> w <> '') AS toks_all,
       |   ${TextQueries.duckTerms("text")} AS toks
       |  FROM documents)
       | WHERE len(toks_all) > 0""".stripMargin

  private val duckPerValue: String =
    s"""SELECT score, CAST(sum(y) AS BIGINT) AS pos,
       |  CAST(sum(1 - y) AS BIGINT) AS neg
       | FROM ($duckScored) GROUP BY score""".stripMargin

  val oracles: Seq[(String, String)] = Seq(
    "q_ml_auc" ->
      s"""WITH v AS ($duckPerValue),
         | c AS (SELECT *, CAST(coalesce(sum(neg) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS negb
         |  FROM v)
         | SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |  CAST(sum(neg) AS BIGINT) AS n_neg,
         |  CAST(10000 * sum(pos * (2 * negb + neg))
         |    // (2 * sum(pos) * sum(neg)) AS BIGINT) AS auc_bp
         | FROM c""".stripMargin,
    "q_ml_auc_sliced" ->
      s"""WITH sc AS (
         |  SELECT source,
         |   CAST(10000 * (len(toks_all) - len(toks)) // len(toks_all) AS BIGINT) AS score,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM (SELECT source, lang,
         |    list_filter(string_split(${TextQueries.duckClean("text")}, ' '), w -> w <> '') AS toks_all,
         |    ${TextQueries.duckTerms("text")} AS toks
         |   FROM documents)
         |  WHERE len(toks_all) > 0),
         | v AS (SELECT source, score, CAST(sum(y) AS BIGINT) AS pos,
         |   CAST(sum(1 - y) AS BIGINT) AS neg
         |  FROM sc GROUP BY source, score),
         | c AS (SELECT *, CAST(coalesce(sum(neg) OVER (PARTITION BY source
         |    ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0) AS BIGINT) AS negb
         |  FROM v)
         | SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
         |  CAST(sum(neg) AS BIGINT) AS n_neg,
         |  CAST(10000 * sum(pos * (2 * negb + neg))
         |    // (2 * sum(pos) * sum(neg)) AS BIGINT) AS auc_bp
         | FROM c GROUP BY source
         | HAVING sum(pos) > 0 AND sum(neg) > 0
         | ORDER BY source""".stripMargin,
    "q_ml_pr_curve" ->
      s"""WITH v AS ($duckPerValue),
         | c AS (SELECT score,
         |   CAST(sum(pos) OVER (ORDER BY score DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
         |   CAST(sum(neg) OVER (ORDER BY score DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
         |   CAST(sum(pos) OVER () AS BIGINT) AS npos
         |  FROM v)
         | SELECT score AS threshold, tp, fp,
         |  10000 * tp // (tp + fp) AS precision_bp,
         |  10000 * tp // npos AS recall_bp,
         |  20000 * tp // (tp + fp + npos) AS f1_bp
         | FROM c ORDER BY threshold DESC""".stripMargin,
    "q_ml_calibration" ->
      s"""WITH b AS (SELECT least(score // 1000, ${CalibBins - 1}) AS bin, score, y
         |  FROM ($duckScored)),
         | g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |   CAST(sum(score) AS BIGINT) AS score_sum,
         |   CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY bin),
         | t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS n_all FROM g)
         | SELECT bin, n, 10000 * n // n_all AS share_bp,
         |  score_sum // n AS pred_bp, 10000 * pos // n AS obs_bp,
         |  abs(score_sum // n - 10000 * pos // n) AS gap_bp
         | FROM t ORDER BY bin""".stripMargin,
    "q_ml_ece" ->
      s"""WITH b AS (SELECT least(score // 1000, ${CalibBins - 1}) AS bin, score, y
         |  FROM ($duckScored)),
         | g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |   CAST(sum(score) AS BIGINT) AS score_sum,
         |   CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY bin),
         | t AS (SELECT bin, n,
         |   abs(score_sum // n - 10000 * pos // n) AS gap_bp FROM g)
         | SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(n * gap_bp) // sum(n) AS BIGINT) AS ece_bp
         | FROM t""".stripMargin,
    "q_ml_kappa" ->
      s"""WITH fv AS (${TextQueries.duckFilterVerdicts}),
         | cl AS (SELECT doc_id,
         |   CASE WHEN sum(w_milli) > 0 THEN 'keep' ELSE 'drop' END AS label
         |  FROM (SELECT doc_id,
         |    CAST('0x' || substr(md5('w#' || CAST(bucket AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000 AS w_milli
         |   FROM (SELECT doc_id,
         |     CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % ${TextQueries.ClassifyBuckets} AS bucket
         |    FROM (SELECT doc_id, unnest(${TextQueries.duckTerms("text")}) AS term FROM documents)))
         |  GROUP BY doc_id),
         | j AS (SELECT (fv.verdict = 'keep') AS k1, (cl.label = 'keep') AS k2
         |  FROM fv JOIN cl ON fv.doc_id = cl.doc_id),
         | m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |   CAST(sum(CASE WHEN k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |   CAST(sum(CASE WHEN k1 AND NOT k2 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |   CAST(sum(CASE WHEN NOT k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |   CAST(sum(CASE WHEN NOT k1 AND NOT k2 THEN 1 ELSE 0 END) AS BIGINT) AS d
         |  FROM j)
         | SELECT n, a AS n_both_keep, b AS n_filter_only, c AS n_clf_only,
         |  d AS n_both_drop,
         |  CAST(10000 * (CAST(a AS HUGEINT) + d) // n AS BIGINT) AS agree_bp,
         |  CAST(10000 * (CAST(n AS HUGEINT) * (a + d)
         |      - (CAST(a AS HUGEINT) + b) * (CAST(a AS HUGEINT) + c)
         |      - (CAST(c AS HUGEINT) + d) * (CAST(b AS HUGEINT) + d))
         |    // (CAST(n AS HUGEINT) * n
         |      - (CAST(a AS HUGEINT) + b) * (CAST(a AS HUGEINT) + c)
         |      - (CAST(c AS HUGEINT) + d) * (CAST(b AS HUGEINT) + d)) AS BIGINT) AS kappa_bp
         | FROM m""".stripMargin,
    "q_ml_ap" ->
      s"""WITH v AS ($duckPerValue),
         | c AS (SELECT *,
         |   CAST(sum(pos) OVER wd AS BIGINT) AS tp,
         |   CAST(sum(neg) OVER wd AS BIGINT) AS fp,
         |   CAST(sum(pos) OVER () AS BIGINT) AS tp_tot
         |  FROM v WINDOW wd AS (ORDER BY score DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         | SELECT CAST(max(tp_tot) AS BIGINT) AS n_pos,
         |  CAST(sum(1000000 * CAST(pos AS HUGEINT) * tp
         |    // ((CAST(tp AS HUGEINT) + fp) * tp_tot)) AS BIGINT) AS ap_ppm
         | FROM c""".stripMargin,
    "q_ml_brier" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(1000000 * sum(CAST((score - 10000 * y) AS HUGEINT) * (score - 10000 * y))
         |    // (CAST(count(*) AS HUGEINT) * 100000000) AS BIGINT) AS brier_ppm
         | FROM ($duckScored)""".stripMargin,
    "q_ml_auc_jackknife" ->
      s"""WITH sc AS (
         |  SELECT doc_id,
         |   CAST(10000 * (len(toks_all) - len(toks)) // len(toks_all) AS BIGINT) AS score,
         |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |   CAST('0x' || substr(md5('jk#' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % $JkGroups AS g
         |  FROM (SELECT doc_id, lang,
         |    list_filter(string_split(${TextQueries.duckClean("text")}, ' '), w -> w <> '') AS toks_all,
         |    ${TextQueries.duckTerms("text")} AS toks
         |   FROM documents)
         |  WHERE len(toks_all) > 0),
         | pvt AS (SELECT score, CAST(sum(y) AS BIGINT) AS pos,
         |   CAST(sum(1 - y) AS BIGINT) AS neg FROM sc GROUP BY score),
         | pvg AS (SELECT g, score, CAST(sum(y) AS BIGINT) AS posg,
         |   CAST(sum(1 - y) AS BIGINT) AS negg FROM sc GROUP BY g, score),
         | gs AS (SELECT DISTINCT g FROM pvg),
         | compl AS (SELECT gs.g, pvt.score,
         |   pvt.pos - coalesce(pvg.posg, 0) AS pos,
         |   pvt.neg - coalesce(pvg.negg, 0) AS neg
         |  FROM gs CROSS JOIN pvt
         |   LEFT JOIN pvg ON pvg.g = gs.g AND pvg.score = pvt.score),
         | cc AS (SELECT *, CAST(coalesce(sum(neg) OVER (PARTITION BY g
         |    ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS negb
         |  FROM compl),
         | pg AS (SELECT g,
         |   CAST(10000 * sum(pos * (2 * negb + neg))
         |     // (2 * sum(pos) * sum(neg)) AS BIGINT) AS auc_bp
         |  FROM cc GROUP BY g HAVING sum(pos) > 0 AND sum(neg) > 0),
         | st AS (SELECT CAST(count(*) AS HUGEINT) AS gn,
         |   CAST(sum(auc_bp) AS HUGEINT) AS s1,
         |   CAST(sum(CAST(auc_bp AS HUGEINT) * auc_bp) AS HUGEINT) AS s2 FROM pg),
         | v AS (SELECT CAST(gn AS BIGINT) AS g_n,
         |   CAST((gn - 1) * (gn * s2 - s1 * s1) // (gn * gn) AS BIGINT) AS jk_var_bp2
         |  FROM st),
         | v2 AS (SELECT *, CAST(floor(sqrt(CAST(jk_var_bp2 AS DOUBLE))) AS BIGINT) AS jk_se_bp FROM v),
         | c0 AS (SELECT *, CAST(coalesce(sum(neg) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS negb
         |  FROM pvt),
         | f AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |   CAST(sum(neg) AS BIGINT) AS n_neg,
         |   CAST(10000 * sum(pos * (2 * negb + neg))
         |     // (2 * sum(pos) * sum(neg)) AS BIGINT) AS auc_bp
         |  FROM c0)
         | SELECT f.n_pos, f.n_neg, f.auc_bp, v2.g_n, v2.jk_var_bp2, v2.jk_se_bp,
         |  f.auc_bp - (196 * v2.jk_se_bp) // 100 AS ci_lo_bp,
         |  f.auc_bp + (196 * v2.jk_se_bp) // 100 AS ci_hi_bp
         | FROM f CROSS JOIN v2""".stripMargin,
    "q_ml_mcnemar" ->
      s"""WITH fv AS (${TextQueries.duckFilterVerdicts}),
         | cl AS (SELECT doc_id,
         |   CASE WHEN sum(w_milli) > 0 THEN 'keep' ELSE 'drop' END AS label
         |  FROM (SELECT doc_id,
         |    CAST('0x' || substr(md5('w#' || CAST(bucket AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000 AS w_milli
         |   FROM (SELECT doc_id,
         |     CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % ${TextQueries.ClassifyBuckets} AS bucket
         |    FROM (SELECT doc_id, unnest(${TextQueries.duckTerms("text")}) AS term FROM documents)))
         |  GROUP BY doc_id),
         | j AS (SELECT (fv.verdict = 'keep') AS k1, (cl.label = 'keep') AS k2,
         |   (d.lang = 'en') AS truth
         |  FROM fv JOIN cl ON fv.doc_id = cl.doc_id
         |   JOIN documents d ON d.doc_id = fv.doc_id),
         | m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |   CAST(sum(CASE WHEN k1 = truth AND k2 <> truth THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |   CAST(sum(CASE WHEN k1 <> truth AND k2 = truth THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM j)
         | SELECT n, b AS n_h_only_right, c AS n_clf_only_right,
         |  CAST(1000000 * (CAST(b AS HUGEINT) - c) * (CAST(b AS HUGEINT) - c)
         |    // (CAST(b AS HUGEINT) + c) AS BIGINT) AS chi2_ppm,
         |  CAST(1000000 * greatest(abs(CAST(b AS HUGEINT) - c) - 1, 0) * greatest(abs(CAST(b AS HUGEINT) - c) - 1, 0)
         |    // (CAST(b AS HUGEINT) + c) AS BIGINT) AS chi2_cc_ppm
         | FROM m""".stripMargin,
    "q_ml_fleiss" ->
      s"""WITH fv AS (${TextQueries.duckFilterVerdicts}),
         | cl AS (SELECT doc_id,
         |   CASE WHEN sum(w_milli) > 0 THEN 'keep' ELSE 'drop' END AS label
         |  FROM (SELECT doc_id,
         |    CAST('0x' || substr(md5('w#' || CAST(bucket AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000 AS w_milli
         |   FROM (SELECT doc_id,
         |     CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % ${TextQueries.ClassifyBuckets} AS bucket
         |    FROM (SELECT doc_id, unnest(${TextQueries.duckTerms("text")}) AS term FROM documents)))
         |  GROUP BY doc_id),
         | j AS (SELECT
         |   (CASE WHEN fv.verdict = 'keep' THEN 1 ELSE 0 END)
         |   + (CASE WHEN cl.label = 'keep' THEN 1 ELSE 0 END)
         |   + (CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS k
         |  FROM fv JOIN cl ON fv.doc_id = cl.doc_id
         |   JOIN documents d ON d.doc_id = fv.doc_id),
         | m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |   CAST(sum(k) AS HUGEINT) AS kk,
         |   CAST(sum(k * k + (3 - k) * (3 - k)) AS HUGEINT) AS ss FROM j)
         | SELECT CAST(n AS BIGINT) AS n_docs, CAST(kk AS BIGINT) AS votes_keep,
         |  CAST(10000 * (3 * n * (ss - 3 * n)
         |      - 2 * (kk * kk + (3 * n - kk) * (3 * n - kk)))
         |    // (2 * (9 * n * n - kk * kk - (3 * n - kk) * (3 * n - kk)))
         |   AS BIGINT) AS fleiss_bp
         | FROM m""".stripMargin,
    "q_ml_rankcorr" ->
      s"""WITH sc AS (
         |  SELECT doc_id,
         |   CAST(10000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) // length(text) AS BIGINT) AS alpha_bp,
         |   CAST(10000 * (len(toks_all) - len(toks)) // len(toks_all) AS BIGINT) AS stop_bp
         |  FROM (SELECT doc_id, text,
         |    list_filter(string_split(${TextQueries.duckClean("text")}, ' '), w -> w <> '') AS toks_all,
         |    ${TextQueries.duckTerms("text")} AS toks
         |   FROM documents)
         |  WHERE len(toks_all) > 0 AND length(text) > 0),
         | r AS (SELECT doc_id,
         |   row_number() OVER (ORDER BY alpha_bp, doc_id) AS r1,
         |   row_number() OVER (ORDER BY stop_bp, doc_id) AS r2
         |  FROM sc)
         | SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(1000000 - 6000000 * sum(CAST((r1 - r2) AS HUGEINT) * (r1 - r2))
         |    // (CAST(count(*) AS HUGEINT) * count(*) * count(*) - count(*))
         |   AS BIGINT) AS rho_ppm
         | FROM r""".stripMargin,
    "q_ml_ndcg" -> {
      val termRows = NdcgTerms.map(t => s"('$t')").mkString(", ")
      s"""WITH base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks
         |  FROM (SELECT doc_id, ${TextQueries.duckTerms("text")} AS toks FROM documents)
         |  WHERE len(toks) > 0),
         | pq AS (SELECT doc_id, dl, q.qterm,
         |   CAST(len(list_filter(toks, w -> w = q.qterm)) AS BIGINT) AS tf,
         |   CAST(coalesce(list_position(toks, q.qterm), 0) AS BIGINT) AS fpos
         |  FROM base CROSS JOIN (VALUES $termRows) AS q(qterm)),
         | rl AS (SELECT *, ${relSql("tf", "fpos", "dl")} AS rel FROM pq),
         | rk AS (SELECT * FROM (SELECT qterm, rel,
         |    row_number() OVER (PARTITION BY qterm
         |      ORDER BY tf DESC, dl ASC, doc_id ASC) AS rank
         |   FROM rl WHERE tf > 0) WHERE rank <= $NdcgK),
         | ik AS (SELECT * FROM (SELECT qterm, rel,
         |    row_number() OVER (PARTITION BY qterm
         |      ORDER BY rel DESC, doc_id ASC) AS rank
         |   FROM rl WHERE rel > 0) WHERE rank <= $NdcgK),
         | j AS (SELECT qterm, CAST(count(*) AS BIGINT) AS n_judged
         |  FROM rl WHERE rel > 0 GROUP BY qterm),
         | d AS (SELECT qterm,
         |   CAST(sum((${gainSql("rel")}) * (${dmSql("rank")})) AS BIGINT) AS dcg_micro,
         |   CAST(min(CASE WHEN rel > 0 THEN rank END) AS BIGINT) AS first_rel
         |  FROM rk GROUP BY qterm),
         | i AS (SELECT qterm,
         |   CAST(sum((${gainSql("rel")}) * (${dmSql("rank")})) AS BIGINT) AS idcg_micro
         |  FROM ik GROUP BY qterm)
         | SELECT j.qterm, n_judged, dcg_micro, idcg_micro,
         |  10000 * dcg_micro // idcg_micro AS ndcg_bp,
         |  CAST(coalesce(1000000 // first_rel, 0) AS BIGINT) AS rr_micro
         | FROM j JOIN d USING (qterm) JOIN i USING (qterm)
         | ORDER BY qterm""".stripMargin
    }
  )
}
