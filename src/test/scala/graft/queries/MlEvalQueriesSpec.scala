package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Hand-graded toys through the SAME plans the graded `q_ml_*` queries
  * run (the Q closures call these seams on the documents-derived frame).
  * AUC/PR numbers below are computed by hand from the pair definition —
  * concordant + ½·ties over pos×neg pairs — not from any re-derivation
  * of the rank-sum identity under test. */
class MlEvalQueriesSpec extends SparkSpec {

  import spark.implicits._

  /** (score, y): npos = 4 {4,5,6,8}, nneg = 3 {3,5,7}; one pos/neg tie
    * at 5. Pairwise: 7.5 of 12 → AUC = 0.625 exactly. */
  private def toy: DataFrame =
    Seq((3L, 0L), (4L, 1L), (5L, 0L), (5L, 1L), (6L, 1L), (7L, 0L), (8L, 1L))
      .toDF("score", "y")

  test("AUC matches the hand-computed pair count, ties at half weight") {
    val r = MlEvalQueries.aucOf(toy).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_pos") == 4L)
    assert(row.getAs[Long]("n_neg") == 3L)
    assert(row.getAs[Long]("auc_bp") == 6250L, row)
  }

  test("AUC is 10000 on perfectly separated classes, 0 when inverted") {
    val sep = Seq((1L, 0L), (2L, 0L), (9L, 1L), (10L, 1L)).toDF("score", "y")
    assert(MlEvalQueries.aucOf(sep).collect().head.getAs[Long]("auc_bp") == 10000L)
    val inv = Seq((1L, 1L), (2L, 1L), (9L, 0L), (10L, 0L)).toDF("score", "y")
    assert(MlEvalQueries.aucOf(inv).collect().head.getAs[Long]("auc_bp") == 0L)
  }

  test("PR curve: hand-checked row at threshold 6; recall monotone") {
    val rows = MlEvalQueries.prCurveOf(toy).collect()
    // thresholds are the 6 distinct scores, descending
    assert(rows.map(_.getAs[Long]("threshold")).toSeq ==
      Seq(8L, 7L, 6L, 5L, 4L, 3L))
    val t6 = rows.find(_.getAs[Long]("threshold") == 6L).get
    assert(t6.getAs[Long]("tp") == 2L && t6.getAs[Long]("fp") == 1L)
    assert(t6.getAs[Long]("precision_bp") == 6666L)
    assert(t6.getAs[Long]("recall_bp") == 5000L)
    assert(t6.getAs[Long]("f1_bp") == 5714L) // 40000 div 7
    // As the threshold drops, predicted-positive sets only grow.
    val recalls = rows.map(_.getAs[Long]("recall_bp")).toSeq
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(recalls.last == 10000L, "lowest threshold must reach full recall")
  }

  test("calibration bins: clamp at 9, integer bp arithmetic, shares") {
    val sc = Seq((950L, 1L), (50L, 0L), (10000L, 1L)).toDF("score", "y")
    val byBin = MlEvalQueries.calibrationOf(sc).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(byBin.keySet == Set(0L, 9L), "score 10000 must clamp into bin 9")
    val b0 = byBin(0L)
    assert(b0.getAs[Long]("n") == 2L)
    assert(b0.getAs[Long]("share_bp") == 6666L)
    assert(b0.getAs[Long]("pred_bp") == 500L)  // (950+50) DIV 2
    assert(b0.getAs[Long]("obs_bp") == 5000L)
    assert(b0.getAs[Long]("gap_bp") == 4500L)
    val b9 = byBin(9L)
    assert(b9.getAs[Long]("n") == 1L && b9.getAs[Long]("gap_bp") == 0L)
  }

  test("sliced AUC: per-slice values match aucOf per slice; degenerate dropped") {
    // Slice a = the tied toy (0.625), slice b = perfectly separated
    // (1.0), slice c = all-positive (AUC undefined, must be DROPPED).
    val sc = (toy.collect().map(r => ("a", r.getLong(0), r.getLong(1))) ++
      Seq(("b", 1L, 0L), ("b", 2L, 0L), ("b", 9L, 1L), ("b", 10L, 1L)) ++
      Seq(("c", 5L, 1L), ("c", 6L, 1L))).toSeq
      .toDF("slice", "score", "y")
    val rows = MlEvalQueries.aucBy(sc, "slice").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("auc_bp")).toMap
    assert(rows == Map("a" -> 6250L, "b" -> 10000L),
      s"per-slice AUC wrong or degenerate slice not dropped: $rows")
    // Engine-vs-engine: each surviving slice must equal the global
    // estimator run on that slice alone — the sliced plan may not
    // change the statistic, only the keying.
    for (s <- Seq("a", "b")) {
      val solo = MlEvalQueries.aucOf(sc.where($"slice" === s)
        .select("score", "y")).collect().head.getAs[Long]("auc_bp")
      assert(solo == rows(s), s"slice $s: $solo vs ${rows(s)}")
    }
  }

  test("average precision: 1.0 on perfect ranking; interleaved toy by hand") {
    def ap(rows: (Long, Long)*) =
      MlEvalQueries.apOf(rows.toSeq.toDF("score", "y"))
        .collect().head.getAs[Long]("ap_ppm")
    // Perfect separation: every positive above every negative → AP = 1.
    assert(ap((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)) == 1000000L)
    // Interleaved pos@1, neg@2, pos@3, neg@4 (desc): terms are
    // floor(1e6·pos·tp/((tp+fp)·n_pos)) per distinct threshold:
    //   t=40: tp=1 fp=0 → 1e6·1·1/(1·2) = 500000
    //   t=30: tp=1 fp=1 → 0 (pos=0)
    //   t=20: tp=2 fp=1 → 1e6·1·2/(3·2) = 333333
    //   t=10: tp=2 fp=2 → 0 (pos=0)
    assert(ap((40L, 1L), (30L, 0L), (20L, 1L), (10L, 0L)) == 833333L)
  }

  test("Brier: exact hand values at the bp scale") {
    def brier(rows: (Long, Long)*) =
      MlEvalQueries.brierOf(rows.toSeq.toDF("score", "y"))
        .collect().head.getAs[Long]("brier_ppm")
    // Perfect confident predictions → 0; the 0.5 coin → 0.25 = 250000.
    assert(brier((10000L, 1L), (0L, 0L)) == 0L)
    assert(brier((5000L, 1L), (5000L, 0L)) == 250000L)
    // (0.8, 1) and (0.3, 0): ((0.2)² + (0.3)²)/2 = 0.065 → 65000 ppm.
    assert(brier((8000L, 1L), (3000L, 0L)) == 65000L)
  }

  test("jackknife AUC: complement arithmetic equals direct leave-one-out") {
    val sc = Seq(
      (1L, 10L, 0L, 0L), (2L, 20L, 0L, 0L), (3L, 30L, 1L, 0L),
      (4L, 15L, 0L, 1L), (5L, 25L, 1L, 1L), (6L, 35L, 1L, 1L),
      (7L, 12L, 0L, 2L), (8L, 22L, 1L, 2L), (9L, 18L, 0L, 2L))
      .toDF("doc_id", "score", "y", "g")
    val row = MlEvalQueries.aucJackknifeOf(sc).collect().head
    // The graded path derives each leave-one-out estimate ARITHMETICALLY
    // (total − group per-value counts); it must equal the direct form —
    // the global estimator run on the physically filtered complement.
    val thetas = (0L to 2L).flatMap { g =>
      val r = MlEvalQueries.aucOf(
        sc.where($"g" =!= g).select("score", "y")).collect().head
      if (r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
        Some(BigInt(r.getAs[Long]("auc_bp")))
      else None
    }
    val gn = BigInt(thetas.size)
    val s1 = thetas.sum
    val s2 = thetas.map(t => t * t).sum
    val varExp = ((gn - 1) * (gn * s2 - s1 * s1) / (gn * gn)).toLong
    assert(row.getAs[Long]("g_n") == gn.toLong, row)
    assert(row.getAs[Long]("jk_var_bp2") == varExp, row)
    val se = math.floor(math.sqrt(varExp.toDouble)).toLong
    assert(row.getAs[Long]("jk_se_bp") == se, row)
    assert(row.getAs[Long]("ci_lo_bp") ==
      row.getAs[Long]("auc_bp") - 196 * se / 100, row)
    assert(row.getAs[Long]("ci_hi_bp") ==
      row.getAs[Long]("auc_bp") + 196 * se / 100, row)
  }

  test("Fleiss kappa: perfect mixed agreement reads 1.0; toy matches BigInt math") {
    def votes(ks: Long*) = ks.toSeq.toDF("k")
    // Unanimous but MIXED direction (3-0 and 0-3 docs): P̄ = 1, chance < 1
    // → κ_F must be exactly 1.0.
    assert(MlEvalQueries.fleissFromVotes(votes(3L, 0L, 3L, 0L))
      .head().getAs[Long]("fleiss_bp") == 10000L)
    // Toy with split votes, against an independent BigInt derivation.
    val ks = Seq(3L, 2L, 1L, 0L, 2L, 2L, 1L, 3L)
    val row = MlEvalQueries.fleissFromVotes(votes(ks: _*)).head()
    val n = BigInt(ks.size); val kk = BigInt(ks.sum)
    val ss = BigInt(ks.map(k => k * k + (3 - k) * (3 - k)).sum)
    val d = 3 * n - kk
    val num = BigInt(10000) * (3 * n * (ss - 3 * n) - 2 * (kk * kk + d * d))
    val den = 2 * (9 * n * n - kk * kk - d * d)
    assert(row.getAs[Long]("fleiss_bp") == (num / den).toLong,
      s"$row vs ${num / den}")
    assert(row.getAs[Long]("n_docs") == 8L &&
      row.getAs[Long]("votes_keep") == ks.sum)
  }

  test("kappa arithmetic survives counts past the int64 product ceiling") {
    // n = 5×10⁹ puts n² ≈ 2.5×10¹⁹ past 2⁶³−1 ≈ 9.2×10¹⁸ — the
    // pre-widened BIGINT form wraps (non-ANSI) or raises (ANSI) here;
    // the DECIMAL(38,0) form must return the BigInt-exact value.
    val (a, b, c, d) = (2000000000L, 1500000000L, 1000000000L, 500000000L)
    val n = a + b + c + d
    val cells = Seq((n, a, b, c, d)).toDF("n", "a", "b", "c", "d")
    val row = MlEvalQueries.kappaFromCounts(cells).collect().head
    def big(x: Long) = BigInt(x)
    val chance =
      (big(a) + big(b)) * (big(a) + big(c)) + (big(c) + big(d)) * (big(b) + big(d))
    val expected =
      (BigInt(10000) * (big(n) * (big(a) + big(d)) - chance) /
        (big(n) * big(n) - chance)).toLong
    assert(row.getAs[Long]("agree_bp") ==
      (BigInt(10000) * (big(a) + big(d)) / big(n)).toLong, row)
    assert(row.getAs[Long]("kappa_bp") == expected, row)
  }

  test("Spearman: +1e6 on agreement, -1e6 on reversal, hand value on a swap") {
    def sc(rows: (Long, Long, Long)*) = rows.toSeq.toDF("doc_id", "s1", "s2")
    def rho(d: org.apache.spark.sql.DataFrame) =
      MlEvalQueries.rankCorrOf(d, "s1", "s2").collect().head.getAs[Long]("rho_ppm")
    assert(rho(sc((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L))) == 1000000L)
    assert(rho(sc((1L, 10L, 300L), (2L, 20L, 200L), (3L, 30L, 100L))) == -1000000L)
    // Ranks (1,2,3) vs (2,1,3): Σd² = 2, rho = 1e6 - 6e6·2/24 = 500000.
    val swap = MlEvalQueries.rankCorrOf(
      sc((1L, 10L, 200L), (2L, 20L, 100L), (3L, 30L, 300L)), "s1", "s2")
      .collect().head
    assert(swap.getAs[Long]("rho_ppm") == 500000L, swap)
  }

  test("NDCG/MRR match the hand-computed toy, rel-0-at-rank-1 included") {
    // One query. Ranking is tf desc (dl, doc_id break ties); rel comes
    // from the first-occurrence position. doc 1 ranks FIRST but its only
    // mentions sit in the tail (rel 0) — so MRR must be 1/2, not 1, and
    // DCG loses rank 1 entirely.
    //   doc 1: tf 3, fpos 8, dl 8 -> rel 0   (rank 1, gain 0)
    //   doc 2: tf 2, fpos 2, dl 8 -> rel 3   (rank 2, gain 7)
    //   doc 3: tf 1, fpos 4, dl 8 -> rel 2   (rank 3, gain 3)
    //   doc 5: tf 1, fpos 5, dl 8 -> rel 1   (rank 4, gain 1)
    //   doc 4: tf 0            -> unranked, unjudged
    // Discounts (floor micro): 1000000, 630929, 500000, 430676.
    // DCG  = 7·630929 + 3·500000 + 1·430676          = 6347179
    // IDCG = 7·1000000 + 3·630929 + 1·500000         = 9392787
    // NDCG = 10000·6347179 div 9392787               = 6757 bp
    val perQ = Seq(
      (1L, 8L, "q", 3L, 8L), (2L, 8L, "q", 2L, 2L),
      (3L, 8L, "q", 1L, 4L), (5L, 8L, "q", 1L, 5L),
      (4L, 8L, "q", 0L, 0L))
      .toDF("doc_id", "dl", "qterm", "tf", "fpos")
    val r = MlEvalQueries.ndcgOf(perQ).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_judged") == 3L, row)
    assert(row.getAs[Long]("dcg_micro") == 6347179L, row)
    assert(row.getAs[Long]("idcg_micro") == 9392787L, row)
    assert(row.getAs[Long]("ndcg_bp") == 6757L, row)
    assert(row.getAs[Long]("rr_micro") == 500000L, row)
  }

  test("NDCG is 10000 bp when the ranking equals the ideal ordering") {
    val perQ = Seq((1L, 8L, "q", 3L, 1L), (2L, 8L, "q", 2L, 3L),
      (3L, 8L, "q", 1L, 5L))
      .toDF("doc_id", "dl", "qterm", "tf", "fpos")
    val row = MlEvalQueries.ndcgOf(perQ).collect().head
    assert(row.getAs[Long]("ndcg_bp") == 10000L, row)
    assert(row.getAs[Long]("rr_micro") == 1000000L, row)
  }

  test("held-out LM: hand-graded surprisals, OOV scored not dropped") {
    // Train: one doc, terms a×3, b×1 → T=4, V=2.
    //   mln(a) = floor(1000·ln(7/4)) = 559 ; mln(b) = floor(1000·ln(7/2)) = 1252
    //   OOV    = floor(1000·ln(7))   = 1945
    val tf = Seq(
      (1L, "train", "a", 3L), (1L, "train", "b", 1L),
      (9L, "val", "a", 2L), (9L, "val", "z", 1L))
      .toDF("doc_id", "split", "term", "k")
    val r = graft.queries.TextQueries.heldoutOf(tf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_tokens") == 3L, row)
    assert(row.getAs[Long]("n_oov") == 1L, row)
    // (2·559 + 1·1945) DIV 3 = 3063 DIV 3 = 1021
    assert(row.getAs[Long]("heldout_mb") == 1021L, row)
  }

  test("corpus AUC sits at chance — the harness detects a no-signal pair") {
    // TESTDATA's `lang` label is drawn independently of the text (every
    // language shares one vocabulary), so the TRUE AUC of any text-derived
    // score against lang=en is 0.5. A correct estimator must say so; the
    // classic broken ones drift systematically (dropping pos/neg ties
    // biases toward 0, counting them fully toward 1, both amplified here
    // because bp-quantized scores tie heavily). Band = chance ± sampling
    // noise at ~500 docs.
    val r = graft.SparkEntry.queries("q_ml_auc")(spark, "/root/testdata/sf0.01")
      .collect().head
    val auc = r.getAs[Long]("auc_bp")
    assert(auc > 4000L && auc < 6000L,
      s"independent labels must grade near 5000 bp, got $auc bp")
  }
}
