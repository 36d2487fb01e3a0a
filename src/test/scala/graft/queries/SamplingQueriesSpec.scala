package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the deterministic hash-split family (values themselves
  * are oracle-verified by the driver). */
class SamplingQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def split() = graft.SparkEntry.queries("q_sample_split")(spark, dir)

  test("hash split is deterministic, total, and disjoint") {
    val a = split().collect()
    val b = split().collect()
    assert(a.sameElements(b)) // same bytes, run to run
    val total = Tables.t(spark, dir, "documents").count()
    assert(a.length == total)            // every doc assigned
    assert(a.map(_.getLong(0)).distinct.length == a.length) // exactly once
  }

  test("split proportions land near 80/10/10 and buckets stay in range") {
    val byS = split().groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byS.values.sum.toDouble
    assert(math.abs(byS("train") / n - 205.0 / 256) < 0.05)
    assert(math.abs(byS("val") / n - 25.0 / 256) < 0.05)
    assert(math.abs(byS("test") / n - 26.0 / 256) < 0.05)
    val range = split().agg(min("bucket"), max("bucket")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) <= 255)
  }

  test("weighted sample is deterministic and size-biased") {
    val q = graft.SparkEntry.queries("q_sample_weighted")(spark, dir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    // Decision audit holds on every emitted row.
    rows.foreach(r => assert(r.getAs[Long]("wbucket") < r.getAs[Long]("thr")))
    // Deterministic: same selection run to run.
    assert(graft.SparkEntry.queries("q_sample_weighted")(spark, dir)
      .collect().sameElements(rows))
    // Size-biased: the sampled mean length exceeds the corpus mean
    // (inclusion probability ∝ n_chars).
    val corpusMean = Tables.t(spark, dir, "documents")
      .agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("mixture sample lands near the target shares") {
    val out = graft.SparkEntry.queries("q_sample_mixture")(spark, dir).collect()
    assert(out.length == SamplingQueries.MixtureTargetsBp.length)
    val total = out.map(_.getAs[Long]("n_sampled")).sum.toDouble
    val targets = SamplingQueries.MixtureTargetsBp.toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_corpus"))
      assert(r.getAs[Long]("n_sampled") > 0)
      val share = r.getAs[Long]("n_sampled") / total
      val tgt = targets(r.getString(0)) / 10000.0
      assert(math.abs(share - tgt) < 0.08,
        s"${r.getString(0)}: sampled share $share vs target $tgt")
    }
  }

  test("stratified sample keeps every stratum at roughly the corpus share") {
    val sampled = graft.SparkEntry.queries("q_sample_strat")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = Tables.t(spark, dir, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet == corpus.keySet) // no stratum vanishes
    for ((lang, total) <- corpus) {
      val rate = sampled(lang).toDouble / total
      assert(rate > 0.03 && rate < 0.20, // ~10% target, small-stratum noise
        s"stratum $lang sampled at $rate")
    }
  }

  test("DSIR keep-set is deterministic and partitioning-invariant") {
    val q = graft.SparkEntry.queries("q_sample_dsir")
    val a = q(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = q(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a == b, "same corpus must select the same docs, run to run")
    assert(a.length == 100)
    assert(a.distinct.length == a.length, "sampling is without replacement")
  }

  test("DSIR importance weights favor the in-domain source's distribution") {
    // Gibbs' inequality applied to the hashed space: the target empirical
    // distribution maximizes Σ p̂_t(b)·ln(q(b)/p̂_r(b)) at q = p̂_t, so
    // the TOKEN-weighted mean per-token log-weight of in-domain docs must
    // exceed that of the rest (equality only if the hashed distributions
    // coincide exactly — they differ by sampling noise even on a shared
    // vocabulary).
    val rows = SamplingQueries.dsirScoredFrame(spark, dir).collect()
    val inSrc = rows.map(_.getAs[String]("source")).min
    def perTok(rs: Array[org.apache.spark.sql.Row]) = {
      val tok = rs.map(_.getAs[Long]("n_tokens")).sum.toDouble
      val lw = rs.map(_.getAs[Long]("logw_mln")).sum.toDouble
      lw / tok
    }
    val (tgt, rest) = rows.partition(_.getAs[String]("source") == inSrc)
    assert(tgt.nonEmpty && rest.nonEmpty, "both classes should survive")
    assert(perTok(tgt) > perTok(rest),
      s"in-domain per-token logw ${perTok(tgt)} should exceed ${perTok(rest)}")
  }

  test("epoch water-filling: caps honored, budget conserved, refill " +
      "dominates the plain allocation") {
    // Values are oracle-verified; this pins the SEMANTIC invariants of
    // the closed-form fixpoint so a refactor cannot silently break the
    // Muennighoff recipe while still agreeing with a co-broken oracle.
    val plain = graft.SparkEntry.queries("q_sample_epochs")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val refill = graft.SparkEntry
      .queries("q_sample_epochs_refill")(spark, dir).collect()
    assert(refill.nonEmpty)
    val capMilli = 4000L
    var realizedSum = 0L
    refill.foreach { r =>
      val src = r.getAs[String]("source")
      val e = r.getAs[Long]("epochs_milli")
      val capped = r.getAs[Boolean]("capped")
      assert(e <= capMilli, s"$src exceeds the 4-epoch cap: $e")
      // Capped sources realize EXACTLY the cap; uncapped sit under it.
      if (capped) assert(e == capMilli, s"$src capped but epochs $e")
      else assert(e < capMilli, s"$src uncapped at the cap")
      // Refill never shrinks an allocation: every source gets at least
      // its plain-allocation epochs (water only flows downhill into
      // uncapped sources; capped ones stay at the cap).
      val pe = plain(src).getAs[Long]("epochs_milli")
      assert(e >= pe, s"$src refill $e < plain $pe")
      realizedSum += r.getAs[Long]("realized_tok")
    }
    // Budget conservation: total realized tokens never exceed B = 2x
    // corpus tokens, and the refill strands LESS than the plain
    // allocation did (that is its whole point) — unless nothing was
    // capped, in which case the two coincide on realized totals.
    val nTotal = refill.map(_.getAs[Long]("n_tok")).sum
    val budget = 2L * nTotal
    assert(realizedSum <= budget,
      s"realized $realizedSum exceeds budget $budget")
    val plainRealized = plain.values.map(_.getAs[Long]("realized_tok")).sum
    assert(realizedSum >= plainRealized,
      s"refill realized $realizedSum < plain $plainRealized")
    if (refill.exists(_.getAs[Boolean]("capped")) &&
        refill.exists(!_.getAs[Boolean]("capped")))
      assert(realizedSum > plainRealized,
        "capped + uncapped sources present but the refill moved nothing")
  }

  test("prototype pruning keeps exactly the hardest ceil-fraction per cluster") {
    val kept = graft.SparkEntry.queries("q_sample_proto_prune")(spark, dir)
      .collect()
    assert(kept.nonEmpty)
    val assign = SimilarityQueries.sharedKmeansAssign(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
        r.getAs[Long]("d2_ppm")))
    val byCid = assign.groupBy(_._2)
    kept.groupBy(_.getAs[Long]("cid")).foreach { case (cid, ks) =>
      val members = byCid(cid)
      val quota = (members.length * SamplingQueries.ProtoKeepBp + 9999L) / 10000L
      assert(ks.length == quota, s"cluster $cid kept ${ks.length} != $quota")
      // The kept set IS the hardest: every kept d2 >= every dropped d2
      // (ties broken by vec_id, so compare (d2, -vec_id) lexically).
      val keptIds = ks.map(_.getAs[Long]("vec_id")).toSet
      val keyOf = (m: (Long, Long, Long)) => (m._3, -m._1)
      val minKept = members.filter(m => keptIds(m._1)).map(keyOf).min
      val dropped = members.filterNot(m => keptIds(m._1))
      if (dropped.nonEmpty)
        assert(Ordering[(Long, Long)].gt(minKept, dropped.map(keyOf).max))
    }
  }

  test("interleave: total, md5-ordered per source, prefixes track temperature shares") {
    val rows = graft.SparkEntry.queries("q_sample_interleave")(spark, dir)
      .orderBy("train_pos").collect()
    val n = rows.length
    assert(rows.map(_.getAs[Long]("train_pos")).toSeq == (1L to n).toSeq)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == n)
    // Within each source the schedule consumes docs in md5-rank order.
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val ranks = rs.sortBy(_.getAs[Long]("train_pos"))
        .map(_.getAs[Long]("src_rank"))
      assert(ranks.toSeq == (1L to ranks.length).toSeq,
        s"source $src consumed out of rank order")
    }
    // Prefix mixture matches the α=0.5 shares while no source is
    // exhausted (stride scheduling's bounded-deviation guarantee;
    // past first exhaustion the survivors legitimately speed up).
    val wppm = graft.SparkEntry.queries("q_sample_temperature")(spark, dir)
      .where(col("alpha_pct") === 50).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_ppm")).toMap
    val wSum = wppm.values.sum.toDouble
    val firstExhaust = rows.groupBy(_.getAs[String]("source"))
      .values.map(_.map(_.getAs[Long]("train_pos")).max).min
    val srcSeq = rows.map(_.getAs[String]("source"))
    val tol = (t: Int) => math.max(wppm.size + 1.0, 0.02 * t)
    for (fr <- Seq(0.25, 0.5, 0.75, 1.0)) {
      val t0 = math.max(1, ((firstExhaust - 1) * fr).toInt)
      val pre = srcSeq.take(t0).groupBy(identity).view.mapValues(_.length)
      wppm.foreach { case (src, w) =>
        val expect = t0 * w / wSum
        val got = pre.getOrElse(src, 0)
        assert(math.abs(got - expect) <= tol(t0),
          s"prefix $t0: source $src got $got expected ~$expect")
      }
    }
  }

  test("mixture-ordered packing: bins contiguous, totals conserved, windows mixed") {
    val bins = graft.SparkEntry.queries("q_sample_pack_mix")(spark, dir)
      .orderBy("bin").collect()
    assert(bins.nonEmpty)
    assert(bins.map(_.getAs[Long]("bin")).toSeq ==
      (0L until bins.length).toSeq, "bin gap")
    // Positions partition the schedule: consecutive, non-overlapping.
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("last_pos") + 1 == b.getAs[Long]("first_pos"))
    }
    // Token totals conserve the corpus.
    val corpusTok = graft.queries.Tables.t(spark, dir, "documents")
      .selectExpr("sum(n_chars DIV 4)").head().getLong(0)
    assert(bins.map(_.getAs[Long]("sum_tokens")).sum == corpusTok)
    // The property this packer exists for: every full window draws
    // from MORE than one source (per-source packing gives 1 here).
    val full = bins.dropRight(1)
    assert(full.nonEmpty && full.forall(_.getAs[Long]("n_sources") >= 2),
      "a full mixture-ordered window came from a single source")
  }

  test("d4 composes dedup-then-prune: no removed doc kept, survivor quotas exact") {
    val kept = graft.SparkEntry.queries("q_sample_d4")(spark, dir).collect()
    assert(kept.nonEmpty)
    val removed = graft.SparkEntry.queries("q_sim_semdedup")(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(removed.nonEmpty, "fixture should produce semantic near-dups")
    val keptIds = kept.map(_.getAs[Long]("vec_id")).toSet
    assert(keptIds.intersect(removed).isEmpty,
      "a SemDeDup-removed vector survived into the D4 kept set")
    // Quotas are ceil on SURVIVOR occupancies, not pre-dedup sizes.
    val surv = SimilarityQueries.sharedKmeansAssign(spark, dir).collect()
      .filterNot(r => removed(r.getAs[Long]("vec_id")))
    val survByCid = surv.groupBy(_.getAs[Long]("cid")).view.mapValues(_.length)
    kept.groupBy(_.getAs[Long]("cid")).foreach { case (cid, ks) =>
      val quota =
        (survByCid(cid) * SamplingQueries.ProtoKeepBp + 9999L) / 10000L
      assert(ks.length == quota, s"cluster $cid kept ${ks.length} != $quota")
    }
    // Dedup happened before pruning: the D4 kept set differs from
    // plain proto-prune wherever a removed doc freed a quota slot.
    val plain = graft.SparkEntry.queries("q_sample_proto_prune")(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds != plain,
      "d4 should differ from plain proto-prune on a fixture with near-dups")
  }

  test("pruning curve is monotone and beats proportional mass retention") {
    val rows = graft.SparkEntry.queries("q_sample_proto_ablation")(spark, dir)
      .orderBy("keep_bp").collect()
    assert(rows.map(_.getAs[Int]("keep_bp")).toSeq == Seq(2500, 5000, 7500))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_kept") <= b.getAs[Long]("n_kept"))
      assert(a.getAs[Long]("d2_kept_ppm") <= b.getAs[Long]("d2_kept_ppm"))
    }
    rows.foreach { r =>
      // Hardness-ranked selection retains at least its proportional
      // share of the d2 mass (top-q mean >= cluster mean, per cluster).
      assert(r.getAs[Long]("retained_bp") >= r.getAs[Int]("keep_bp"),
        s"keep_bp ${r.getAs[Int]("keep_bp")} retained only " +
          s"${r.getAs[Long]("retained_bp")}")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
    }
  }
}
