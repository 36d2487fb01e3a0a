package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant pins for the clustering / pair-qualification / mixture /
  * drift operators — properties the DuckDB hash-compare cannot state
  * (it proves engine agreement, not that the STATISTIC behaves): mass
  * conservation, ordering laws, bound laws. All on sf0.001. */
class CorpusOpsPropsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("kmeans: every corpus vector lands in exactly one cluster; K bounded") {
    val corpus = Tables.t(spark, dir, "embeddings")
      .where(col("vec_id") >= 5).count()
    val rows = q("q_sim_kmeans").collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == corpus,
      "cluster sizes do not conserve the corpus")
    assert(rows.length <= 8 && rows.map(_.getAs[Long]("cid")).distinct.length == rows.length)
    assert(rows.forall(_.getAs[Long]("inertia_ppm") >= 0L))
  }

  test("kmeans: the Lloyd step does not increase total inertia") {
    def inertia(rounds: Int): Long =
      SimilarityQueries.kmeansAssign(spark, dir, rounds)
        .agg(sum("d2_ppm")).as[Long].head()
    val (i1, i2) = (inertia(1), inertia(2))
    // Slack = corpus size: each per-vector distance floors to ppm, so
    // the SUMS can disagree with the true (monotone) inertias by up to
    // one ppm per vector on each side.
    val corpus = Tables.t(spark, dir, "embeddings")
      .where(col("vec_id") >= 5).count()
    assert(i2 <= i1 + corpus, s"Lloyd ascent: round1 $i1 -> round2 $i2")
  }

  test("cluster topics: at most 5 terms per cluster, counts descending") {
    val byCid = q("q_sim_cluster_topics").collect()
      .groupBy(_.getAs[Long]("cid"))
    byCid.foreach { case (cid, rows) =>
      assert(rows.length <= 5, s"cluster $cid has ${rows.length} topics")
      val byRank = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("cnt"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"cluster $cid counts not descending: ${byRank.toSeq}")
    }
  }

  test("semdedup: removals point at a STRICTLY earlier cluster-mate over threshold") {
    val assign = SimilarityQueries.kmeansAssign(spark, dir)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = q("q_sim_semdedup").collect()
    rows.foreach { r =>
      val (v, nn) = (r.getAs[Long]("vec_id"), r.getAs[Long]("nn_vec"))
      assert(nn < v, s"keep-first violated: nn $nn !< removed $v")
      assert(assign(v) == assign(nn) && assign(v) == r.getAs[Long]("cid"),
        s"pair $v/$nn crosses clusters")
      assert(r.getAs[Long]("cos_ppm") >= 400000L, // CosDupThreshold = 0.40
        s"below-threshold removal: $r")
      assert(v >= 5L && nn >= 5L, "query vectors must not participate")
    }
  }

  test("binary quantization: Hamming top-C matches a driver recompute; rerank ⊆ candidates") {
    // Independent reference: recompute sign-bit codes and Hamming
    // distances from the raw embeddings on the driver.
    val emb = graft.queries.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val codes = emb.map { case (id, v) =>
      id -> v.zipWithIndex.filter(_._1 >= 0f).map(_._2).toSet
    }.toMap
    def ham(a: Set[Int], b: Set[Int]) = (a.diff(b).size + b.diff(a).size)
    val adc = q("q_sim_bq_adc").collect()
    val queries = adc.map(_.getAs[Long]("qid")).distinct
    queries.foreach { qid =>
      val expect = codes.filter(_._1 >= 5L).toSeq
        .map { case (cid, c) => (ham(codes(qid), c).toLong, cid) }
        .sorted.take(20).map { case (h, cid) => (cid, h) }
      val got = adc.filter(_.getAs[Long]("qid") == qid)
        .sortBy(_.getAs[Int]("rnk"))
        .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("ham"))).toSeq
      assert(got == expect, s"qid $qid: engine top-C diverges from recompute")
    }
    // The rescore leg only reorders within the Hamming candidate set.
    val candSet = adc.map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val rr = q("q_sim_bq_rerank").collect()
    assert(rr.nonEmpty)
    rr.foreach { r =>
      assert(candSet((r.getAs[Long]("qid"), r.getAs[Long]("cid"))),
        "reranked pair outside the Hamming candidate budget")
    }
    q("q_sim_bq_recall").collect().foreach { r =>
      val bp = r.getAs[Long]("recall_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }

  test("pair ROUGE: overlap bounded by both sides; F within [0, 10000]") {
    val rows = DedupQueries.pairRougeFrame(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ov, n1, n2) = (r.getAs[Long]("overlap2"),
        r.getAs[Long]("nb1"), r.getAs[Long]("nb2"))
      assert(ov >= 0 && ov <= math.min(n1, n2), s"overlap out of bounds: $r")
      val f = r.getAs[Long]("rouge2_f_bp")
      assert(f >= 0 && f <= 10000, s"F out of range: $r")
      // F is exactly the declared function of the reported counts.
      assert(f == 10000L * 2 * ov / (n1 + n2), s"F inconsistent: $r")
    }
  }

  test("heaps curve: quartiles balanced, cumulatives monotone, closes on q_text_lexical") {
    val rows = q("q_text_heaps").collect()
    val lex = q("q_text_lexical").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"))).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("bucket"))
      assert(sorted.map(_.getAs[Int]("bucket")).toSeq == (1 to sorted.length),
        s"$src: bucket gap")
      // ntile balance: sizes differ by at most 1
      val sizes = sorted.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$src: unbalanced quartiles $sizes")
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("n_tokens_cum") <= b.getAs[Long]("n_tokens_cum"))
        assert(a.getAs[Long]("vocab_cum") <= b.getAs[Long]("vocab_cum"))
      }
      // Heaps behavior: vocabulary density falls from the first cut to
      // the last (sublinear type growth on any non-degenerate corpus).
      assert(sorted.head.getAs[Long]("vocab_per_mtok") >
        sorted.last.getAs[Long]("vocab_per_mtok"),
        s"$src: vocabulary density did not fall — Heaps violated")
      // The curve's endpoint IS the lexical report's totals.
      val (types, toks) = lex(src)
      assert(sorted.last.getAs[Long]("vocab_cum") == types,
        s"$src: endpoint vocab != q_text_lexical n_types")
      assert(sorted.last.getAs[Long]("n_tokens_cum") == toks,
        s"$src: endpoint tokens != q_text_lexical n_tokens")
    }
  }

  test("temperature: floors sum to ~1e6 and lower alpha flattens the mixture") {
    val rows = q("q_sample_temperature").collect()
    val byAlpha = rows.groupBy(_.getAs[Long]("alpha_pct"))
    assert(byAlpha.keySet == Set(100L, 50L, 25L))
    val nSources = byAlpha(100L).length
    byAlpha.foreach { case (a, rs) =>
      val s = rs.map(_.getAs[Long]("w_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - nSources,
        s"alpha $a weights sum $s outside floor band")
      // Every domain repeats at least ~once per epoch under alpha<1 only
      // if upweighted; epochs are positive always.
      assert(rs.forall(_.getAs[Long]("epochs_ppm") > 0L))
    }
    // Flattening law: the largest share shrinks as alpha drops.
    def maxW(a: Long) = byAlpha(a).map(_.getAs[Long]("w_ppm")).max
    assert(maxW(100L) >= maxW(50L) && maxW(50L) >= maxW(25L),
      s"alpha flattening violated: ${maxW(100L)}/${maxW(50L)}/${maxW(25L)}")
  }

  test("KS statistic: within [0, 1e6], location inside the value range") {
    val r = q("q_report_ks").collect().head
    val ks = r.getAs[Long]("ks_ppm")
    assert(ks >= 0L && ks <= 1000000L, r.toString)
    val (lo, hi) = Tables.t(spark, dir, "events")
      .agg(min("value"), max("value")).as[(Double, Double)].head()
    val at = r.getAs[Double]("ks_at_value")
    assert(at >= lo && at <= hi, s"argmax location $at outside [$lo, $hi]")
  }
}
