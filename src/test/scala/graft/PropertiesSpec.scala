package graft

import org.apache.spark.sql.functions._

/** Algebraic properties from the test plan (SURVEY.md §5.2 item 3). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.queries.Tables
    .t(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "lang", "text")

  /** Several graded emissions (a1HashAgg basis points, cents columns)
    * document "overflow is loud, not silent" on the strength of Spark 4's
    * ANSI default. Pin that assumption: if a config drift ever flips ANSI
    * off, overflow would silently wrap/NULL and the documented bounds
    * become lies — this fails first. */
  test("ANSI default holds: bigint overflow raises, never wraps") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val e = intercept[Exception] {
      spark.sql("SELECT CAST(9223372036854775807 AS BIGINT) + CAST(1 AS BIGINT)")
        .collect()
    }
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      e.getMessage.toLowerCase.contains("overflow"), e.getMessage)
  }

  /** The chunking contract a training consumer relies on: chunks tile
    * every document — stride-aligned starts, full windows everywhere but
    * the tail, and complete coverage of the token range (start of chunk
    * k+1 = start of chunk k + stride, last chunk reaches token n). */
  test("q_text_chunks tiles each document's token range completely") {
    val dir = "/root/testdata/sf0.001"
    val chunks = graft.SparkEntry.queries("q_text_chunks")(spark, dir)
    val bad = chunks
      .withColumn("next_start", lead("tok_start", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_id")))
      .where(
        // interior chunks are full-width and stride-spaced …
        (col("next_start").isNotNull &&
          (col("next_start") =!= col("tok_start") + 24 || col("n_tok") =!= 32)) ||
        // … the last chunk ends exactly at the document's token count
        (col("next_start").isNull && col("n_tok") > 32) ||
        col("n_tok") < 1)
    assert(bad.isEmpty, bad.limit(5).collect().mkString("\n"))
    // Coverage: last chunk's end (start + n_tok − 1) is the max token
    // index, and consecutive windows overlap (no token falls in a gap).
    val gap = chunks
      .withColumn("prev_end", lag(col("tok_start") + col("n_tok") - 1, 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_id")))
      .where(col("prev_end").isNotNull && col("tok_start") > col("prev_end") + 1)
    assert(gap.isEmpty, "a token index fell between chunks")
  }

  /** ntile(4) balance: RFM quartile sizes differ by at most one row —
    * the property that makes quartile labels comparable across metrics. */
  test("q_w2_rfm quartiles are balanced within one row") {
    val rfm = graft.SparkEntry.queries("q_w2_rfm")(spark, "/root/testdata/sf0.001")
    for (qc <- Seq("r_q", "f_q", "m_q")) {
      val sizes = rfm.groupBy(qc).count()
        .select("count").as[Long].collect()
      assert(sizes.length == 4 && sizes.max - sizes.min <= 1,
        s"$qc sizes: ${sizes.mkString(",")}")
    }
  }

  test("dropDuplicates is idempotent") {
    val once = docs.select("lang").dropDuplicates()
    assert(once.count() == once.dropDuplicates().count())
  }

  test("stop-word removal output is a sub-multiset of its input") {
    val viol = docs
      .withColumn("toks", split(graft.ops.TextOps.cleanText($"text"), " "))
      .withColumn("kept", graft.ops.TokenOps.removeStopWords($"toks"))
      .where(size(filter($"kept", w => !array_contains($"toks", w))) > 0)
    assert(viol.count() == 0)
  }

  test("set algebra: (A except B) union (A intersect B) == A for key sets") {
    val a = docs.where($"lang".isin("en", "fr")).select("doc_id")
    val b = docs.where($"lang" === "fr").select("doc_id")
    val rebuilt = a.except(b).union(a.intersect(b)).distinct()
    assert(rebuilt.count() == a.distinct().count())
    assert(rebuilt.except(a).count() == 0)
  }

  test("union is commutative under distinct") {
    val a = docs.where($"lang" === "en").select("doc_id")
    val b = docs.where($"lang" === "de").select("doc_id")
    assert(a.union(b).distinct().count() == b.union(a).distinct().count())
  }

  /** The winnowing guarantee (Schleimer–Wilkerson–Aiken 2003, theorem
    * behind `q_text_winnow`): two documents sharing a token run of at
    * least w+k−1 tokens MUST share a selected fingerprint — the run
    * contains a full window of common k-grams and that window's minimum
    * is picked on both sides. Different surroundings on each side make
    * the negative control meaningful: docs with NO long shared run need
    * not (and here do not) intersect. */
  test("winnowing guarantees a shared fingerprint for a shared long run") {
    // k=4, w=5 ⇒ guarantee threshold is 8 shared consecutive tokens.
    val run = "kestrel quartz velvet marmot oboe zephyr tundra cobalt"
    val a = s"aardvark binnacle chutney $run dromedary eiderdown"
    val b = s"foxglove gannet hawser ibex jacamar $run knapweed"
    val c = "lorikeet mandrake nutmeg oarlock pemmican quahog rhubarb sassafras tamarind"
    val d = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val sel = graft.queries.TextQueries.winnowSelected(d)
      .select("doc_id", "wmin").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert((sel(1L) & sel(2L)).nonEmpty,
      "docs sharing an 8-token run selected no common fingerprint")
    assert((sel(1L) & sel(3L)).isEmpty && (sel(2L) & sel(3L)).isEmpty,
      "unrelated doc shares fingerprints — hash or windowing is degenerate")
  }

  /** The pair consumer inherits the winnowing guarantee: a shared run of
    * ≥ minShared·(w+1)/2-ish tokens forces enough shared selections to
    * cross the reporting floor, and docs with no shared run report
    * nothing. The hub-df prune cannot fire here (df = 2 ≤ cap), so a
    * regression in the prune predicate that over-prunes would also
    * surface as a missing pair. */
  test("q_text_winnow_pairs reports a long shared run and stays silent otherwise") {
    // k=4, w=5: a 40-token shared run holds ≥ 7 full windows ⇒ well past
    // the minShared=3 floor even after window-minimum dedup.
    val run = (1 to 40).map(i => s"zq$i").mkString(" ")
    val a = s"aardvark binnacle chutney $run dromedary eiderdown"
    val b = s"foxglove gannet hawser $run jacamar knapweed"
    val c = "lorikeet mandrake nutmeg oarlock pemmican quahog rhubarb sassafras tamarind"
    val d = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = graft.queries.TextQueries.winnowPairFrame(d)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      "docs sharing a 40-token run were not reported as a pair")
    assert(pairs.size == 1,
      s"unrelated docs reported as pairs: $pairs")
  }

  /** The span merge is EXACT, not just guaranteed-nonempty: a planted
    * shared run must come back as one span with the run's precise
    * 1-based start position in each doc's de-stopped token stream and
    * its exact token length — the rows a span-removal pass would cut.
    * Below-floor runs (< w+k−1 = 8 tokens) stay silent, as does an
    * unrelated doc. */
  test("q_dedup_spans recovers a planted run with exact positions and length") {
    val run = (1 to 12).map(i => s"zq$i").mkString(" ")
    val short = (1 to 6).map(i => s"yx$i").mkString(" ")
    // doc 1: run at de-stopped positions 4..15; doc 2: at 3..14.
    val a = s"aardvark binnacle chutney $run dromedary $short"
    val b = s"foxglove gannet $run jacamar $short"
    val c = "lorikeet mandrake nutmeg oarlock pemmican quahog rhubarb sassafras tamarind"
    val d = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val spans = graft.queries.TextQueries.spanFrame(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 2L, 4L, 3L, 12L)),
      s"expected exactly the planted 12-token span (1,2,4,3,12); got $spans")
  }

  /** The apply step must merge OVERLAPPING victim intervals before
    * counting: doc 9 shares run t1..t12 with doc 1 and run t7..t18 with
    * doc 2 — two spans overlapping on t7..t12. Counting both would claim
    * 30 duplicated tokens of an 18-token overlap; the merge must report
    * one [1,18] interval. Docs 1 and 2 are min-id keepers (their mutual
    * 6-token overlap sits below the span floor), so the manifest is
    * exactly one row. */
  test("q_dedup_span_apply merges overlapping spans and keeps min-id copies") {
    val t = (1 to 18).map(i => s"zq$i")
    val d = Seq(
      (1L, t.take(12).mkString(" ")),
      (2L, t.drop(6).mkString(" ")),
      (9L, t.mkString(" ") + " aardvark binnacle chutney"))
      .toDF("doc_id", "text")
    val rows = graft.queries.TextQueries.spanApplyFrame(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(rows == Set((9L, 21L, 18L, 3L, 1L)),
      s"expected the merged single-interval manifest (9,21,18,3,1); got $rows")
  }

  /** The discrimination property Moore–Lewis selection exists for: docs
    * from the in-domain source must on average outscore the rest (their
    * own counts inflate the in-domain LM, so their in-domain surprisal
    * is systematically lower). A regression that zeroed the in-domain
    * leg or flipped the difference's sign would pass the hash oracle on
    * a wrong-but-consistent formula — this pins the SEMANTICS. */
  test("q_text_moore_lewis ranks in-domain docs above the rest on average") {
    val dir = "/root/testdata/sf0.001"
    val scored = graft.SparkEntry.queries("q_text_moore_lewis")(spark, dir)
    val inSrc = scored.agg(min("source")).head().getString(0)
    val Array(inMean, outMean) = Seq(true, false).map { isIn =>
      scored.where(if (isIn) $"source" === inSrc else $"source" =!= inSrc)
        .agg(avg($"ml_score_mb")).head().getDouble(0)
    }.toArray
    assert(inMean > outMean,
      s"in-domain mean $inMean does not exceed out-of-domain mean $outMean")
  }
}
