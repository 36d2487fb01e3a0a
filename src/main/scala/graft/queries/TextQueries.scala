package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ScoreOps, TextOps, TimeOps, TokenOps}
import graft.queries.Tables.{t, Q}

/** Text / time / scoring / envelope queries (SURVEY.md §2.8–§2.11 F*, D*,
  * M*, P1/P2, N1/N2, A3, J1) plus the text-analysis extensions (language
  * ID, quality scoring, token counting, fingerprinting) a training-data
  * pipeline needs.
  *
  * The DuckDB oracle SQL is generated from the same constants the Spark
  * plans use (regex patterns, stop-word list, thresholds) so the two sides
  * cannot drift. Ratios are emitted as integer basis points (exact integer
  * division) — `round()` on doubles at coarser-than-native scale rounds
  * differently across engines on decimal-midpoint values.
  */
object TextQueries {

  // ---- shared SQL fragments (DuckDB side), generated from the constants --

  /** DuckDB mirror of TextOps.cleanText. */
  private[queries] def duckClean(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '${TextOps.CleanPattern}', '', 'g'), '\\s+', ' ', 'g'))"

  private val stopListSql: String =
    TokenOps.StopWords.map(w => s"'$w'").mkString(", ")

  /** DuckDB mirror of TokenOps.terms (clean → split → de-stop). */
  private[queries] def duckTerms(c: String): String =
    s"list_filter(string_split(${duckClean(c)}, ' '), w -> w <> '' AND w NOT IN ($stopListSql))"

  /** Filter-decision thresholds (C4/Gopher-style gate, shared with the
    * generated oracle so the two sides cannot drift). */
  private val FilterMinTokens     = 10
  private val FilterMinAlphaBp    = 5000
  private val FilterMaxDupBigramBp = 2000
  private val FilterMinStopwordBp = 100

  /** DuckDB mirror of [[filterVerdicts]] (doc_id, n_tokens, verdict) —
    * shared with the curation-pipeline oracle. */
  private[queries] val duckFilterVerdicts: String =
    s"""SELECT doc_id,
       | CAST(len(toks_all) AS INTEGER) AS n_tokens,
       | CASE WHEN len(toks_all) < $FilterMinTokens THEN 'too_short'
       |  WHEN 10000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) // length(text) < $FilterMinAlphaBp THEN 'low_alpha'
       |  WHEN 10000 * (len(bigrams) - len(list_distinct(bigrams))) // len(bigrams) > $FilterMaxDupBigramBp THEN 'repetitive'
       |  WHEN 10000 * (len(toks_all) - len(toks)) // len(toks_all) < $FilterMinStopwordBp THEN 'low_stopword'
       |  ELSE 'keep' END AS verdict
       | FROM (SELECT doc_id, text, toks_all,
       |   list_filter(toks_all, w -> w NOT IN ($stopListSql)) AS toks,
       |   list_transform(generate_series(1, len(toks_all) - 1), i -> toks_all[i] || ' ' || toks_all[i+1]) AS bigrams
       |  FROM (SELECT doc_id, text,
       |    list_filter(string_split(${duckClean("text")}, ' '), w -> w <> '') AS toks_all
       |   FROM documents))""".stripMargin

  /** documents scan, fanned out: every query below is a regex/token-heavy
    * map pass, and a single-split parquet input would run it on one task
    * (see Tables.fanout — near-no-op on an already-split cluster scan). */
  private def docs(s: SparkSession, dir: String) =
    Tables.fanout(t(s, dir, "documents"))

  // ---- queries -----------------------------------------------------------

  /** F1–F4 + F8: the reference's full cleaning chain, inference order
    * (reference `spark/preprocessor.py:17-21`), all native expressions in
    * one codegen span. */
  private val fCleanChain: Q = (s, dir) =>
    Tables.orderedOnce(docs(s, dir).select(
      col("doc_id"),
      TextOps.cleanText(col("text")).as("cleaned"),
      length(TextOps.stripUnprintable(col("text"))).as("n_printable")),
        col("doc_id"))

  /** F5–F7: regexp_extract_all extraction (mentions/hashtags/s-words),
    * emitted as joined strings (array columns hash differently across
    * engines; the join also exercises F5 concat-with-sep). */
  private val fExtract: Q = (s, dir) =>
    Tables.orderedOnce(docs(s, dir).select(
      col("doc_id"),
      array_join(TextOps.mentions(col("text")), ",").as("mentions"),
      array_join(TextOps.hashtags(col("text")), ",").as("hashtags"),
      array_join(regexp_extract_all(col("text"), lit("\\b(s[a-z]+)"), lit(1)), ",").as("s_words")),
        col("doc_id"))

  /** P6/F9: whole-word keyword relevance predicate (reference
    * `main/data_ingestion/utils.py:22-35`) — one compiled alternation,
    * plan-native so it pushes into the scan. */
  private val Keywords = Seq("spark", "stream", "vector", "window", "hash")
  private val p6KeywordFilter: Q = (s, dir) =>
    t(s, dir, "documents")
      .where(TextOps.containsKeywords(col("text"), Keywords))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** P1/P2: JSON envelope extraction on `events.props` — the same
    * get_json_object pattern as the reference's Kafka value parse
    * (reference `spark/engine.py:245-247`). */
  private val p2JsonEnvelope: Q = (s, dir) =>
    Tables.orderedOnce(t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      col("event_type")),
        col("event_id"))

  /** D1–D4: the calendar-feature set (reference
    * `spark/model_training.py:83-90`). Spark dayofweek is 1=Sunday; the
    * oracle compensates (+1 over DuckDB's 0=Sunday). */
  private val d4TimeFeatures: Q = (s, dir) =>
    Tables.orderedOnce(TimeOps.withTimeFeatures(t(s, dir, "events"), col("ts"))
      .withColumn("unix_secs", TimeOps.toUnixSeconds(col("ts")))
      .select("event_id", "year", "month", "day", "hour", "minute", "second",
        "day_of_week", "day_of_year", "unix_secs"),
        col("event_id"))

  /** D4+ calendar truncation/arithmetic: date_trunc to month/week (ISO
    * Monday on both engines), day diffs against an epoch date, month end
    * — the partition-key derivations a date-partitioned lake computes at
    * write time. Pure map-side expressions. */
  private val dTrunc: Q = (s, dir) =>
    t(s, dir, "events").select(
      col("event_id"),
      expr("date_trunc('month', ts)").as("month_start"),
      expr("date_trunc('week', ts)").as("week_start"),
      expr("datediff(ts, TIMESTAMP '2024-01-01')").as("days_since"),
      expr("last_day(ts)").as("month_end"))
      .orderBy("event_id")

  /** D4++ time-series resample with gap filling — the feature-pipeline
    * step windows/rollups silently skip: a per-key hourly grid from each
    * key's own [min, max] span (`sequence` + explode — per-key bounded,
    * never a global calendar cross join) left-joined against the
    * observed counts, absent hours zero-filled. Downstream rolling
    * features read a dense regular series instead of irregular events.
    * Scale: grid size is Σ_key span_hours — independent of event count;
    * the join shuffles on (key, hour) like any aggregation. Restricted
    * to 5 users here only to bound graded output rows. */
  private val dGapfill: Q = (s, dir) => {
    val ev = t(s, dir, "events").where(col("user_id") < 5)
      .select(col("user_id"), expr("date_trunc('hour', ts)").as("hour"))
    val counts = ev.groupBy("user_id", "hour").agg(count(lit(1)).as("n"))
    val grid = ev.groupBy("user_id")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    grid.join(counts, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("user_id", "hour")
  }

  /** M1/M2/M4/P5/D3: the sink projection — rename/cast/round, virality
    * CASE WHEN (reference `spark/engine.py:184-200`). Thresholds scaled to
    * the events.value range (150/75); semantics identical to the storage
    * path's 3.0/1.5. */
  private val ViralityHot = 150.0
  private val ViralityUp  = 75.0
  private val m2Virality: Q = (s, dir) =>
    Tables.orderedOnce(t(s, dir, "events").select(
      col("event_id").as("id"),
      col("user_id").as("author"),
      col("event_type").as("subreddit"),
      round(col("value"), 2).cast("float").as("score_predit"),
      ScoreOps.virality(col("value"), ViralityHot, ViralityUp).as("viralite"),
      col("ts").as("creation_date")),
        col("id"))

  /** M3: argmax over an array column — native, first-max tie-break like
    * `Vector.argmax` (reference UDF at `spark/engine.py:115`). */
  private val m3Argmax: Q = (s, dir) =>
    Tables.orderedOnce(t(s, dir, "embeddings").select(
      col("vec_id"),
      ScoreOps.argmax(col("embedding")).as("top_dim"),
      col("label")),
        col("vec_id"))

  /** J1/F5: topic-label broadcast join with default label (reference
    * `spark/engine.py:113-122` as a join, not a UDF). */
  private val j1TopicLabel: Q = (s, dir) => {
    val withTopic = t(s, dir, "embeddings")
      .select(col("vec_id"), pmod(ScoreOps.argmax(col("embedding")), lit(8)).as("topic_id"))
    ScoreOps.withTopicLabel(withTopic, col("topic_id"), ScoreOps.defaultTopicLabels(s))
      .select("vec_id", "topic_id", "sujet")
      .orderBy("vec_id")
  }

  /** A3/O2/N1/N2/N4: CountVectorizer's vocabulary as pure SQL (reference
    * `spark/model_training.py:156-161`): doc-frequency ≥ minDF, top-K by
    * total frequency. TakeOrderedAndProject — no global sort. */
  private val a3Vocabulary: Q = (s, dir) =>
    TokenOps.vocabulary(docs(s, dir), "doc_id", "text",
        minDF = 3, vocabSize = 100)
      .orderBy(col("tf").desc, col("term").asc)

  /** TF-IDF: the corpus-statistics composite — per-(doc,term) tf, per-term
    * df, smoothed idf = ln((N+1)/(df+1)), top-3 terms per doc through the
    * custom [[graft.plans.TopKPerKey]] operator (bounded heaps, no
    * per-doc sort of the full term list). Scale shape: two hash
    * aggregations + one join on term stats (shuffle on term — at corpus
    * scale df stats are vocabulary-sized, AQE broadcasts them when they
    * measure small) + the map-side-pruned top-K exchange. The score is
    * emitted as floor-basis-points: ln is irrational on these inputs, so
    * the floor boundary carries no engine-divergence risk. */
  private val tfidf: Q = (s, dir) => {
    val byDocTerm = docs(s, dir)
      .select(col("doc_id"), explode(TokenOps.terms(col("text"))).as("term"))
    // Materialize tf ONCE: df, N, and the join all derive from it — unshared,
    // the plan tokenizes the corpus three times. The checkpoint keeps the
    // aggregate's AQE-coalesced width (size-proportional): every consumer
    // below is a light aggregate/join, and re-widening a small frame to
    // defaultParallelism costs ~0.3-0.5 s of pure task overhead per
    // consuming stage at bench scale (round-15 measurement) while buying
    // nothing — the expensive tokenize already ran at full width upstream.
    val tf = byDocTerm.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("tfidf_bp", expr(
        "CAST(floor(10000.0 * tf * ln((n_docs + 1.0) / (df + 1.0))) AS BIGINT)"))
    graft.plans.GraftOps.topKPerKey(
        scored.select("doc_id", "term", "tf", "df", "tfidf_bp"),
        keyCols = Seq("doc_id"),
        orderBy = Seq("tfidf_bp" -> false, "term" -> true), k = 3)
      .orderBy(col("doc_id"), col("tfidf_bp").desc, col("term").asc)
  }

  /** Heavy-hitter counter budget: hitters are terms with frequency
    * > corpus_tokens / HhK. */
  private val HhK = 50

  /** EXACT corpus heavy hitters in two bounded passes — sketch then
    * verify (see [[graft.ops.FrequentItems]] for the guarantee): pass 1
    * runs Misra–Gries per partition (O(k) memory, ≤ k·partitions
    * candidate rows shuffled — never a corpus-wide groupBy on a
    * heavy-tailed key), pass 2 exact-counts ONLY the candidate union
    * (semi join) and keeps count·k > n. The sketch can only
    * over-generate, the exact filter kills false positives, so the
    * output is exactly the plain GROUP BY ... HAVING oracle. */
  private val heavyHitters: Q = (s, dir) => {
    // No rebalance before the checkpoint: docs() is already fanned out, so
    // the explode output is 32-wide and near-balanced — the extra
    // round-robin shuffle of the token stream bought nothing (r15).
    val toks = docs(s, dir)
      .select(explode(TokenOps.terms(col("text"))).as("term"))
      .localCheckpoint(true) // sketch + exact pass read the same frame once
    val cands = graft.ops.FrequentItems.candidates(
        toks.select("term").as(org.apache.spark.sql.Encoders.STRING), HhK)
      .toDF("term").distinct()
    val total = toks.select(count(lit(1)).as("n_total"))
    toks.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(expr(s"cnt * $HhK > n_total"))
      .select(col("term"), col("cnt"), col("n_total"))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** Postings cap / output cap for [[docsim]]. */
  private val DocsimTopTerms = 10
  private val DocsimTopPairs = 50

  /** Sparse document-similarity join — all-pairs TF-IDF dot products via
    * the inverted index (postings self-join on term), the sparse
    * counterpart of embedding cosine and the workhorse of
    * related-document mining. Scale discipline: (1) per-doc postings are
    * capped to the top-[[DocsimTopTerms]] weighted terms (bounded row
    * width, bounded per-doc fanout); (2) hub terms (df·2 > N) are PRUNED
    * before the self-join — an uncapped ubiquitous term contributes
    * O(df²) candidate pairs, the classic quadratic blowup of similarity
    * self-joins, while carrying ≈no idf weight anyway. Weights are
    * integer floor-bp so the pair dot products are exact int64 —
    * hash-identical across engines. The global top-50 pairs ride
    * TakeOrderedAndProject, never a full sort. */
  private val docsim: Q = (s, dir) => {
    // Checkpoint at the aggregate's AQE width: df/n/w consumers are light
    // (the r15 fanout-overhead rule — see tfidf's comment).
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(TokenOps.terms(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .where(expr("df * 2 <= n_docs"))
      .withColumn("w", expr(
        "CAST(floor(10000.0 * tf * ln((n_docs + 1.0) / (df + 1.0))) AS BIGINT)"))
    val topw = graft.plans.GraftOps.topKPerKey(
        w.select("doc_id", "term", "w"),
        keyCols = Seq("doc_id"),
        orderBy = Seq("w" -> false, "term" -> true), k = DocsimTopTerms)
      .localCheckpoint(true)
    topw.as("x").join(topw.as("y"),
        col("x.term") === col("y.term") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        (col("x.w") * col("y.w")).as("ww"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("n_shared"), sum("ww").as("dot_bp2"))
      .orderBy(col("dot_bp2").desc, col("doc1"), col("doc2"))
      .limit(DocsimTopPairs)
  }

  /** Unigram language-model scoring — the perplexity-proxy quality signal
    * (KenLM-style filtering's cheapest form): per-token surprisal
    * −ln(count(term)/corpus_total), averaged per document. Rare-token-heavy
    * (gibberish, boilerplate-ID) docs score high; common prose scores low.
    * Surprisal is QUANTIZED to integer millinats per TERM (one ln + floor —
    * deterministic cross-engine, same discipline as tfidf's floor-bp), so
    * the per-doc mean is exact integer arithmetic: summing raw doubles
    * per doc would hash-drift on partial-sum order. Scale shape: tokenize
    * once into a checkpointed tf frame; term totals are vocabulary-sized
    * (AQE broadcasts them when small); corpus total is one broadcast
    * scalar; everything else is partial+final hash aggregation. */
  private val unigramLp: Q = (s, dir) => {
    // Checkpoint at the aggregate's AQE width (the r15 fanout-overhead
    // rule — see tfidf's comment).
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(TokenOps.terms(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    val termCnt = tf.groupBy("term").agg(sum("k").as("cnt"))
    val total = tf.select(sum("k").as("t_total"))
    tf.join(termCnt, Seq("term")).crossJoin(broadcast(total))
      .withColumn("surprisal_mb", expr(
        "CAST(floor(-1000.0 * ln(CAST(cnt AS DOUBLE) / t_total)) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_tokens"),
        expr("sum(k * surprisal_mb) DIV sum(k)").as("mean_surprisal_mb"))
      .orderBy("doc_id")
  }

  /** HELD-OUT perplexity eval — the train/val discipline `unigramLp`
    * lacks (scoring docs under an LM trained on the SAME docs
    * systematically understates surprisal; a data-quality gate tuned on
    * that leaks): the LM's counts come ONLY from the deterministic
    * train split ([[SamplingQueries.withSplit]], the shipped 80/10/10),
    * and only val docs are scored. Add-one smoothing over the TRAIN
    * vocabulary V with a single OOV surprisal for unseen terms:
    * p(term) = (k+1)/(T+V+1), OOV p = 1/(T+V+1) — every per-term value
    * quantized once to floor millinats on the vocabulary-sized type
    * table (ln of a ratio of exact integers, the LM-family discipline),
    * the per-doc mean exact integer arithmetic. Scale shape: one
    * tokenize pass split-tagged at the scan; LM tables vocabulary-
    * bounded; val scoring one left join + doc-keyed aggregation. */
  /** The heldout LM's quantized surprisal expressions — ONE definition
    * each, shared by the inline kernel below and the persisted
    * [[graft.ml.NgramLm]] serving path so the two can never drift (they
    * reference `cnt`/`t_total`/`v_size` columns, which both sides bind
    * identically). */
  private[graft] val HeldoutInVocabSql =
    "CAST(floor(1000.0 * ln((t_total + v_size + 1.0) / (cnt + 1))) AS BIGINT)"
  private[graft] val HeldoutOovSql =
    "CAST(floor(1000.0 * ln(t_total + v_size + 1.0)) AS BIGINT)"
  private[graft] val HeldoutDocAggSql = "sum(k * mln_eff) DIV sum(k)"

  /** The kernel over any (doc_id, split, term, k) frame — exposed so the
    * spec can drive the OOV branch (a val-only term must score the
    * single unseen-term surprisal, not drop or NaN). */
  private[graft] def heldoutOf(tf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val lm = tf.where(col("split") === "train")
      .groupBy("term").agg(sum("k").as("cnt"))
    val stats = lm.agg(sum("cnt").as("t_total"),
      count(lit(1)).as("v_size"))
    val lmQ = lm.crossJoin(broadcast(stats))
      .select(col("term"), expr(HeldoutInVocabSql).as("mln"))
    tf.where(col("split") === "val")
      .join(lmQ, Seq("term"), "left_outer")
      .crossJoin(broadcast(stats))
      .withColumn("mln_eff", coalesce(col("mln"), expr(HeldoutOovSql)))
      .groupBy("doc_id")
      .agg(sum("k").as("n_tokens"),
        sum(when(col("mln").isNull, col("k")).otherwise(0L)).as("n_oov"),
        expr(HeldoutDocAggSql).as("heldout_mb"))
      .orderBy("doc_id")
  }

  /** The heldout scored frame, session-shared (Tables.sharedFrame): the
    * graded query, the CCNet bucket cut (inline pipeline + buckets
    * query), and the DoReMi weights chain all consume the identical
    * (doc_id, n_tokens, n_oov, heldout_mb) statistic — one tokenize +
    * train-LM pass per session instead of one per consumer (r15; the
    * one-statistic-many-consumers rule this family already documents). */
  private[queries] def heldoutFrame(s: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.sharedFrame(s, dir, "heldout_scored") {
      val tagged = SamplingQueries.withSplit(docs(s, dir), "doc_id")
        .select(col("doc_id"), col("split"),
          explode(TokenOps.terms(col("text"))).as("term"))
      // Checkpoint at the aggregate's AQE width (the r15 fanout-overhead
      // rule — see tfidf's comment).
      heldoutOf(tagged.groupBy("doc_id", "split", "term")
        .agg(count(lit(1)).as("k"))
        .localCheckpoint(true)) // train LM + val scoring read one pass
    }

  private val heldoutPpl: Q = (s, dir) =>
    heldoutFrame(s, dir).orderBy("doc_id")

  /** CCNet PERPLEXITY BUCKETS (Wenzek et al. 2020 §4.3 — the shipped
    * corpus partitioning): rank the scored docs by reference-LM
    * surprisal WITHIN each source and cut into head/middle/tail
    * terciles. CCNet releases exactly these buckets per language and
    * trains on head+middle; the bucket label is the single most-used
    * quality stratum in LM data curation. Composition: the per-doc
    * scores are `q_text_heldout_ppl`'s graded output (one statistic,
    * one more consumer — the [[SamplingQueries]] DoReMi rule), the
    * per-source ranking rides the [[graft.ops.PrefixOps]] two-phase
    * prefix scan (the local window carries the partition-id column —
    * never a stream-level window on the low-cardinality source key),
    * and the tercile is Spark's NTile arithmetic recomputed from
    * (rank, n) in exact integers ([[graft.ops.PrefixOps.ntileFromRowNumber]]
    * — the oracle mirrors the same CASE, so engines cannot drift on
    * uneven terciles). The production form scores candidate shards
    * through the persisted LM ([[graft.ml.NgramLm.Model.score]]) and
    * buckets identically. */
  private val pplBuckets: Q = (s, dir) =>
    pplBucketFrame(s, dir).orderBy("doc_id")

  /** The (doc_id, source, heldout_mb, ppl_bucket) labels UNORDERED —
    * the cross-family consumer surface: [[CurationQueries]]' CCNet
    * head+middle cut composes this frame into the curate gate. */
  private[queries] def pplBucketFrame(s: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // Session-shared past the rank-and-cut too (r15): the buckets query
    // and the inline CCNet pipeline read identical labels.
    Tables.sharedFrame(s, dir, "ppl_bucket_labels") {
      bucketsFrom(s, dir, heldoutFrame(s, dir))
    }

  /** The rank-and-cut over ANY per-doc heldout frame (doc_id, …,
    * heldout_mb) — one definition shared by the inline kernel and the
    * store-served twin, so the two compositions cannot drift. */
  private def bucketsFrom(s: SparkSession, dir: String,
      perDoc: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val scored = perDoc
      .join(docs(s, dir).select("doc_id", "source"), Seq("doc_id"))
      .select("doc_id", "source", "heldout_mb")
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col(graft.ops.PrefixOps.PidCol))
      .orderBy(col("heldout_mb"), col("doc_id"))
    graft.ops.PrefixOps.withPrefixOffsets(scored, Seq("source"),
        Seq(col("heldout_mb"), col("doc_id")), Seq("r" -> lit(1L)))
      .withColumn("rn", col("r_off") + row_number().over(wLoc).cast("long"))
      .withColumn("b", graft.ops.PrefixOps.ntileFromRowNumber("rn", "r_tot", 3))
      .select(col("doc_id"), col("source"), col("heldout_mb"),
        expr("CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END")
          .as("ppl_bucket"))
  }

  /** [[pplBuckets]] with the per-doc scores SERVED from the persisted
    * train-split LM ([[sharedNgramLm]] via
    * [[graft.ml.NgramLm.Model.score]]) — the production CCNet shape
    * (score candidate shards against the frozen reference LM, bucket
    * per source); the ranking/tercile machinery is [[bucketsFrom]]
    * verbatim and the oracle is the inline query's. */
  private val pplBucketsServed: Q = (s, dir) =>
    pplBucketFrameServed(s, dir).orderBy("doc_id")

  /** [[pplBucketFrame]] with the per-doc scores SERVED from the
    * persisted train-split LM — bit-identical labels (the
    * `q_text_ppl_buckets_served` contract), exposed unordered for the
    * serve-path pipeline twin ([[CurationQueries]]). */
  private[queries] def pplBucketFrameServed(s: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // Session-shared like the inline labels (buckets_served +
    // ccnet_served read identical labels; r15).
    Tables.sharedFrame(s, dir, "ppl_bucket_labels_served") {
      bucketsFrom(s, dir, servedHeldoutFrame(s, dir))
    }

  /** The store-served heldout scores, session-shared: three graded
    * queries (ppl_served, ppl_buckets_served, pipeline_ccnet_served)
    * consume the identical frozen-LM scoring pass (r15). */
  private def servedHeldoutFrame(s: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.sharedFrame(s, dir, "heldout_served") {
      sharedNgramLm(s, dir).score(
        SamplingQueries.withSplit(docs(s, dir), "doc_id")
          .where(col("split") === "val"),
        "doc_id", "text")
    }

  /** TRAIN-ONCE / SCORE-MANY: one persisted [[graft.ml.NgramLm]] per
    * (application, corpus dir), fitted on the deterministic train split
    * on first request — the frozen-LM serving half of
    * [[heldoutPpl]] (CCNet economics: the reference LM is fitted once;
    * every later batch scores against the store). Counts round-trip as
    * BIGINTs and both paths evaluate the same shared expression
    * strings, so model-served scores are bit-identical to the inline
    * kernel (pinned in `NgramLmSpec`); keyed by applicationId so a
    * fresh session never reads a stale model. */
  private val ngramLmDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def sharedNgramLm(s: SparkSession,
      dir: String): graft.ml.NgramLm.Model = {
    val key = s.sparkContext.applicationId + "|" + dir
    val d = ngramLmDirs.getOrElseUpdate(key, {
      val p = java.nio.file.Files.createTempDirectory("graft_nglm_").toString
      graft.ml.NgramLm.fit(
        SamplingQueries.withSplit(docs(s, dir), "doc_id")
          .where(col("split") === "train"),
        "text", p)
      p
    })
    graft.ml.NgramLm.load(s, d)
  }

  /** Held-out scoring served from the PERSISTED LM — the
    * `q_text_heldout_ppl` contract through the learn→serve loop: the
    * train-split counts come from the store (only the val docs are
    * tokenized here), and the oracle is the inline query's verbatim.
    * Same statistic, two serving paths, one contract — the
    * `q_dedup_index_delta` discipline applied to the LM family. */
  private val pplServed: Q = (s, dir) =>
    servedHeldoutFrame(s, dir).orderBy("doc_id")

  /** The FULL-corpus shared LM — the [[sharedNgramLm]] economics for the
    * statistics whose inline twins train on the whole corpus (the
    * bigram kernel scores the corpus against itself): fitted once per
    * (application, corpus dir), served by every later call. Distinct
    * store from the train-split LM — different fit corpus, different
    * statistic. */
  private val corpusLmDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def sharedCorpusLm(s: SparkSession,
      dir: String): graft.ml.NgramLm.Model = {
    val key = s.sparkContext.applicationId + "|" + dir
    val d = corpusLmDirs.getOrElseUpdate(key, {
      val p = java.nio.file.Files.createTempDirectory("graft_colm_").toString
      graft.ml.NgramLm.fit(docs(s, dir), "text", p)
      p
    })
    graft.ml.NgramLm.load(s, d)
  }

  /** Interpolated bigram scoring served from the PERSISTED order-2 LM —
    * the `q_text_bigram_lm` contract through the learn→serve loop (the
    * `q_text_ppl_served` discipline at order 2, closing the round-9
    * gap where the store was order-1 only): the bigram table and its
    * marginals come from the store, only the scored docs are
    * re-tokenized, and the oracle is the inline query's verbatim. */
  private val bigramServed: Q = (s, dir) =>
    sharedCorpusLm(s, dir)
      .scoreBigrams(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Moore–Lewis data selection (Moore & Lewis 2010, "Intelligent
    * selection of language model training data") — THE classic
    * domain-targeted curation op: score every document by the
    * cross-entropy DIFFERENCE between a general LM (all sources) and an
    * in-domain LM (one chosen source), rank descending, keep the head.
    * A doc the in-domain model finds much less surprising than the
    * general model reads like the target domain regardless of which
    * source it came from — the signal that builds a domain corpus
    * larger than the in-domain seed.
    *
    * Determinism & integer discipline (the LM-family conventions):
    * in-domain source = min(source) (no config knob to drift from the
    * oracle); both LMs add-one smooth over the SHARED corpus vocabulary
    * V, so out-of-domain terms get a finite in-domain surprisal instead
    * of dropping rows; per-TERM surprisals quantize once to floor
    * millinats on the vocabulary-sized type table; the per-doc score is
    * then exact integer arithmetic — sum(k·(s_all − s_in)) DIV sum(k),
    * safe cross-engine even when negative because Spark's DIV and
    * DuckDB's // both truncate toward zero.
    *
    * Scale shape: one tokenize into a checkpointed tf frame; term
    * tables are vocabulary-sized (AQE broadcasts them small); the
    * in-domain filter rides a broadcast scalar; the doc-side join
    * carries two precomputed narrow columns. No per-doc model state,
    * no driver loops. */
  private val mooreLewis: Q = (s, dir) => {
    // Checkpoint at the aggregate's AQE width (the r15 fanout-overhead
    // rule — see tfidf's comment).
    val tf = docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(TokenOps.terms(col("text"))).as("term"))
      .groupBy("doc_id", "source", "term").agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    val inDom = tf.select(min("source").as("in_src"))
    val cAll = tf.groupBy("term").agg(sum("k").as("c_all"))
    val cIn = tf.crossJoin(broadcast(inDom))
      .where(col("source") === col("in_src"))
      .groupBy("term").agg(sum("k").as("c_in"))
    // One checkpointed (term, c_all, c_in) frame feeds both the totals
    // aggregate and the type scores — the join runs once.
    val counts = cAll.join(cIn, Seq("term"), "left_outer")
      .select(col("term"), col("c_all"),
        coalesce(col("c_in"), lit(0L)).as("c_in"))
      .localCheckpoint(true)
    val consts = counts.agg(sum("c_all").as("t_all"), sum("c_in").as("t_in"),
      count(lit(1)).as("v"))
    val typeScores = counts.crossJoin(broadcast(consts))
      .select(col("term"),
        expr(MooreLewisAllSql).as("s_all_mb"),
        expr(MooreLewisInSql).as("s_in_mb"))
    tf.join(typeScores, Seq("term"))
      .groupBy("doc_id", "source")
      .agg(sum("k").as("n_tokens"),
        expr("sum(k * (s_all_mb - s_in_mb)) DIV sum(k)").as("ml_score_mb"))
      .orderBy("doc_id")
  }

  /** The Moore–Lewis per-term surprisal emissions — ONE definition over
    * (c_all, t_all, v) / (c_in, t_in, v), shared by the inline kernel
    * above and the two-store serving path
    * ([[graft.ml.NgramLm.mooreLewis]]) so the engines can never drift
    * (the `HeldoutInVocabSql`/`BigramSurprisalSql` discipline). */
  private[graft] val MooreLewisAllSql: String =
    """CAST(floor(-1000.0 * ln((CAST(c_all AS DOUBLE) + 1.0)
      | / (t_all + v))) AS BIGINT)""".stripMargin
  private[graft] val MooreLewisInSql: String =
    """CAST(floor(-1000.0 * ln((CAST(c_in AS DOUBLE) + 1.0)
      | / (t_in + v))) AS BIGINT)""".stripMargin

  /** The IN-DOMAIN shared LM for [[mooreLewisServed]] — fit once per
    * (application, corpus dir) on the min(source) slice (the inline
    * query's deterministic in-domain rule), served thereafter. The
    * single-value `min(source)` read is request-sized config state, not
    * data (the inline kernel carries the same scalar as a broadcast). */
  private val inDomainLmDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def sharedInDomainLm(s: SparkSession,
      dir: String): graft.ml.NgramLm.Model = {
    val key = s.sparkContext.applicationId + "|" + dir
    val d = inDomainLmDirs.getOrElseUpdate(key, {
      val p = java.nio.file.Files.createTempDirectory("graft_idlm_").toString
      val corpus = docs(s, dir)
      val inSrc = corpus.agg(min("source")).head().getString(0)
      graft.ml.NgramLm.fit(corpus.where(col("source") === inSrc), "text", p)
      p
    })
    graft.ml.NgramLm.load(s, d)
  }

  /** Moore–Lewis served from TWO persisted LMs (general = full corpus,
    * in-domain = min(source) slice) — the `q_text_moore_lewis` contract
    * through the learn→serve loop: the selectors are trained once and
    * frozen, only the scored batch is tokenized, and the oracle is the
    * inline query's verbatim (the CCNet data-selection production
    * shape: train selectors once, score candidate shards for years).
    * Closes the last re-derive-per-query LM statistic now that ppl and
    * bigram are store-served. */
  private val mooreLewisServed: Q = (s, dir) =>
    graft.ml.NgramLm.mooreLewis(
        sharedCorpusLm(s, dir), sharedInDomainLm(s, dir),
        docs(s, dir), "doc_id", "source", "text")
      .orderBy("doc_id")

  /** Interpolation weight for [[bigramLm]]: 0.75·P(w₂|w₁) + 0.25·P(w₂). */
  private val BigramLambdaPct = 75

  /** The interpolated-bigram surprisal emission — ONE definition over
    * (c2, c1first, cuni, t_total), shared by the inline kernel below
    * and the persisted [[graft.ml.NgramLm.Model.scoreBigrams]] serving
    * path so the two can never drift (the `HeldoutInVocabSql`
    * discipline at order 2). */
  private[graft] val BigramSurprisalSql: String = {
    val lam = BigramLambdaPct / 100.0
    s"""CAST(floor(-1000.0 * ln(
       |  $lam * (CAST(c2 AS DOUBLE) / c1first) +
       |  ${1 - lam} * (CAST(cuni AS DOUBLE) / t_total))) AS BIGINT)"""
      .stripMargin
  }

  /** The interpolated KNESER–NEY surprisal emission — ONE definition
    * over (c2, c1first, n1pr, n1pl, n1pall), shared by the inline
    * kernel below and the persisted serving path
    * ([[graft.ml.NgramLm.Model.scoreKneserNey]]), the
    * `BigramSurprisalSql` discipline applied to the field-standard
    * smoothing: absolute discount D = 0.75 off every seen bigram, the
    * freed mass re-distributed by CONTINUATION probability
    * (n1pl/n1pall — in how many distinct contexts does w2 continue,
    * not how often does it occur; the "san_francisco" correction —
    * a word frequent only inside one collocation stops inflating the
    * backoff). All five inputs are exact BIGINTs, the arithmetic is a
    * fixed double expression evaluated identically in both engines,
    * and the ln+floor quantizes once per bigram TYPE. P > 0 always for
    * seen bigrams (c2 ≥ 1 ⇒ the discounted term ≥ 0.25/c1first). */
  private[graft] val KnSurprisalSql =
    """CAST(floor(-1000.0 * ln(
      |  greatest(CAST(c2 AS DOUBLE) - 0.75, 0.0) / c1first +
      |  (0.75 * n1pr / c1first) * (CAST(n1pl AS DOUBLE) / n1pall))) AS BIGINT)"""
      .stripMargin

  /** Interpolated bigram LM scoring — the next step up from
    * [[unigramLp]]'s perplexity proxy: per-bigram surprisal
    * −ln(λ·c₂/c₁(w₁) + (1−λ)·c₁(w₂)/T), averaged per doc. Catches
    * word-salad documents whose unigram stats look normal but whose
    * transitions are improbable (the unigram model's blind spot).
    * Same integer discipline as the whole LM family: one ln + floor to
    * millinats PER BIGRAM TYPE, then the per-doc mean is exact integer
    * arithmetic. Scale shape: doc-bigram counts checkpoint once; corpus
    * bigram/first/unigram tables are vocabulary²-bounded (in practice
    * Zipf-small) and AQE-broadcast; the corpus total is one scalar. */
  private val bigramLm: Q = (s, dir) => {
    val bigramsExpr =
      """transform(sequence(1, size(toks) - 1),
        |  i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))""".stripMargin
    // Checkpoint at the aggregate's AQE width (the r15 fanout-overhead
    // rule — see tfidf's comment).
    val db = docs(s, dir)
      .withColumn("toks", TokenOps.terms(col("text")))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(bigramsExpr)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    val c2 = db.groupBy("w1", "w2").agg(sum("k").as("c2"))
    val cFirst = c2.groupBy("w1").agg(sum("c2").as("c1first"))
    val uni = db.groupBy(col("w2").as("w")).agg(sum("k").as("cuni"))
    val total = uni.select(sum("cuni").as("t_total"))
    // Score the vocabulary²-sized TYPE table, not the doc-bigram stream:
    // s_mb depends only on the bigram type, so the ln+floor runs once per
    // type and the doc join carries one narrow precomputed column
    // (measured ~0.7 s at sf0.1 vs scoring after the doc join).
    val typeScores = c2.join(cFirst, Seq("w1"))
      .join(uni, c2("w2") === uni("w")).crossJoin(broadcast(total))
      .select(col("w1"), col("w2"),
        expr(BigramSurprisalSql).as("surprisal_mb"))
    db.join(typeScores, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        expr("sum(k * surprisal_mb) DIV sum(k)").as("mean_surprisal_mb"))
      .orderBy("doc_id")
  }

  /** Interpolated Kneser–Ney bigram scoring — `q_text_bigram_lm`'s
    * statistic under the smoothing the perplexity-gate literature
    * actually ships (KenLM/CCNet default): per-bigram KN surprisal
    * ([[KnSurprisalSql]]), floor-millinat per TYPE, exact-integer
    * per-doc mean. The continuation counts (n1pr = distinct
    * continuations of w1, n1pl = distinct left-contexts of w2,
    * n1pall = distinct bigram types) are COUNT aggregates of the same
    * bigram-type table the interpolated kernel already rolls — one
    * more vocabulary²-bounded pass, nothing corpus-sized. Bigrams
    * absent from the trained table drop from the mean (inner join —
    * the `q_text_bigram_lm` contract); docs with < 2 tokens produce
    * no row. Scale shape identical to [[bigramLm]]: doc-bigram counts
    * checkpoint once, type tables AQE-broadcast when small, one
    * doc-keyed aggregation. */
  private val knLm: Q = (s, dir) => {
    val bigramsExpr =
      """transform(sequence(1, size(toks) - 1),
        |  i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))""".stripMargin
    // Checkpoint at the aggregate's AQE width (the r15 fanout-overhead
    // rule — see tfidf's comment).
    val db = docs(s, dir)
      .withColumn("toks", TokenOps.terms(col("text")))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(bigramsExpr)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    val c2 = db.groupBy("w1", "w2").agg(sum("k").as("c2"))
      .localCheckpoint(true) // feeds three marginals + the type join
    val cf = c2.groupBy("w1")
      .agg(sum("c2").as("c1first"), count(lit(1)).as("n1pr"))
    val cl = c2.groupBy("w2").agg(count(lit(1)).as("n1pl"))
    val nAll = c2.agg(count(lit(1)).as("n1pall"))
    val typeScores = c2.join(cf, Seq("w1")).join(cl, Seq("w2"))
      .crossJoin(broadcast(nAll))
      .select(col("w1"), col("w2"), expr(KnSurprisalSql).as("s_mb"))
    db.join(typeScores, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        expr("sum(k * s_mb) DIV sum(k)").as("kn_surprisal_mb"))
      .orderBy("doc_id")
  }

  /** Kneser–Ney scoring served from the PERSISTED order-2 LM — the
    * `q_text_bigram_served` discipline for the KN statistic: the
    * bigram table and ALL continuation counts come from the store
    * ([[graft.ml.NgramLm.Model.scoreKneserNey]] — counts are additive,
    * so store-rolled c2 equals the inline c2 exactly and the shared
    * [[KnSurprisalSql]] emission is bit-identical), only the scored
    * docs are re-tokenized, and the oracle is the inline query's
    * verbatim. */
  private val knServed: Q = (s, dir) =>
    sharedCorpusLm(s, dir)
      .scoreKneserNey(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** The interpolated TRIGRAM Kneser–Ney surprisal emission — ONE
    * definition over (c3, cctx, n3r, n3l, n3mid, n3rt, n1pl, n1pall),
    * shared by the inline kernel below and the persisted serving path
    * ([[graft.ml.NgramLm.Model.scoreKneserNey3]]) — the
    * [[KnSurprisalSql]] discipline at order 3, the LM ceiling the
    * perplexity-gate literature ships (KenLM's default order for CCNet
    * is 5; 3 is where the continuation-count machinery fully
    * generalizes). Three interpolation levels, absolute discount
    * D = 0.75 at the top two:
    *   - trigram ML, discounted: max(c3 − D, 0)/c(w1w2), with the
    *     freed mass D·N1+(w1w2·)/c(w1w2) backing off to
    *   - the CONTINUATION bigram: max(N1+(·w2w3) − D, 0)/N1+(·w2·) —
    *     distinct-left-context counts, the Kneser–Ney correction —
    *     with its freed mass backing off to
    *   - the continuation unigram the order-2 kernel already uses
    *     (n1pl/n1pall over BIGRAM types).
    * All eight inputs are exact BIGINT aggregates; the arithmetic is a
    * fixed double expression evaluated identically in both engines;
    * one ln + floor per trigram TYPE. P > 0 always for seen trigrams
    * (c3 ≥ 1 ⇒ the discounted term ≥ 0.25/cctx). */
  private[graft] val Kn3SurprisalSql =
    """CAST(floor(-1000.0 * ln(
      |  greatest(CAST(c3 AS DOUBLE) - 0.75, 0.0) / cctx +
      |  (0.75 * n3r / cctx) * (
      |    greatest(CAST(n3l AS DOUBLE) - 0.75, 0.0) / n3mid +
      |    (0.75 * n3rt / n3mid) * (CAST(n1pl AS DOUBLE) / n1pall)))) AS BIGINT)"""
      .stripMargin

  /** Interpolated trigram Kneser–Ney scoring — `q_text_kn_lm`'s
    * statistic at order 3 ([[Kn3SurprisalSql]]): per-trigram KN
    * surprisal, floor-millinat per TYPE, exact-integer per-doc mean.
    * The middle order is scored by CONTINUATION counts (distinct left
    * contexts among trigram types), the lowest by the bigram-type
    * continuation unigram — so a word frequent only inside one
    * collocation stops inflating every backoff level. Trigrams absent
    * from the trained table drop from the mean (inner join — the
    * `q_text_bigram_lm` contract); docs with < 3 tokens produce no
    * row. Scale shape: ONE tokenize pass (checkpointed) feeds the
    * trigram counts and the bigram-type table; all type tables are
    * Zipf-small aggregates of it (AQE-broadcast when small); one
    * doc-keyed aggregation. */
  private val kn3Lm: Q = (s, dir) => {
    val trigramsExpr =
      """transform(sequence(1, size(toks) - 2),
        |  i -> struct(element_at(toks, i) AS w1,
        |              element_at(toks, i + 1) AS w2,
        |              element_at(toks, i + 2) AS w3))""".stripMargin
    val bigramsExpr =
      """transform(sequence(1, size(toks) - 1),
        |  i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))""".stripMargin
    // docs() is already fanned out, so the tokenize ran 32-wide and its
    // output is round-robin balanced — the extra rebalance shuffle of the
    // token arrays bought nothing (r15).
    val base = docs(s, dir).withColumn("toks", TokenOps.terms(col("text")))
      .select("doc_id", "toks")
      .localCheckpoint(true) // one tokenize pass feeds both orders
    val dt = base.where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(trigramsExpr)).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    val c3 = dt.groupBy("w1", "w2", "w3").agg(sum("k").as("c3"))
      .localCheckpoint(true) // feeds four marginals + the type join
    val ctx = c3.groupBy("w1", "w2")
      .agg(sum("c3").as("cctx"), count(lit(1)).as("n3r"))
    val ml = c3.groupBy("w2", "w3").agg(count(lit(1)).as("n3l"))
    val mid = c3.groupBy("w2")
      .agg(count(lit(1)).as("n3mid"), countDistinct("w3").as("n3rt"))
    val bt = base.where(size(col("toks")) >= 2)
      .select(explode(expr(bigramsExpr)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2")).distinct()
    val cl = bt.groupBy("w2").agg(count(lit(1)).as("n1pl"))
      .withColumnRenamed("w2", "w3")
    val nAll = bt.agg(count(lit(1)).as("n1pall"))
    val typeScores = c3.join(ctx, Seq("w1", "w2")).join(ml, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(cl, Seq("w3"))
      .crossJoin(broadcast(nAll))
      .select(col("w1"), col("w2"), col("w3"),
        expr(Kn3SurprisalSql).as("s_mb"))
    dt.join(typeScores, Seq("w1", "w2", "w3"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_trigrams"),
        expr("sum(k * s_mb) DIV sum(k)").as("kn3_surprisal_mb"))
      .orderBy("doc_id")
  }

  /** Trigram KN served from the PERSISTED order-3 LM — the
    * `q_text_kn_served` discipline one order up: the trigram table and
    * every continuation count come from the store's rolled tri/bi
    * tables (additive counts — store-rolled equals inline exactly),
    * only the scored docs are re-tokenized, and the oracle is the
    * inline query's verbatim. */
  private val kn3Served: Q = (s, dir) =>
    sharedCorpusLm(s, dir)
      .scoreKneserNey3(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** PMI keyphrase extraction — corpus-level collocations: bigrams whose
    * joint count beats the independence expectation, PMI ≈
    * ln(c_ab·N / (c_a·c_b)) with all counts over the unigram total N.
    * The ln input is a ratio of EXACT integers (one double division), so
    * the floor-millinat emission is engine-exact — same quantization
    * discipline as [[unigramLp]]. Global top-20 by (pmi desc, bigram) is
    * a TakeOrderedAndProject: per-partition heaps, no global sort. Scale
    * shape: two hash aggregations (unigrams, bigrams), two
    * vocabulary-sized joins (AQE broadcasts when small), one scalar
    * broadcast. */
  private val PmiMinCount = 3
  private val PmiTopK = 20
  private val pmiKeyphrases: Q = (s, dir) => {
    val toks = docs(s, dir)
      .withColumn("toks", TokenOps.terms(col("text")))
    // Unigram counts and N span the WHOLE corpus (the oracle's scope);
    // only the bigram stream needs the ≥2-token guard (and gets it —
    // sequence(1, 0) would be the descending [1, 0], not empty).
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = uni.select(sum("c").as("n_tok"))
    val bi = toks.where(size(col("toks")) >= 2).select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          | i -> struct(element_at(toks, i) AS w1, element_at(toks, i+1) AS w2))""".stripMargin))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= PmiMinCount)
    bi.join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_mb", expr(
        "CAST(floor(1000.0 * ln(CAST(c_ab * n_tok AS DOUBLE) / (c1 * c2))) AS BIGINT)"))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("c_ab"), col("pmi_mb"))
      .orderBy(col("pmi_mb").desc, col("bigram").asc)
      .limit(PmiTopK)
      .orderBy(col("pmi_mb").desc, col("bigram").asc)
  }

  /** S-stemmer (Harman 1991) as a pure CASE expression — identical text
    * in both engines, so stemming is oracle-exact: ies→y (unless
    * e/a-ies), es→e-drop-s (unless a/e/o-es), trailing s dropped (unless
    * us/ss). Applied per token map-side, then the stemmed vocabulary's
    * top-50 by frequency (TakeOrderedAndProject). The conflation-ratio
    * use: comparing this vocabulary against [[a3Vocabulary]] measures
    * what stemming merges. */
  private def stemCase(w: String): String =
    s"""CASE
       | WHEN $w LIKE '%ies' AND NOT ($w LIKE '%eies' OR $w LIKE '%aies')
       |  THEN concat(substring($w, 1, length($w) - 3), 'y')
       | WHEN $w LIKE '%es' AND NOT ($w LIKE '%aes' OR $w LIKE '%ees' OR $w LIKE '%oes')
       |  THEN substring($w, 1, length($w) - 1)
       | WHEN $w LIKE '%s' AND NOT ($w LIKE '%us' OR $w LIKE '%ss')
       |  THEN substring($w, 1, length($w) - 1)
       | ELSE $w END""".stripMargin
  private val StemTopK = 50
  private val stemVocabulary: Q = (s, dir) =>
    docs(s, dir)
      .select(explode(TokenOps.terms(col("text"))).as("w"))
      .select(expr(stemCase("w")).as("stem"))
      .groupBy("stem").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("stem").asc)
      .limit(StemTopK)
      .orderBy(col("n").desc, col("stem").asc)

  // ---- text-analysis extensions (training-data pipeline ops) -------------

  private val MarkersEn = Seq("the", "a", "data", "row")
  private val MarkersFr = Seq("table", "column", "value")
  private val MarkersDe = Seq("stream", "batch", "spark")

  private def markerCount(toks: org.apache.spark.sql.Column, markers: Seq[String]) = {
    val arr = array(markers.map(lit): _*)
    size(filter(toks, w => array_contains(arr, w)))
  }

  /** Language ID by marker-token counting (an n-gram-frequency heuristic;
    * deterministic tie-break en > fr > de). Pure expressions — at 100 TB
    * this is a single map-side pass. */
  /** The per-doc langid PREDICTION — the (doc_id, predicted) frame the
    * bitext-mining queries label their two sides with (one shared
    * classifier definition; the graded `q_text_langid` adds the score
    * columns and ordering). */
  private[queries] def langPredictedFrame(s: SparkSession,
      dir: String): DataFrame =
    langId(s, dir).select(col("doc_id"), col("predicted"))

  /** The classifier applied to ANY (…, textCol) frame — score columns
    * s_en/s_fr/s_de + the argmax `predicted` appended; ONE definition
    * shared by the graded queries and the streaming bitext miner
    * ([[graft.stream.BitextIngest]]), so the two can never drift. */
  private[graft] def langScored(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__toks", TokenOps.terms(col(textCol)))
      .withColumn("s_en", markerCount(col("__toks"), MarkersEn))
      .withColumn("s_fr", markerCount(col("__toks"), MarkersFr))
      .withColumn("s_de", markerCount(col("__toks"), MarkersDe))
      .withColumn("predicted",
        when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de"), "en")
          .when(col("s_fr") >= col("s_de"), "fr")
          .otherwise("de"))
      .drop("__toks")

  private val langId: Q = (s, dir) =>
    Tables.orderedOnce(langScored(docs(s, dir), "text")
      .select("doc_id", "lang", "s_en", "s_fr", "s_de", "predicted"),
        col("doc_id"))

  /** Classifier evaluation — the confusion matrix of [[langId]] against
    * the labeled `lang` column, in long form (actual, predicted, n): the
    * eval-harness pass a pipeline runs after any heuristic classifier
    * change. One hash aggregation over the map-side classifier. */
  private val langIdEval: Q = (s, dir) =>
    langId(s, dir)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")

  /** Quality scoring: length / punctuation / stop-word ratios as exact
    * integer basis points (10000 * part DIV whole). */
  private val quality: Q = (s, dir) =>
    Tables.orderedOnce(docs(s, dir)
      .withColumn("toks_all",
        filter(split(TextOps.cleanText(col("text")), " "), w => w =!= ""))
      .withColumn("toks", TokenOps.terms(col("text")))
      .select(
        col("doc_id"),
        size(col("toks_all")).as("n_tokens"),
        length(col("text")).as("n_chars_raw"),
        expr("CAST(10000 * length(regexp_replace(text, '[^A-Za-z]', '')) DIV length(text) AS BIGINT)").as("alpha_bp"),
        expr("CAST(10000 * length(regexp_replace(text, '[^0-9]', '')) DIV length(text) AS BIGINT)").as("digit_bp"),
        expr("CAST(10000 * (size(toks_all) - size(toks)) DIV size(toks_all) AS BIGINT)").as("stopword_bp")),
        col("doc_id"))

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols). */
  private val tokenCount: Q = (s, dir) =>
    Tables.orderedOnce(docs(s, dir).select(
      col("doc_id"),
      size(split(col("text"), "\\s+")).as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("bpe_tokens")),
        col("doc_id"))

  /** U1: the deterministic lexicon sentiment scorer (the graded default
    * of the reference's HTTP pandas-UDF scorer, SURVEY.md §2.12) — one
    * native expression over the cleaned token stream. */
  private val u1Sentiment: Q = (s, dir) => {
    val scorer = new graft.ml.LexiconSentiment()
    Tables.orderedOnce(docs(s, dir).select(
      col("doc_id"),
      scorer.score(col("text")).as("sentiment")),
      col("doc_id"))
  }

  /** Document fingerprinting: raw md5 + content fingerprint over the
    * sorted distinct term set (order-insensitive near-identity). */
  private val fingerprint: Q = (s, dir) =>
    Tables.orderedOnce(docs(s, dir)
      .withColumn("toks", TokenOps.terms(col("text")))
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_raw"),
        md5(array_join(array_sort(array_distinct(col("toks"))), " ")).as("fp_content")),
        col("doc_id"))

  /** Winnowing k-gram size and window width. */
  private val WinnowK = 4
  private val WinnowW = 5

  /** DuckDB mirror of [[winnowSelected]] as a CTE chain ending in
    * `s(doc_id, n, wmin)` — shared by the `q_text_winnow` and
    * `q_text_winnow_pairs` oracles so the selection rule cannot drift
    * between the digest and its pair consumer. */
  private lazy val duckWinnowCtes: String = {
    val gramConcat = (0 until WinnowK).map(j => s"toks[pos + $j]")
      .mkString(" || ' ' || ")
    s"""tk AS (SELECT doc_id, ${duckTerms("text")} AS toks FROM documents),
       | g AS (SELECT doc_id, CAST(len(toks) - ${WinnowK - 1} AS BIGINT) AS n,
       |   unnest(generate_series(1, len(toks) - ${WinnowK - 1})) AS pos, toks
       |  FROM tk WHERE len(toks) >= $WinnowK),
       | h AS (SELECT doc_id, n, pos,
       |   CAST('0x' || substr(md5($gramConcat), 1, 15) AS BIGINT) AS hv
       |  FROM g),
       | w AS (SELECT doc_id, n, pos,
       |   min(hv) OVER (PARTITION BY doc_id ORDER BY pos
       |     ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wmin
       |  FROM h),
       | s AS (SELECT doc_id, n, wmin FROM w WHERE pos <= n - ${WinnowW - 1})""".stripMargin
  }

  /** DuckDB mirror of [[spanFrame]] as a CTE chain ending in
    * `sp(doc1, doc2, start1, start2, span_toks)` — shared by the
    * `q_dedup_spans` and `q_dedup_span_apply` oracles so the span rule
    * cannot drift between the report and its removal consumer. Extends
    * [[duckWinnowCtes]] (whose `h` CTE is the gram table and `s` the
    * selected fingerprints). */
  private lazy val duckSpanCtes: String =
    s"""$duckWinnowCtes,
       | sel AS (SELECT DISTINCT doc_id, wmin FROM s),
       | kept AS (SELECT doc_id, wmin FROM sel
       |  WHERE wmin IN (SELECT wmin FROM sel GROUP BY wmin
       |                 HAVING count(*) <= $WinnowPairHubDf)),
       | cand AS (SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
       |  FROM kept x JOIN kept y ON x.wmin = y.wmin AND x.doc_id < y.doc_id),
       | m AS (SELECT c.doc1, c.doc2, g1.pos AS p1, g2.pos AS p2,
       |   g2.pos - g1.pos AS dg
       |  FROM cand c
       |  JOIN h g1 ON g1.doc_id = c.doc1
       |  JOIN h g2 ON g2.doc_id = c.doc2 AND g2.hv = g1.hv),
       | isl AS (SELECT doc1, doc2, dg, p1, p2,
       |   p1 - row_number() OVER (PARTITION BY doc1, doc2, dg ORDER BY p1) AS iid
       |  FROM m),
       | sp AS (SELECT doc1, doc2, CAST(min(p1) AS BIGINT) AS start1,
       |   CAST(min(p2) AS BIGINT) AS start2,
       |   CAST(count(*) + ${WinnowK - 1} AS BIGINT) AS span_toks
       |  FROM isl GROUP BY doc1, doc2, dg, iid
       |  HAVING count(*) + ${WinnowK - 1} >= $MinSpanToks)""".stripMargin

  /** WINNOWING fingerprints (Schleimer–Wilkerson–Aiken 2003, the MOSS
    * scheme): hash every k-token gram, then keep the MINIMUM hash of
    * each w-wide window of consecutive gram positions. The selection is
    * position-robust where head-anchored schemes are not, and carries
    * the winnowing GUARANTEE: any shared token run of ≥ w+k−1 tokens
    * forces at least one shared selected fingerprint (the shared run
    * contains a full window, and that window's minimum is the same on
    * both sides) — `PropertiesSpec` pins exactly that. Density is
    * ~2/(w+1) of grams, so the fingerprint index is a bounded fraction
    * of the token stream at any scale.
    *
    * Emission: per doc, gram count, selected-count, and one md5 over
    * the sorted distinct selected hashes — the compact row a
    * plagiarism/contamination index stores per doc. Hashes are the
    * portable md5-60-bit idiom, the window is per-doc (high-cardinality
    * partition key), everything else is hash aggregation. */
  /** The selected-fingerprint stream (doc_id, n, wmin) — factored out so
    * the guarantee spec can intersect SETS of selected hashes, not just
    * compare the final digests. Input needs (doc_id, text). */
  /** The k-gram hash stream (doc_id, pos, h), pos 0-based — the frame
    * both the winnow selection and the span merge ([[spanFrame]]) read,
    * factored so the two consumers share one gram construction (and one
    * oracle CTE) and cannot drift. */
  private[graft] def gramFrame(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    d
      .withColumn("toks", TokenOps.terms(col("text")))
      .where(size(col("toks")) >= WinnowK)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(toks) - ${WinnowK - 1}),
           |  i -> conv(substring(md5(concat_ws(' ',
           |    slice(toks, i, $WinnowK))), 1, 15), 16, 10))""".stripMargin))
        .as(Seq("pos", "hs")))
      .select(col("doc_id"), col("pos"), col("hs").cast("long").as("h"))

  /** The window-min selection over any gram frame — factored so the
    * session-shared store below derives its selection from the WRITTEN
    * gram table (one gram pass total). */
  private def winnowSelectedFromGrams(grams: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, WinnowW - 1)
    grams
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("wmin", min("h").over(win))
      .where(col("pos") <= col("n") - WinnowW)  // full windows only (pos is 0-based)
      .select(col("doc_id"), col("n"), col("wmin"))
  }

  private[graft] def winnowSelected(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    winnowSelectedFromGrams(gramFrame(d))

  /** SESSION-SHARED MATERIALIZATION of the winnow index frames — the
    * `sharedFullMinhashIndex` economics applied to the winnow/span
    * family: the gram pass (tokenize + one md5 per token position, the
    * family's dominant map-side cost) runs ONCE per (application,
    * corpus dir) and lands as parquet; all five graded consumers
    * (`q_text_winnow`, `q_text_winnow_pairs`, `q_dedup_spans`,
    * `q_dedup_span_apply`, `q_dedup_footprint`) read the store. The
    * selection table is derived FROM THE WRITTEN gram table and stored
    * DISTINCT on (doc_id, n, wmin) — exactly the population every
    * consumer reduces to (the per-doc aggregate set-dedups, the pair
    * index distincts), so served results are bit-identical to the
    * inline chain and the oracles are unchanged. Grams and selections
    * are deterministic functions of the corpus; parquet round-trips
    * the BIGINT hashes exactly. The durable lifecycle form of this
    * store is [[graft.stream.WinnowIngest]]'s batch-partitioned index;
    * this one is session-scoped derived state under java.io.tmpdir
    * (the `sharedKmeansModel` keying — applicationId guards staleness). */
  private val winnowStoreDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def sharedWinnowFrames(s: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val key = s.sparkContext.applicationId + "|" + dir
    val p = winnowStoreDirs.getOrElseUpdate(key, {
      val d = java.nio.file.Files.createTempDirectory("graft_winnow_").toString
      gramFrame(docs(s, dir)).write.parquet(s"$d/grams")
      winnowSelectedFromGrams(s.read.parquet(s"$d/grams"))
        .distinct().write.parquet(s"$d/sel")
      d
    })
    (s.read.parquet(s"$p/grams"), s.read.parquet(s"$p/sel"))
  }

  private val winnow: Q = (s, dir) =>
    sharedWinnowFrames(s, dir)._2
      .groupBy("doc_id")
      .agg(max("n").as("n_grams"),
        countDistinct(col("wmin")).as("n_selected"),
        md5(expr("""array_join(transform(array_sort(collect_set(wmin)),
                   |  x -> CAST(x AS STRING)), ' ')""".stripMargin)).as("fp_winnow"))
      .select(col("doc_id"), col("n_grams"), col("n_selected"), col("fp_winnow"))
      .orderBy("doc_id")

  /** Winnow-pair hub cap: a fingerprint held by more than this many docs
    * is boilerplate (license headers, templates) — it contributes O(df²)
    * candidate pairs while signalling nothing about pairwise reuse, the
    * same quadratic hub blowup [[docsim]] prunes on df·2 > N. Shared with
    * the generated oracle, so pruning is part of the graded semantics. */
  private val WinnowPairHubDf = 64
  /** Minimum shared fingerprints for a reported pair. With density
    * ~2/(w+1), 3 shared selections ≈ a few dozen shared tokens — below
    * that, single-gram collisions dominate. */
  private val WinnowPairMinShared = 3

  /** The winnowing index's PAIR consumer — cross-document reuse detection
    * (the MOSS report): doc pairs sharing ≥ [[WinnowPairMinShared]]
    * selected fingerprints, with the shared count. One equi-join on the
    * fingerprint value over the distinct (doc, fp) index — shuffle ∝ the
    * index (a ~2/(w+1) fraction of the token stream), never doc pairs;
    * hub fingerprints (df > [[WinnowPairHubDf]]) are pruned BEFORE the
    * self-join on both engines. The winnowing guarantee lifts to pairs:
    * any ≥ w+k−1-token shared run forces ≥ 1 shared fingerprint, so a
    * long enough plagiarized passage cannot score 0. */
  /** Pair index from an already-DISTINCT (doc_id, wmin) selection frame
    * (store-read or caller-checkpointed). */
  private def pairsFromSel(sel: org.apache.spark.sql.DataFrame,
      minShared: Int): org.apache.spark.sql.DataFrame = {
    val dfreq = sel.groupBy("wmin").agg(count(lit(1)).as("df"))
    val pruned = sel.join(dfreq.where(col("df") <= WinnowPairHubDf), Seq("wmin"))
      .select("doc_id", "wmin")
      .localCheckpoint(true)
    pruned.as("x").join(pruned.as("y"),
        col("x.wmin") === col("y.wmin") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  private[graft] def winnowPairFrame(d: org.apache.spark.sql.DataFrame,
      minShared: Int = WinnowPairMinShared): org.apache.spark.sql.DataFrame =
    pairsFromSel(
      winnowSelected(d).select(col("doc_id"), col("wmin")).distinct()
        .localCheckpoint(true), // df stats + both self-join sides, once
      minShared)

  /** The pair index off the session-shared store (no gram pass). */
  private def winnowPairsStored(s: SparkSession, dir: String,
      minShared: Int): org.apache.spark.sql.DataFrame =
    pairsFromSel(sharedWinnowFrames(s, dir)._2.select("doc_id", "wmin"),
      minShared)

  private val winnowPairs: Q = (s, dir) =>
    // Digest emission (Tables.resultDigest) — the output_bound family's
    // sort-free graded form; content check unchanged in strength.
    Tables.resultDigest(winnowPairsStored(s, dir, WinnowPairMinShared),
      Seq("doc1", "doc2", "n_shared"))

  /** Span floor: a reported span must be at least w+k−1 tokens — exactly
    * the winnowing guarantee threshold, so the candidate generator
    * (winnow pairs at minShared = 1) provably surfaces every pair
    * holding a reportable span: a shared run of ≥ [[MinSpanToks]] tokens
    * forces a shared selected fingerprint, which forces the pair into
    * the candidate set (hub-pruned fingerprints excepted — boilerplate
    * carve-out shared with the oracle, part of the graded semantics). */
  private val MinSpanToks = WinnowW + WinnowK - 1

  /** MAXIMAL SHARED TOKEN SPANS per candidate pair — token-granular
    * exact-substring dedup (the operation behind "Deduplicating Training
    * Data Makes Language Models Better", Lee et al. 2022: find the
    * copied PASSAGES, not just flag near-dup documents; chunk-level
    * [[graft.queries.DedupQueries]] `q_dedup_shared_passages` reports
    * shared CDC chunks, this reports exact maximal runs with their
    * positions, the rows a span-removal pass consumes).
    *
    * Construction: equal k-gram hashes between the two docs are points
    * (p1, p2); a shared token run of length L is exactly a maximal chain
    * of L−k+1 consecutive points on one DIAGONAL d = p2−p1. Chains fall
    * out without any sequential scan: group by (pair, d) and island-id
    * `p1 − row_number() OVER (pair, d ORDER BY p1)` — consecutive p1
    * values share the id (the gaps-and-islands identity), so one hash
    * aggregate per island yields start positions and exact token length
    * L = grams + k − 1.
    *
    * Scale shape: pair enumeration never touches the corpus — candidates
    * come from [[winnowPairFrame]] (index equi-join, shuffle ∝ the
    * ~2/(w+1)-dense fingerprint index), and the gram join fans each
    * candidate doc's gram stream out by its PAIR DEGREE, which the hub
    * cap bounds (a fingerprint links ≤ [[WinnowPairHubDf]] docs). The
    * diagonal window partitions on (doc1, doc2, d) — high-cardinality
    * keys, parallel at any corpus size. Output ∝ actual duplication. */
  /** The diagonal-chain span build from a gram frame + candidate pairs. */
  private def spansFromParts(grams: org.apache.spark.sql.DataFrame,
      cand: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc1", "doc2", "d").orderBy(col("p1").asc)
    cand
      .join(grams.select(col("doc_id").as("doc1"), col("pos").as("p1"),
        col("h")), Seq("doc1"))
      .join(grams.select(col("doc_id").as("doc2"), col("pos").as("p2"),
        col("h")), Seq("doc2", "h"))
      .withColumn("d", col("p2") - col("p1"))
      .withColumn("iid", col("p1") - row_number().over(win))
      .groupBy("doc1", "doc2", "d", "iid")
      .agg((min("p1") + 1).cast("long").as("start1"),
        (min("p2") + 1).cast("long").as("start2"),
        (count(lit(1)) + (WinnowK - 1)).cast("long").as("span_toks"))
      .where(col("span_toks") >= MinSpanToks)
      .select("doc1", "doc2", "start1", "start2", "span_toks")
  }

  private[graft] def spanFrame(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    // Checkpointed once: both gram-attach joins read the same stream.
    spansFromParts(gramFrame(d).localCheckpoint(true),
      winnowPairFrame(d, minShared = 1).select("doc1", "doc2"))

  /** The span build off the session-shared store: grams AND candidates
    * come from the one persisted gram pass. */
  private def spanFrameStored(s: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    spansFromParts(sharedWinnowFrames(s, dir)._1,
      winnowPairsStored(s, dir, minShared = 1).select("doc1", "doc2"))

  private val dedupSpans: Q = (s, dir) =>
    Tables.resultDigest(spanFrameStored(s, dir),
      Seq("doc1", "doc2", "start1", "start2", "span_toks"))

  /** The spans family's candidate-pair count — the `SCALING` span-budget
    * metric (round-9 verdict task 4): the gram-join work `q_dedup_spans`
    * and `q_dedup_span_apply` pay is proportional to this candidate set
    * (each candidate doc's gram stream fans out by its pair degree), so
    * the declared budget bars IT against the measured span output
    * instead of letting the time-vs-rows ratio grandfather unbounded
    * intermediate growth. Measured OUTSIDE the clock, off the
    * session-shared winnow store (no gram pass). */
  private[graft] def spanCandidateCount(s: SparkSession, dir: String): Long =
    winnowPairsStored(s, dir, minShared = 1).count()

  /** SPAN-REMOVAL accounting — the APPLY step of span-level dedup: the
    * smallest doc id holding a span keeps it (the min-id representative
    * convention of `q_dedup_exact`), every other holder marks its copy
    * for removal, and per victim the marked intervals are MERGED
    * (overlaps collapse — a doc sharing overlapping runs with several
    * partners must not double-count tokens) into the per-doc removal
    * manifest: token count, duplicated tokens, kept tokens, merged-span
    * count. Multi-doc chains converge to one surviving copy: in a
    * 3-way duplicate {1,2,3}, pairs (1,2),(1,3),(2,3) mark docs 2 and 3
    * and doc 1 keeps.
    *
    * Interval merge is the same gaps-and-islands discipline as the span
    * build, per victim doc: previous-max-end window → new-group flag →
    * running-sum group id → one aggregate per merged interval. The
    * group assignment is ORDER-INVARIANT under duplicate (start, end)
    * rows (a twin's flag is 0 because start ≤ its own end), so window
    * tie order cannot leak into results. All windows partition on the
    * high-cardinality doc key. */
  /** The interval-merge manifest from any span frame + the doc frame
    * (for total token counts). */
  private def spanApplyFromSpans(spans: org.apache.spark.sql.DataFrame,
      d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val v = spans.select(col("doc2").as("doc_id"),
      col("start2").as("s"),
      (col("start2") + col("span_toks") - 1).as("e"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("s"), col("e"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("s"), col("e"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val agg = v
      .withColumn("pme", max("e").over(wPrev))
      .withColumn("grp", sum(when(col("pme").isNull || col("s") > col("pme"),
        1L).otherwise(0L)).over(wRun))
      .groupBy("doc_id", "grp")
      .agg(min("s").as("ms"), max("e").as("me"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("me") - col("ms") + 1).as("dup_toks"))
    val toks = d.select(col("doc_id"),
      size(TokenOps.terms(col("text"))).cast("long").as("n_toks"))
    agg.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("n_toks"), col("dup_toks"),
        (col("n_toks") - col("dup_toks")).as("kept_toks"), col("n_spans"))
  }

  private[graft] def spanApplyFrame(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    spanApplyFromSpans(spanFrame(d), d)

  /** The removal manifest off the session-shared store. */
  private def spanApplyStored(s: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    spanApplyFromSpans(spanFrameStored(s, dir), docs(s, dir))

  private val dedupSpanApply: Q = (s, dir) =>
    Tables.resultDigest(spanApplyStored(s, dir),
      Seq("doc_id", "n_toks", "dup_toks", "kept_toks", "n_spans"))

  /** DUPLICATION FOOTPRINT per source — the corpus-level headline the
    * span manifests roll up to (Lee et al. 2022's "what fraction of
    * the training text is duplicated" number, reported where a mixture
    * designer reads it: next to `q_text_lexical` and `q_text_source_kl`
    * in the per-source diagnostics): share of each source's tokens
    * sitting inside cross-document duplicated spans, plus how many of
    * its docs are affected at all. Exactly [[spanApplyFrame]]'s merged
    * intervals (no double-counting under overlap) left-joined back to
    * the FULL corpus so untouched docs count in the denominator; the
    * ppm ratio clears through DECIMAL(38,0) (1e6 × corpus tokens
    * outgrows int64 near 10¹³ tokens — the 100 TB regime). Output is
    * O(sources); the only new work over the span build is one join and
    * a rollup. */
  private val dedupFootprint: Q = (s, dir) => {
    val manifests = spanApplyStored(s, dir)
      .select("doc_id", "dup_toks", "n_spans")
    val all = docs(s, dir).select(col("source"), col("doc_id"),
      size(TokenOps.terms(col("text"))).cast("long").as("n_toks"))
    all.join(manifests, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_toks", "n_spans"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("n_docs_affected"),
        sum("n_toks").as("n_toks"),
        sum("dup_toks").as("dup_toks"))
      .select(col("source"), col("n_docs"), col("n_docs_affected"),
        col("n_toks"), col("dup_toks"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * dup_toks) DIV n_toks AS BIGINT)")
          .as("dup_ppm"))
      .orderBy("source")
  }

  /** BM25 constants (Robertson/Lucene form), shared with the oracle:
    * k1 = 6/5, b = 3/4 — kept as exact rationals so the tf-normalization
    * denominator clears to integers (see [[bm25]]). */
  private val Bm25Terms = Seq("hash", "vector", "window")
  private val Bm25TopK  = 20

  /** BM25 lexical retrieval — the ranked keyword-search baseline every
    * hybrid stack pairs with dense ANN (this engine fuses the two in
    * `q_sim_hybrid_rrf`; BM25 is the principled replacement for its raw
    * overlap leg). Lucene's non-negative idf ln(1 + (N−df+½)/(df+½)) is
    * quantized once to integer micronats — the ratio is formed as
    * (2N−2df+1)/(2df+1), so the only double op is one ln + floor (the
    * tfidf discipline). The tf normalization tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
    * clears to EXACT int64 arithmetic by multiplying through by 10·avgdl_milli:
    * contribution = idf_un · 22·A·tf DIV (10·A·tf + 3·A + 9000·dl), with
    * A = avgdl in millitokens. Scale shape: per-doc dl and per-query-term
    * tfs come from ONE narrow map pass (the corpus text never shuffles);
    * corpus stats (N, Σdl, per-term df) are a single aggregated row
    * broadcast back; the top-K rides TakeOrderedAndProject. Per-query
    * work at 100 TB is one scan + an O(1) exchange. */
  private val bm25: Q = (s, dir) => {
    val tfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      expr(s"CAST(size(filter(toks, w -> w = '$term')) AS BIGINT)").as(s"tf_$i")
    }
    val base = docs(s, dir)
      .withColumn("toks", TokenOps.terms(col("text")))
      .select(col("doc_id") +: size(col("toks")).cast("long").as("dl") +: tfCols: _*)
      .where(col("dl") > 0)
      .localCheckpoint(true) // stats row + scoring read the same narrow frame
    val statAggs =
      sum("dl").as("dl_sum") +:
        Bm25Terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(count(lit(1)).as("n_docs"), statAggs: _*)
      .withColumn("a_milli",
        expr(graft.ops.Bm25.aMilliSql("dl_sum", "n_docs", "DIV")))
    val contribs = Bm25Terms.indices.map { i =>
      val c = graft.ops.Bm25.contribSql(
        graft.ops.Bm25.idfUnSql("n_docs", s"df_$i"),
        "a_milli", s"tf_$i", "dl", "DIV")
      expr(s"CASE WHEN tf_$i > 0 THEN $c ELSE CAST(0 AS BIGINT) END")
    }
    val nHit = Bm25Terms.indices
      .map(i => when(col(s"tf_$i") > 0, 1).otherwise(0))
      .reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score_un", contribs.reduce(_ + _))
      .withColumn("n_hit", nHit.cast("int"))
      .where(col("score_un") > 0)
      .select("doc_id", "dl", "n_hit", "score_un")
      .orderBy(col("score_un").desc, col("doc_id"))
      .limit(Bm25TopK)
  }

  /** Hashed-feature classifier width (the "hashing trick",
    * Weinberger et al. 2009) — the weight vector is indexed by
    * hash(term) % B, so the model is a fixed-size array independent of
    * vocabulary. */
  private[queries] val ClassifyBuckets = 256

  /** Linear text-classifier SERVING over hashed features — the shape of
    * every fastText-style quality/domain classifier a curation pipeline
    * applies corpus-wide (CCNet, DCLM): score = Σ_t tf(t)·w(h(t) mod B),
    * margin = score per 1000 tokens. The weight table is DERIVED
    * (w = md5-hash of the bucket id mapped to [−1000, 1000] millis), so
    * the query grades the full serving path — feature hashing, bucket
    * lookup, margin, decision — with zero model-distribution machinery:
    * at 100 TB the real weights arrive as one ≤B-row broadcast; here the
    * lookup is fused into the same codegen pass, which is strictly
    * harder to get wrong. Everything is integer (md5-60-bit hashes,
    * milli weights, DIV margins); one explode + one doc-keyed hash
    * aggregation — no joins, no model state, map-side combine bounds the
    * shuffle by doc count. */
  private[graft] def classifyFrame(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = classify(s, dir)

  private val classify: Q = (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"), explode(TokenOps.terms(col("text"))).as("term"))
      .withColumn("bucket", expr(
        s"CAST(conv(substring(md5(term), 1, 15), 16, 10) AS BIGINT) % $ClassifyBuckets"))
      .withColumn("w_milli", expr(
        "CAST(conv(substring(md5(concat('w#', CAST(bucket AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("w_milli").as("score_milli"))
      .withColumn("margin_mpt", expr("1000 * score_milli DIV n_terms"))
      .withColumn("label",
        when(col("score_milli") > 0, "keep").otherwise("drop"))
      .select("doc_id", "n_terms", "score_milli", "margin_mpt", "label")
      .orderBy("doc_id")

  /** The PERSISTED classifier weight store — the
    * [[graft.ml.HashedLogReg]] O(B) parquet table holding
    * `q_text_classify`'s derived milli weights (w(b) = md5("w#"+b)
    * 60-bit mod 2001 − 1000, computed once driver-side: B hashes, not a
    * job), saved once per application through the trainer's
    * [[graft.ml.HashedLogReg.save]]/load loop so the GRADED serving
    * path exercises the same store a trained model ships through. The
    * weights are integers held exactly in the store's doubles (|w| ≤
    * 1000 ≪ 2⁵³), so load → serve loses nothing. Keyed by application
    * only — the derived table is corpus-independent. */
  private val classifyModelDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def sharedClassifyModel(
      s: SparkSession): graft.ml.HashedLogReg.Model = {
    val d = classifyModelDirs.getOrElseUpdate(s.sparkContext.applicationId, {
      val p = java.nio.file.Files.createTempDirectory("graft_clsw_").toString
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = Array.tabulate(ClassifyBuckets) { b =>
        val hex = md.digest(s"w#$b".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001 - 1000)
          .toDouble
      }
      graft.ml.HashedLogReg.save(
        graft.ml.HashedLogReg.Model(ClassifyBuckets, 0.0, w), p)
      p
    })
    graft.ml.HashedLogReg.load(s, d)
  }

  /** Classifier serving from the PERSISTED weight table — the
    * `q_text_classify` contract through the learn→serve loop, closing
    * the one scorer family whose store was spec-only: the O(B) weight
    * table comes from the [[graft.ml.HashedLogReg]] store (bias row,
    * width row, tear checks), and the margin is the trainer's join-free
    * `element_at` lookup against the broadcast-as-literal weight array —
    * one codegen pass, no join, no model state on executors beyond the
    * B-element literal. All arithmetic stays integer (milli weights cast
    * back to BIGINT), so the oracle is the inline query's verbatim:
    * same statistic, two serving paths, one contract. */
  private val classifyServed: Q = (s, dir) => {
    val m = sharedClassifyModel(s)
    val wCol = array(m.w.toIndexedSeq.map(v => lit(v.toLong)): _*)
    docs(s, dir)
      .select(col("doc_id"), explode(TokenOps.terms(col("text"))).as("term"))
      .withColumn("bucket", expr(
        s"CAST(conv(substring(md5(term), 1, 15), 16, 10) AS BIGINT) % $ClassifyBuckets"))
      .withColumn("w_milli", element_at(wCol, col("bucket").cast("int") + 1))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("w_milli").as("score_milli"))
      .withColumn("margin_mpt", expr("1000 * score_milli DIV n_terms"))
      .withColumn("label",
        when(col("score_milli") > 0, "keep").otherwise("drop"))
      .select("doc_id", "n_terms", "score_milli", "margin_mpt", "label")
      .orderBy("doc_id")
  }

  /** Per-source corpus-mixture divergence — KL(source ‖ corpus) over
    * unigram distributions, the domain-shift diagnostic that ranks which
    * sources differ most from the blend (the corpus-composition
    * companion of Moore–Lewis doc selection and the PSI drift report,
    * which compares time slices instead of sources). Per-(source, term)
    * log-ratios are quantized once to floor millinats on the
    * vocabulary×sources-bounded type table — the ln argument is formed
    * as one division of two exact integer products (k·CT, Tₛ·ck, both
    * < 2⁵³) so the only FP surface is the single ln+floor (the tfidf
    * discipline); the per-source aggregation is exact integer
    * arithmetic. Scale shape: tokenize once into a checkpointed
    * (source, term) tf frame; corpus/term totals are vocabulary-sized
    * and source totals O(sources); output is O(sources). */
  private val sourceKl: Q = (s, dir) => {
    // Checkpoint at the aggregate's AQE width (the r15 fanout-overhead
    // rule — see tfidf's comment).
    val tf = docs(s, dir)
      .select(col("source"), explode(TokenOps.terms(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("k"))
      .localCheckpoint(true) // term totals, source totals, corpus total, join
    val byTerm = tf.groupBy("term").agg(sum("k").as("ck"))
    val bySrc = tf.groupBy("source").agg(sum("k").as("tsrc"))
    val total = tf.agg(sum("k").as("ct"))
    tf.join(byTerm, Seq("term")).join(bySrc, Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("mln", expr(
        """CAST(floor(1000.0 * ln((CAST(k AS DOUBLE) * ct)
          |                       / (CAST(tsrc AS DOUBLE) * ck))) AS BIGINT)"""
          .stripMargin.replace("\n", " ")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"), sum("k").as("n_tokens"),
        expr("sum(k * mln) DIV sum(k)").as("kl_mln"))
      .orderBy("source")
  }

  /** Repetition-ratio quality signal (the within-document counterpart of
    * cross-document dedup; Gopher-style "repetitious text" filter, Rae et
    * al. 2021 §A1.1): the fraction of word tokens and of word 2-grams that
    * are repeats of an earlier occurrence, as exact integer basis points.
    * A spammy "buy now buy now buy now" page scores ~1, clean prose ~0.
    * Pure map-side expressions — one codegen pass at any scale. */
  private val repetition: Q = (s, dir) =>
    Tables.orderedOnce(docs(s, dir)
      .withColumn("toks_all",
        filter(split(TextOps.cleanText(col("text")), " "), w => w =!= ""))
      // Guard the 0/1-token case explicitly: Spark's sequence(1, 0) is the
      // DESCENDING [1, 0] (default step -1), not an empty list.
      .withColumn("bigrams", expr(
        """CASE WHEN size(toks_all) >= 2
          | THEN transform(sequence(1, size(toks_all) - 1), i -> concat_ws(' ', element_at(toks_all, i), element_at(toks_all, i+1)))
          | ELSE CAST(array() AS array<string>) END""".stripMargin))
      .select(
        col("doc_id"),
        size(col("toks_all")).as("n_tokens"),
        expr("CASE WHEN size(toks_all) > 0 THEN CAST(10000 * (size(toks_all) - size(array_distinct(toks_all))) DIV size(toks_all) AS BIGINT) ELSE 0 END")
          .as("dup_token_bp"),
        expr("CASE WHEN size(bigrams) > 0 THEN CAST(10000 * (size(bigrams) - size(array_distinct(bigrams))) DIV size(bigrams) AS BIGINT) ELSE 0 END")
          .as("dup_bigram_bp")),
        col("doc_id"))

  /** PII scrubbing for corpus publication: redact emails / IP literals /
    * long digit runs, plus per-doc match counts for the redaction audit a
    * release pipeline logs. Chained regexp_replace — map-side, no UDF. */
  private val piiScrub: Q = (s, dir) =>
    Tables.orderedOnce(docs(s, dir).select(
      col("doc_id"),
      TextOps.scrubPii(col("text")).as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(TextOps.EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(TextOps.IpPattern), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(TextOps.LongNumPattern), lit(0))).as("n_longnums")),
      col("doc_id"))

  /** C4/Gopher-style keep/drop decision: the composed quality gate a
    * curation pipeline applies before dedup — minimum length, alphabetic
    * ratio, repetition, stop-word presence — emitting the FIRST failing
    * rule as the verdict (so drop reasons are auditable). All integer
    * basis points; the CASE short-circuits in both engines, so the ratio
    * divisions only run once the length guard has passed. */
  /** Session-shared (Tables.sharedFrame): the gate verdict is the most
    * widely consumed statistic in the suite — the filter query, the
    * four curation pipelines, the per-source report, and the three
    * agreement metrics (kappa/fleiss/mcnemar) all read it, and each
    * re-running the heavy 4-rule regex/array pass was ~0.5 s at sf0.1
    * (r15). One pass per session is also the production shape: a gate
    * stamps verdicts once, every downstream stage reads them. The
    * derivation is deterministic integer/string arithmetic ⇒
    * bit-identical to the former inline form; oracles unchanged. */
  private[graft] def filterVerdicts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.sharedFrame(s, dir, "filter_verdicts") {
      filterVerdictsInline(s, dir)
    }

  private def filterVerdictsInline(s: org.apache.spark.sql.SparkSession,
                                      dir: String): org.apache.spark.sql.DataFrame =
    docs(s, dir)
      .withColumn("toks_all",
        filter(split(TextOps.cleanText(col("text")), " "), w => w =!= ""))
      .withColumn("toks", TokenOps.terms(col("text")))
      .withColumn("bigrams", expr(
        """CASE WHEN size(toks_all) >= 2
          | THEN transform(sequence(1, size(toks_all) - 1), i -> concat_ws(' ', element_at(toks_all, i), element_at(toks_all, i+1)))
          | ELSE CAST(array() AS array<string>) END""".stripMargin))
      .select(
        col("doc_id"),
        size(col("toks_all")).as("n_tokens"),
        expr(
          s"""CASE WHEN size(toks_all) < $FilterMinTokens THEN 'too_short'
             | WHEN 10000 * length(regexp_replace(text, '[^A-Za-z]', '')) DIV length(text) < $FilterMinAlphaBp THEN 'low_alpha'
             | WHEN 10000 * (size(bigrams) - size(array_distinct(bigrams))) DIV size(bigrams) > $FilterMaxDupBigramBp THEN 'repetitive'
             | WHEN 10000 * (size(toks_all) - size(toks)) DIV size(toks_all) < $FilterMinStopwordBp THEN 'low_stopword'
             | ELSE 'keep' END""".stripMargin).as("verdict"))

  private val filterDecision: Q = (s, dir) =>
    Tables.orderedOnce(filterVerdicts(s, dir), col("doc_id"))

  /** GATE ABLATION — the "which rule earns its place" report a quality
    * gate-stack owner reads before adding/removing a rule: per rule,
    * how many docs it flags at all, how many it UNIQUELY flags (the
    * docs only this rule protects against — dropping the rule admits
    * exactly these), and how many it flags FIRST (the attribution the
    * `q_text_filter` verdict column reports). Booleans are evaluated
    * INDEPENDENTLY (ablation semantics — each rule on every doc, with
    * explicit zero-denominator guards the sequential CASE never
    * needed), in ONE corpus pass feeding a 12-column aggregate that
    * `stack`s to the fixed 4-row report. */
  private val gateAblation: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("toks_all",
        filter(split(TextOps.cleanText(col("text")), " "), w => w =!= ""))
      .withColumn("toks", TokenOps.terms(col("text")))
      .withColumn("bigrams", expr(
        """CASE WHEN size(toks_all) >= 2
          | THEN transform(sequence(1, size(toks_all) - 1), i -> concat_ws(' ', element_at(toks_all, i), element_at(toks_all, i+1)))
          | ELSE CAST(array() AS array<string>) END""".stripMargin))
      .select(
        expr(s"size(toks_all) < $FilterMinTokens").as("f_short"),
        // CASE guards, not AND: neither engine guarantees boolean
        // short-circuit under vectorized evaluation, and a zero
        // denominator must not raise under ANSI.
        expr(s"""CASE WHEN length(text) > 0
                | THEN 10000 * length(regexp_replace(text, '[^A-Za-z]', '')) DIV length(text) < $FilterMinAlphaBp
                | ELSE false END"""
          .stripMargin.replace("\n", " ")).as("f_alpha"),
        expr(s"""CASE WHEN size(bigrams) > 0
                | THEN 10000 * (size(bigrams) - size(array_distinct(bigrams))) DIV size(bigrams) > $FilterMaxDupBigramBp
                | ELSE false END"""
          .stripMargin.replace("\n", " ")).as("f_rep"),
        expr(s"""CASE WHEN size(toks_all) > 0
                | THEN 10000 * (size(toks_all) - size(toks)) DIV size(toks_all) < $FilterMinStopwordBp
                | ELSE false END"""
          .stripMargin.replace("\n", " ")).as("f_stop"))
      .withColumn("n_fired", expr(
        "CAST(f_short AS INT) + CAST(f_alpha AS INT) + CAST(f_rep AS INT) + CAST(f_stop AS INT)"))
      .agg(
        sum(when(col("f_short"), 1L).otherwise(0L)).as("sf"),
        sum(when(col("f_short") && col("n_fired") === 1, 1L).otherwise(0L)).as("su"),
        sum(when(col("f_short"), 1L).otherwise(0L)).as("s1"),
        sum(when(col("f_alpha"), 1L).otherwise(0L)).as("af"),
        sum(when(col("f_alpha") && col("n_fired") === 1, 1L).otherwise(0L)).as("au"),
        sum(when(col("f_alpha") && !col("f_short"), 1L).otherwise(0L)).as("a1"),
        sum(when(col("f_rep"), 1L).otherwise(0L)).as("rf"),
        sum(when(col("f_rep") && col("n_fired") === 1, 1L).otherwise(0L)).as("ru"),
        sum(when(col("f_rep") && !col("f_short") && !col("f_alpha"), 1L)
          .otherwise(0L)).as("r1"),
        sum(when(col("f_stop"), 1L).otherwise(0L)).as("pf"),
        sum(when(col("f_stop") && col("n_fired") === 1, 1L).otherwise(0L)).as("pu"),
        sum(when(col("f_stop") && !col("f_short") && !col("f_alpha") &&
          !col("f_rep"), 1L).otherwise(0L)).as("p1"))
      .selectExpr(
        """stack(4,
          | 'too_short',    sf, su, s1,
          | 'low_alpha',    af, au, a1,
          | 'repetitive',   rf, ru, r1,
          | 'low_stopword', pf, pu, p1)
          | AS (rule, n_flagged, n_uniquely_flagged, n_first_failing)"""
          .stripMargin.replace("\n", " "))
      .orderBy("rule")

  /** Levenshtein edit distance (fuzzy-match building block): how far the
    * raw text head drifts from its cleaned form — bounded operands (the
    * DP is O(len²); at scale always cap the compared prefix). */
  private val editDistance: Q = (s, dir) =>
    Tables.orderedOnce(docs(s, dir).select(
      col("doc_id"),
      levenshtein(substring(col("text"), 1, 40),
        substring(TextOps.cleanText(col("text")), 1, 40)).as("edit40")),
        col("doc_id"))

  /** Shared langid SELECT (sans ORDER BY) for the per-doc and
    * confusion-matrix oracles — one definition, no drift (also the
    * side-labeling CTE of the bitext-mining oracles in
    * [[SimilarityQueries]]). */
  private[queries] lazy val duckLangId: String =
    s"""SELECT doc_id, lang, s_en, s_fr, s_de,
       | CASE WHEN s_en >= s_fr AND s_en >= s_de THEN 'en'
       |      WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END AS predicted
       | FROM (SELECT doc_id, lang,
       |   CAST(len(list_filter(toks, w -> w IN (${MarkersEn.map(w => s"'$w'").mkString(", ")}))) AS INTEGER) AS s_en,
       |   CAST(len(list_filter(toks, w -> w IN (${MarkersFr.map(w => s"'$w'").mkString(", ")}))) AS INTEGER) AS s_fr,
       |   CAST(len(list_filter(toks, w -> w IN (${MarkersDe.map(w => s"'$w'").mkString(", ")}))) AS INTEGER) AS s_de
       |   FROM (SELECT doc_id, lang, ${duckTerms("text")} AS toks FROM documents))""".stripMargin

  /** Context-window chunking constants: 32-token windows, 8-token
    * overlap → stride 24. Chunk count and bounds are pure integer
    * arithmetic (no ceil-of-double), identical in both engines. */
  private val ChunkSize    = 32
  private val ChunkOverlap = 8
  private val ChunkStride  = ChunkSize - ChunkOverlap

  /** Fixed-token-window document chunking with overlap — the step that
    * turns variable-length documents into training context windows
    * (every pretraining pipeline ships one; the reference has none).
    * ALL tokens are kept (no de-stopping — chunks must reconstruct the
    * text); last chunk may run short; single-chunk docs pass through
    * whole. Emits per-chunk bounds + an md5 fingerprint of the chunk
    * text rather than the text itself, so the output stays narrow and
    * the oracle hash-checks content without shipping it twice.
    *
    * Scale shape: pure map-side — tokenize once, an integer-sequence
    * explode per doc (fan-out ∝ chunks, no shuffle, no window), and
    * codegen'd slice/concat per chunk. At 100 TB this is the shape you
    * want: chunking never exchanges data, parallelism is the scan's. */
  private val chunkDocs: Q = (s, dir) =>
    Tables.orderedOnce(Tables.fanout(t(s, dir, "documents"))
      .select(col("doc_id"),
        filter(TokenOps.tokenize(TextOps.cleanText(col("text"))),
          w => w =!= "").as("toks"))
      .where(size(col("toks")) >= 1)
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks",
        expr(s"CAST(1 + (greatest(0, n - $ChunkSize) + $ChunkStride - 1) DIV $ChunkStride AS INT)"))
      .select(col("doc_id"), col("n"), col("toks"),
        explode(expr("sequence(1, n_chunks)")).as("cid"))
      .withColumn("tok_start", expr(s"1 + (cid - 1) * $ChunkStride"))
      .withColumn("tok_end", expr(s"least(n, tok_start + ${ChunkSize - 1})"))
      .select(col("doc_id"), col("cid").cast("long").as("chunk_id"),
        col("tok_start").cast("long").as("tok_start"),
        (col("tok_end") - col("tok_start") + 1).cast("long").as("n_tok"),
        md5(concat_ws(" ",
          expr("slice(toks, tok_start, tok_end - tok_start + 1)"))).as("chunk_fp")),
        col("doc_id"), col("chunk_id"))

  /** Output cap for [[bpePairs]]. */
  private val BpeTopPairs = 50

  /** The first BPE merge iteration — the statistic a tokenizer TRAINING
    * pass computes: adjacent character-pair frequencies over the corpus,
    * as the argmax candidate list for the first merge rule. The classic
    * BPE efficiency trick is load-bearing at scale: pairs are counted
    * over the DISTINCT vocabulary weighted by word frequency (one row
    * per word TYPE × position), never over raw corpus tokens — the
    * explode is vocabulary-sized (sublinear in corpus, Heaps' law)
    * while the counts are exactly the corpus-wide ones. Top-K rides
    * `TakeOrderedAndProject`; ties break on the pair string. */
  private val bpePairs: Q = (s, dir) => {
    val wordFreq = docs(s, dir)
      .select(explode(TokenOps.terms(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    wordFreq
      .where(length(col("term")) >= 2)
      .select(col("term"), col("freq"),
        explode(expr("sequence(1, length(term) - 1)")).as("i"))
      .select(concat(expr("substring(term, i, 1)"), lit(" "),
        expr("substring(term, i + 1, 1)")).as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(BpeTopPairs)
  }

  /** The FIXTURE merge list for [[bpeTokenize]] — a frozen, ordered BPE
    * merge table (the artifact a tokenizer TRAINING run like
    * [[graft.ops.BpeTrainer]] produces; frozen here so both engines
    * share it verbatim and the graded statistic is the SERVING side:
    * token accounting under a fixed tokenizer, not training). Later
    * merges consume earlier outputs ("t h"→th before "th e"→the;
    * "i n"→in before "in g"→ing) — order is part of the constant. */
  private[queries] val BpeMergeList: Seq[(String, String)] = Seq(
    "t" -> "h", "i" -> "n", "e" -> "r", "a" -> "n", "o" -> "n",
    "r" -> "e", "th" -> "e", "an" -> "d", "in" -> "g", "s" -> "t",
    "e" -> "s", "o" -> "r")

  /** Per-term BPE subword count under [[BpeMergeList]], as ONE
    * expression string per dialect so both engines execute the same
    * recipe: char-split the term into a space-delimited symbol string
    * (" i n g "), apply each merge as TWO left-to-right non-overlapping
    * `replace` passes of " a b " → " ab " (two passes because one
    * replace consumes the shared delimiter between adjacent
    * occurrences — e.g. " a b a b " merges only the first pair in pass
    * one; after it, surviving occurrences are never adjacent, so pass
    * two catches them all), then count symbols as spaces − 1. The
    * recipe is a deterministic engine-identical BPE application; on
    * pathological same-symbol runs its GROUPING can differ from
    * canonical leftmost-greedy BPE, but the symbol COUNT — the graded
    * statistic — does not. */
  private def bpeCountExpr(colName: String, spark: Boolean): String =
    graft.ops.BpeTrainer.countExpr(colName, BpeMergeList, spark)

  /** BPE-SEGMENTED TOKEN ACCOUNTING — per-doc token counts under the
    * fixed learned-subword tokenizer, next to the whitespace count the
    * packing/budget queries use: real context windows are priced in
    * SUBWORD tokens, and the ws-token proxy systematically under-counts
    * long/rare-word documents. The classic BPE serving economics are
    * load-bearing at scale: segmentation runs once per word TYPE over
    * the distinct vocabulary (sublinear in the corpus, Heaps' law),
    * then joins back to the (doc, term, tf) frame — the corpus-sized
    * side never touches the replace chain. Everything is exact integer
    * counting; the merge table is [[BpeMergeList]] verbatim in both
    * engines. */
  private val bpeTokenize: Q = (s, dir) =>
    bpeDocTokens(s, dir)
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
      .orderBy("doc_id")

  /** The shared per-doc BPE accounting frame — (doc_id, source,
    * n_ws_tokens, n_bpe_tokens) — read by the graded [[bpeTokenize]]
    * report and by `q_sample_pack_bpe`'s subword-budget packing
    * (SamplingQueries): the "real tokenizer count column" the packing
    * scaladoc promised drops in without changing the packing shape. */
  private[queries] def bpeDocTokens(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    // Session-shared (r15): bpe_tokenize + pack_bpe read the identical
    // per-doc accounting, and the vocabulary-sized BPE replace chain is
    // the family's dominant cost.
    Tables.sharedFrame(s, dir, "bpe_doc_tokens") {
      val tf = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(TokenOps.terms(col("text"))).as("term"))
        .groupBy("doc_id", "source", "term").agg(count(lit(1)).as("tf"))
      val vocab = tf.select("term").distinct()
        .select(col("term"),
          expr(bpeCountExpr("term", spark = true)).cast("long").as("n_sub"))
      tf.join(vocab, Seq("term"))
        .groupBy("doc_id", "source")
        .agg(sum("tf").as("n_ws_tokens"),
          sum(col("tf") * col("n_sub")).as("n_bpe_tokens"))
    }

  /** DuckDB twin of [[bpeDocTokens]], as a CTE body both BPE consumers
    * paste — the merge recipe string is generated from the SAME
    * [[BpeMergeList]] constant as the Spark side. */
  private[queries] def duckBpeDocTokens: String =
    s"""SELECT doc_id, source,
       |  CAST(sum(tf) AS BIGINT) AS n_ws_tokens,
       |  CAST(sum(tf * n_sub) AS BIGINT) AS n_bpe_tokens
       | FROM (SELECT doc_id, source, t AS term, count(*) AS tf
       |   FROM (SELECT doc_id, source, unnest(${duckTerms("text")}) AS t FROM documents)
       |   GROUP BY 1, 2, 3) tf
       | JOIN (SELECT term, ${bpeCountExpr("term", spark = false)} AS n_sub
       |   FROM (SELECT DISTINCT t AS term
       |     FROM (SELECT unnest(${duckTerms("text")}) AS t FROM documents))) vocab
       | USING (term)
       | GROUP BY doc_id, source""".stripMargin

  /** TOKENIZER FERTILITY per source — subword tokens per whitespace
    * word under the fixed [[BpeMergeList]] tokenizer, the standard
    * tokenizer-eval cut (a source whose fertility runs high is one the
    * tokenizer segments poorly — it pays more context budget per word,
    * the signal a mixture designer reads next to [[lexicalRichness]]).
    * Same vocabulary-sized segmentation economics as [[bpeTokenize]];
    * the rollup is O(sources) with an exact integer ppm ratio. */
  private val bpeFertility: Q = (s, dir) => {
    val tf = docs(s, dir)
      .select(col("source"), explode(TokenOps.terms(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val vocab = tf.select("term").distinct()
      .select(col("term"),
        expr(bpeCountExpr("term", spark = true)).cast("long").as("n_sub"))
    tf.join(vocab, Seq("term"))
      .groupBy("source")
      .agg(sum("tf").as("n_ws_tokens"),
        sum(col("tf") * col("n_sub")).as("n_bpe_tokens"))
      .select(col("source"), col("n_ws_tokens"), col("n_bpe_tokens"),
        expr("1000000 * n_bpe_tokens DIV n_ws_tokens").as("fertility_ppm"))
      .orderBy("source")
  }

  /** LEXICAL-RICHNESS report per source — the Heaps/Zipf-side corpus
    * diagnostic the quality gates don't see: type/token ratio (low TTR
    * flags template/boilerplate-heavy sources long before a dedup pass
    * runs) and hapax share (high hapax flags OCR noise / tokenizer
    * damage — vocabulary that never repeats). Exact integers: one
    * (source, term) aggregate — vocabulary-sized output per source,
    * sublinear in the corpus by Heaps' law — then an O(vocab) rollup to
    * O(sources) rows. */
  private val lexicalRichness: Q = (s, dir) =>
    docs(s, dir)
      .select(col("source"), explode(TokenOps.terms(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .groupBy("source")
      .agg(sum("tf").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("1000000 * n_types DIV n_tokens").as("ttr_ppm"),
        expr("1000000 * n_hapax DIV n_types").as("hapax_ppm"))
      .orderBy("source")

  /** Quartile count of the vocabulary-growth curve. */
  private val HeapsBuckets = 4

  /** VOCABULARY-GROWTH (Heaps-law) report — the corpus-health curve a
    * curator reads per source: order each source's docs by the md5
    * shuffle (so the curve is a property of the SOURCE, not of
    * ingestion order), cut into [[HeapsBuckets]] quartiles, and report
    * cumulative tokens vs cumulative DISTINCT vocabulary at each cut.
    * Healthy text follows Heaps' law (V ∝ n^β, β≈0.5 — vocab density
    * `vocab_per_mtok` falls steadily across buckets); a FLAT density
    * says new docs keep minting new types (OCR noise, random IDs,
    * boilerplate churn), a COLLAPSING one says the tail is near-
    * duplicate mass a dedup pass missed — both actionable before
    * training. Complements [[lexicalRichness]] (one point per source)
    * with the curve that point sits on. All exact integers: a term's
    * contribution lands at its FIRST bucket (min over occurrences), so
    * cumulative vocab is one O(vocab) aggregate + an O(sources·4)
    * running sum — never a distinct-count per prefix. The per-source
    * rank rides [[graft.ops.PrefixOps]] (never a stream window on the
    * low-cardinality source key); the quartile is Spark's exact NTile
    * arithmetic from the prefix rank. */
  private val textHeaps: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.fanout(t(s, dir, "documents"))
      .withColumn("rk", expr("md5(CAST(doc_id AS STRING))"))
      .withColumn("toks", TokenOps.terms(col("text")))
      .select(col("doc_id"), col("source"), col("rk"), col("toks"),
        size(col("toks")).cast("long").as("n_tok"))
    val ranked = graft.ops.PrefixOps.withPrefixOffsets(d, Seq("source"),
        Seq(col("rk").asc, col("doc_id").asc), Seq("r" -> lit(1L)))
      .withColumn("rn", col("r_off") + row_number().over(
        Window.partitionBy(col("source"), col(graft.ops.PrefixOps.PidCol))
          .orderBy(col("rk").asc, col("doc_id").asc)).cast("long"))
      .withColumn("bucket",
        graft.ops.PrefixOps.ntileFromRowNumber("rn", "r_tot", HeapsBuckets)
          .cast("int"))
    val perBucket = ranked.groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val firstSeen = ranked
      .select(col("source"), col("bucket"), explode(col("toks")).as("term"))
      .groupBy("source", "term").agg(min("bucket").as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("vocab_new"))
    // O(sources · buckets) frame from here down — window is model-state
    // sized, the bounded-frame convention.
    val w = Window.partitionBy("source").orderBy("bucket")
    perBucket.join(firstSeen, Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("vocab_new"))
      .withColumn("n_tokens_cum", sum("n_tokens").over(w))
      .withColumn("vocab_cum", sum("vocab_new").over(w))
      .select(col("source"), col("bucket"), col("n_docs"), col("n_tokens"),
        col("n_tokens_cum"), col("vocab_new"), col("vocab_cum"),
        expr("1000000 * vocab_cum DIV greatest(n_tokens_cum, 1)")
          .as("vocab_per_mtok"))
      .orderBy("source", "bucket")
  }

  val queries: Seq[(String, Q)] = Seq(
    "q_text_heaps"       -> textHeaps,
    "q_text_lexical"     -> lexicalRichness,
    "q_text_bpe_pairs"   -> bpePairs,
    "q_text_bpe_tokenize" -> bpeTokenize,
    "q_text_bpe_fertility" -> bpeFertility,
    "q_text_chunks"      -> chunkDocs,
    "q_text_editdist"    -> editDistance,
    "q_f_clean_chain"    -> fCleanChain,
    "q_f_extract"        -> fExtract,
    "q_p6_keyword_filter"-> p6KeywordFilter,
    "q_p2_json_envelope" -> p2JsonEnvelope,
    "q_d4_time_features" -> d4TimeFeatures,
    "q_d_trunc"          -> dTrunc,
    "q_d_gapfill"        -> dGapfill,
    "q_m2_virality"      -> m2Virality,
    "q_m3_argmax"        -> m3Argmax,
    "q_j1_topic_label"   -> j1TopicLabel,
    "q_a3_vocabulary"    -> a3Vocabulary,
    "q_u1_sentiment"     -> u1Sentiment,
    "q_text_langid"      -> langId,
    "q_text_langid_eval" -> langIdEval,
    "q_text_quality"     -> quality,
    "q_text_tokencount"  -> tokenCount,
    "q_text_fingerprint" -> fingerprint,
    "q_text_winnow"      -> winnow,
    "q_text_winnow_pairs" -> winnowPairs,
    "q_dedup_spans" -> dedupSpans,
    "q_dedup_span_apply" -> dedupSpanApply,
    "q_dedup_footprint"  -> dedupFootprint,
    "q_text_bm25"        -> bm25,
    "q_text_classify"    -> classify,
    "q_text_classify_served" -> classifyServed,
    "q_text_source_kl"   -> sourceKl,
    "q_text_repetition"  -> repetition,
    "q_text_pii"         -> piiScrub,
    "q_text_filter"      -> filterDecision,
    "q_text_gate_ablation" -> gateAblation,
    "q_text_tfidf"       -> tfidf,
    "q_text_docsim"      -> docsim,
    "q_text_heavyhitters" -> heavyHitters,
    "q_text_unigram_lp"  -> unigramLp,
    "q_text_bigram_lm"   -> bigramLm,
    "q_text_moore_lewis" -> mooreLewis,
    "q_text_moore_lewis_served" -> mooreLewisServed,
    "q_text_heldout_ppl" -> heldoutPpl,
    "q_text_ppl_served"  -> pplServed,
    "q_text_bigram_served" -> bigramServed,
    "q_text_kn_lm"       -> knLm,
    "q_text_kn_served"   -> knServed,
    "q_text_kn3_lm"      -> kn3Lm,
    "q_text_kn3_served"  -> kn3Served,
    "q_text_ppl_buckets" -> pplBuckets,
    "q_text_ppl_buckets_served" -> pplBucketsServed,
    "q_text_pmi"         -> pmiKeyphrases,
    "q_text_stem"        -> stemVocabulary
  )

  /** `q_text_heldout_ppl`'s oracle — ONE definition, also graded
    * against `q_text_ppl_served` (the persisted-LM serving path). */
  private val heldoutOracleSql = heldoutCoreSql + " ORDER BY doc_id"

  /** The heldout chain WITHOUT its ordering — reusable as a
    * parenthesized subquery (the per-source DoReMi oracle wraps it). */
  private[queries] lazy val heldoutCoreSql =
    s"""WITH tf AS (SELECT doc_id, ${SamplingQueries.duckSplitSql("doc_id")} AS split,
       |   term, CAST(count(*) AS BIGINT) AS k
       |  FROM (SELECT doc_id, unnest(${duckTerms("text")}) AS term FROM documents)
       |  GROUP BY 1, 2, 3),
       | lm AS (SELECT term, sum(k) AS cnt FROM tf WHERE split = 'train' GROUP BY 1),
       | st AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total,
       |   CAST(count(*) AS BIGINT) AS v_size FROM lm),
       | lq AS (SELECT term,
       |   CAST(floor(1000.0 * ln((t_total + v_size + 1.0) / (cnt + 1))) AS BIGINT) AS mln
       |  FROM lm CROSS JOIN st),
       | sc AS (SELECT tf.doc_id, tf.k, lq.mln,
       |   coalesce(lq.mln,
       |     CAST(floor(1000.0 * ln(st.t_total + st.v_size + 1.0)) AS BIGINT)) AS mln_eff
       |  FROM tf LEFT JOIN lq ON tf.term = lq.term CROSS JOIN st
       |  WHERE tf.split = 'val')
       | SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN mln IS NULL THEN k ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(sum(k * mln_eff) // sum(k) AS BIGINT) AS heldout_mb
       | FROM sc GROUP BY doc_id""".stripMargin

  /** `q_text_moore_lewis`'s oracle — ONE definition, also graded
    * against `q_text_moore_lewis_served` (the two-store serving path). */
  private val mooreLewisOracleSql =
    s"""WITH tok AS (
       |  SELECT doc_id, source, unnest(${duckTerms("text")}) AS term FROM documents),
       | tf AS (SELECT doc_id, source, term, count(*) AS k FROM tok GROUP BY 1, 2, 3),
       | ind AS (SELECT min(source) AS in_src FROM tf),
       | counts AS (
       |  SELECT term, sum(k) AS c_all,
       |    sum(CASE WHEN source = (SELECT in_src FROM ind) THEN k ELSE 0 END) AS c_in
       |  FROM tf GROUP BY term),
       | consts AS (SELECT sum(c_all) AS t_all, sum(c_in) AS t_in,
       |   count(*) AS v FROM counts),
       | ts AS (SELECT term,
       |   CAST(floor(-1000.0 * ln((CAST(c_all AS DOUBLE) + 1.0) / (t_all + v))) AS BIGINT) AS s_all_mb,
       |   CAST(floor(-1000.0 * ln((CAST(c_in AS DOUBLE) + 1.0) / (t_in + v))) AS BIGINT) AS s_in_mb
       |  FROM counts CROSS JOIN consts)
       | SELECT doc_id, source, CAST(sum(k) AS BIGINT) AS n_tokens,
       |  CAST(sum(k * (s_all_mb - s_in_mb)) // sum(k) AS BIGINT) AS ml_score_mb
       | FROM tf JOIN ts USING (term)
       | GROUP BY doc_id, source ORDER BY doc_id""".stripMargin

  /** `q_text_bigram_lm`'s oracle — ONE definition, also graded against
    * `q_text_bigram_served` (the persisted order-2 LM serving path). */
  private val bigramOracleSql = {
    val lam = BigramLambdaPct / 100.0
    s"""WITH db AS (
       |  SELECT doc_id, w1, w2, count(*) AS k FROM (
       |   SELECT doc_id,
       |     unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
       |     unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
       |   FROM (SELECT doc_id, ${duckTerms("text")} AS toks FROM documents)
       |   WHERE len(toks) >= 2)
       |  GROUP BY 1, 2, 3),
       | c2 AS (SELECT w1, w2, sum(k) AS c2 FROM db GROUP BY 1, 2),
       | cf AS (SELECT w1, sum(c2) AS c1first FROM c2 GROUP BY 1),
       | un AS (SELECT w2 AS w, sum(k) AS cuni FROM db GROUP BY 1),
       | t AS (SELECT sum(cuni) AS t_total FROM un),
       | sc AS (SELECT db.doc_id, db.k,
       |   CAST(floor(-1000.0 * ln(
       |     $lam * (CAST(c2.c2 AS DOUBLE) / cf.c1first) +
       |     ${1 - lam} * (CAST(un.cuni AS DOUBLE) / t.t_total))) AS BIGINT) AS s_mb
       |  FROM db JOIN c2 ON db.w1 = c2.w1 AND db.w2 = c2.w2
       |   JOIN cf ON db.w1 = cf.w1
       |   JOIN un ON db.w2 = un.w
       |   CROSS JOIN t)
       | SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
       |  CAST(sum(k * s_mb) // sum(k) AS BIGINT) AS mean_surprisal_mb
       | FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** `q_text_kn_lm`'s oracle — ONE definition, also graded against
    * `q_text_kn_served` (the persisted-LM KN serving path). */
  private val knOracleSql =
    s"""WITH db AS (
       |  SELECT doc_id, w1, w2, count(*) AS k FROM (
       |   SELECT doc_id,
       |     unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
       |     unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
       |   FROM (SELECT doc_id, ${duckTerms("text")} AS toks FROM documents)
       |   WHERE len(toks) >= 2)
       |  GROUP BY 1, 2, 3),
       | c2 AS (SELECT w1, w2, sum(k) AS c2 FROM db GROUP BY 1, 2),
       | cf AS (SELECT w1, sum(c2) AS c1first, count(*) AS n1pr FROM c2 GROUP BY 1),
       | cl AS (SELECT w2, count(*) AS n1pl FROM c2 GROUP BY 1),
       | na AS (SELECT count(*) AS n1pall FROM c2),
       | sc AS (SELECT db.doc_id, db.k,
       |   CAST(floor(-1000.0 * ln(
       |     greatest(CAST(c2.c2 AS DOUBLE) - 0.75, 0.0) / cf.c1first +
       |     (0.75 * cf.n1pr / cf.c1first) * (CAST(cl.n1pl AS DOUBLE) / na.n1pall))) AS BIGINT) AS s_mb
       |  FROM db JOIN c2 ON db.w1 = c2.w1 AND db.w2 = c2.w2
       |   JOIN cf ON db.w1 = cf.w1
       |   JOIN cl ON db.w2 = cl.w2
       |   CROSS JOIN na)
       | SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
       |  CAST(sum(k * s_mb) // sum(k) AS BIGINT) AS kn_surprisal_mb
       | FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `q_text_kn3_lm`'s oracle — ONE definition, also graded against
    * `q_text_kn3_served` (the persisted order-3 LM serving path).
    * Mirrors [[Kn3SurprisalSql]] level for level: discounted trigram
    * ML over the trigram-context count, continuation-bigram middle
    * (distinct left contexts among trigram types), bigram-type
    * continuation unigram at the bottom. */
  private[queries] val kn3OracleSql =
    s"""WITH dt AS (
       |  SELECT doc_id, w1, w2, w3, count(*) AS k FROM (
       |   SELECT doc_id,
       |     unnest(list_transform(generate_series(1, len(toks) - 2), i -> toks[i])) AS w1,
       |     unnest(list_transform(generate_series(1, len(toks) - 2), i -> toks[i + 1])) AS w2,
       |     unnest(list_transform(generate_series(1, len(toks) - 2), i -> toks[i + 2])) AS w3
       |   FROM (SELECT doc_id, ${duckTerms("text")} AS toks FROM documents)
       |   WHERE len(toks) >= 3)
       |  GROUP BY 1, 2, 3, 4),
       | c3 AS (SELECT w1, w2, w3, sum(k) AS c3 FROM dt GROUP BY 1, 2, 3),
       | ctx AS (SELECT w1, w2, sum(c3) AS cctx, count(*) AS n3r
       |  FROM c3 GROUP BY 1, 2),
       | ml AS (SELECT w2, w3, count(*) AS n3l FROM c3 GROUP BY 1, 2),
       | mid AS (SELECT w2, count(*) AS n3mid, count(DISTINCT w3) AS n3rt
       |  FROM c3 GROUP BY 1),
       | bt AS (SELECT DISTINCT w1, w2 FROM (
       |   SELECT
       |     unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
       |     unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
       |   FROM (SELECT ${duckTerms("text")} AS toks FROM documents)
       |   WHERE len(toks) >= 2)),
       | cl AS (SELECT w2 AS w3, count(*) AS n1pl FROM bt GROUP BY 1),
       | na AS (SELECT count(*) AS n1pall FROM bt),
       | sc AS (SELECT dt.doc_id, dt.k,
       |   CAST(floor(-1000.0 * ln(
       |     greatest(CAST(c3.c3 AS DOUBLE) - 0.75, 0.0) / ctx.cctx +
       |     (0.75 * ctx.n3r / ctx.cctx) * (
       |       greatest(CAST(ml.n3l AS DOUBLE) - 0.75, 0.0) / mid.n3mid +
       |       (0.75 * mid.n3rt / mid.n3mid) * (CAST(cl.n1pl AS DOUBLE) / na.n1pall)))) AS BIGINT) AS s_mb
       |  FROM dt JOIN c3 ON dt.w1 = c3.w1 AND dt.w2 = c3.w2 AND dt.w3 = c3.w3
       |   JOIN ctx ON dt.w1 = ctx.w1 AND dt.w2 = ctx.w2
       |   JOIN ml ON dt.w2 = ml.w2 AND dt.w3 = ml.w3
       |   JOIN mid ON dt.w2 = mid.w2
       |   JOIN cl ON dt.w3 = cl.w3
       |   CROSS JOIN na)
       | SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_trigrams,
       |  CAST(sum(k * s_mb) // sum(k) AS BIGINT) AS kn3_surprisal_mb
       | FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `q_text_ppl_buckets`' oracle — ONE definition, also graded against
    * the store-served twin. NTile arithmetic mirrored inline (first
    * n%3 terciles hold one extra row — Spark's NTile rule verbatim) so
    * uneven sources cannot drift between engines. */
  private[queries] lazy val pplBucketsCtes =
    s"""pplb_h AS ($heldoutCoreSql),
       | pplb_j AS (SELECT pplb_h.doc_id, d.source, pplb_h.heldout_mb
       |  FROM pplb_h JOIN documents d USING (doc_id)),
       | pplb_r AS (SELECT doc_id, source, heldout_mb,
       |   CAST(row_number() OVER (PARTITION BY source
       |     ORDER BY heldout_mb, doc_id) AS BIGINT) AS rn,
       |   CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM pplb_j),
       | pplb AS (SELECT doc_id, source, heldout_mb,
       |  CASE (CASE WHEN rn <= ((n // 3) + 1) * (n % 3)
       |    THEN (rn - 1) // ((n // 3) + 1) + 1
       |    ELSE (n % 3) + (rn - ((n // 3) + 1) * (n % 3) - 1) // (n // 3) + 1
       |   END) WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       |  END AS ppl_bucket
       | FROM pplb_r)""".stripMargin

  private lazy val pplBucketsOracleSql =
    s"""WITH $pplBucketsCtes
       | SELECT doc_id, source, heldout_mb, ppl_bucket
       | FROM pplb ORDER BY doc_id""".stripMargin

  /** `q_text_classify`'s oracle — ONE definition, also graded against
    * `q_text_classify_served` (the persisted weight-table serving
    * path). */
  private lazy val classifyOracleSql =
    s"""SELECT doc_id, count(*) AS n_terms,
       | CAST(sum(w_milli) AS BIGINT) AS score_milli,
       | 1000 * CAST(sum(w_milli) AS BIGINT) // count(*) AS margin_mpt,
       | CASE WHEN sum(w_milli) > 0 THEN 'keep' ELSE 'drop' END AS label
       | FROM (SELECT doc_id,
       |   CAST('0x' || substr(md5('w#' || CAST(bucket AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000 AS w_milli
       |  FROM (SELECT doc_id,
       |    CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % $ClassifyBuckets AS bucket
       |   FROM (SELECT doc_id, unnest(${duckTerms("text")}) AS term FROM documents)))
       | GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val oracles: Seq[(String, String)] = Seq(
    // The model-served bigram twin shares the inline oracle: one
    // statistic, two serving paths (inline rebuild vs persisted LM).
    "q_text_bigram_served" -> bigramOracleSql,
    "q_text_kn_lm"     -> knOracleSql,
    "q_text_kn_served" -> knOracleSql,
    "q_text_kn3_lm"     -> kn3OracleSql,
    "q_text_kn3_served" -> kn3OracleSql,
    // Perplexity terciles: NTile arithmetic mirrored inline (first
    // n%3 terciles hold one extra row — Spark's NTile rule verbatim)
    // so uneven sources cannot drift between engines. The served twin
    // shares the oracle verbatim (one statistic, two serving paths).
    "q_text_ppl_buckets" -> pplBucketsOracleSql,
    "q_text_ppl_buckets_served" -> pplBucketsOracleSql,
    // md5 per-source order, native ntile (= Spark's NTile arithmetic,
    // the curriculum precedent), first-bucket vocab attribution,
    // running sums over the O(sources·4) frame.
    "q_text_heaps" ->
      s"""WITH d AS (SELECT doc_id, source, md5(CAST(doc_id AS STRING)) AS rk,
         |   ${duckTerms("text")} AS toks FROM documents),
         | b AS (SELECT doc_id, source, toks,
         |   CAST(len(toks) AS BIGINT) AS n_tok,
         |   CAST(ntile($HeapsBuckets) OVER (PARTITION BY source
         |     ORDER BY rk, doc_id) AS INTEGER) AS bucket
         |  FROM d),
         | pb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |   CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |  FROM b GROUP BY source, bucket),
         | fs AS (SELECT source, min(bucket) AS bucket, term
         |  FROM (SELECT source, bucket, unnest(toks) AS term FROM b)
         |  GROUP BY source, term),
         | vn AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS vocab_new
         |  FROM fs GROUP BY source, bucket),
         | j AS (SELECT pb.source, pb.bucket, pb.n_docs, pb.n_tokens,
         |   coalesce(vn.vocab_new, 0) AS vocab_new
         |  FROM pb LEFT JOIN vn USING (source, bucket))
         | SELECT source, bucket, n_docs, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_tokens_cum,
         |  vocab_new,
         |  CAST(sum(vocab_new) OVER (PARTITION BY source ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS vocab_cum,
         |  CAST(1000000 * sum(vocab_new) OVER (PARTITION BY source
         |      ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    // greatest(sum(n_tokens) OVER (PARTITION BY source ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1) AS BIGINT)
         |    AS vocab_per_mtok
         | FROM j ORDER BY source, bucket""".stripMargin,
    "q_text_lexical" ->
      s"""WITH tf AS (
         |  SELECT source, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT source, unnest(${duckTerms("text")}) AS term FROM documents)
         |  GROUP BY source, term)
         | SELECT source,
         |  CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         |  CAST(1000000 * count(*) // sum(tf) AS BIGINT) AS ttr_ppm,
         |  CAST(1000000 * sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS hapax_ppm
         | FROM tf GROUP BY source
         | ORDER BY source""".stripMargin,
    "q_text_bpe_tokenize" ->
      s"""WITH bt AS ($duckBpeDocTokens)
         | SELECT doc_id, n_ws_tokens, n_bpe_tokens
         | FROM bt ORDER BY doc_id""".stripMargin,
    "q_text_bpe_fertility" ->
      s"""WITH tf AS (
         |  SELECT source, t AS term, count(*) AS tf
         |  FROM (SELECT source, unnest(${duckTerms("text")}) AS t FROM documents)
         |  GROUP BY 1, 2),
         | vocab AS (
         |  SELECT term, ${bpeCountExpr("term", spark = false)} AS n_sub
         |  FROM (SELECT DISTINCT term FROM tf))
         | SELECT source,
         |  CAST(sum(tf) AS BIGINT) AS n_ws_tokens,
         |  CAST(sum(tf * n_sub) AS BIGINT) AS n_bpe_tokens,
         |  CAST(1000000 * sum(tf * n_sub) // sum(tf) AS BIGINT) AS fertility_ppm
         | FROM tf JOIN vocab USING (term)
         | GROUP BY source ORDER BY source""".stripMargin,
    "q_text_bpe_pairs" ->
      s"""WITH wf AS (
         |  SELECT t AS term, count(*) AS freq
         |  FROM (SELECT unnest(${duckTerms("text")}) AS t FROM documents)
         |  GROUP BY 1),
         | pairs AS (
         |  SELECT substr(term, i, 1) || ' ' || substr(term, i + 1, 1) AS pair, freq
         |  FROM (SELECT term, freq,
         |     unnest(generate_series(1, len(term) - 1)) AS i
         |    FROM wf WHERE len(term) >= 2))
         | SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
         | FROM pairs GROUP BY pair
         | ORDER BY cnt DESC, pair ASC LIMIT $BpeTopPairs""".stripMargin,
    "q_text_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |   list_filter(string_split(${duckClean("text")}, ' '), w -> w <> '') AS toks
         |  FROM documents),
         | sized AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |   1 + (greatest(0, len(toks) - $ChunkSize) + $ChunkStride - 1) // $ChunkStride AS n_chunks
         |  FROM toks WHERE len(toks) >= 1),
         | chunks AS (
         |  SELECT doc_id, toks, n,
         |   unnest(generate_series(1, n_chunks)) AS chunk_id
         |  FROM sized),
         | bounds AS (
         |  SELECT doc_id, toks, n, chunk_id,
         |   1 + (chunk_id - 1) * $ChunkStride AS tok_start
         |  FROM chunks)
         | SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(tok_start AS BIGINT) AS tok_start,
         |  CAST(least(n, tok_start + ${ChunkSize - 1}) - tok_start + 1 AS BIGINT) AS n_tok,
         |  md5(array_to_string(list_slice(toks, tok_start,
         |    least(n, tok_start + ${ChunkSize - 1})), ' ')) AS chunk_fp
         | FROM bounds ORDER BY doc_id, chunk_id""".stripMargin,
    "q_text_editdist" ->
      s"""SELECT doc_id,
         | CAST(levenshtein(substr(text, 1, 40),
         |   substr(${duckClean("text")}, 1, 40)) AS INTEGER) AS edit40
         | FROM documents ORDER BY doc_id""".stripMargin,
    "q_f_clean_chain" ->
      s"""SELECT doc_id, ${duckClean("text")} AS cleaned,
         | CAST(length(regexp_replace(text, '[\\p{C}]', '', 'g')) AS INTEGER) AS n_printable
         | FROM documents ORDER BY doc_id""".stripMargin,
    "q_f_extract" ->
      s"""SELECT doc_id,
         | coalesce(array_to_string(regexp_extract_all(text, '@([A-Za-z0-9_]+)', 1), ','), '') AS mentions,
         | coalesce(array_to_string(regexp_extract_all(text, '#(\\w+)', 1), ','), '') AS hashtags,
         | coalesce(array_to_string(regexp_extract_all(text, '\\b(s[a-z]+)', 1), ','), '') AS s_words
         | FROM documents ORDER BY doc_id""".stripMargin,
    "q_p6_keyword_filter" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         | WHERE regexp_matches(lower(text), '\\b(${Keywords.mkString("|")})\\b')
         | ORDER BY doc_id""".stripMargin,
    "q_p2_json_envelope" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        | event_type FROM events ORDER BY event_id""".stripMargin,
    "q_d4_time_features" ->
      """SELECT event_id,
        | CAST(year(ts) AS INTEGER) AS year, CAST(month(ts) AS INTEGER) AS month,
        | CAST(dayofmonth(ts) AS INTEGER) AS day, CAST(hour(ts) AS INTEGER) AS hour,
        | CAST(minute(ts) AS INTEGER) AS minute, CAST(second(ts) AS INTEGER) AS second,
        | CAST(dayofweek(ts) + 1 AS INTEGER) AS day_of_week,
        | CAST(dayofyear(ts) AS INTEGER) AS day_of_year,
        | CAST(floor(epoch(ts)) AS BIGINT) AS unix_secs
        | FROM events ORDER BY event_id""".stripMargin,
    "q_d_trunc" ->
      """SELECT event_id,
        | date_trunc('month', ts) AS month_start,
        | date_trunc('week', ts) AS week_start,
        | CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_since,
        | last_day(ts) AS month_end
        | FROM events ORDER BY event_id""".stripMargin,
    "q_d_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour FROM events WHERE user_id < 5),
        | c AS (SELECT user_id, hour, count(*) AS n FROM e GROUP BY 1, 2),
        | b AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM e GROUP BY 1),
        | g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b)
        | SELECT g.user_id, g.hour, coalesce(c.n, 0) AS n_events
        | FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.hour = c.hour
        | ORDER BY g.user_id, g.hour""".stripMargin,
    "q_m2_virality" ->
      s"""SELECT event_id AS id, user_id AS author, event_type AS subreddit,
         | CAST(round(value, 2) AS FLOAT) AS score_predit,
         | CASE WHEN value > $ViralityHot THEN 'HOT'
         |      WHEN value > $ViralityUp THEN 'UP' ELSE 'LOW' END AS viralite,
         | ts AS creation_date
         | FROM events ORDER BY id""".stripMargin,
    "q_m3_argmax" ->
      """SELECT vec_id,
        | CAST(list_position(embedding, list_max(embedding)) - 1 AS INTEGER) AS top_dim,
        | label FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_j1_topic_label" ->
      """SELECT vec_id, topic_id, coalesce(label, 'Sujet ' || topic_id) AS sujet
        | FROM (SELECT vec_id,
        |   CAST((list_position(embedding, list_max(embedding)) - 1) % 8 AS INTEGER) AS topic_id
        |   FROM embeddings) e
        | LEFT JOIN (VALUES (0, 'btc-price-moon'), (1, 'eth-gas-defi'),
        |   (2, 'market-crash-fed'), (3, 'wallet-exchange-fees'),
        |   (4, 'nft-art-mint'), (5, 'doge-meme-elon')) t(tid, label)
        | ON topic_id = tid ORDER BY vec_id""".stripMargin,
    "q_a3_vocabulary" ->
      s"""SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
         | FROM (SELECT doc_id, unnest(${duckTerms("text")}) AS term FROM documents)
         | GROUP BY term HAVING count(DISTINCT doc_id) >= 3
         | ORDER BY tf DESC, term LIMIT 100""".stripMargin,
    "q_u1_sentiment" -> {
      val pos = graft.ml.LexiconSentiment.Positive.map(w => s"'$w'").mkString(", ")
      val neg = graft.ml.LexiconSentiment.Negative.map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id,
         | CASE WHEN p > n THEN 'positive' WHEN p < n THEN 'negative'
         |      ELSE 'neutral' END AS sentiment
         | FROM (SELECT doc_id,
         |   len(list_filter(toks, w -> w IN ($pos))) AS p,
         |   len(list_filter(toks, w -> w IN ($neg))) AS n
         |   FROM (SELECT doc_id, string_split(${duckClean("text")}, ' ') AS toks
         |         FROM documents))
         | ORDER BY doc_id""".stripMargin
    },
    "q_text_langid" ->
      s"$duckLangId ORDER BY doc_id",
    "q_text_langid_eval" ->
      s"""SELECT lang, predicted, count(*) AS n FROM ($duckLangId)
         | GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "q_text_quality" ->
      s"""SELECT doc_id,
         | CAST(len(toks_all) AS INTEGER) AS n_tokens,
         | CAST(length(text) AS INTEGER) AS n_chars_raw,
         | CAST(10000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) // length(text) AS BIGINT) AS alpha_bp,
         | CAST(10000 * length(regexp_replace(text, '[^0-9]', '', 'g')) // length(text) AS BIGINT) AS digit_bp,
         | CAST(10000 * (len(toks_all) - len(toks)) // len(toks_all) AS BIGINT) AS stopword_bp
         | FROM (SELECT doc_id, text,
         |   list_filter(string_split(${duckClean("text")}, ' '), w -> w <> '') AS toks_all,
         |   ${duckTerms("text")} AS toks
         |   FROM documents) ORDER BY doc_id""".stripMargin,
    "q_text_tokencount" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(text, '\s+')) AS INTEGER) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]', 0)) AS INTEGER) AS bpe_tokens
        | FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp_raw,
         | md5(array_to_string(list_sort(list_distinct(${duckTerms("text")})), ' ')) AS fp_content
         | FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_winnow" ->
      s"""WITH $duckWinnowCtes
         | SELECT doc_id, max(n) AS n_grams,
         |  CAST(count(DISTINCT wmin) AS BIGINT) AS n_selected,
         |  md5(array_to_string(list_sort(list_distinct(list(wmin))), ' ')) AS fp_winnow
         | FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Pair-family oracles wrap the brute-force SQL in the shared
    // order-independent digest emission (Tables.duckDigest) — see the
    // DedupQueries oracle block for the contract.
    "q_text_winnow_pairs" -> Tables.duckDigest(
      s"""WITH $duckWinnowCtes,
         | sel AS (SELECT DISTINCT doc_id, wmin FROM s),
         | kept AS (SELECT doc_id, wmin FROM sel
         |  WHERE wmin IN (SELECT wmin FROM sel GROUP BY wmin
         |                 HAVING count(*) <= $WinnowPairHubDf))
         | SELECT x.doc_id AS doc1, y.doc_id AS doc2, count(*) AS n_shared
         | FROM kept x JOIN kept y ON x.wmin = y.wmin AND x.doc_id < y.doc_id
         | GROUP BY 1, 2 HAVING count(*) >= $WinnowPairMinShared""".stripMargin,
      Seq("doc1", "doc2", "n_shared")),
    "q_dedup_spans" -> Tables.duckDigest(
      s"""WITH $duckSpanCtes
         | SELECT doc1, doc2, start1, start2, span_toks FROM sp""".stripMargin,
      Seq("doc1", "doc2", "start1", "start2", "span_toks")),
    "q_dedup_span_apply" -> Tables.duckDigest(
      s"""WITH $duckSpanCtes,
         | v AS (SELECT doc2 AS doc_id, start2 AS s,
         |   start2 + span_toks - 1 AS e FROM sp),
         | pw AS (SELECT doc_id, s, e,
         |   max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
         |  FROM v),
         | gi AS (SELECT doc_id, s, e,
         |   sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
         |     OVER (PARTITION BY doc_id ORDER BY s, e
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM pw),
         | mg AS (SELECT doc_id, grp, min(s) AS ms, max(e) AS me
         |  FROM gi GROUP BY doc_id, grp),
         | agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |   CAST(sum(me - ms + 1) AS BIGINT) AS dup_toks
         |  FROM mg GROUP BY doc_id)
         | SELECT a.doc_id AS doc_id, CAST(len(tk.toks) AS BIGINT) AS n_toks,
         |  dup_toks, CAST(len(tk.toks) AS BIGINT) - dup_toks AS kept_toks,
         |  n_spans
         | FROM agg a JOIN tk ON a.doc_id = tk.doc_id""".stripMargin,
      Seq("doc_id", "n_toks", "dup_toks", "kept_toks", "n_spans")),
    "q_dedup_footprint" ->
      s"""WITH $duckSpanCtes,
         | v AS (SELECT doc2 AS doc_id, start2 AS s,
         |   start2 + span_toks - 1 AS e FROM sp),
         | pw AS (SELECT doc_id, s, e,
         |   max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
         |  FROM v),
         | gi AS (SELECT doc_id, s, e,
         |   sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
         |     OVER (PARTITION BY doc_id ORDER BY s, e
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM pw),
         | mg AS (SELECT doc_id, grp, min(s) AS ms, max(e) AS me
         |  FROM gi GROUP BY doc_id, grp),
         | agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |   CAST(sum(me - ms + 1) AS BIGINT) AS dup_toks
         |  FROM mg GROUP BY doc_id),
         | alltok AS (SELECT source, doc_id,
         |   CAST(len(${duckTerms("text")}) AS BIGINT) AS n_toks
         |  FROM documents)
         | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN a.n_spans IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_affected,
         |  CAST(sum(n_toks) AS BIGINT) AS n_toks,
         |  CAST(coalesce(sum(a.dup_toks), 0) AS BIGINT) AS dup_toks,
         |  CAST(1000000 * coalesce(sum(CAST(a.dup_toks AS HUGEINT)), 0)
         |    // sum(n_toks) AS BIGINT) AS dup_ppm
         | FROM alltok t LEFT JOIN agg a USING (doc_id)
         | GROUP BY source ORDER BY source""".stripMargin,
    "q_text_bm25" -> {
      val tfDefs = Bm25Terms.zipWithIndex.map { case (term, i) =>
        s"CAST(len(list_filter(toks, w -> w = '$term')) AS BIGINT) AS tf_$i"
      }.mkString(",\n |   ")
      val dfAggs = Bm25Terms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i").mkString(", ")
      val contribs = Bm25Terms.indices.map { i =>
        val c = graft.ops.Bm25.contribSql(
          graft.ops.Bm25.idfUnSql("n_docs", s"df_$i"),
          "a_milli", s"tf_$i", "dl", "//")
        s"CASE WHEN tf_$i > 0 THEN $c ELSE 0 END"
      }.mkString(" + ")
      val nHit = Bm25Terms.indices
        .map(i => s"CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH base AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         |   $tfDefs
         |  FROM (SELECT doc_id, ${duckTerms("text")} AS toks FROM documents)
         |  WHERE len(toks) > 0),
         | st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS dl_sum, $dfAggs FROM base),
         | sc AS (SELECT doc_id, dl, CAST(($nHit) AS INTEGER) AS n_hit,
         |   ($contribs) AS score_un
         |  FROM base CROSS JOIN (SELECT *, ${graft.ops.Bm25.aMilliSql("dl_sum", "n_docs", "//")} AS a_milli FROM st))
         | SELECT doc_id, dl, n_hit, score_un FROM sc WHERE score_un > 0
         | ORDER BY score_un DESC, doc_id LIMIT $Bm25TopK""".stripMargin
    },
    "q_text_source_kl" ->
      s"""WITH tf AS (SELECT source, t AS term, count(*) AS k
         |  FROM (SELECT source, unnest(${duckTerms("text")}) AS t FROM documents)
         |  GROUP BY 1, 2),
         | c AS (SELECT term, CAST(sum(k) AS BIGINT) AS ck FROM tf GROUP BY 1),
         | st AS (SELECT source, CAST(sum(k) AS BIGINT) AS tsrc FROM tf GROUP BY 1),
         | tot AS (SELECT CAST(sum(k) AS BIGINT) AS ct FROM tf),
         | m AS (SELECT tf.source, tf.k,
         |   CAST(floor(1000.0 * ln((CAST(k AS DOUBLE) * ct)
         |                          / (CAST(tsrc AS DOUBLE) * ck))) AS BIGINT) AS mln
         |  FROM tf JOIN c USING (term) JOIN st USING (source) CROSS JOIN tot)
         | SELECT source, count(*) AS n_terms,
         |  CAST(sum(k) AS BIGINT) AS n_tokens,
         |  CAST(sum(k * mln) AS BIGINT) // CAST(sum(k) AS BIGINT) AS kl_mln
         | FROM m GROUP BY source ORDER BY source""".stripMargin,
    "q_text_classify" -> classifyOracleSql,
    // The store-served classifier twin shares the inline oracle: the
    // persisted weights ARE the derived table (integer milli, exact in
    // the store's doubles), so one statistic grades both serving paths.
    "q_text_classify_served" -> classifyOracleSql,
    "q_text_repetition" ->
      s"""SELECT doc_id,
         | CAST(len(toks_all) AS INTEGER) AS n_tokens,
         | CASE WHEN len(toks_all) > 0 THEN CAST(10000 * (len(toks_all) - len(list_distinct(toks_all))) // len(toks_all) AS BIGINT) ELSE 0 END AS dup_token_bp,
         | CASE WHEN len(bigrams) > 0 THEN CAST(10000 * (len(bigrams) - len(list_distinct(bigrams))) // len(bigrams) AS BIGINT) ELSE 0 END AS dup_bigram_bp
         | FROM (SELECT doc_id, toks_all,
         |   list_transform(generate_series(1, len(toks_all) - 1), i -> toks_all[i] || ' ' || toks_all[i+1]) AS bigrams
         |  FROM (SELECT doc_id,
         |    list_filter(string_split(${duckClean("text")}, ' '), w -> w <> '') AS toks_all
         |   FROM documents)) ORDER BY doc_id""".stripMargin,
    "q_text_pii" ->
      s"""SELECT doc_id,
         | regexp_replace(regexp_replace(regexp_replace(text,
         |   '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
         |   '${TextOps.IpPattern}', '<IP>', 'g'),
         |   '${TextOps.LongNumPattern}', '<NUM>', 'g') AS scrubbed,
         | CAST(len(regexp_extract_all(text, '${TextOps.EmailPattern}')) AS INTEGER) AS n_emails,
         | CAST(len(regexp_extract_all(text, '${TextOps.IpPattern}')) AS INTEGER) AS n_ips,
         | CAST(len(regexp_extract_all(text, '${TextOps.LongNumPattern}')) AS INTEGER) AS n_longnums
         | FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_gate_ablation" ->
      s"""WITH base AS (SELECT doc_id, text, toks_all,
         |   list_filter(toks_all, w -> w NOT IN ($stopListSql)) AS toks,
         |   list_transform(generate_series(1, len(toks_all) - 1), i -> toks_all[i] || ' ' || toks_all[i+1]) AS bigrams
         |  FROM (SELECT doc_id, text,
         |    list_filter(string_split(${duckClean("text")}, ' '), w -> w <> '') AS toks_all
         |   FROM documents)),
         | fl AS (SELECT
         |   len(toks_all) < $FilterMinTokens AS f_short,
         |   CASE WHEN length(text) > 0
         |    THEN 10000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) // length(text) < $FilterMinAlphaBp
         |    ELSE false END AS f_alpha,
         |   CASE WHEN len(bigrams) > 0
         |    THEN 10000 * (len(bigrams) - len(list_distinct(bigrams))) // len(bigrams) > $FilterMaxDupBigramBp
         |    ELSE false END AS f_rep,
         |   CASE WHEN len(toks_all) > 0
         |    THEN 10000 * (len(toks_all) - len(toks)) // len(toks_all) < $FilterMinStopwordBp
         |    ELSE false END AS f_stop
         |  FROM base),
         | n AS (SELECT *,
         |   CAST(f_short AS INT) + CAST(f_alpha AS INT) + CAST(f_rep AS INT) + CAST(f_stop AS INT) AS n_fired
         |  FROM fl),
         | agg AS (SELECT
         |   CAST(sum(CASE WHEN f_short THEN 1 ELSE 0 END) AS BIGINT) AS sf,
         |   CAST(sum(CASE WHEN f_short AND n_fired = 1 THEN 1 ELSE 0 END) AS BIGINT) AS su,
         |   CAST(sum(CASE WHEN f_short THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         |   CAST(sum(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT) AS af,
         |   CAST(sum(CASE WHEN f_alpha AND n_fired = 1 THEN 1 ELSE 0 END) AS BIGINT) AS au,
         |   CAST(sum(CASE WHEN f_alpha AND NOT f_short THEN 1 ELSE 0 END) AS BIGINT) AS a1,
         |   CAST(sum(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT) AS rf,
         |   CAST(sum(CASE WHEN f_rep AND n_fired = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ru,
         |   CAST(sum(CASE WHEN f_rep AND NOT f_short AND NOT f_alpha THEN 1 ELSE 0 END) AS BIGINT) AS r1,
         |   CAST(sum(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS pf,
         |   CAST(sum(CASE WHEN f_stop AND n_fired = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pu,
         |   CAST(sum(CASE WHEN f_stop AND NOT f_short AND NOT f_alpha AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS p1
         |  FROM n)
         | SELECT * FROM (
         |  SELECT 'too_short' AS rule, sf AS n_flagged, su AS n_uniquely_flagged, s1 AS n_first_failing FROM agg
         |  UNION ALL SELECT 'low_alpha', af, au, a1 FROM agg
         |  UNION ALL SELECT 'repetitive', rf, ru, r1 FROM agg
         |  UNION ALL SELECT 'low_stopword', pf, pu, p1 FROM agg)
         | ORDER BY rule""".stripMargin,
    "q_text_filter" ->
      s"$duckFilterVerdicts ORDER BY doc_id",
    "q_text_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${duckTerms("text")}) AS term FROM documents),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         | n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
         | s AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |    CAST(floor(10000.0 * tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))) AS BIGINT) AS tfidf_bp
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_bp DESC, term) AS rnk FROM s)
         | SELECT doc_id, term, tf, df, tfidf_bp FROM r WHERE rnk <= 3
         | ORDER BY doc_id, tfidf_bp DESC, term""".stripMargin,
    "q_text_heavyhitters" ->
      s"""WITH tok AS (SELECT unnest(${duckTerms("text")}) AS term FROM documents),
         | n AS (SELECT count(*) AS n_total FROM tok)
         | SELECT term, count(*) AS cnt, n_total
         | FROM tok CROSS JOIN n
         | GROUP BY term, n_total
         | HAVING count(*) * $HhK > n_total
         | ORDER BY cnt DESC, term""".stripMargin,
    "q_text_bigram_lm" -> bigramOracleSql,
    "q_text_docsim" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${duckTerms("text")}) AS term FROM documents),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         | n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
         | w AS (
         |  SELECT tf.doc_id, tf.term,
         |    CAST(floor(10000.0 * tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))) AS BIGINT) AS w
         |  FROM tf JOIN df USING (term) CROSS JOIN n
         |  WHERE df.df * 2 <= n.n_docs),
         | topw AS (
         |  SELECT doc_id, term, w FROM (
         |   SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS rnk FROM w)
         |  WHERE rnk <= $DocsimTopTerms)
         | SELECT x.doc_id AS doc1, y.doc_id AS doc2,
         |  count(*) AS n_shared, CAST(sum(x.w * y.w) AS BIGINT) AS dot_bp2
         | FROM topw x JOIN topw y ON x.term = y.term AND x.doc_id < y.doc_id
         | GROUP BY 1, 2
         | ORDER BY dot_bp2 DESC, doc1, doc2 LIMIT $DocsimTopPairs""".stripMargin,
    "q_text_unigram_lp" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${duckTerms("text")}) AS term FROM documents),
         | tf AS (SELECT doc_id, term, count(*) AS k FROM tok GROUP BY 1, 2),
         | tc AS (SELECT term, sum(k) AS cnt FROM tf GROUP BY 1),
         | tot AS (SELECT sum(k) AS t_total FROM tf),
         | sc AS (SELECT tf.doc_id, tf.k,
         |   CAST(floor(-1000.0 * ln(CAST(tc.cnt AS DOUBLE) / tot.t_total)) AS BIGINT) AS surprisal_mb
         |  FROM tf JOIN tc USING (term) CROSS JOIN tot)
         | SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
         |  CAST(sum(k * surprisal_mb) // sum(k) AS BIGINT) AS mean_surprisal_mb
         | FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Spark DIV and DuckDB // both truncate toward zero, so the possibly
    // negative per-doc mean is engine-exact.
    "q_text_heldout_ppl" -> heldoutOracleSql,
    // The model-served twin is graded against the SAME oracle: one
    // statistic, two serving paths (inline rebuild vs persisted LM).
    "q_text_ppl_served" -> heldoutOracleSql,
    "q_text_moore_lewis" -> mooreLewisOracleSql,
    // The two-store served twin is graded against the SAME oracle: one
    // statistic, two serving paths (inline refit vs persisted selectors).
    "q_text_moore_lewis_served" -> mooreLewisOracleSql,
    "q_text_pmi" ->
      s"""WITH tk AS (SELECT ${duckTerms("text")} AS toks FROM documents),
         | uc AS (SELECT w, count(*) AS c FROM
         |   (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
         | n AS (SELECT sum(c) AS n_tok FROM uc),
         | bl AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
         |     i -> toks[i] || ' ' || toks[i+1])) AS bigram
         |   FROM tk WHERE len(toks) >= 2),
         | bc AS (SELECT bigram, count(*) AS c_ab FROM bl GROUP BY bigram
         |   HAVING count(*) >= $PmiMinCount),
         | j AS (SELECT bigram, c_ab,
         |   string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2 FROM bc),
         | p AS (SELECT j.bigram, j.c_ab,
         |   CAST(floor(1000.0 * ln(CAST(j.c_ab * n.n_tok AS DOUBLE) / (u1.c * u2.c))) AS BIGINT) AS pmi_mb
         |  FROM j JOIN uc u1 ON j.w1 = u1.w JOIN uc u2 ON j.w2 = u2.w CROSS JOIN n)
         | SELECT bigram, c_ab, pmi_mb FROM p
         | ORDER BY pmi_mb DESC, bigram LIMIT $PmiTopK""".stripMargin,
    "q_text_stem" ->
      s"""SELECT ${stemCase("w")} AS stem, count(*) AS n
         | FROM (SELECT unnest(${duckTerms("text")}) AS w FROM documents)
         | GROUP BY stem ORDER BY n DESC, stem LIMIT $StemTopK""".stripMargin
  )
}
