package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{TextOps, TokenOps}
import graft.queries.Tables.{t, Q}

/** Deduplication operators for a training-data pipeline (builder brief +
  * SURVEY.md §7.4 M6): exact hash-dedup, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine near-dup.
  *
  * Hash parity across engines: every hash is md5 (identical hex output in
  * Spark and DuckDB); MinHash minimizes md5 hex strings lexicographically
  * (fixed-width hex preserves numeric order), so no engine-specific
  * integer-hash function appears anywhere.
  *
  * Scale shape: all candidate generation is blocked (LSH bands / key
  * buckets) — never an unblocked O(n²) cross join. Exact verification
  * (Jaccard, Hamming, cosine) runs on candidates only.
  */
object DedupQueries {

  /** Default signature width (the graded corpus is calibrated by
    * `q_dedup_minhash_est`; production 0.6-Jaccard dedup typically runs
    * 64–128). Width and banding are PARAMETERS of [[minhashSigs]] /
    * [[minhashBandsOf]] — `DedupQueriesSpec` sweeps 8/16/32 and asserts
    * estimator error shrinks — with defaults pinned to the oracle. */
  private val NumHashes   = 8 // 4 bands × 2 rows
  private val RowsPerBand = 2
  private[queries] def bandsFor(numHashes: Int,
                                rows: Int = RowsPerBand): Seq[(Int, Int)] =
    (1 to numHashes).grouped(rows).map(g => (g.head, g.last)).toSeq
  private val Bands = bandsFor(NumHashes)
  private val SimBits   = 16
  private val JaccardBpThreshold = 6000
  private val HammingMax = 3
  /** Per-doc term-set cap for Jaccard verification: the K lexicographically
    * smallest distinct terms (identical rule in both engines, so the oracle
    * stays exact). Bounds the verify kernel — without it a pathological
    * 10M-distinct-term document makes one row arbitrarily large at scale.
    * Graded corpora sit far below the cap, so there it is a no-op. */
  private val MaxTermsPerDoc = 2048

  // ---- Spark-side building blocks ---------------------------------------

  /** (doc_id, text, …) + de-stopped token array, ≥3 tokens (shingle-able).
    * Frame-based so the persisted [[graft.sim.MinHashIndex]] builds its
    * segments through the SAME tokenize rule as the inline queries. */
  private[graft] def tokenizedOf(docs: DataFrame): DataFrame =
    docs.withColumn("toks", TokenOps.terms(col("text")))
      .where(size(col("toks")) >= 3)

  /** documents + de-stopped token array, ≥3 tokens (shingle-able). The
    * scan is fanned out FIRST: tokenize/shingle/hash are the map-side
    * cost of every sketch below, and a single-split parquet input would
    * run them all on one task. Session-shared (r15): eight dedup
    * consumers (simhash fp, prefix join, cdc chunks, pair rouge,
    * winnow, decontam, dupngrams, source overlap) re-ran the identical
    * regex tokenize per query; the shared table drops `text` (no
    * consumer reads past the token array) and the trailing fanout
    * restores full width for each consumer's shingle/hash map work. */
  private def tokenized(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.sharedFrame(s, dir, "tokenized_docs") {
      tokenizedOf(Tables.fanout(t(s, dir, "documents")))
        .select("doc_id", "lang", "source", "n_chars", "toks")
    })

  /** 3-word shingles (1-based element_at — same indexing as DuckDB). */
  private val shingleExpr =
    "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2)))"

  /** Universal-hash permutation constants: sig_i = min over shingles of
    * (A_i·h32 + B_i) mod P, P = 2³¹−1 (Mersenne prime), A_i/B_i fixed
    * 30-bit primes. ONE md5 per shingle — the base hash is its first 60
    * bits, which both engines read as an int64 (`conv(hex,16,10)` /
    * `CAST('0x'||hex AS BIGINT)`) — then 8 integer multiply-mods replace
    * 8 full md5 passes over the shingle text. At corpus scale that is an
    * 8× cut in hash throughput cost, and the signature shuffle carries 8
    * longs instead of 8 hex strings (4× narrower rows). Overflow-safe by
    * construction: A_i < 2³¹ and h32 < 2³² keep A·h+B under 2⁶³ in both
    * engines. P must be SMALL relative to the product range: A·h32 then
    * wraps the modulus ~2³² times, destroying monotonicity in h32 — with
    * a large P (say 2⁶¹−1) the product wraps at most once, the 8
    * "permutations" share the same argmin shingle, and LSH buckets
    * degenerate (measured: 16 fixpoint iterations instead of 3).
    * Truncating the base hash to 32 bits aliases ~V²/2³³ shingle pairs
    * (identical aliasing in both engines, so the oracle stays exact). */
  private val MinhashP = 2147483647L // 2^31 − 1
  private val MinhashA = Seq(1000000007L, 998244353L, 754974721L, 167772161L,
    469762049L, 1004535809L, 1073741789L, 715827883L)
  private val MinhashB = Seq(433494437L, 299709779L, 179424673L, 613651369L,
    982451653L, 735632797L, 104395303L, 533000401L)

  /** Permutation constants past the 8 hand-picked primes: a splitmix64
    * mix of the index, reduced to [1, P) — same universal-hash family
    * ((a·h + b) mod P needs no prime `a`), deterministic, and still
    * overflow-safe (a < 2³¹). The first 8 stay the fixed primes so the
    * default signatures — and the DuckDB oracle built from the same
    * constants — are unchanged. */
  private def mixConst(i: Long, salt: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L + salt
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^= x >>> 31
    java.lang.Long.remainderUnsigned(x, MinhashP - 1) + 1
  }
  private def hashA(i: Int): Long =
    if (i < MinhashA.size) MinhashA(i) else mixConst(i, 0x5DEECE66DL)
  private def hashB(i: Int): Long =
    if (i < MinhashB.size) MinhashB(i) else mixConst(i, 0xA96619E9L)

  /** Per-doc MinHash signature (sig1..sigN as BIGINT) from any
    * (doc_id, text) frame — ONE definition of the shingle→hash→min
    * kernel, shared by the inline queries and the persisted
    * [[graft.sim.MinHashIndex]] so a store-served signature can never
    * drift from the oracle-graded one. */
  private[graft] def minhashSigsOf(docs: DataFrame,
                                   numHashes: Int = NumHashes): DataFrame = {
    val shingled = tokenizedOf(docs)
      .select(col("doc_id"), explode(expr(shingleExpr)).as("shingle"))
      .select(col("doc_id"),
        (conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long")
          % 4294967296L).as("h32"))
    val aggs = (0 until numHashes).map(i =>
      min((col("h32") * hashA(i) + hashB(i)) % MinhashP).as(s"sig${i + 1}"))
    shingled.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Per-doc MinHash signature over the corpus (sig1..sigN as BIGINT). */
  private def minhashSigs(s: SparkSession, dir: String,
                          numHashes: Int = NumHashes): DataFrame =
    minhashSigsOf(Tables.fanout(t(s, dir, "documents")), numHashes)

  /** LSH banding: (band, key = ':'-joined band signature rows). Band
    * tuples are INCLUSIVE ranges (start, end): every signature row in
    * the range joins the key, so rows-per-band ≥ 3 keeps its middle
    * rows (a head/last-only key would silently widen bucket collision
    * probability past the advertised (1−Jʳ)ᵇ). */
  private[graft] def minhashBandsOf(sigs: DataFrame,
                                    bands: Seq[(Int, Int)] = Bands): DataFrame = {
    val bandStructs = bands.zipWithIndex.map { case ((h1, h2), i) =>
      struct(lit(i + 1).as("b"),
        concat_ws(":", (h1 to h2).map(h => col(s"sig$h")): _*).as("bkey"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bkey").as("bkey"))
  }

  private def minhashBands(s: SparkSession, dir: String): DataFrame =
    minhashBandsOf(minhashSigs(s, dir))

  /** Per-doc SimHash over token md5 hex digits: position p contributes
    * +1 if hex digit ≥ 8 else -1; fingerprint bit = sign of the sum. */
  private def simhashFp(s: SparkSession, dir: String): DataFrame = {
    val highDigits = "89abcdef".map(_.toString)
    val toks = tokenized(s, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
    val aggs = (1 to SimBits).map(p =>
      sum(when(substring(col("h"), p, 1).isin(highDigits: _*), 1).otherwise(-1)).as(s"b$p"))
    val fp = concat((1 to SimBits).map(p =>
      when(col(s"b$p") > 0, "1").otherwise("0")): _*)
    toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  // ---- queries -----------------------------------------------------------

  /** Exact dedup by content hash (hash-groupBy; the scale-out form of
    * `dropDuplicates` — deterministic representative via min). */
  private val exactDedup: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), md5(TextOps.cleanText(col("text"))).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
      .orderBy("fp")

  /** BUILD-ONCE / SERVE-MANY for the whole LSH family: one persisted
    * full-corpus [[graft.sim.MinHashIndex]] per (application, corpus
    * dir) — the sketch pass (one md5 per shingle over the corpus text,
    * the family's dominant cost) runs ONCE at first request, and every
    * pair-derived consumer (`q_dedup_minhash_sig/_pairs/_est`,
    * components, cluster_sizes, triangles, pagerank, apply,
    * lsh_jaccard, pair_rouge) reads the store instead of re-sketching —
    * the `sharedKmeansModel` discipline applied to dedup. Signatures
    * are deterministic and parquet round-trips BIGINTs exactly, so the
    * served frames are bit-identical to the inline pipeline
    * (`MinHashIndexSpec` pins sigs and pairs); oracles unchanged.
    * `q_dedup_incremental` deliberately stays inline — it is the
    * declared inline/served contrast pair of `q_dedup_index_delta`. */
  private val fullMinhashIndexDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def sharedFullMinhashIndex(s: SparkSession,
      dir: String): graft.sim.MinHashIndex = {
    val key = s.sparkContext.applicationId + "|" + dir
    val idir = fullMinhashIndexDirs.getOrElseUpdate(key, {
      val d = java.nio.file.Files.createTempDirectory("graft_mhfull_").toString
      new graft.sim.MinHashIndex(s, d)
        .build(t(s, dir, "documents"), "doc_id", "text")
      d
    })
    new graft.sim.MinHashIndex(s, idir)
  }

  /** MinHash signatures (the per-doc sketch), served from the shared
    * persisted index — bit-identical to the inline build (spec-pinned);
    * the oracle grades the store against a from-scratch rebuild. */
  private val minhashSignatures: Q = (s, dir) =>
    sharedFullMinhashIndex(s, dir).signatures().orderBy("doc_id")

  /** MinHash-LSH candidate pairs (doc1 < doc2) from any band frame. */
  private def candidatesFromBands(bandsRaw: DataFrame): DataFrame = {
    // Materialize the sketch once: the self-join's two branches otherwise
    // re-run the whole shingle→signature pipeline (round-robin fanout
    // upstream defeats exchange reuse). The fanout before the checkpoint
    // undoes AQE's coalescing of the signature aggregate's tiny shuffle —
    // without it the checkpoint pins the pair join to ~1 partition.
    val bands = Tables.fanout(bandsRaw).localCheckpoint(true)
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
  }

  /** MinHash-LSH candidate pairs (doc1 < doc2), unordered — served from
    * the shared persisted index ([[sharedFullMinhashIndex]]): every
    * downstream consumer inherits the one-sketch-pass economics, and
    * the store-vs-inline bit-identity is spec-pinned. */
  private[queries] def minhashCandidates(s: SparkSession, dir: String): DataFrame =
    // Session-shared (r15): ~8 graded consumers (pairs/est/triangles/
    // pagerank/lsh_jaccard/pair_rouge + the pipelines' restricted
    // fixpoints) read the identical candidate set; the banded self-join
    // + distinct over the 64-bucket store ran once per consumer before.
    // Deterministic ⇒ bit-identical (the shared-frame contract).
    Tables.sharedFrame(s, dir, "minhash_cand_pairs") {
      sharedFullMinhashIndex(s, dir).candidatePairs()
    }

  /** MinHash-LSH candidate pairs: docs sharing any band bucket. The join
    * key is (band, bandKey) — shuffle is proportional to bucket sizes,
    * never O(n²). */
  private val minhashPairs: Q = (s, dir) =>
    minhashCandidates(s, dir).orderBy("doc1", "doc2")

  /** Duplicate-cluster formation: connected components over the candidate
    * pair graph by distributed min-label propagation (the step a dedup
    * pipeline runs after pair generation — keep min(doc) per component,
    * drop the rest). Each iteration is two distributed joins; the loop
    * runs on the driver until fixpoint (≤ graph diameter iterations —
    * near-dup clusters are shallow). The oracle computes the same
    * component = min(reachable id) via a recursive CTE. */
  private val dedupComponents: Q = (s, dir) =>
    minhashComponents(s, dir).orderBy("doc_id")

  /** The unrestricted-candidate component labels, session-shared
    * (Tables.sharedFrame): three graded queries (components,
    * cluster_sizes, dedup_apply) consume the identical fixpoint, and
    * the driver loop's ~4 join-rounds per run were repeated per
    * consumer (r15). Deterministic (min reachable id) => bit-identical
    * to inline; the pipeline queries keep their OWN restricted
    * fixpoints (membership changes the graph). */
  private[graft] def sharedMinhashComponents(s: SparkSession,
      dir: String): DataFrame = minhashComponents(s, dir)

  private def minhashComponents(s: SparkSession, dir: String): DataFrame =
    Tables.sharedFrame(s, dir, "minhash_components") {
      connectedComponents(s, minhashCandidates(s, dir))
    }

  /** Near-dup CLUSTER-SIZE histogram — the dedup savings estimator read
    * off the component structure before any removal runs: for each
    * cluster size ≥ 2, how many clusters, how many docs they hold, and
    * how many a min-id keep would delete (size − 1 each). The headline
    * Σ removable is the capacity win dedup buys; the size profile says
    * whether duplication is a few huge mirrors (big-size rows) or broad
    * low-grade copying (size-2 mass) — different remediation. Two
    * O(components)-sized hash aggregates over the fixpoint output;
    * output is O(distinct sizes). */
  private val clusterSizes: Q = (s, dir) =>
    minhashComponents(s, dir)
      .groupBy("component").agg(count(lit(1)).as("sz"))
      .where(col("sz") >= 2)
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum("sz").as("n_docs"),
        sum(col("sz") - 1).as("removable_docs"))
      .orderBy("cluster_size")

  /** The fixpoint itself, over any (doc1, doc2) pair frame. The candidate
    * graph is orders of magnitude smaller than the corpus (pairs, not
    * docs×docs): the loop runs on a reduced shuffle-partition count —
    * derived from the cluster's parallelism, not a literal — so each
    * iteration is a handful of tasks, not sf-sized stages. The override is
    * restored in a `finally`: callers like Bench/Verify catch per-query
    * Throwables and continue, so a leak here would silently cut every
    * subsequent query's parallelism. */
  /** Fixpoint iteration tracing — off by default (library stderr stays
    * clean); set GRAFT_CC_DEBUG=1 to see per-iteration timings. */
  private val ccDebug = sys.env.contains("GRAFT_CC_DEBUG")
  @inline private def ccLog(msg: => String): Unit =
    if (ccDebug) System.err.println(msg)

  private[graft] def connectedComponents(s: SparkSession, pairs: DataFrame): DataFrame =
    connectedComponentsWithIters(s, pairs)._1

  /** The fixpoint loop's edge layout: mirror the pairs and spread them
    * ROUND-ROBIN over the loop's partition count. Key-OBLIVIOUS by
    * design — a power-law hub's edges land evenly regardless of degree,
    * so no iteration task can be dominated by one mega-cluster. This is
    * the rule the skew spec in `DedupQueriesSpec` measures; keeping it
    * here (not inlined in the loop) means the spec pins the SHIPPED
    * spread, not a private copy. */
  private[queries] def spreadEdges(pairs: DataFrame, loopParts: Int): DataFrame =
    pairs
      .union(pairs.select(col("doc2"), col("doc1")))
      .toDF("src", "dst").repartition(loopParts)

  /** The fixpoint plus its iteration count — the count is the pointer-
    * jumping O(log diameter) claim, pinned by the power-law skew spec in
    * `DedupQueriesSpec` (a star-hub + long-chain mega-cluster must
    * converge logarithmically, not walk the chain). */
  private[queries] def connectedComponentsWithIters(
      s: SparkSession, pairs: DataFrame): (DataFrame, Int) = {
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    var edges: DataFrame = null
    try {
      // Loop sizing: edges ≈ 2×pairs rows, tiny per-row payload. 1/8 of
      // defaultParallelism keeps iterations at a few tasks on local[32]
      // (the round-1 measured sweet spot) and still spreads a
      // billion-edge graph across a 4000-core cluster (500 partitions).
      val loopParts = math.max(1, s.sparkContext.defaultParallelism / 8)
      s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
      val t0 = System.nanoTime()
      // The union references `pairs` twice; materialize the (possibly
      // expensive) candidate subtree once before mirroring it.
      val p = pairs.localCheckpoint(true)
      edges = spreadEdges(p, loopParts).persist()
      // localCheckpoint (not persist): an iterative DataFrame loop grows
      // the logical plan each round — caching cuts re-EXECUTION but not
      // re-ANALYSIS, so planning time compounds. Checkpointing truncates
      // the lineage, keeping each iteration's plan constant-size.
      // Seed labels with min(self, min neighbor) instead of self: the
      // same shuffle the old distinct() paid (groupBy src) already folds
      // iteration 1's propagate step into the init, so shallow LSH
      // cluster graphs converge one full join-chain earlier (round 15;
      // the fixpoint and its value are unchanged — min over reachable
      // ids is order-insensitive).
      var labels = edges.groupBy(col("src").as("doc_id"))
        .agg(min(col("dst")).as("m"))
        .select(col("doc_id"),
          least(col("doc_id"), col("m")).as("label")).localCheckpoint(true)
      var changed = 1L
      var iter = 0
      ccLog(f"[cc] edges+labels init: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      while (changed > 0 && iter < 25) {
        val ti = System.nanoTime()
        // Propagate: label(x) := min(label(x), min over neighbors' labels).
        val nbrMin = edges.join(labels, edges("dst") === labels("doc_id"))
          .groupBy("src").agg(min("label").as("nbr_label"))
        val propagated = labels.join(nbrMin, labels("doc_id") === nbrMin("src"), "left")
          .select(labels("doc_id"),
            least(labels("label"), coalesce(col("nbr_label"), labels("label"))).as("label"))
        // Compress (pointer jumping): label(x) := label(label(x)) — every
        // label is itself a node id, so one self-join halves path lengths
        // and the loop converges in O(log diameter) instead of O(diameter).
        val jumped = propagated.toDF("doc_id", "l1").as("a")
          .join(propagated.toDF("pid", "l2").as("b"), col("l1") === col("pid"))
          .select(col("doc_id"), least(col("l1"), col("l2")).as("label"))
        // Fuse the convergence check into the checkpointed frame: the
        // old-label join runs once inside the materialization and the
        // count is then a scan of the cached RDD — one fewer distributed
        // join job per iteration than checkpointing first and joining
        // labels again for `changed`.
        val next = jumped.toDF("doc_id", "new_label")
          .join(labels.select(col("doc_id"), col("label").as("old_label")), "doc_id")
          .select(col("doc_id"), col("new_label").as("label"),
            (col("new_label") =!= col("old_label")).as("chg"))
          .localCheckpoint(true)
        changed = next.where(col("chg")).count()
        labels = next.select("doc_id", "label")
        iter += 1
        ccLog(f"[cc] iter $iter: changed=$changed ${(System.nanoTime() - ti) / 1e9}%.2f s")
      }
      // No ordering imposed here: callers that JOIN against the labels
      // (dedup-apply, the curation pipeline) must not pay a global sort;
      // the components query orders its own output.
      (labels.select(col("doc_id"), col("label").as("component")), iter)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (edges != null) edges.unpersist()
    }
  }

  /** SimHash fingerprints, session-shared: the sketch pass (one md5 per
    * token) runs once per corpus for both simhash consumers. */
  private def simhashShared(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.sharedFrame(s, dir, "simhash")(simhashFp(s, dir)))

  /** SimHash fingerprints (16-bit sign sketch). */
  private val simhashFingerprints: Q = (s, dir) =>
    simhashShared(s, dir).orderBy("doc_id")

  /** SimHash near-dup pairs: block on either fingerprint half (a pair
    * within Hamming ≤ 8 shares at least one exact half — pigeonhole), then
    * verify exact Hamming ≤ HammingMax on candidates only.
    *
    * Perf shape: Hamming distance is popcount(xor) over the fingerprint
    * as an integer, not 16 per-character substring compares; the Hamming
    * filter runs BEFORE the dedup-distinct so the exchange only carries
    * surviving pairs. The band self-join is a shuffle equi-join on
    * (band, bucket) — shuffle ∝ bucket sizes, and AQE re-plans it to a
    * broadcast join at runtime iff the build side measures small, so the
    * plan has no O(corpus)-broadcast ceiling at 100×. */
  private val simhashPairs: Q = (s, dir) =>
    Tables.resultDigest(simhashPairsFrame(s, dir),
      Seq("doc1", "doc2", "hamming"))

  private[graft] def simhashPairsFrame(s: SparkSession,
      dir: String): DataFrame = {
    val fp = simhashShared(s, dir)
      .withColumn("fpl", conv(col("simhash"), 2, 10).cast("long"))
    def half(c: Column, i: Int) = substring(c, 1 + 8 * i, 8)
    // One banded self-join instead of a union of two (same minhash-LSH
    // shape): explode each fingerprint into its two half-buckets, join
    // on (band, bucket). A pair sharing both halves surfaces twice →
    // distinct after the Hamming filter (which runs pre-exchange).
    // Fanout before the checkpoint: the fingerprint aggregate's tiny
    // shuffle gets AQE-coalesced, and without the explicit repartition the
    // checkpoint would pin the banded pair join to those few partitions.
    val bands = Tables.fanout(fp.select(col("doc_id"), col("fpl"),
      posexplode(array(half(col("simhash"), 0), half(col("simhash"), 1)))
        .as(Seq("b", "bkey"))))
      .localCheckpoint(true) // fingerprint agg computed once, not per join side
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        bit_count(col("x.fpl").bitwiseXOR(col("y.fpl"))).as("hamming"))
      .where(col("hamming") <= HammingMax)
      .distinct()
  }

  /** N-gram (token-set) Jaccard near-dup, blocked by lang; similarity as
    * exact integer basis points (10000·|∩| DIV |∪|) — cross-engine-safe.
    * At 100 TB the lang block is replaced by the MinHash-LSH candidates
    * above; the verification expression is unchanged.
    *
    * Perf shape: |∪| is derived as |A|+|B|−|∩| so each candidate pair pays
    * ONE sorted-merge intersect instead of intersect+union (the sizes are
    * precomputed per doc, not per pair). The pair join is a plain shuffle
    * equi-join on the block key — AQE turns it into a broadcast join at
    * runtime iff the build side measures small, so there is no O(corpus)
    * broadcast ceiling at scale. */
  /** Per-doc hashed term sets for Jaccard verification: distinct terms,
    * capped at the MaxTermsPerDoc lexicographically-smallest BEFORE hashing
    * (both engines apply the same rule, so the oracle stays exact), then
    * feature-hashed to sorted long ids (xxhash64). The per-pair intersect
    * runs on primitive long arrays (two-pointer merge, no per-element
    * string hashing) and no dictionary structure is ever built — fully
    * map-side, no global ordering, no driver state. Term→id must stay
    * injective on the corpus vocabulary for Jaccard to be exact; a 64-bit
    * hash collides with probability ~V²/2⁶⁵ (≈5e-5 at a billion-term
    * vocabulary). The production audit is one aggregation —
    * count(DISTINCT term) = count(DISTINCT xxhash64(term)) — asserted over
    * this corpus in DedupQueriesSpec. Terms are cleaned ASCII, so Spark's
    * binary-UTF8 sort and DuckDB's varchar sort agree. */
  private[queries] def termSets(s: SparkSession, dir: String): DataFrame =
    // Session-shared: five graded consumers (ngram_jaccard, containment,
    // prefix_join, lsh_jaccard, minhash_est) attach these term sets —
    // the tokenize+sort+hash pass runs once per corpus, not per query
    // (arrays of longs parquet-round-trip exactly; oracles unchanged).
    Tables.fanout(Tables.sharedFrame(s, dir, "termsets") {
      Tables.fanout(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          explode(array_distinct(TokenOps.terms(col("text")))).as("term"))
        .groupBy("doc_id", "lang")
        .agg(slice(array_sort(collect_set(col("term"))), 1, MaxTermsPerDoc).as("terms"))
        .select(col("doc_id"), col("lang"),
          array_sort(transform(col("terms"), tm => xxhash64(tm))).as("tset"))
        .withColumn("n", size(col("tset")))
    })
  // The TRAILING fanout is load-bearing: the term-set aggregate's shuffle
  // output is tiny at bench scale, so AQE coalesces its final stage to ~1
  // partition — and the checkpoint downstream then pins the PAIR JOIN
  // (the kernel-heavy O(bucket²) stage) to that single task. An explicit
  // round-robin repartition is exempt from AQE coalescing, keeping the
  // verify kernels spread across all cores (measured 3.1 s → ~1.4 s on
  // q_dedup_ngram_jaccard at sf0.1).

  /** Fused two-pointer sorted-intersection codegen expression. */
  private def interSize(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.toColumn(
      graft.functions.SortedIntersectionSize(
        org.apache.spark.sql.graftshim.ColumnShim.toExpression(a),
        org.apache.spark.sql.graftshim.ColumnShim.toExpression(b)))

  /** Every term-set element ranked within its doc by the global canonical
    * order (document frequency ASC, hash ASC — so each doc's earliest
    * positions hold its RAREST terms). One df aggregate (vocabulary-sized)
    * + one doc_id-partitioned window; both the prefix filter and the
    * PPJoin positional filter read `pos` from this single frame, so the
    * position bookkeeping adds zero extra shuffles over a plain prefix
    * build. Shared by the Jaccard and containment candidate generators. */
  private[queries] def rankedTerms(d: DataFrame,
      dfreqIn: Option[DataFrame] = None): DataFrame = {
    val toks = d.select(col("doc_id"), col("lang"), col("n"),
      explode(col("tset")).as("h"))
    val dfreq = dfreqIn.getOrElse(toks.groupBy("h").agg(count(lit(1)).as("df")))
    toks.join(dfreq, Seq("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df").asc, col("h").asc)))
      .select("doc_id", "lang", "n", "h", "pos")
  }

  /** Per-doc prefix length for threshold t (basis points): keep positions
    * `pos ≤ n − ⌈t·n/10⁴⌉ + 1`. Any qualifying pair shares ≥ ⌈t·n⌉
    * elements per side, and the canonically-smallest shared element must
    * sit inside this prefix (≥ I−1 shared elements follow it). */
  private def prefixLenFilter(tBp: Int): Column =
    expr(s"pos <= n - (($tBp * n + 9999) DIV 10000) + 1")

  /** Document-frequency profile of a term-set frame: one vocabulary-sized
    * aggregate, shared by the strategy selector and (on the prefix
    * branch) the canonical term ranking — computed once per query. */
  private[queries] def termDf(d: DataFrame): DataFrame =
    d.select(explode(col("tset")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))

  /** COST-BASED STRATEGY SELECTOR for the exact-verify joins: does the
    * prefix-filter candidate join beat the fused all-pairs block join on
    * THIS corpus? The prefix filter's pruning power is bounded by term
    * rarity: its candidate join shuffles ~Σ_h pb(h)² rows, where pb(h)
    * counts docs holding prefix element h. On Zipfian vocabularies
    * (real text) prefixes hold df≈1 terms and the join is near-linear;
    * on a dense corpus the bound collapses — the graded documents table
    * is a 29-term vocabulary where the measured filter is NEAR-OPTIMAL
    * (2.45 M candidates vs 1.80 M true pairs at sf0.1, 1.36×) yet still
    * shuffles 21.3 M pre-filter rows, 4× slower than the fused all-pairs
    * join that streams 12.5 M in-join kernel evals with ZERO extra
    * exchanges. No candidate generator can beat Ω(result) — and when
    * the result itself is Θ(n²)-dense, all-pairs IS the optimal plan.
    *
    * The estimate: take terms in df-ASCENDING order (exactly the order
    * the canonical ranking fills prefixes from) until their total mass
    * reaches the prefix share of all tokens (`prefixFracBp`, ≈(1−t) for
    * Jaccard, (1−T) for containment's small side), and sum df² over
    * that head — an upper bound on the candidate join volume (pb ≤ df).
    * Bucketing df by log2 keeps the profile frame O(64) rows at any
    * vocabulary size (no global sort, no driver-side vocabulary); the
    * one `.collect()` reads those ≤64 rows — AQE-style stats, not data.
    * Prefix wins when the estimate stays under the all-pairs kernel
    * volume n²/4 (measured per-row costs put indifference near n²/5;
    * the regimes sit orders of magnitude apart, so the constant is not
    * load-bearing). Both branches are LOSSLESS — the selector moves
    * time, never results (pinned engine-vs-engine in DedupQueriesSpec,
    * plan shapes per regime in PlanAuditSpec). */
  private[queries] def prefixSelective(dfreq: DataFrame, nDocs: Long,
      prefixFracBp: Int): Boolean = {
    val prof = dfreq
      .groupBy(ceil(log2(col("df"))).cast("int").as("b"))
      .agg(sum(col("df")).as("mass"),
        sum(col("df").cast("double") * col("df")).as("sq"))
      .orderBy("b").collect()
    val total = prof.map(_.getLong(1)).sum
    val budget = prefixFracBp.toLong * total / 10000
    var cum = 0L
    var vol = 0.0
    prof.foreach { r =>
      if (cum < budget) vol += r.getDouble(2)
      cum += r.getLong(1)
    }
    vol < nDocs.toDouble * nDocs / 4
  }

  /** LOSSLESS candidate pairs for Jaccard ≥ t over term sets — the
    * AllPairs/PPJoin construction replacing the language-blocked
    * all-pairs join (the last quadratic-shaped plan in the dedup family):
    *
    *  - prefix filter: J ≥ t forces I ≥ ⌈t·nx⌉ on either side (via the
    *    length bound ny ≥ t·nx), so the smallest common element lands in
    *    both docs' (n − ⌈t·n⌉ + 1)-prefixes — an equi-join on prefix
    *    elements (+ lang, part of the query's block semantics) cannot
    *    miss a qualifying pair;
    *  - length filter: t·max(n1,n2) ≤ min(n1,n2), division-free in bp;
    *  - positional filter (the "PP" in PPJoin): a match at positions
    *    (pa, pb) bounds I ≤ 1 + min(na−pa, nb−pb) (all other shared
    *    elements rank after the smallest one), so rows where that upper
    *    bound cannot reach ⌈t·(na+nb)/(1+t)⌉ are dropped BEFORE the
    *    pair-distinct — lossless because the smallest-common-element row
    *    itself always passes.
    *
    * Scale: df frame is vocabulary-sized and aggregated before joining;
    * the rank window partitions on doc_id (high-cardinality); candidate
    * volume is Σ_h prefix-bucket², bounded by true term sharing among
    * length-compatible same-lang docs — never corpus². The DuckDB oracle
    * stays the brute-force all-pairs join, so every green run proves the
    * filter lossless on the graded corpus (same convention as
    * [[prefixJoinPairs]]). */
  private[queries] def jaccardPrefixCandidates(d: DataFrame, tBp: Int,
      dfreq: Option[DataFrame] = None): DataFrame = {
    // Checkpointed once: both sides of the candidate self-join read it.
    val pfx = rankedTerms(d, dfreq).where(prefixLenFilter(tBp)).localCheckpoint(true)
    pfx.select(col("doc_id").as("doc1"), col("lang"), col("n").as("na"),
        col("pos").as("pa"), col("h"))
      .join(pfx.select(col("doc_id").as("doc2"), col("lang"),
        col("n").as("nb"), col("pos").as("pb"), col("h")), Seq("h", "lang"))
      .where(col("doc1") < col("doc2") &&
        expr(s"10000 * nb >= $tBp * na AND 10000 * na >= $tBp * nb") &&
        expr(s"(1 + least(na - pa, nb - pb)) * ${10000 + tBp} >= $tBp * (na + nb)"))
      .select("doc1", "doc2").distinct()
  }

  /** N-gram (token-set) Jaccard near-dup at T = 0.6, with the candidate
    * strategy chosen per-corpus by [[prefixSelective]]:
    *
    *  - SPARSE (Zipfian vocabulary — real text): candidates from the
    *    lossless prefix filter ([[jaccardPrefixCandidates]]), then two
    *    equi-joins attach the term sets and the fused two-pointer kernel
    *    verifies exactly — near-linear in true phrase sharing, the only
    *    shape that survives 100×;
    *  - DENSE (the selector's measured Σdf² estimate approaches n²):
    *    the fused lang-blocked all-pairs join — when the RESULT is
    *    Θ(n²)-dense no candidate generator can win, and the fused form
    *    pays zero candidate shuffles (measured 4× faster at sf0.1,
    *    where 14% of all pairs qualify).
    *
    * Both branches verify with the same kernel and are individually
    * lossless, so the output (and the all-pairs DuckDB oracle) is
    * branch-independent — similarity as exact integer basis points
    * (10000·|∩| DIV |∪|), cross-engine-safe. */
  private val ngramJaccard: Q = (s, dir) =>
    // Graded as an order-independent digest (Tables.resultDigest): the
    // pair set is fixture-quadratic by design, and the deterministic
    // global sort the row-order oracle compare forced was the one
    // super-linear stage in the timed plan (the round-10 output_bound
    // envelope existed solely to excuse it). Content verification is
    // unchanged in strength — count + per-row 60-bit xor over the same
    // columns, both engines.
    Tables.resultDigest(ngramJaccardPairs(s, dir),
      Seq("doc1", "doc2", "jac_bp"))

  private[graft] def ngramJaccardPairs(s: SparkSession,
      dir: String): DataFrame =
    ngramJaccardPairsOf(termSets(s, dir))

  /** The selective kernel over ANY (doc_id, lang, tset, n) set frame —
    * shared by the graded term-space query and the Zipfian shingle-space
    * scaling fixture ([[ngramJaccardZipfFrame]]), so the selector and
    * both branches are measured exactly as shipped. */
  private[graft] def ngramJaccardPairsOf(d0: DataFrame): DataFrame = {
    val d = d0.localCheckpoint(true)            // one set build, three readers
    val dfreq = termDf(d).localCheckpoint(true) // selector + prefix ranking
    if (prefixSelective(dfreq, d.count(), 10000 - JaccardBpThreshold))
      ngramJaccardPrefixRouted(d, dfreq)
    else ngramJaccardAllPairsFrame(d)
  }

  /** The sparse-regime plan, exposed so specs can pin it engine-vs-engine
    * against the all-pairs twin regardless of what the selector picks on
    * the graded corpus. */
  private[queries] def ngramJaccardPrefixRouted(d: DataFrame,
      dfreq: DataFrame): DataFrame =
    jaccardPrefixCandidates(d, JaccardBpThreshold, Some(dfreq))
      .join(d.select(col("doc_id").as("doc1"), col("tset").as("t1"),
        col("n").as("n1")), Seq("doc1"))
      .join(d.select(col("doc_id").as("doc2"), col("tset").as("t2"),
        col("n").as("n2")), Seq("doc2"))
      .withColumn("inter", interSize(col("t1"), col("t2")))
      .where(col("inter") * lit(10000 + JaccardBpThreshold) >=
        lit(JaccardBpThreshold) * (col("n1") + col("n2")))
      .select(col("doc1"), col("doc2"),
        expr("CAST(10000 * inter DIV (n1 + n2 - inter) AS BIGINT)").as("jac_bp"))

  /** The fused language-blocked all-pairs form — the DENSE-regime branch
    * of [[ngramJaccard]] (kernel runs inside the join condition, so no
    * candidate row is ever materialized or shuffled) and, via the
    * (s, dir) wrapper below, the spec-side exact twin the prefix branch
    * is compared against engine-vs-engine. */
  private[queries] def ngramJaccardAllPairsFrame(d: DataFrame): DataFrame = {
    val inter = interSize(col("x.tset"), col("y.tset"))
    d.as("x").join(d.as("y"),
        col("x.lang") === col("y.lang") && col("x.doc_id") < col("y.doc_id") &&
          inter * lit(10000 + JaccardBpThreshold) >=
            lit(JaccardBpThreshold) * (col("x.n") + col("y.n")))
      .withColumn("inter", inter)
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        expr("CAST(10000 * inter DIV (x.n + y.n - inter) AS BIGINT)").as("jac_bp"))
  }

  private[queries] def ngramJaccardAllPairs(s: SparkSession, dir: String): DataFrame =
    ngramJaccardAllPairsFrame(termSets(s, dir).localCheckpoint(true))
      .orderBy("doc1", "doc2")

  /** Prefix-filter EXACT set-similarity join (the AllPairs/PPJoin
    * family): the candidate generator that is LOSSLESS — where MinHash
    * banding trades recall for pruning, the prefix filter prunes
    * without missing a single qualifying pair. Elements take a global
    * canonical order (document frequency ASC, hash ASC — each doc's
    * prefix carries its RAREST elements, minimizing collisions); for
    * Jaccard ≥ 1/2 two qualifying docs must share ≥ ⌈n/2⌉ elements, so
    * their prefixes of length n DIV 2 + 1 are guaranteed to collide on
    * ≥ 1 element (the classic prefix-filtering theorem). Candidates =
    * equi-join on prefix elements; the exact sorted-merge intersection
    * then applies the division-free threshold 3·I ≥ n1+n2.
    *
    * Joins over SHINGLE sets, not term sets — prefix filtering lives or
    * dies on element sparsity. Measured at sf0.1 (5 K docs): in TERM
    * space the tiny vocabulary makes even the rarest-token prefixes
    * collide everywhere — 12.5 M candidate pairs ≈ the full all-pairs
    * cross, a 58 s query; in 3-word-shingle space (df ≈ 1 for almost
    * every shingle) the same filter yields 447 K candidates (28×
    * fewer) for 256 qualifying pairs. Same portable md5-60-bit shingle
    * hash as [[minhashSigs]], so DuckDB rebuilds identical sets.
    *
    * Scale: the df frame is shingle-vocabulary-sized and aggregated
    * (never joined at full fanout width); the per-doc rank window
    * partitions on doc_id (high-cardinality); the candidate join's
    * volume is Σ prefix-bucket² — bounded by true phrase sharing, not
    * corpus size. The DuckDB oracle is the brute-force all-pairs join
    * at the same threshold, so every green run PROVES the filter
    * lossless on the graded corpus. */
  /** The prefix-filter join kernel over any (doc_id, tset, n) set frame
    * — shared by the declared query and the spec's random-input
    * losslessness property, so the pinned theorem (no qualifying pair
    * escapes the prefix + length filters) tests the SHIPPED filter, not
    * a re-derivation. Caller checkpoints the input. */
  private[queries] def prefixJoinPairs(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"), col("n"), explode(col("tset")).as("h"))
    val dfreq = toks.groupBy("h").agg(count(lit(1)).as("df"))
    // Checkpointed once: both sides of the candidate self-join consume it
    // (without this, the df aggregate + per-doc rank window run twice).
    val prefix = toks.join(dfreq, Seq("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df").asc, col("h").asc)))
      .where(expr("pos <= n DIV 2 + 1"))
      .select("doc_id", "n", "h")
      .localCheckpoint(true)
    // Length filter inside the candidate join (also lossless): J ≥ 1/2
    // forces |∩| ≥ max(n1,n2)/2 and |∩| ≤ min(n1,n2), so sizes must be
    // within 2× of each other — a hub element (boilerplate shingle)
    // shared by d docs contributes only its length-COMPATIBLE pairs,
    // not d²/2.
    val cand = prefix.select(col("doc_id").as("doc1"), col("n").as("na"), col("h"))
      .join(prefix.select(col("doc_id").as("doc2"), col("n").as("nb"), col("h")), Seq("h"))
      .where(col("doc1") < col("doc2") &&
        expr("2 * nb >= na AND 2 * na >= nb"))
      .select("doc1", "doc2").distinct()
    cand
      .join(d.select(col("doc_id").as("doc1"), col("tset").as("t1"),
        col("n").as("n1")), Seq("doc1"))
      .join(d.select(col("doc_id").as("doc2"), col("tset").as("t2"),
        col("n").as("n2")), Seq("doc2"))
      .withColumn("inter", interSize(col("t1"), col("t2")))
      .where(expr("3 * inter >= n1 + n2"))
      .select(col("doc1"), col("doc2"),
        expr("CAST(inter AS BIGINT)").as("inter"),
        expr("CAST(n1 AS BIGINT)").as("n1"),
        expr("CAST(n2 AS BIGINT)").as("n2"),
        expr("CAST(10000 * inter DIV (n1 + n2 - inter) AS BIGINT)").as("jac_bp"))
  }

  private val prefixJaccardJoin: Q = (s, dir) =>
    Tables.resultDigest(prefixJoinFrame(s, dir),
      Seq("doc1", "doc2", "inter", "n1", "n2", "jac_bp"))

  private[graft] def prefixJoinFrame(s: SparkSession,
      dir: String): DataFrame =
    prefixJoinPairs(
      Tables.fanout(tokenized(s, dir)
          .select(col("doc_id"), explode(expr(shingleExpr)).as("shingle"))
          .select(col("doc_id"),
            conv(substring(md5(col("shingle")), 1, 15), 16, 10)
              .cast("long").as("h"))
          .groupBy("doc_id")
          .agg(array_sort(collect_set(col("h"))).as("tset"))
          .withColumn("n", size(col("tset"))))
        .localCheckpoint(true))

  /** SHINGLE-space set frame (doc_id, lang, tset, n) — the Zipfian
    * element space (3-word shingles, df≈1 almost everywhere on real
    * text) the [[prefixSelective]] sparse branch exists for. Same
    * md5-60-bit shingle hash as [[prefixJoinPairs]]'s fixture so DuckDB
    * rebuilds identical sets; session-shared like [[termSets]] (the
    * tokenize+shingle+hash pass runs once per corpus). */
  private[queries] def zipfShingleSets(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.sharedFrame(s, dir, "shinglesets") {
      Tables.fanout(tokenized(s, dir))
        .select(col("doc_id"), col("lang"),
          explode(expr(shingleExpr)).as("shingle"))
        .select(col("doc_id"), col("lang"),
          conv(substring(md5(col("shingle")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .groupBy("doc_id", "lang")
        .agg(array_sort(collect_set(col("h"))).as("tset"))
        .withColumn("n", size(col("tset")))
    })

  /** SPARSE-REGIME ngram Jaccard (`q_dedup_ngram_jaccard_zipf`) — the
    * SAME cost-based selective plan as `q_dedup_ngram_jaccard`, run
    * where exact-verify joins actually live at 100 TB: a Zipfian
    * element space instead of the graded 29-term vocabulary. On this
    * input [[prefixSelective]]'s Σdf² estimate sits orders of magnitude
    * under the all-pairs kernel volume, so the selector routes to the
    * lossless prefix-filter branch (routing pinned in `PlanAuditSpec`;
    * losslessness proven per-run by the brute-force all-pairs oracle).
    * The SCALING block for this key grades the sparse-branch work
    * budget the dense-branch blocks cannot show: prefix candidates must
    * track the RESULT's growth, never corpus² (`prefix_budget` regime —
    * the amplifier manufactures f(f−1)/2 cross-copy near-dup pairs per
    * doc, so output itself is quadratic by fixture and the honest bars
    * are work-per-output-row plus strict output_bound time). */
  private val ngramJaccardZipf: Q = (s, dir) =>
    Tables.resultDigest(ngramJaccardZipfFrame(s, dir),
      Seq("doc1", "doc2", "jac_bp"))

  private[graft] def ngramJaccardZipfFrame(s: SparkSession,
      dir: String): DataFrame =
    ngramJaccardPairsOf(zipfShingleSets(s, dir))

  /** The zipf fixture's prefix-filter CANDIDATE count — the
    * `prefix_budget` metric [[graft.Scaling]] reads OUTSIDE the clock
    * (the `spanCandidateCount` convention): one count over the same
    * candidate generator the timed plan ran, against the same
    * session-shared shingle frame. */
  private[graft] def zipfPrefixCandidateCount(s: SparkSession,
      dir: String): Long = {
    val d = zipfShingleSets(s, dir).localCheckpoint(true)
    // Explicit dfreq, exactly as the routed plan passes it — the
    // metric must count the SAME candidate generator the timed plan
    // ran, through the same input seam.
    jaccardPrefixCandidates(d, JaccardBpThreshold, Some(termDf(d))).count()
  }

  /** Cross-source DUPLICATION MATRIX — the dedup-planning signal read
    * from theta sketches instead of a corpus self-join: one content
    * fingerprint sketch per source (md5 of the cleaned text, the
    * [[exactDedup]] identity), then every pairwise shared-document
    * count comes from sketch INTERSECTION over the O(sources) frame.
    * This is the triage that decides where dedup effort goes ("src3
    * and src7 mirror each other; src9 is clean") without ever joining
    * the corpus against itself — and with persisted per-source
    * sketches ([[graft.stream.SketchIngest]]) it answers from the
    * store alone.
    *
    * Oracle-exactness: per-source distinct fingerprints (≤250 at
    * sf0.1) sit far under the 2^12 exact-mode bound, so estimates ARE
    * the exact distinct counts DuckDB computes ([[ThetaSketch]]
    * scaladoc; same convention as `q_sketch_retention`). At corpus
    * scale the same plan serves ±1.6% estimates — still enough to
    * rank source pairs. */
  /** The matrix kernel over any (source, fp) frame — shared by the
    * declared query and the spec's ESTIMATION-MODE property (drive
    * per-source cardinalities past 2^lgK and the matrix must still rank
    * source pairs correctly within the ±1.6%-rse envelope — the triage
    * decision the query exists to make), so the pinned claim tests the
    * shipped plan, not a re-derivation. */
  private[queries] def overlapMatrix(fps: DataFrame): DataFrame = {
    import graft.functions.ThetaSketch.{estimateCol, intersectionCol, sketchAgg}
    // Checkpointed once: both sides of the pairwise self-join read it.
    val sk = fps
      .groupBy("source").agg(sketchAgg(col("fp")).as("sk"))
      .localCheckpoint(true)
    sk.select(col("source").as("src_a"), col("sk").as("sk_a"))
      .join(sk.select(col("source").as("src_b"), col("sk").as("sk_b")),
        col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        estimateCol(col("sk_a")).as("docs_a"),
        estimateCol(col("sk_b")).as("docs_b"),
        estimateCol(intersectionCol(col("sk_a"), col("sk_b"))).as("shared"))
      .orderBy("src_a", "src_b")
  }

  private val sourceOverlap: Q = (s, dir) =>
    overlapMatrix(Tables.fanout(t(s, dir, "documents"))
      .select(col("source"), md5(TextOps.cleanText(col("text"))).as("fp")))

  /** Content-defined chunk boundary density: 1/16 ⇒ ~16-token expected
    * chunks on this corpus (docs are a few dozen tokens after
    * de-stopping). */
  private val CdcChunkMod = 16

  /** CONTENT-DEFINED chunk fingerprinting — the shift-robust dedup
    * primitive fixed windows lack: [[graft.queries.TextQueries]]'
    * `q_text_chunks` cuts every 8 tokens from the doc head, so ONE
    * inserted sentence shifts every later window and all their
    * fingerprints change; here a token OPENS a new chunk iff its own
    * hash ≡ 0 mod $CdcChunkMod — boundaries depend only on LOCAL
    * content, so an edit changes the fingerprint of the chunk holding
    * it and leaves every other chunk's fp intact (the rsync/LBFS
    * anchoring idea, over tokens). Joining chunk fps across docs then
    * finds shared passages between documents whose heads differ — the
    * copy-with-edits case shingle-set Jaccard scores low and fixed
    * windows miss entirely.
    *
    * Determinism: boundaries and fps use the portable md5 idiom (60-bit
    * hash for the anchor test, md5 text digest for the fp), token order
    * forced by array_sort over (pos, tok) structs. Scale: posexplode +
    * per-doc cumulative sum (window on high-cardinality doc_id) + one
    * hash aggregation — no pair enumeration anywhere; the chunk-fp
    * table is the O(total tokens / mod) index later passage-level joins
    * consume. */
  /** The chunk transform over any (doc_id, toks) frame — shared by the
    * declared query and the spec's shift-robustness property (an edit
    * must change ONE chunk's fp), so the pinned claim tests the shipped
    * rule. */
  private[queries] def cdcChunkFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("boundary", when(
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          % CdcChunkMod === 0, 1L).otherwise(0L))
      .withColumn("chunk", sum("boundary").over(
        Window.partitionBy("doc_id").orderBy(col("pos").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "chunk")
      .agg(count(lit(1)).as("n_toks"),
        (min("pos") + 1).as("tok_start"),
        expr("""md5(array_join(transform(
               |  array_sort(collect_list(struct(pos, tok))),
               |  x -> x.tok), ' '))""".stripMargin).as("chunk_fp"))
      .select(col("doc_id"), col("chunk").as("chunk_idx"),
        col("n_toks"), col("tok_start").cast("long").as("tok_start"),
        col("chunk_fp"))

  /** The chunk table, session-shared by both CDC consumers (one
    * boundary+fingerprint pass per corpus). */
  private def cdcChunksShared(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.sharedFrame(s, dir, "cdc_chunks") {
      cdcChunkFrame(tokenized(s, dir))
    })

  private val cdcChunks: Q = (s, dir) =>
    cdcChunksShared(s, dir).orderBy("doc_id", "chunk_idx")

  /** Substantial-passage floor: chunks shorter than this are too common
    * to signal copying (articles, headers) — both engines filter on it
    * before the fp join. */
  private val MinSharedChunkToks = 8

  /** Shared-passage detection — the consumer of [[cdcChunks]]' index:
    * two docs share a passage iff they share a chunk fingerprint, so
    * copy-with-edits pairs surface from ONE equi-join on the fp column
    * (shuffle ∝ chunk table, never doc pairs; bucket sizes are the
    * number of docs holding that exact passage). Per-doc duplicate fps
    * (a passage repeated WITHIN a doc) are collapsed first so the pair
    * counts mean "distinct shared passages". The substantial-chunk
    * floor keeps trivial short chunks from linking unrelated docs. */
  private val sharedPassages: Q = (s, dir) => {
    // Checkpointed once: both sides of the fp self-join consume it.
    val ch = cdcChunksShared(s, dir)
      .where(col("n_toks") >= MinSharedChunkToks)
      .groupBy("doc_id", "chunk_fp")
      .agg(max("n_toks").as("n_toks"))
      .localCheckpoint(true)
    ch.select(col("doc_id").as("doc1"), col("chunk_fp"), col("n_toks"))
      .join(ch.select(col("doc_id").as("doc2"), col("chunk_fp")), Seq("chunk_fp"))
      .where(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("n_shared_chunks"),
        sum("n_toks").as("shared_toks"))
      .orderBy("doc1", "doc2")
  }

  /** LSH-candidates → exact-Jaccard verification — the 100 TB chain the
    * lang-blocked [[ngramJaccard]] documents: candidate pairs come from
    * MinHash-LSH banding (shuffle ∝ bucket sizes, never O(n²)), then each
    * candidate pays one sorted-merge intersect. Two shuffle equi-joins on
    * doc id attach the per-doc term sets; the candidate side is orders of
    * magnitude smaller than the corpus, so AQE broadcast-promotes it when
    * it measures small. Emits the verified similarity (no threshold) —
    * the downstream filter is policy, the verify kernel is the operator. */
  private val lshJaccard: Q = (s, dir) => {
    val d = termSets(s, dir).localCheckpoint(true) // attached to both pair ends
    minhashCandidates(s, dir)
      .join(d.select(col("doc_id").as("doc1"), col("tset").as("t1"),
        col("n").as("n1")), Seq("doc1"))
      .join(d.select(col("doc_id").as("doc2"), col("tset").as("t2"),
        col("n").as("n2")), Seq("doc2"))
      .withColumn("inter", interSize(col("t1"), col("t2")))
      .select(col("doc1"), col("doc2"),
        expr("CAST(10000 * inter DIV (n1 + n2 - inter) AS BIGINT)").as("jac_bp"))
      .orderBy("doc1", "doc2")
  }

  /** ROUGE-2 qualification of the MinHash-LSH candidate pairs — the
    * n-gram-overlap evidence a near-dup adjudication wants NEXT TO the
    * set-based Jaccard (multiset bigram overlap penalizes repetition
    * and word-order divergence that term-set Jaccard is blind to; it is
    * also the summarization-eval statistic, so the same kernel serves
    * reference-vs-candidate scoring). Per candidate pair: bigram
    * MULTISET intersection Σ min(tf₁, tf₂) and the symmetric F-measure
    * 2·overlap/(n₁+n₂) in basis points — all integer-exact.
    *
    * Scale shape: the per-doc bigram tf frame is built once
    * (checkpointed — it feeds the overlap join twice and the totals),
    * and the overlap join carries (pair, bigram, tf) keyed by
    * (doc, bigram) — shuffle ∝ candidate pairs × doc bigram lists,
    * never corpus². Pairs with no shared bigram (pure band-hash
    * collisions) survive with overlap 0 via the left join — silently
    * dropping them would hide exactly the false-positive rate this
    * report exists to expose. */
  private val pairRouge: Q = (s, dir) =>
    Tables.resultDigest(pairRougeFrame(s, dir),
      Seq("doc1", "doc2", "nb1", "nb2", "overlap2", "rouge2_f_bp"))

  private[graft] def pairRougeFrame(s: SparkSession,
      dir: String): DataFrame = {
    val bg = tokenized(s, dir)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1)))"""
          .stripMargin)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val tot = bg.groupBy("doc_id").agg(sum("tf").as("nb"))
    val pairs = minhashCandidates(s, dir)
    val overlap = pairs
      .join(bg.select(col("doc_id").as("doc1"), col("bg"),
        col("tf").as("tf1")), Seq("doc1"))
      .join(bg.select(col("doc_id").as("doc2"), col("bg"),
        col("tf").as("tf2")), Seq("doc2", "bg"))
      .groupBy("doc1", "doc2")
      .agg(sum(least(col("tf1"), col("tf2"))).as("overlap2"))
    pairs
      .join(tot.select(col("doc_id").as("doc1"), col("nb").as("nb1")), Seq("doc1"))
      .join(tot.select(col("doc_id").as("doc2"), col("nb").as("nb2")), Seq("doc2"))
      .join(overlap, Seq("doc1", "doc2"), "left_outer")
      .select(col("doc1"), col("doc2"), col("nb1"), col("nb2"),
        coalesce(col("overlap2"), lit(0L)).as("overlap2"))
      .withColumn("rouge2_f_bp",
        expr("CAST(10000 * 2 * overlap2 DIV (nb1 + nb2) AS BIGINT)"))
  }

  /** Containment (overlap-coefficient) threshold, basis points. */
  private val ContainmentBpThreshold = 8000

  /** LOSSLESS candidate pairs for containment ≥ T — the asymmetric
    * prefix-vs-full construction. Containment (I / min(n1,n2)) admits NO
    * length-ratio filter (a doc pasted inside a 10× larger one qualifies
    * by design), so the Jaccard symmetric prefix join does not transfer:
    * the larger doc's guaranteed overlap ⌈T·n_min⌉ depends on the
    * UNKNOWN partner size, and its own safe prefix degenerates to the
    * full set. The asymmetric theorem fixes this:
    *
    *   for a qualifying pair with ns ≤ nb, I ≥ ⌈T·ns⌉, so the smallest
    *   common element sits within the SMALLER doc's
    *   (ns − ⌈T·ns⌉ + 1)-prefix — and trivially somewhere in the larger
    *   doc's full element list. Equi-joining small-side prefixes against
    *   the full ranked element frame (+ lang) with ns ≤ nb therefore
    *   cannot miss a qualifying pair.
    *
    * The positional filter still applies (all other shared elements rank
    * after the smallest on BOTH sides): I ≤ 1 + min(ns−ps, nb−pb), so
    * rows where that bound cannot reach ⌈T·ns⌉ drop before the
    * pair-distinct. At T = 0.8 the small-side prefix is ~n/5 — and the
    * full-side frame is consumed as built (no second window): candidate
    * volume is Σ_h prefix-df(h)·df(h) over the rarest fifth of each
    * doc's terms. Pairs are emitted normalized to doc_id order (the
    * size order that drove generation is an implementation detail). */
  private[queries] def containmentPrefixCandidates(d: DataFrame, tBp: Int,
      dfreq: Option[DataFrame] = None): DataFrame = {
    // Checkpointed once: the prefix side is a filter over the same frame
    // the full side consumes, so one df-aggregate + one rank window feed
    // both join inputs.
    val ranked = rankedTerms(d, dfreq).localCheckpoint(true)
    ranked.where(prefixLenFilter(tBp))
      .select(col("doc_id").as("small"), col("lang"), col("n").as("ns"),
        col("pos").as("ps"), col("h"))
      .join(ranked.select(col("doc_id").as("big"), col("lang"),
        col("n").as("nb"), col("pos").as("pb"), col("h")), Seq("h", "lang"))
      .where(col("small") =!= col("big") && col("ns") <= col("nb") &&
        expr(s"(1 + least(ns - ps, nb - pb)) * 10000 >= $tBp * ns"))
      .select(least(col("small"), col("big")).as("doc1"),
        greatest(col("small"), col("big")).as("doc2"))
      .distinct()
  }

  /** Containment near-dup detection — |A∩B| / min(|A|,|B|): the
    * quote/near-superset detector Jaccard misses (a doc pasted inside a
    * 10× larger one has Jaccard ≈ 0.1 but containment ≈ 1.0). Candidate
    * strategy chosen per-corpus by [[prefixSelective]] exactly as in
    * [[ngramJaccard]]: the lossless asymmetric prefix filter
    * ([[containmentPrefixCandidates]]) on sparse vocabularies, the fused
    * all-pairs block join when the corpus is dense enough that the
    * result itself is quadratic. Both branches verify with the same
    * kernel; output and all-pairs DuckDB oracle are branch-independent. */
  private val containment: Q = (s, dir) =>
    Tables.resultDigest(containmentPairs(s, dir),
      Seq("doc1", "doc2", "cont_bp"))

  private[graft] def containmentPairs(s: SparkSession,
      dir: String): DataFrame =
    containmentPairsOf(termSets(s, dir))

  /** The selective containment kernel over ANY (doc_id, lang, tset, n)
    * set frame — the [[ngramJaccardPairsOf]] seam for the asymmetric
    * filter, shared by the graded term-space query and the Zipfian
    * shingle-space fixture. */
  private[graft] def containmentPairsOf(d0: DataFrame): DataFrame = {
    val d = d0.localCheckpoint(true)
    val dfreq = termDf(d).localCheckpoint(true)
    if (prefixSelective(dfreq, d.count(), 10000 - ContainmentBpThreshold))
      containmentPrefixRouted(d, dfreq)
    else containmentAllPairsFrame(d)
  }

  /** SPARSE-REGIME containment (`q_dedup_containment_zipf`) — the
    * [[ngramJaccardZipfFrame]] discipline for the ASYMMETRIC filter:
    * the same selective containment plan over the Zipfian shingle
    * space, where the selector routes to the small-side prefix branch
    * (`containmentPrefixCandidates`'s ns − ⌈T·ns⌉ + 1 bound — the
    * second of the two sparse branches the round-14 audit found only
    * spec-pinned). Its SCALING block shares the `prefix_budget` regime. */
  private val containmentZipf: Q = (s, dir) =>
    Tables.resultDigest(containmentZipfFrame(s, dir),
      Seq("doc1", "doc2", "cont_bp"))

  private[graft] def containmentZipfFrame(s: SparkSession,
      dir: String): DataFrame =
    containmentPairsOf(zipfShingleSets(s, dir))

  /** The containment zipf fixture's prefix-candidate count — the
    * `prefix_budget` metric, [[zipfPrefixCandidateCount]]'s asymmetric
    * twin. */
  private[graft] def zipfContainmentCandidateCount(s: SparkSession,
      dir: String): Long = {
    val d = zipfShingleSets(s, dir).localCheckpoint(true)
    containmentPrefixCandidates(d, ContainmentBpThreshold,
      Some(termDf(d))).count()
  }

  /** The sparse-regime containment plan — spec-pinned against the
    * all-pairs twin independently of the selector's corpus decision. */
  private[queries] def containmentPrefixRouted(d: DataFrame,
      dfreq: DataFrame): DataFrame =
    containmentPrefixCandidates(d, ContainmentBpThreshold, Some(dfreq))
      .join(d.select(col("doc_id").as("doc1"), col("tset").as("t1"),
        col("n").as("n1")), Seq("doc1"))
      .join(d.select(col("doc_id").as("doc2"), col("tset").as("t2"),
        col("n").as("n2")), Seq("doc2"))
      .withColumn("inter", interSize(col("t1"), col("t2")))
      .where(col("inter") * lit(10000) >=
        lit(ContainmentBpThreshold) * least(col("n1"), col("n2")))
      .select(col("doc1"), col("doc2"),
        expr("CAST(10000 * inter DIV least(n1, n2) AS BIGINT)").as("cont_bp"))

  /** Fused all-pairs containment — the dense-regime branch of
    * [[containment]] and (via the wrapper) the spec-side exact twin
    * (mirrors [[ngramJaccardAllPairsFrame]]). */
  private[queries] def containmentAllPairsFrame(d: DataFrame): DataFrame = {
    val inter = interSize(col("x.tset"), col("y.tset"))
    d.as("x").join(d.as("y"),
        col("x.lang") === col("y.lang") && col("x.doc_id") < col("y.doc_id") &&
          inter * lit(10000) >=
            lit(ContainmentBpThreshold) * least(col("x.n"), col("y.n")))
      .withColumn("inter", inter)
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        expr("CAST(10000 * inter DIV least(x.n, y.n) AS BIGINT)").as("cont_bp"))
  }

  private[queries] def containmentAllPairs(s: SparkSession, dir: String): DataFrame =
    containmentAllPairsFrame(termSets(s, dir).localCheckpoint(true))
      .orderBy("doc1", "doc2")

  /** Sketch calibration — MinHash-ESTIMATED Jaccard (matching-signature
    * fraction, the estimator LSH banding is built on) next to the exact
    * sorted-merge value for every candidate pair: the audit that tells
    * you whether 8 hashes are enough for your threshold before you trust
    * the sketch at 100 TB. Pure composition of two verified frames; both
    * sides integer basis points. */
  private val minhashEstimate: Q = (s, dir) => {
    // Signatures AND candidates both come off the shared persisted
    // index — zero sketch work here (the pre-store form checkpointed
    // one signature build to feed both; the store makes even that one
    // build amortized across the whole family).
    val sigs = sharedFullMinhashIndex(s, dir).signatures()
    def side(role: String) = sigs.select(
      col("doc_id").as(role) +:
        (1 to NumHashes).map(i => col(s"sig$i").as(s"${role}_s$i")): _*)
    val matchSql = (1 to NumHashes)
      .map(i => s"CASE WHEN doc1_s$i = doc2_s$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val d = termSets(s, dir).localCheckpoint(true)
    // Signatures and term sets attach to the LSH CANDIDATES only — the
    // estimator is never evaluated on an unblocked pair space.
    minhashCandidates(s, dir)
      .join(side("doc1"), Seq("doc1")).join(side("doc2"), Seq("doc2"))
      .withColumn("est_jac_bp",
        expr(s"CAST(10000 * ($matchSql) DIV $NumHashes AS BIGINT)"))
      .join(d.select(col("doc_id").as("doc1"),
        col("tset").as("t1"), col("n").as("n1")), Seq("doc1"))
      .join(d.select(col("doc_id").as("doc2"),
        col("tset").as("t2"), col("n").as("n2")), Seq("doc2"))
      .withColumn("inter", interSize(col("t1"), col("t2")))
      .select(col("doc1"), col("doc2"), col("est_jac_bp"),
        expr("CAST(10000 * inter DIV (n1 + n2 - inter) AS BIGINT)").as("jac_bp"))
      .orderBy("doc1", "doc2")
  }

  /** Per-doc hashed SHINGLE sets (the space MinHash actually sketches —
    * term sets reorder-invariantly overlap where shingle sets do not, so
    * calibration must compare like with like). Same sorted-long-array
    * form as [[termSets]], fed to the same intersect kernel. */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(tokenized(s, dir)
      .select(col("doc_id"), explode(expr(shingleExpr)).as("shingle"))
      .groupBy("doc_id")
      .agg(array_sort(collect_set(xxhash64(col("shingle")))).as("sset"))
      .withColumn("n", size(col("sset"))))

  /** Width-sweep calibration: mean |estimated − exact| SHINGLE Jaccard
    * (basis points) at `numHashes` signatures. The pair set is
    * width-independent — 1-row bands over the DEFAULT 8 signatures, a
    * high-recall blocking (P ≈ 1−(1−J)⁸) that yields thousands of pairs
    * at sf0.01 — so the estimator's 1/√n tightening dominates
    * pair-sampling noise. `DedupQueriesSpec` sweeps 8/16/32 and asserts
    * the error shrinks — the measurement that justifies moving to
    * production widths (64–128) when the threshold drops. */
  private[queries] def minhashSweepErrorBp(s: SparkSession, dir: String,
                                           numHashes: Int): Double = {
    require(numHashes >= NumHashes, s"sweep width $numHashes < default $NumHashes")
    val sigs = minhashSigs(s, dir, numHashes).localCheckpoint(true)
    def side(role: String) = sigs.select(
      col("doc_id").as(role) +:
        (1 to numHashes).map(i => col(s"sig$i").as(s"${role}_s$i")): _*)
    val matchSql = (1 to numHashes)
      .map(i => s"CASE WHEN doc1_s$i = doc2_s$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val d = shingleSets(s, dir).localCheckpoint(true)
    candidatesFromBands(minhashBandsOf(sigs, bandsFor(NumHashes, rows = 1)))
      .join(side("doc1"), Seq("doc1")).join(side("doc2"), Seq("doc2"))
      .withColumn("est_bp", expr(s"CAST(10000 * ($matchSql) DIV $numHashes AS BIGINT)"))
      .join(d.select(col("doc_id").as("doc1"),
        col("sset").as("t1"), col("n").as("n1")), Seq("doc1"))
      .join(d.select(col("doc_id").as("doc2"),
        col("sset").as("t2"), col("n").as("n2")), Seq("doc2"))
      .withColumn("inter", interSize(col("t1"), col("t2")))
      .agg(avg(abs(col("est_bp") -
        expr("CAST(10000 * inter DIV (n1 + n2 - inter) AS BIGINT)"))))
      .head() match {
        // avg over zero pairs is NULL — surface NaN, not a primitive-getter
        // NPE, so the sweep spec reports "no pairs" instead of crashing.
        case r if r.isNullAt(0) => Double.NaN
        case r => r.getDouble(0)
      }
  }

  /** Triangle counting over the candidate graph — the cluster-density
    * diagnostic next to [[dedupComponents]]: a clique-like component
    * (many triangles) is a true duplicate cluster; a star/chain (few)
    * is band-collision noise chaining unrelated docs — exactly the case
    * to re-verify before [[dedupApply]] drops documents. Classic
    * ordered-edge distributed algorithm: edges already carry doc1<doc2
    * orientation, so two equi-joins enumerate each triangle exactly once
    * (wedge a<b<c closed by edge (a,c)) — shuffle ∝ wedge count, never
    * an all-pairs product; per-node counts are one explode + hash agg.
    * (At corpus scale, orientation by DEGREE instead of id bounds the
    * per-vertex wedge fanout on hubs; id-orientation is the same join
    * shape.) */
  private val dedupTriangles: Q = (s, dir) => {
    val e = minhashCandidates(s, dir).localCheckpoint(true)
    val tri = e.as("ab").join(e.as("bc"), col("ab.doc2") === col("bc.doc1"))
      .select(col("ab.doc1").as("a"), col("ab.doc2").as("b"),
        col("bc.doc2").as("c"))
      .join(e.toDF("a", "c"), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy("doc_id")
  }

  /** The "new batch" source for [[incrementalDedup]] — one of the 20
    * equal-sized source shards plays the freshly-ingested delta. */
  private val NewBatchSource = "src0"

  /** Incremental dedup — the delta-ingestion path a production pipeline
    * actually runs: a 100 TB corpus is NOT re-deduplicated per batch; the
    * new batch's sketches are checked against the standing corpus index.
    * Each new doc gets its corpus-candidate count (LSH band collisions)
    * and a keep/drop decision; new docs with no banded collision pass
    * without ever forming a pair. Scale shape: the band join is a shuffle
    * equi-join on (band, key) — the batch side is small by definition, so
    * AQE broadcast-promotes it against the corpus index (which at scale
    * is a precomputed, bucketed signature table: [[minhashBands]] IS that
    * index's build expression). Short docs (< 3 tokens, no shingles) have
    * no sketch and default to keep. */
  private val incrementalDedup: Q = (s, dir) => {
    val bySource = minhashBands(s, dir)
      .join(t(s, dir, "documents").select("doc_id", "source"), Seq("doc_id"))
    val newBands    = bySource.where(col("source") === NewBatchSource)
    val corpusBands = bySource.where(col("source") =!= NewBatchSource)
    val matches = newBands.as("n").join(corpusBands.as("c"),
        col("n.b") === col("c.b") && col("n.bkey") === col("c.bkey"))
      .select(col("n.doc_id").as("doc_id"), col("c.doc_id").as("corpus_doc"))
      .groupBy("doc_id")
      .agg(countDistinct("corpus_doc").as("n_matches"))
    t(s, dir, "documents").where(col("source") === NewBatchSource)
      .select("doc_id")
      .join(matches, Seq("doc_id"), "left")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
      .withColumn("decision",
        when(col("n_matches") > 0, "drop").otherwise("keep"))
      .orderBy("doc_id")
  }

  /** BUILD-ONCE / PROBE-MANY: one persisted [[graft.sim.MinHashIndex]]
    * per (application, corpus dir), built over the STANDING corpus
    * (every source except [[NewBatchSource]]) on first request — the
    * precomputed signature table [[incrementalDedup]]'s scaladoc
    * promises, made real. Both graded consumers (`q_dedup_index_pairs`,
    * `q_dedup_index_delta`) read it: two queries, one sketch pass.
    * Signatures are deterministic and parquet round-trips BIGINTs
    * exactly, so index-served results are bit-identical to the inline
    * pipeline (pinned in `MinHashIndexSpec`); keyed by applicationId so
    * a fresh session never reads a stale index. */
  private val minhashIndexDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def sharedMinhashIndex(s: SparkSession,
      dir: String): graft.sim.MinHashIndex = {
    val key = s.sparkContext.applicationId + "|" + dir
    val idir = minhashIndexDirs.getOrElseUpdate(key, {
      val d = java.nio.file.Files.createTempDirectory("graft_mhidx_").toString
      new graft.sim.MinHashIndex(s, d).build(
        t(s, dir, "documents").where(col("source") =!= NewBatchSource),
        "doc_id", "text")
      d
    })
    new graft.sim.MinHashIndex(s, idir)
  }

  /** Standing-corpus LSH candidate pairs served from the PERSISTED index
    * (no sketch pass — the `q_dedup_minhash_pairs` semantics restricted
    * to the indexed corpus, read off [[sharedMinhashIndex]]'s band
    * table). The oracle rebuilds the same pair set from scratch; a green
    * row proves the persisted segments carry the full sketch state. */
  private val indexPairs: Q = (s, dir) =>
    sharedMinhashIndex(s, dir).candidatePairs().orderBy("doc1", "doc2")

  /** Delta screening against the persisted index — [[incrementalDedup]]
    * served the way production runs it: the standing corpus' sketches
    * come from the store (bucket-pruned probe), only the delta batch is
    * sketched. Output and oracle are IDENTICAL to `q_dedup_incremental`
    * — same decisions, two serving paths, one contract. */
  private val indexDelta: Q = (s, dir) =>
    sharedMinhashIndex(s, dir)
      .probeDecisions(
        t(s, dir, "documents").where(col("source") === NewBatchSource),
        "doc_id", "text")
      .orderBy("doc_id")

  /** Eval-set membership for [[decontaminate]]: doc_id ≡ 0 (mod 97) plays
    * the held-out benchmark. */
  private val EvalModulus = 97

  /** Benchmark decontamination — the train/eval overlap scan every serious
    * corpus release runs (e.g. GPT-3 appendix C; The Pile §6.3): flag
    * training docs sharing any 3-token shingle with the eval set, with
    * shared-shingle and eval-doc counts for the contamination report.
    * Scale shape: the eval side is small BY DEFINITION (a benchmark), so
    * its distinct shingles are explicitly broadcast — the train corpus is
    * probed map-side by a broadcast hash join and NEVER shuffles its
    * shingles; only matches reach the per-doc aggregation. At 100 TB this
    * is one pass over the corpus with an O(|eval shingles|) build side. */
  private val decontaminate: Q = (s, dir) => {
    val sh = tokenized(s, dir)
      .select(col("doc_id"), explode(expr(shingleExpr)).as("shingle"))
    val evalSh = sh.where(col("doc_id") % EvalModulus === 0)
      .select(col("doc_id").as("eval_doc"), col("shingle")).distinct()
    // No distinct on the train side: the final countDistinct dedups
    // repeated shingles anyway, and a pre-join distinct would shuffle the
    // FULL train shingle stream — the broadcast probe must stay map-side
    // so the only exchange after the scan carries matches.
    sh.where(col("doc_id") % EvalModulus =!= 0)
      .join(broadcast(evalSh), Seq("shingle"))
      .groupBy("doc_id")
      .agg(countDistinct("shingle").as("n_shared_shingles"),
        countDistinct("eval_doc").as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** Deduplicated-corpus materialization — the step every training
    * pipeline actually ships: form duplicate clusters (LSH pairs →
    * connected components), keep each cluster's min-doc_id representative
    * (the component label IS that min), drop the rest via a left-anti
    * join. Docs outside any cluster pass through untouched. The anti-join
    * probe side is O(duplicates), not O(corpus). */
  private val dedupApply: Q = (s, dir) => {
    val comp = minhashComponents(s, dir)
    val dupes = comp.where(col("doc_id") =!= col("component")).select("doc_id")
    t(s, dir, "documents")
      .join(dupes, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** PageRank scale (micro-rank units), fixed iteration count, and
    * teleport percentage (damping = 100 − teleport). `private[queries]`
    * so the conservation spec asserts against THESE constants. */
  private[queries] val PageRankU           = 1000000000000L // 10^12
  private[queries] val PageRankTeleportPct = 15L
  private val PageRankIters = 3

  /** Integer-exact PageRank over the LSH candidate graph — the
    * centrality diagnostic that ranks "template" documents sitting at the
    * heart of many near-dup chains (the triangle count's global cousin).
    *
    * Every quantity is INTEGER: ranks in 10^12 micro-units, contributions
    * `r div outdeg`, damping `(15·(U div N)) div 100 + (85·Σ) div 100`.
    * Integer addition commutes exactly, so the result is bit-identical at
    * ANY parallelism — unlike double-valued PageRank, whose per-partition
    * sum order changes the low bits run to run. The graded corpus' graph
    * is symmetric (undirected pairs), so there are no dangling nodes and
    * no rank leak.
    *
    * Scale shape: edges checkpointed once (the LSH chain is not re-run
    * per iteration); each of the 3 fixed iterations is one edge-keyed
    * join + hash agg + node-keyed left join — shuffle ∝ edges, the same
    * budget as one components round. */
  private val dedupPagerank: Q = (s, dir) => {
    val pairs = minhashCandidates(s, dir)
    // Cluster-mode swap point: see "localCheckpoint swap point" in PLANS.md.
    val edges = pairs.select(col("doc1").as("src"), col("doc2").as("dst"))
      .union(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = edges.select(col("src").as("doc_id")).distinct()
    val nn = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(nn)
      .select(col("doc_id"), expr(s"$PageRankU DIV n").as("r"))
    for (_ <- 1 to PageRankIters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("doc_id", "src"), "src")
        .join(deg, "src")
        .groupBy("dst")
        .agg(sum(expr("r DIV outdeg")).as("c"))
        .withColumnRenamed("dst", "doc_id")
      ranks = nodes.crossJoin(nn)
        .join(contrib, Seq("doc_id"), "left")
        .select(col("doc_id"), expr(
          s"($PageRankTeleportPct * ($PageRankU DIV n)) DIV 100 + " +
            s"(${100 - PageRankTeleportPct} * coalesce(c, 0L)) DIV 100"
        ).as("r"))
    }
    ranks.select(col("doc_id"), col("r").as("rank_u")).orderBy("doc_id")
  }

  /** Per-document duplicated-n-gram fraction (the span-level dedup signal
    * of Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022 — reference has no equivalent): the share of a
    * document's distinct 3-shingles that also occur in ANY other
    * document. Unlike the pairwise sketches above this is a corpus-global
    * per-doc score — the gate that catches boilerplate-heavy documents no
    * single near-dup pair would flag.
    *
    * Scale shape: distinct (doc, shingle) → shingle document-frequency
    * (partial+final hash agg) → join back on shingle (both sides
    * co-partitioned by the join key) → per-doc hash agg. No pair
    * enumeration anywhere: cost is O(total shingles), the same as one
    * MinHash signature pass. The fraction is integer basis points
    * ((10000·shared) div total) — exact in both engines. */
  private val dupNgrams: Q = (s, dir) => {
    val docShingles = tokenized(s, dir)
      .select(col("doc_id"), explode(expr(shingleExpr)).as("shingle"))
      .distinct()
    val dfreq = docShingles.groupBy("shingle").agg(count(lit(1)).as("df"))
    docShingles.join(dfreq, Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("dup_bp", expr("(10000 * n_shared) div n_shingles"))
      .orderBy("doc_id")
  }

  val queries: Seq[(String, Q)] = Seq(
    "q_dedup_exact"       -> exactDedup,
    "q_dedup_minhash_sig" -> minhashSignatures,
    "q_dedup_minhash_pairs" -> minhashPairs,
    "q_dedup_components"  -> dedupComponents,
    "q_dedup_cluster_sizes" -> clusterSizes,
    "q_dedup_simhash_sig" -> simhashFingerprints,
    "q_dedup_simhash_pairs" -> simhashPairs,
    "q_dedup_ngram_jaccard" -> ngramJaccard,
    "q_dedup_ngram_jaccard_zipf" -> ngramJaccardZipf,
    "q_dedup_prefix_join"   -> prefixJaccardJoin,
    "q_dedup_cdc_chunks"    -> cdcChunks,
    "q_dedup_shared_passages" -> sharedPassages,
    "q_dedup_source_overlap" -> sourceOverlap,
    "q_dedup_lsh_jaccard" -> lshJaccard,
    "q_dedup_pair_rouge"  -> pairRouge,
    "q_dedup_containment" -> containment,
    "q_dedup_containment_zipf" -> containmentZipf,
    "q_dedup_decontam"    -> decontaminate,
    "q_dedup_incremental" -> incrementalDedup,
    "q_dedup_index_pairs" -> indexPairs,
    "q_dedup_index_delta" -> indexDelta,
    "q_dedup_minhash_est" -> minhashEstimate,
    "q_dedup_triangles" -> dedupTriangles,
    "q_dedup_dupngrams"   -> dupNgrams,
    "q_dedup_pagerank"    -> dedupPagerank,
    "q_dedup_apply"       -> dedupApply
  )

  // ---- DuckDB oracles (generated from the same constants) ----------------

  private def duckClean(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '${TextOps.CleanPattern}', '', 'g'), '\\s+', ' ', 'g'))"
  private val stopListSql = TokenOps.StopWords.map(w => s"'$w'").mkString(", ")
  private def duckTerms(c: String): String =
    s"list_filter(string_split(${duckClean(c)}, ' '), w -> w <> '' AND w NOT IN ($stopListSql))"

  private val duckToks =
    s"SELECT doc_id, ${duckTerms("text")} AS toks FROM documents"

  /** The content-defined chunk derivation ending in
    * `chunks(doc_id, chunk_idx, n_toks, tok_start, chunk_fp)` — shared
    * by the chunk dump and the shared-passage join so the boundary rule
    * cannot drift between the two oracles. */
  private def duckCdcChunkCtes: String =
    s"""ctoks AS (SELECT doc_id, toks FROM ($duckToks) WHERE len(toks) >= 3),
       | cpos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS pos FROM ctoks),
       | ctok AS (SELECT doc_id, pos, toks[pos] AS tok FROM cpos),
       | cb AS (SELECT doc_id, pos, tok,
       |   CASE WHEN CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % $CdcChunkMod = 0
       |        THEN 1 ELSE 0 END AS boundary FROM ctok),
       | cc AS (SELECT doc_id, pos, tok,
       |   sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
       |     ROWS UNBOUNDED PRECEDING) AS chunk FROM cb),
       | chunks AS (
       |  SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_idx,
       |   CAST(count(*) AS BIGINT) AS n_toks,
       |   CAST(min(pos) AS BIGINT) AS tok_start,
       |   md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
       |  FROM cc GROUP BY doc_id, chunk)""".stripMargin
  private val duckShingles =
    s"""SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
       |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
       | FROM ($duckToks) WHERE len(toks) >= 3""".stripMargin
  /** Same single-md5 + universal-hash scheme as [[minhashSigs]]: the
    * first 60 bits of md5 parse as int64 via DuckDB's '0x' string cast,
    * then the identical (A·h32+B) mod P arithmetic. */
  private val duckH32 =
    s"""SELECT doc_id,
       |   CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 4294967296 AS h32
       | FROM ($duckShingles)""".stripMargin
  private val duckSigCols = (0 until NumHashes)
    .map(i => s"min((h32 * ${MinhashA(i)} + ${MinhashB(i)}) % $MinhashP) AS sig${i + 1}")
    .mkString(",\n   ")
  private val duckSigs =
    s"SELECT doc_id,\n   $duckSigCols\n FROM ($duckH32) GROUP BY doc_id"
  private val duckBandCase = Bands.zipWithIndex.map { case ((h1, h2), i) =>
    val key = (h1 to h2).map(h => s"CAST(sig$h AS VARCHAR)").mkString(" || ':' || ")
    s"WHEN ${i + 1} THEN $key"
  }.mkString(" ")
  private[queries] val duckBands =
    s"""SELECT doc_id, b, CASE b $duckBandCase END AS bkey
       | FROM ($duckSigs) CROSS JOIN (SELECT unnest([${Bands.indices.map(_ + 1).mkString(", ")}]) AS b)""".stripMargin

  private val duckSimSums = (1 to SimBits).map(p =>
    s"sum(CASE WHEN substr(h, $p, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b$p"
  ).mkString(",\n   ")
  private val duckSimFpExpr = (1 to SimBits).map(p =>
    s"CASE WHEN b$p > 0 THEN '1' ELSE '0' END").mkString(" || ")
  private val duckSimhash =
    s"""SELECT doc_id, $duckSimFpExpr AS simhash FROM (
       | SELECT doc_id,
       |   $duckSimSums
       | FROM (SELECT doc_id, md5(unnest(toks)) AS h FROM ($duckToks) WHERE len(toks) >= 3)
       | GROUP BY doc_id)""".stripMargin
  private val duckHamming = (1 to SimBits).map(p =>
    s"CASE WHEN substr(s1, $p, 1) <> substr(s2, $p, 1) THEN 1 ELSE 0 END").mkString(" + ")

  /** Shared CTE chain `bands → pairs` (LSH candidates, doc1 < doc2).
    * `pairsWhere` optionally restricts the pair ends (e.g. to filter
    * survivors). Callers continue the WITH list or select from `pairs`. */
  private[queries] def duckPairsCte(pairsWhere: String = ""): String =
    s"""bands AS ($duckBands),
       | pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
       |  FROM bands x JOIN bands y
       |   ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id$pairsWhere)""".stripMargin

  /** Shared CTE chain through connected components:
    * `bands → pairs → edges2 → reach → comp(doc_id, component)`. Needs a
    * leading `WITH RECURSIVE`. One definition for the three oracles that
    * form clusters (components, apply, curate) — they cannot drift. */
  private[queries] def duckComponentsCte(pairsWhere: String = ""): String =
    s"""${duckPairsCte(pairsWhere)},
       | edges2 AS (SELECT doc1 AS s, doc2 AS d FROM pairs
       |            UNION ALL SELECT doc2, doc1 FROM pairs),
       | reach(n, m) AS (
       |  SELECT s, s FROM edges2
       |  UNION
       |  SELECT r.n, e.d FROM reach r JOIN edges2 e ON r.m = e.s),
       | comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n)""".stripMargin

  val oracles: Seq[(String, String)] = Seq(
    "q_dedup_exact" ->
      s"""SELECT md5(${duckClean("text")}) AS fp, count(*) AS n,
         | min(doc_id) AS first_doc
         | FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q_dedup_minhash_sig" ->
      s"$duckSigs ORDER BY doc_id",
    "q_dedup_minhash_pairs" ->
      s"""WITH ${duckPairsCte()}
         | SELECT doc1, doc2 FROM pairs
         | ORDER BY doc1, doc2""".stripMargin,
    "q_dedup_components" ->
      s"""WITH RECURSIVE ${duckComponentsCte()}
         | SELECT doc_id, component FROM comp
         | ORDER BY doc_id""".stripMargin,
    "q_dedup_cluster_sizes" ->
      s"""WITH RECURSIVE ${duckComponentsCte()},
         | cs AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
         |  FROM comp GROUP BY component HAVING count(*) >= 2)
         | SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(sum(sz - 1) AS BIGINT) AS removable_docs
         | FROM cs GROUP BY sz ORDER BY cluster_size""".stripMargin,
    "q_dedup_triangles" ->
      s"""WITH ${duckPairsCte()},
         | tri AS (
         |  SELECT ab.doc1 AS a, ab.doc2 AS b, bc.doc2 AS c
         |  FROM pairs ab JOIN pairs bc ON ab.doc2 = bc.doc1
         |   JOIN pairs ac ON ac.doc1 = ab.doc1 AND ac.doc2 = bc.doc2)
         | SELECT doc_id, count(*) AS n_triangles FROM (
         |  SELECT unnest([a, b, c]) AS doc_id FROM tri)
         | GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_simhash_sig" ->
      s"$duckSimhash ORDER BY doc_id",
    // The pair family's oracles wrap the SAME brute-force SQL in the
    // order-independent digest emission (Tables.duckDigest) the Spark
    // side now emits — one statistic, verified content-exact without
    // forcing a row-order sort into either engine's plan.
    "q_dedup_simhash_pairs" -> Tables.duckDigest(
      s"""WITH fp AS ($duckSimhash),
         | cands AS (
         |  SELECT x.doc_id AS doc1, y.doc_id AS doc2, x.simhash AS s1, y.simhash AS s2
         |  FROM fp x JOIN fp y ON substr(x.simhash, 1, 8) = substr(y.simhash, 1, 8)
         |   AND x.doc_id < y.doc_id
         |  UNION
         |  SELECT x.doc_id, y.doc_id, x.simhash, y.simhash
         |  FROM fp x JOIN fp y ON substr(x.simhash, 9, 8) = substr(y.simhash, 9, 8)
         |   AND x.doc_id < y.doc_id)
         | SELECT doc1, doc2, CAST($duckHamming AS INTEGER) AS hamming
         | FROM cands WHERE $duckHamming <= $HammingMax""".stripMargin,
      Seq("doc1", "doc2", "hamming")),
    "q_dedup_ngram_jaccard" -> Tables.duckDigest(
      s"""WITH d AS (SELECT doc_id, lang, list_slice(list_sort(list_distinct(${duckTerms("text")})), 1, $MaxTermsPerDoc) AS tset FROM documents)
         | SELECT x.doc_id AS doc1, y.doc_id AS doc2,
         |  CAST(10000 * len(list_intersect(x.tset, y.tset)) // len(list_distinct(list_concat(x.tset, y.tset))) AS BIGINT) AS jac_bp
         | FROM d x JOIN d y ON x.lang = y.lang AND x.doc_id < y.doc_id
         | WHERE 10000 * len(list_intersect(x.tset, y.tset)) // len(list_distinct(list_concat(x.tset, y.tset))) >= $JaccardBpThreshold""".stripMargin,
      Seq("doc1", "doc2", "jac_bp")),
    // Exact-mode sketches (≤250 distinct fps per source ≪ 2^12), so the
    // theta estimates equal DuckDB's exact distinct/intersection counts.
    "q_dedup_source_overlap" ->
      s"""WITH d AS (SELECT source, md5(${duckClean("text")}) AS fp FROM documents),
         | s AS (SELECT source, count(DISTINCT fp) AS n FROM d GROUP BY 1),
         | sh AS (SELECT x.source AS sa, y.source AS sb,
         |   count(DISTINCT x.fp) AS shared
         |  FROM d x JOIN d y ON x.fp = y.fp AND x.source < y.source
         |  GROUP BY 1, 2)
         | SELECT a.source AS src_a, b.source AS src_b,
         |  a.n AS docs_a, b.n AS docs_b,
         |  coalesce(sh.shared, 0) AS shared
         | FROM s a JOIN s b ON a.source < b.source
         | LEFT JOIN sh ON sh.sa = a.source AND sh.sb = b.source
         | ORDER BY src_a, src_b""".stripMargin,
    "q_dedup_cdc_chunks" ->
      s"""WITH $duckCdcChunkCtes
         | SELECT doc_id, chunk_idx, n_toks, tok_start, chunk_fp
         | FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_dedup_shared_passages" ->
      s"""WITH $duckCdcChunkCtes,
         | ch AS (SELECT doc_id, chunk_fp, max(n_toks) AS n_toks
         |  FROM chunks WHERE n_toks >= $MinSharedChunkToks
         |  GROUP BY doc_id, chunk_fp)
         | SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |  count(*) AS n_shared_chunks,
         |  CAST(sum(a.n_toks) AS BIGINT) AS shared_toks
         | FROM ch a JOIN ch b ON a.chunk_fp = b.chunk_fp AND a.doc_id < b.doc_id
         | GROUP BY 1, 2 ORDER BY doc1, doc2""".stripMargin,
    // Brute-force ALL-PAIRS over the same md5-60-bit shingle sets at the
    // same threshold: a green row proves the Spark side's prefix filter
    // lossless on the graded corpus.
    // The zipf fixture's oracle is the BRUTE-FORCE all-pairs join over
    // the same shingle-hash sets (lang-blocked, same integer jac_bp),
    // so every green run proves the prefix filter lossless on the
    // graded corpus — the q_dedup_prefix_join convention at the
    // selective query's threshold.
    "q_dedup_ngram_jaccard_zipf" -> Tables.duckDigest(
      s"""WITH hs AS (SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h FROM ($duckShingles)),
         | dl AS (SELECT doc_id, lang FROM documents),
         | d AS (SELECT hs.doc_id AS doc_id, dl.lang AS lang,
         |        list_sort(list_distinct(list(h))) AS tset
         |       FROM hs JOIN dl ON hs.doc_id = dl.doc_id
         |       GROUP BY hs.doc_id, dl.lang)
         | SELECT x.doc_id AS doc1, y.doc_id AS doc2,
         |  CAST(10000 * len(list_intersect(x.tset, y.tset)) // (len(x.tset) + len(y.tset) - len(list_intersect(x.tset, y.tset))) AS BIGINT) AS jac_bp
         | FROM d x JOIN d y ON x.lang = y.lang AND x.doc_id < y.doc_id
         | WHERE (10000 + $JaccardBpThreshold) * len(list_intersect(x.tset, y.tset)) >= $JaccardBpThreshold * (len(x.tset) + len(y.tset))""".stripMargin,
      Seq("doc1", "doc2", "jac_bp")),
    "q_dedup_prefix_join" -> Tables.duckDigest(
      s"""WITH hs AS (SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h FROM ($duckShingles)),
         | d AS (SELECT doc_id, list_sort(list_distinct(list(h))) AS tset FROM hs GROUP BY doc_id)
         | SELECT x.doc_id AS doc1, y.doc_id AS doc2,
         |  CAST(len(list_intersect(x.tset, y.tset)) AS BIGINT) AS inter,
         |  CAST(len(x.tset) AS BIGINT) AS n1,
         |  CAST(len(y.tset) AS BIGINT) AS n2,
         |  CAST(10000 * len(list_intersect(x.tset, y.tset)) // (len(x.tset) + len(y.tset) - len(list_intersect(x.tset, y.tset))) AS BIGINT) AS jac_bp
         | FROM d x JOIN d y ON x.doc_id < y.doc_id
         | WHERE 3 * len(list_intersect(x.tset, y.tset)) >= len(x.tset) + len(y.tset)""".stripMargin,
      Seq("doc1", "doc2", "inter", "n1", "n2", "jac_bp")),
    "q_dedup_lsh_jaccard" ->
      s"""WITH ${duckPairsCte()},
         | d AS (SELECT doc_id, list_slice(list_sort(list_distinct(${duckTerms("text")})), 1, $MaxTermsPerDoc) AS tset FROM documents)
         | SELECT p.doc1, p.doc2,
         |  CAST(10000 * len(list_intersect(x.tset, y.tset)) // (len(x.tset) + len(y.tset) - len(list_intersect(x.tset, y.tset))) AS BIGINT) AS jac_bp
         | FROM pairs p JOIN d x ON p.doc1 = x.doc_id JOIN d y ON p.doc2 = y.doc_id
         | ORDER BY doc1, doc2""".stripMargin,
    "q_dedup_pair_rouge" -> Tables.duckDigest(
      s"""WITH ${duckPairsCte()},
         | bg AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf FROM (
         |   SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
         |     i -> toks[i] || ' ' || toks[i+1])) AS bg
         |   FROM ($duckToks) WHERE len(toks) >= 3)
         |  GROUP BY doc_id, bg),
         | tot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS nb FROM bg GROUP BY doc_id),
         | ov AS (SELECT p.doc1, p.doc2, CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS overlap2
         |  FROM pairs p
         |   JOIN bg a ON a.doc_id = p.doc1
         |   JOIN bg b ON b.doc_id = p.doc2 AND b.bg = a.bg
         |  GROUP BY 1, 2)
         | SELECT p.doc1, p.doc2, t1.nb AS nb1, t2.nb AS nb2,
         |  coalesce(o.overlap2, 0) AS overlap2,
         |  CAST(10000 * 2 * coalesce(o.overlap2, 0) // (t1.nb + t2.nb) AS BIGINT) AS rouge2_f_bp
         | FROM pairs p
         |  JOIN tot t1 ON t1.doc_id = p.doc1
         |  JOIN tot t2 ON t2.doc_id = p.doc2
         |  LEFT JOIN ov o ON o.doc1 = p.doc1 AND o.doc2 = p.doc2""".stripMargin,
      Seq("doc1", "doc2", "nb1", "nb2", "overlap2", "rouge2_f_bp")),
    "q_dedup_containment" -> Tables.duckDigest(
      s"""WITH d AS (SELECT doc_id, lang, list_slice(list_sort(list_distinct(${duckTerms("text")})), 1, $MaxTermsPerDoc) AS tset FROM documents)
         | SELECT x.doc_id AS doc1, y.doc_id AS doc2,
         |  CAST(10000 * len(list_intersect(x.tset, y.tset)) // least(len(x.tset), len(y.tset)) AS BIGINT) AS cont_bp
         | FROM d x JOIN d y ON x.lang = y.lang AND x.doc_id < y.doc_id
         | WHERE 10000 * len(list_intersect(x.tset, y.tset)) >= $ContainmentBpThreshold * least(len(x.tset), len(y.tset))""".stripMargin,
      Seq("doc1", "doc2", "cont_bp")),
    // The containment zipf oracle: brute-force all-pairs over the same
    // shingle-hash sets (the q_dedup_ngram_jaccard_zipf convention with
    // the asymmetric least() denominator), proving the small-side
    // prefix filter lossless per run.
    "q_dedup_containment_zipf" -> Tables.duckDigest(
      s"""WITH hs AS (SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h FROM ($duckShingles)),
         | dl AS (SELECT doc_id, lang FROM documents),
         | d AS (SELECT hs.doc_id AS doc_id, dl.lang AS lang,
         |        list_sort(list_distinct(list(h))) AS tset
         |       FROM hs JOIN dl ON hs.doc_id = dl.doc_id
         |       GROUP BY hs.doc_id, dl.lang)
         | SELECT x.doc_id AS doc1, y.doc_id AS doc2,
         |  CAST(10000 * len(list_intersect(x.tset, y.tset)) // least(len(x.tset), len(y.tset)) AS BIGINT) AS cont_bp
         | FROM d x JOIN d y ON x.lang = y.lang AND x.doc_id < y.doc_id
         | WHERE 10000 * len(list_intersect(x.tset, y.tset)) >= $ContainmentBpThreshold * least(len(x.tset), len(y.tset))""".stripMargin,
      Seq("doc1", "doc2", "cont_bp")),
    "q_dedup_pagerank" -> {
      val U = PageRankU
      val iters = (1 to PageRankIters).map { i =>
        s""" r$i AS (
           |  SELECT nodes.doc_id,
           |   ($PageRankTeleportPct * ($U // nn.n)) // 100 + (${100 - PageRankTeleportPct} * coalesce(c.c, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN nn
           |   LEFT JOIN (SELECT e.d AS doc_id,
           |      CAST(sum(p.r // deg.outdeg) AS BIGINT) AS c
           |     FROM edges2 e JOIN r${i - 1} p ON e.s = p.doc_id
           |      JOIN deg ON deg.s = e.s
           |     GROUP BY e.d) c ON c.doc_id = nodes.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${duckPairsCte()},
         | edges2 AS (SELECT doc1 AS s, doc2 AS d FROM pairs
         |            UNION ALL SELECT doc2, doc1 FROM pairs),
         | deg AS (SELECT s, count(*) AS outdeg FROM edges2 GROUP BY s),
         | nodes AS (SELECT DISTINCT s AS doc_id FROM edges2),
         | nn AS (SELECT count(*) AS n FROM nodes),
         | r0 AS (SELECT doc_id, $U // n AS r FROM nodes CROSS JOIN nn),
         |$iters
         | SELECT doc_id, CAST(r AS BIGINT) AS rank_u
         | FROM r$PageRankIters ORDER BY doc_id""".stripMargin
    },
    "q_dedup_dupngrams" ->
      s"""WITH ds AS (SELECT DISTINCT doc_id, shingle FROM ($duckShingles)),
         | dfreq AS (SELECT shingle, count(*) AS df FROM ds GROUP BY shingle)
         | SELECT ds.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST((10000 * CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS BIGINT) AS dup_bp
         | FROM ds JOIN dfreq ON ds.shingle = dfreq.shingle
         | GROUP BY ds.doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_decontam" ->
      s"""WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ($duckShingles)),
         | ev AS (SELECT DISTINCT doc_id AS eval_doc, shingle FROM sh
         |        WHERE doc_id % $EvalModulus = 0),
         | tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % $EvalModulus <> 0)
         | SELECT tr.doc_id,
         |  count(DISTINCT tr.shingle) AS n_shared_shingles,
         |  count(DISTINCT ev.eval_doc) AS n_eval_docs
         | FROM tr JOIN ev ON tr.shingle = ev.shingle
         | GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_minhash_est" -> {
      val matchSql = (1 to NumHashes)
        .map(i => s"CASE WHEN sx.sig$i = sy.sig$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH ${duckPairsCte()},
         | s1 AS ($duckSigs),
         | d AS (SELECT doc_id, list_slice(list_sort(list_distinct(${duckTerms("text")})), 1, $MaxTermsPerDoc) AS tset FROM documents)
         | SELECT p.doc1, p.doc2,
         |  CAST(10000 * ($matchSql) // $NumHashes AS BIGINT) AS est_jac_bp,
         |  CAST(10000 * len(list_intersect(x.tset, y.tset)) // (len(x.tset) + len(y.tset) - len(list_intersect(x.tset, y.tset))) AS BIGINT) AS jac_bp
         | FROM pairs p
         |  JOIN s1 sx ON p.doc1 = sx.doc_id JOIN s1 sy ON p.doc2 = sy.doc_id
         |  JOIN d x ON p.doc1 = x.doc_id JOIN d y ON p.doc2 = y.doc_id
         | ORDER BY doc1, doc2""".stripMargin
    },
    "q_dedup_incremental" ->
      s"""WITH bands AS ($duckBands),
         | src AS (SELECT doc_id, source FROM documents),
         | nb AS (SELECT bands.* FROM bands JOIN src USING (doc_id)
         |        WHERE source = '$NewBatchSource'),
         | cb AS (SELECT bands.* FROM bands JOIN src USING (doc_id)
         |        WHERE source <> '$NewBatchSource'),
         | agg AS (
         |  SELECT nb.doc_id, count(DISTINCT cb.doc_id) AS n_matches
         |  FROM nb JOIN cb ON nb.b = cb.b AND nb.bkey = cb.bkey
         |  GROUP BY nb.doc_id)
         | SELECT d.doc_id, coalesce(a.n_matches, 0) AS n_matches,
         |  CASE WHEN coalesce(a.n_matches, 0) > 0 THEN 'drop' ELSE 'keep' END AS decision
         | FROM (SELECT doc_id FROM documents WHERE source = '$NewBatchSource') d
         | LEFT JOIN agg a ON d.doc_id = a.doc_id
         | ORDER BY d.doc_id""".stripMargin,
    // Index-served pairs: the oracle rebuilds the standing-corpus pair
    // set from scratch — green ⇔ the persisted segments carry the full
    // sketch state bit-for-bit.
    "q_dedup_index_pairs" ->
      s"""WITH ab AS ($duckBands),
         | bands AS (SELECT ab.* FROM ab JOIN documents USING (doc_id)
         |           WHERE source <> '$NewBatchSource'),
         | pairs AS (
         |  SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
         |  FROM bands x JOIN bands y
         |   ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
         | SELECT doc1, doc2 FROM pairs ORDER BY doc1, doc2""".stripMargin,
    // Same contract as q_dedup_incremental — one semantics, two serving
    // paths (inline rebuild vs persisted bucket-pruned index).
    "q_dedup_index_delta" ->
      s"""WITH bands AS ($duckBands),
         | src AS (SELECT doc_id, source FROM documents),
         | nb AS (SELECT bands.* FROM bands JOIN src USING (doc_id)
         |        WHERE source = '$NewBatchSource'),
         | cb AS (SELECT bands.* FROM bands JOIN src USING (doc_id)
         |        WHERE source <> '$NewBatchSource'),
         | agg AS (
         |  SELECT nb.doc_id, count(DISTINCT cb.doc_id) AS n_matches
         |  FROM nb JOIN cb ON nb.b = cb.b AND nb.bkey = cb.bkey
         |  GROUP BY nb.doc_id)
         | SELECT d.doc_id, coalesce(a.n_matches, 0) AS n_matches,
         |  CASE WHEN coalesce(a.n_matches, 0) > 0 THEN 'drop' ELSE 'keep' END AS decision
         | FROM (SELECT doc_id FROM documents WHERE source = '$NewBatchSource') d
         | LEFT JOIN agg a ON d.doc_id = a.doc_id
         | ORDER BY d.doc_id""".stripMargin,
    "q_dedup_apply" ->
      s"""WITH RECURSIVE ${duckComponentsCte()}
         | SELECT doc_id, lang, source, n_chars FROM documents
         | WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)
         | ORDER BY doc_id""".stripMargin
  )
}
