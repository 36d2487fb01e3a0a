package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRecord
import graft.queries.Tables.{t, Q}

/** Multimodal plumbing in the declared inventory (builder brief): binary
  * media columns manufactured from the documents table (payload = utf8
  * bytes; kinds cycled), run through the typed feature-extraction path.
  * The graded query runs the [[MultimodalOps.PortableCodec]] (md5-derived
  * integer features) through the REAL mapPartitions plumbing, so the
  * whole path — schema, typed Dataset, narrow per-partition map, binary
  * never shuffled — is hash-verified against a DuckDB transliteration of
  * the codec; `MultimodalOpsSpec` covers the stub codec's semantics. */
object MultimodalQueries {

  private val Kinds = Seq("image", "audio", "video")

  private val FeatureDim = 8

  /** The manufactured media table every `q_mm_*` query starts from:
    * payload = utf8 bytes of `text`, kind cycled by doc_id mod 3. One
    * definition so the Spark frames and the DuckDB transliterations
    * can't drift. */
  private def media(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"), pmod(col("doc_id"), lit(3)).cast("int").as("k"))
      .as[(Long, String, Int)]
      .map { case (id, text, k) =>
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        MediaRecord(id, Kinds(k), bytes,
          width = 32, height = 32, sampleRate = 16000,
          nFrames = if (Kinds(k) == "video") 8 else 1)
      }
  }

  private val mmFeatures: Q = (s, dir) =>
    MultimodalOps.extractFeatures(media(s, dir), dim = FeatureDim,
        codec = MultimodalOps.PortableCodec)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        element_at(col("features"), 1).cast("long").as("f0"),
        element_at(col("features"), FeatureDim).cast("long").as("f7"))
      .orderBy("media_id")

  /** Last-16-bit value of md5 of an expression — the DuckDB-side
    * transliteration of [[MultimodalOps.PortableCodec]]'s per-dimension
    * feature. Delegates to the ONE instr-based md5 hex parse
    * (`SamplingQueries.hexBucketSql`, digits 29..32) so the cross-engine
    * hash contract has a single definition. */
  private def last16(payloadExpr: String): String =
    "(" + SamplingQueries.hexBucketSql(payloadExpr, 4) + ")"

  /** Metadata-only profile of the manufactured media table, but
    * oracle-checkable (unlike the codec path): per-kind counts and
    * payload byte sizes, where the payload is the utf8 encoding of
    * `text` — byte lengths agree across engines by construction. At
    * scale this is the query shape that never reads the binary column
    * region (only its length), the first thing a media-curation job
    * runs. */
  private val mmProfile: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(
        expr("CASE CAST(pmod(doc_id, 3) AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END").as("kind"),
        length(coalesce(col("text"), lit("")).cast("binary")).as("n_bytes"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").cast("long").as("sum_bytes"),
        max("n_bytes").cast("long").as("max_bytes"))
      .orderBy("kind")

  /** Every 5th asset is "re-crawled" under a shifted id — the duplicate
    * population [[mmDedup]] exists to find. */
  private val ReingestMod = 5
  private val ReingestOffset = 1000000L

  /** Deterministic fetch-failure simulation for [[mmStorage]]: every
    * 11th asset has a NULL payload. */
  private val NullMod = 11

  /** KLL k for the storage report: 1024 ≫ per-kind row counts at the
    * graded scale factors, so the sketch is in EXACT mode and its
    * INCLUSIVE quantile equals the sorted value at position ⌈r·n⌉ —
    * which is what the DuckDB oracle computes. At 100 TB the same plan
    * serves ±~0.6%-rank estimates (k=1024), the documented
    * estimation-tier trade (same discipline as the theta sketches). */
  private val StorageSketchK = 1024

  /** Binary-payload EXACT dedup across ingestion batches: blob identity
    * is md5 over the `media` BINARY column (codegen'd, no UDF), grouped
    * to (fingerprint → copy count, keeper = min id). The binary column
    * is pruned before the shuffle — only (fp, id, n_bytes) moves, never
    * payload bytes; at 100 TB this is the query that dedups a media
    * lake without ever shuffling a megabyte-sized blob. The re-crawl
    * batch (every ${ReingestMod}th asset re-ingested under a shifted
    * id) guarantees a non-trivial duplicate population; the oracle
    * builds the same union in SQL. */
  private val mmDedup: Q = (s, dir) => {
    import s.implicits._
    val base = media(s, dir)
    val recrawl = base.filter((r: MediaRecord) => r.media_id % ReingestMod == 0)
      .map((r: MediaRecord) => r.copy(media_id = r.media_id + ReingestOffset))
    base.union(recrawl).toDF()
      .select(col("media_id"), md5(col("media")).as("fp"),
        length(col("media")).cast("long").as("n_bytes"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_copies"), min("media_id").as("keeper"),
        max("n_bytes").as("n_bytes"))
      .orderBy("fp")
  }

  /** Per-kind STORAGE report over the binary column — count, missing
    * rate, and size quantiles from the KLL sketch family
    * ([[graft.functions.QuantileSketch]]): the first dashboard a media
    * curation job materializes. Sizes come from `length(media)` (the
    * payload is never parsed), nulls stay out of the sketch but in the
    * missing rate, and the quantile legs ride the mergeable sketch so
    * the same aggregate serves any slice rollup without re-reading
    * blobs. Rank 1.0 is KLL's exact max even in estimation mode;
    * p50/p75 are exact here because k ≫ n per kind (see
    * [[StorageSketchK]]). */
  private val mmStorage: Q = (s, dir) => {
    import graft.functions.QuantileSketch.{nCol, quantileCol, sketchAgg}
    t(s, dir, "documents")
      .select(
        expr("CASE CAST(pmod(doc_id, 3) AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END").as("kind"),
        when(pmod(col("doc_id"), lit(NullMod)) === 0, lit(null).cast("binary"))
          .otherwise(coalesce(col("text"), lit("")).cast("binary")).as("media"))
      .select(col("kind"), length(col("media")).cast("long").as("n_bytes"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_bytes").isNull, 1L).otherwise(0L)).as("n_missing"),
        sketchAgg(col("n_bytes"), k = StorageSketchK).as("sk"))
      .select(col("kind"), col("n"), col("n_missing"),
        expr("10000 * n_missing DIV n").as("missing_bp"),
        nCol(col("sk")).as("n_sized"),
        quantileCol(col("sk"), lit(0.5)).cast("long").as("p50_bytes"),
        quantileCol(col("sk"), lit(0.75)).cast("long").as("p75_bytes"),
        quantileCol(col("sk"), lit(1.0)).cast("long").as("max_bytes"))
      .orderBy("kind")
  }

  /** Block-hash near-dup knobs: [[BlockBits]] fixed-position blocks give
    * a [[BlockBits]]-bit signature; candidate recall rides the pigeonhole
    * over [[NQuarters]] segments (Hamming ≤ [[HamMax]] < NQuarters forces
    * ≥ 1 identical segment — the `q_dedup_simhash_pairs` guarantee); the
    * re-encode batch (every [[EditMod]]th asset with a 1-byte in-place
    * edit under a shifted id) manufactures a guaranteed near-dup
    * population the same way [[mmDedup]]'s re-crawl batch does. */
  private val BlockBits  = 48
  private val NQuarters  = 4
  private val QuarterBits = BlockBits / NQuarters // 12 → masks 4095
  private val HamMax     = 3
  private val EditMod    = 5
  private val EditOffset = 2000000L

  /** The [[BlockBits]]-term signature sum, generated ONCE for both
    * engines (only the integer-division token and the payload slicing
    * function differ): bit i = md5-parity of the payload's i-th
    * equal-width block (block boundaries are pure integer arithmetic on
    * the byte length, so both engines slice identically), weighted by
    * 2^i. The md5-parity bit rides [[SamplingQueries.hexBucketSql]] —
    * the single cross-engine hex-parse definition. */
  private def blockSigSql(payload: String, div: String): String =
    (0 until BlockBits).map { i =>
      val slice = s"substring($payload, 1 + ($i * n) $div $BlockBits, " +
        s"(${i + 1} * n) $div $BlockBits - ($i * n) $div $BlockBits)"
      s"((${SamplingQueries.hexBucketSql(slice, 1)}) % 2) * ${1L << i}"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** Block-hash NEAR-dup detection over binary payloads — the
    * perceptual-hash shape (aHash/blockhash family) for a media lake:
    * the payload is split into [[BlockBits]] fixed-position blocks, each
    * contributing one deterministic bit, so an IN-PLACE edit (re-encode
    * artifact, metadata patch) disturbs only the bits of the blocks it
    * touches and the edited copy sits within Hamming ≤ a few bits of the
    * original — where exact md5 identity ([[mmDedup]]) sees two
    * unrelated blobs and content-defined chunks ([[mmChunks]]) handle
    * the complementary SHIFT case. Candidates come from the pigeonhole
    * segment join (never all-pairs); the exact Hamming verify
    * (`bit_count(s1 ^ s2)`) runs on candidates only. Scale shape: the
    * signature pass is one narrow map (payload bytes never shuffle —
    * only (id, 8-byte sig) moves), the segment join's volume is bounded
    * by true near-duplication plus 2^-QuarterBits random collisions, and
    * the verify is O(candidates). The oracle rebuilds signature, join,
    * and verify from the SAME generated block expression, so a green row
    * proves the whole chain bit-exact. */
  private val mmBlockhash: Q = (s, dir) => {
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("id"), coalesce(col("text"), lit("")).as("p"))
    val edited = base.where(pmod(col("id"), lit(EditMod)) === 0)
      .select((col("id") + EditOffset).as("id"),
        concat(lit("x"), expr("substring(p, 2)")).as("p"))
    val sigs = Tables.fanout(base.unionByName(edited))
      .withColumn("pb", col("p").cast("binary"))
      .withColumn("n", length(col("pb")))
      .where(col("n") >= BlockBits)
      .select(col("id"), expr(blockSigSql("pb", "DIV")).as("sig"))
      .localCheckpoint(true) // both pigeonhole self-join sides
    val quarters = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until NQuarters).map(j =>
        expr(s"(sig >> ${QuarterBits * j}) & ${(1 << QuarterBits) - 1}")): _*))
        .as(Seq("qi", "qv")))
    quarters.as("x").join(quarters.as("y"),
        col("x.qi") === col("y.qi") && col("x.qv") === col("y.qv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        col("x.sig").as("s1"), col("y.sig").as("s2"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS INT)"))
      .where(col("hamming") <= HamMax)
      .select("id1", "id2", "hamming")
      .orderBy("id1", "id2")
  }

  /** Content-defined chunk fingerprints over the binary payload
    * ([[MultimodalOps.cdcByteChunks]]) — the byte-level twin of
    * `q_dedup_cdc_chunks`' token rule, for payloads that have no tokens:
    * chunk boundaries anchor on local 2-byte windows, so a partial
    * re-encode or appended header re-fingerprints only the chunks it
    * touches, and shared-chunk equi-joins then find near-identical blobs
    * without any pairwise byte comparison. Pure narrow flatMap — the
    * chunk table (O(bytes/16) rows, each a few dozen bytes) is the only
    * thing that ever shuffles, never payloads. */
  private val mmChunks: Q = (s, dir) => {
    import s.implicits._
    media(s, dir)
      .flatMap((r: MediaRecord) => MultimodalOps.cdcByteChunks(r.media_id,
        Option(r.media).getOrElse(Array.emptyByteArray)))
      .toDF()
      .orderBy("media_id", "chunk_idx")
  }

  /** Resize target (16×16 → 256-byte image payload cap) and frame
    * stride for [[mmPrep]]. */
  private val PrepW = 16
  private val PrepH = 16
  private val PrepStride = 2

  /** Media PREP pipeline — the transform chain a training job runs
    * before feature extraction, graded on CONTENT, not just lengths:
    * images resize to ${PrepW}×${PrepH} (payload capped at w·h bytes),
    * videos keep every ${PrepStride}nd frame (frame length =
    * payload DIV nFrames, kept slices concatenated), audio passes
    * through; the output row carries the byte count AND the md5 of the
    * TRANSFORMED payload, so the oracle transliterates the exact slice
    * arithmetic (substring concatenation over the utf8 payload — ASCII
    * corpus, chars ≡ bytes) and any off-by-one in the frame math
    * hash-fails. Runs through the REAL typed operators
    * ([[MultimodalOps.resizeImages]] → [[MultimodalOps.sampleFrames]]):
    * two narrow maps, the binary payload never crosses a shuffle, and
    * the metadata (width/height/nFrames) is updated in the same pass. */
  private val mmPrep: Q = (s, dir) =>
    MultimodalOps.sampleFrames(
        MultimodalOps.resizeImages(media(s, dir), PrepW, PrepH,
          codec = MultimodalOps.PortableCodec),
        PrepStride, codec = MultimodalOps.PortableCodec)
      .toDF()
      .select(col("media_id"), col("kind"),
        length(col("media")).cast("long").as("n_bytes_out"),
        md5(col("media")).as("fp_out"),
        col("width"), col("height"), col("nFrames").as("n_frames"))
      .orderBy("media_id")

  val queries: Seq[(String, Q)] = Seq(
    "q_mm_features" -> mmFeatures,
    "q_mm_profile"  -> mmProfile,
    "q_mm_dedup"    -> mmDedup,
    "q_mm_storage"  -> mmStorage,
    "q_mm_chunks"   -> mmChunks,
    "q_mm_blockhash" -> mmBlockhash,
    "q_mm_prep"     -> mmPrep)

  val oracles: Seq[(String, String)] = Seq(
    "q_mm_features" ->
      s"""SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
        | CAST(${last16("coalesce(text, '') || ':0'")} AS BIGINT) AS f0,
        | CAST(${last16(s"coalesce(text, '') || ':${FeatureDim - 1}'")} AS BIGINT) AS f7
        | FROM documents ORDER BY media_id""".stripMargin,
    "q_mm_profile" ->
      """SELECT
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | count(*) AS n,
        | CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS sum_bytes,
        | CAST(max(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS max_bytes
        | FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,
    // md5 over the blob ≡ md5 over the text: the payload IS the utf8
    // encoding of `text` (same identity q_mm_features already grades on).
    "q_mm_dedup" ->
      s"""WITH m AS (
        |  SELECT doc_id AS media_id, coalesce(text, '') AS payload FROM documents
        |  UNION ALL
        |  SELECT doc_id + $ReingestOffset, coalesce(text, '') FROM documents
        |  WHERE doc_id % $ReingestMod = 0)
        | SELECT md5(payload) AS fp, count(*) AS n_copies,
        |  min(media_id) AS keeper,
        |  CAST(max(octet_length(encode(payload))) AS BIGINT) AS n_bytes
        | FROM m GROUP BY fp ORDER BY fp""".stripMargin,
    // Exact-mode KLL inclusive quantile = sorted value at position
    // ⌈r·n⌉ — computed here with an explicit row_number selection (NOT
    // quantile_disc, whose rank rule differs). Ranks 0.5/0.75 are exact
    // in both decimal and binary arithmetic, so ceil() agrees across
    // engines.
    "q_mm_storage" ->
      s"""WITH m AS (
        |  SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   CASE WHEN doc_id % $NullMod = 0 THEN NULL
        |        ELSE octet_length(encode(coalesce(text, ''))) END AS nb
        |  FROM documents),
        | s AS (SELECT kind, nb,
        |   row_number() OVER (PARTITION BY kind ORDER BY nb) AS rn,
        |   count(*) OVER (PARTITION BY kind) AS cnt
        |  FROM m WHERE nb IS NOT NULL),
        | q AS (SELECT kind,
        |   max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN nb END) AS p50,
        |   max(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT) THEN nb END) AS p75,
        |   max(nb) AS mx, max(cnt) AS n_sized
        |  FROM s GROUP BY kind),
        | tot AS (SELECT kind, count(*) AS n,
        |   CAST(sum(CASE WHEN nb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        |  FROM m GROUP BY kind)
        | SELECT tot.kind, n, n_missing, 10000 * n_missing // n AS missing_bp,
        |  CAST(n_sized AS BIGINT) AS n_sized,
        |  CAST(p50 AS BIGINT) AS p50_bytes, CAST(p75 AS BIGINT) AS p75_bytes,
        |  CAST(mx AS BIGINT) AS max_bytes
        | FROM tot JOIN q USING (kind) ORDER BY kind""".stripMargin,
    // Character-for-character transliteration of cdcByteChunks' 2-byte
    // window rule. substring-over-text == substring-over-bytes here
    // because the corpus is pure ASCII (verified: octet_length(encode(x))
    // == length(x) for every row at every SF) — the same utf8 identity
    // the other q_mm_* oracles rely on.
    // Transliterates the prep chain's exact slice arithmetic: image =
    // first w·h bytes; video = concatenation of the kept frames' slices
    // (frame length = len DIV nFrames, tail-capped exactly like the
    // codec's slice); audio passes through. chars ≡ bytes on the ASCII
    // corpus, so substring over text equals the byte slices.
    "q_mm_prep" -> {
      val cap = PrepW * PrepH
      val frames = 0 until 8 by PrepStride
      val videoConcat = frames.map(f =>
        s"substring(txt, $f*fl+1, least(fl, greatest(0, len - $f*fl)))")
        .mkString(" || ")
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, CAST(doc_id % 3 AS INTEGER) AS k,
         |   coalesce(text, '') AS txt, length(coalesce(text, '')) AS len
         |  FROM documents),
         | v AS (SELECT *, greatest(1, len // 8) AS fl FROM m),
         | p AS (SELECT media_id, k,
         |   CASE k WHEN 0 THEN substring(txt, 1, $cap)
         |          WHEN 2 THEN $videoConcat
         |          ELSE txt END AS payload
         |  FROM v)
         | SELECT media_id,
         |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(length(payload) AS BIGINT) AS n_bytes_out,
         |  md5(payload) AS fp_out,
         |  CAST(CASE k WHEN 0 THEN $PrepW ELSE 32 END AS INTEGER) AS width,
         |  CAST(CASE k WHEN 0 THEN $PrepH ELSE 32 END AS INTEGER) AS height,
         |  CAST(CASE k WHEN 2 THEN 4 ELSE 1 END AS INTEGER) AS n_frames
         | FROM p ORDER BY media_id""".stripMargin
    },
    "q_mm_chunks" ->
      """WITH chars AS (
        |  SELECT doc_id AS media_id, coalesce(text, '') AS txt,
        |   unnest(generate_series(1, length(coalesce(text, '')))) AS i
        |  FROM documents),
        | b AS (SELECT media_id, i, substring(txt, i, 1) AS ch,
        |   CASE WHEN i >= 2 AND substring(md5(substring(txt, i - 1, 2)), 32, 1) = '0'
        |        THEN 1 ELSE 0 END AS bd
        |  FROM chars),
        | c AS (SELECT media_id, i, ch,
        |   sum(bd) OVER (PARTITION BY media_id ORDER BY i) AS chunk
        |  FROM b)
        | SELECT media_id, CAST(chunk AS BIGINT) AS chunk_idx,
        |  CAST(count(*) AS BIGINT) AS n_bytes,
        |  CAST(min(i) AS BIGINT) AS byte_start,
        |  md5(string_agg(ch, '' ORDER BY i)) AS chunk_fp
        | FROM c GROUP BY media_id, chunk
        | ORDER BY media_id, chunk_idx""".stripMargin,
    "q_mm_blockhash" ->
      s"""WITH m AS (
         |  SELECT doc_id AS id, coalesce(text, '') AS p FROM documents
         |  UNION ALL
         |  SELECT doc_id + $EditOffset, 'x' || substr(coalesce(text, ''), 2)
         |  FROM documents WHERE doc_id % $EditMod = 0),
         | f AS (SELECT id, p, length(p) AS n FROM m WHERE length(p) >= $BlockBits),
         | s AS (SELECT id, ${blockSigSql("p", "//")} AS sig FROM f),
         | q AS (SELECT id, sig, j, (sig >> (${QuarterBits} * j)) & ${(1 << QuarterBits) - 1} AS qv
         |  FROM s CROSS JOIN (SELECT unnest(generate_series(0, ${NQuarters - 1})) AS j)),
         | c AS (SELECT DISTINCT x.id AS id1, y.id AS id2, x.sig AS s1, y.sig AS s2
         |  FROM q x JOIN q y ON x.j = y.j AND x.qv = y.qv AND x.id < y.id)
         | SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
         | FROM c WHERE bit_count(xor(s1, s2)) <= $HamMax
         | ORDER BY id1, id2""".stripMargin)
}
