package graft.sim

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index — the build-once / probe-many form of the
  * near-dup screen (reference dedup-by-id sink `test/data_ingestion/
  * testpy.py:115-139`, generalized to near-duplicates): the inline
  * `q_dedup_minhash_*` queries re-run shingle → md5 → 8 universal-hash
  * mins over the whole corpus per query; this store pays that sketch
  * pass once per INGESTED BATCH and serves every downstream consumer —
  * candidate pairs, delta screening, component formation — from the
  * persisted signatures. At 100 TB the sketch pass is the dominant cost
  * (one md5 per shingle over the full text), so "never re-sketch the
  * standing corpus" is the difference between an ingest step and a
  * rebuild — the [[LexIndex]] segment economics applied to LSH.
  *
  * Layout (the shared manifest discipline of [[IvfIndex]]/[[LexIndex]]):
  *   - `segments/seg-<uuid>/sigs/`  — (doc_id, sig1..sigN), one row per
  *     sketchable doc (≥ 3 tokens — the inline rule).
  *   - `segments/seg-<uuid>/bands/` — (b, bkey, doc_id) PARTITIONED BY
  *     `bucket` = md5-60-bit hash of (b, bkey) mod [[MinHashIndex.Buckets]]
  *     — a delta probe touches only its own band-keys' buckets
  *     (directory-level pruning; a small batch reads a few buckets, not
  *     the index). Matches can never be lost to pruning: a colliding
  *     corpus row shares (b, bkey) and therefore the bucket.
  *   - `m=N` — manifest: live segment names, one per line; temp-write +
  *     ONE atomic rename ([[graft.ops.VersionedPaths.publish]]), so
  *     readers see the old or new segment set, never a torn mix.
  *
  * Signatures are PER-DOC — no cross-doc state — so the algebra is
  * trivially exact: append of a doc-disjoint batch equals a from-scratch
  * build (set union of rows), and [[forget]] equals an index rebuilt
  * over the redacted corpus BIT-FOR-BIT (filter + re-derived bands;
  * `MinHashIndexSpec` pins both). The hash kernel is
  * [[graft.queries.DedupQueries.minhashSigsOf]] — the same expression
  * tree the oracle-graded inline queries and the DuckDB twins are built
  * from, so store-served results hash-match the oracles by construction.
  *
  * Doc-disjoint batches are the [[LexIndex.append]] contract here too: a
  * doc_id re-ingested into a second segment would duplicate its bands
  * and pair with itself's copies — put the exact-dedup ingest screen
  * ([[graft.stream.DedupIngest]]) in front, as the streaming pipeline
  * already does. */
final class MinHashIndex(spark: SparkSession, val indexDir: String)
    extends Serializable {
  import MinHashIndex._

  private def fs = new Path(indexDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest manifest version (atomic-by-rename ⇒ existence is
    * completeness). */
  def currentVersion(): Option[Long] =
    graft.ops.VersionedPaths.listNumbered(fs, new Path(indexDir), "m=",
        dirsOnly = false)
      .map(_._2).sorted.lastOption

  private def manifestLinesAt(v: Long): Seq[String] = {
    val in = fs.open(new Path(indexDir, s"m=$v"))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList
    } finally in.close()
  }

  // Manifest = segment names + an optional `bh <id>` replay-horizon
  // line ([[graft.ops.BatchHorizon]] — forget/compact fold batch-named
  // segments away; the horizon keeps a redelivered pre-fold batch a
  // no-op instead of a victim-resurrecting re-append).
  private def segmentsAt(v: Long): Seq[String] =
    graft.ops.BatchHorizon.split(manifestLinesAt(v))._1

  /** Live segment names at the newest version, or fail loudly. */
  def liveSegments(): Seq[String] = segmentsAt(resolvedOrFail())

  private def resolvedOrFail(): Long = currentVersion().getOrElse(
    throw new IllegalStateException(s"no complete index under $indexDir"))

  /** Retention: keep the newest `keep` versions, sweep older manifests
    * and unreferenced segment dirs (shared [[IndexVacuum]] rules). */
  def vacuum(keep: Int = 1): (Int, Int) =
    IndexVacuum.vacuum(fs, indexDir, keep, segmentsAt,
      Seq("segments" -> "seg-"))

  /** (segments, horizon, sid) from ONE parsed manifest read — the
    * lifecycle ops' single-read rule (each accessor is a metadata
    * round trip on an object store, and independent reads can straddle
    * a concurrent publish). */
  private def stateAt(v: Long): (Seq[String], Option[Long], Option[String]) = {
    val lines = manifestLinesAt(v)
    val (segs, h) = graft.ops.BatchHorizon.split(lines)
    (segs, h, graft.ops.BatchHorizon.splitSid(lines))
  }

  /** Publish OPTIMISTICALLY against the version the caller's reads
    * were based on (None = no store observed): the target is exactly
    * basedOn + 1, and [[graft.ops.VersionedPaths.publish]] throws if
    * it already exists — a lifecycle op interleaving with another
    * writer (a standing [[graft.stream.MinHashIngest]] append racing a
    * [[graft.gov.ForgetPipeline]] erasure) fails LOUDLY instead of
    * silently rebuilding the manifest from stale reads, which would
    * drop the other writer's segment (or resurrect erased victims). */
  private def publishManifest(segs: Seq[String],
      horizon: Option[Long] = None,
      sid: Option[String] = None,
      basedOn: Option[Long]): Long = {
    val body = segs ++ graft.ops.BatchHorizon.lines(horizon) ++
      graft.ops.BatchHorizon.sidLines(sid)
    val tmp = new Path(indexDir, s".manifest-${java.util.UUID.randomUUID()}")
    val outStream = fs.create(tmp, false)
    try outStream.write(
      (body.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally outStream.close()
    graft.ops.VersionedPaths.publish(fs, new Path(indexDir), tmp, "m=",
      basedOn.map(_ + 1).getOrElse(0L))
  }

  /** Write one segment from a signatures frame: sigs parquet first, then
    * bands DERIVED FROM THE WRITTEN FILE (the write is the
    * materialization — the shingle→sig pipeline runs exactly once per
    * batch, never once per table). */
  private def writeSegmentFromSigs(sigs: DataFrame): String =
    writeNamedSegment(sigs, s"seg-${java.util.UUID.randomUUID()}")

  private def writeNamedSegment(sigs: DataFrame, seg: String): String = {
    val out = s"$indexDir/segments/$seg"
    sigs.write.mode(SaveMode.Overwrite).parquet(s"$out/sigs")
    graft.queries.DedupQueries
      .minhashBandsOf(spark.read.parquet(s"$out/sigs"))
      .withColumn("bucket", expr(bucketSql("b", "bkey")))
      .select("bucket", "b", "bkey", "doc_id")
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$out/bands")
    seg
  }

  /** Sketch a raw (id, text) batch with the shared kernel. The batch is
    * fanned out first — shingle+md5 is the map-side cost, and a
    * single-split input would run it on one task. */
  private def sketch(docs: DataFrame, idCol: String, textCol: String) =
    graft.queries.DedupQueries.minhashSigsOf(
      graft.queries.Tables.fanout(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))))

  /** First build: one segment, manifest version 0 — or a REBUILD over
    * an existing index, which is a FOLD for replay purposes: the live
    * batch-named segments vanish from the manifest, so the published
    * horizon must advance past them ([[graft.ops.BatchHorizon.afterFold]]
    * — a pre-rebuild batch redelivered afterwards would otherwise
    * re-append, double-adding its rows or resurrecting victims a
    * pre-rebuild forget erased) and the stream-identity pin is carried.
    * Old manifests serve until vacuumed. */
  def build(docs: DataFrame, idCol: String, textCol: String): Long = {
    val cv = currentVersion()
    val (folded, h, sid) = cv match {
      case Some(v) => stateAt(v)
      case None => (Nil, None, None)
    }
    publishManifest(Seq(writeSegmentFromSigs(sketch(docs, idCol, textCol))),
      graft.ops.BatchHorizon.afterFold(h, folded), sid, basedOn = cv)
  }

  /** Incremental APPEND: sketch only the delta, publish old segments +
    * the new one. Cost ∝ delta — the standing corpus text is never
    * re-read. Exact (per-doc rows, doc-disjoint contract). */
  def append(docs: DataFrame, idCol: String, textCol: String): Long = {
    val v = resolvedOrFail() // resolve ONCE, BEFORE the heavy write
    val (live, h, sid) = stateAt(v)
    publishManifest(
      live :+ writeSegmentFromSigs(sketch(docs, idCol, textCol)), h,
      sid, basedOn = Some(v))
  }

  /** IDEMPOTENT per-batch append for the streaming maintainer
    * ([[graft.stream.MinHashIngest]]): the segment name is DERIVED FROM
    * THE BATCH ID and the manifest gains the segment at most once — so
    * an at-least-once redelivery (same checkpointed offsets ⇒ same
    * survivor sigs, same id) converges instead of accumulating
    * duplicate segments (the
    * [[graft.stream.MicroBatchIngest.writeBatchPartition]] convergence
    * rule, applied to manifest-versioned segments). A segment ALREADY
    * in the live manifest is a TRUE no-op: published data is never
    * rewritten in place (a crash mid-overwrite would leave the manifest
    * pointing at a half-written segment — the tear the manifest
    * discipline exists to prevent; the caller's rows are deterministic
    * in the batch, so skipping loses nothing). A crash BEFORE the
    * publish leaves an unreferenced segment dir, which the replay
    * overwrites whole. Creates the index when none exists yet.
    *
    * TWO no-op triggers: the segment is still live, OR the batch is at
    * or below the manifest's replay horizon ([[graft.ops.BatchHorizon]])
    * — a forget/compact folded it away, so re-appending would
    * double-add its survivors and RESURRECT its forgotten victims. */
  private[graft] def appendSigsAsBatch(sigs: DataFrame, batchId: Long,
      streamId: Option[String] = None): Long = {
    val cv = currentVersion()
    val (live, h, sid) = cv match {
      case Some(v) => stateAt(v)
      case None    => (Nil, None, None)
    }
    // Identity pin FIRST: the horizon no-op is sound only per
    // checkpoint — a pinned index fed by a different stream identity
    // fails loudly instead of silently dropping every batch at or
    // below the old horizon ([[graft.ops.BatchHorizon.requireSid]]).
    graft.ops.BatchHorizon.requireSid(sid, streamId, s"MinHash index $indexDir")
    val seg = s"seg-batch-$batchId"
    if (live.contains(seg) || graft.ops.BatchHorizon.realizedLoud(h, batchId, indexDir))
      return cv.get
    writeNamedSegment(sigs, seg)
    publishManifest(live :+ seg, h,
      graft.ops.BatchHorizon.adoptSid(sid, streamId), basedOn = cv)
  }

  /** FORGET: drop `ids` and publish one rewritten segment — deletion
    * propagated into the derived store, and EXACT: signatures are
    * per-doc, so the surviving rows (bands re-derived from them) equal
    * an index built over the redacted corpus bit-for-bit (pinned in
    * `MinHashIndexSpec`). O(index) filter; no re-sketch, the corpus
    * text is never re-read. */
  def forget(ids: Seq[Long]): Long = {
    val v = resolvedOrFail()
    val (live, h, sid) = stateAt(v)
    val survivors = readUnion(live, "sigs")
      .where(!col("doc_id").isin(ids: _*))
    // The fold realizes every batch-named segment: advance the replay
    // horizon so a redelivered pre-forget batch cannot re-append (and
    // resurrect victims this forget just erased).
    publishManifest(Seq(writeSegmentFromSigs(survivors)),
      graft.ops.BatchHorizon.afterFold(h, live), sid, basedOn = Some(v))
  }

  /** MASS-erasure forget: victims stay a DataFrame end to end (LEFT
    * ANTI join on `doc_id`; first column cast to BIGINT) — the
    * [[graft.sim.IvfIndex.forget]] overload contract. */
  def forget(victims: DataFrame): Long = {
    val vict = victims.select(
      col(victims.columns.head).cast("long").as("doc_id"))
    val v = resolvedOrFail()
    val (live, h, sid) = stateAt(v)
    val survivors = readUnion(live, "sigs")
      .join(vict, Seq("doc_id"), "left_anti")
    publishManifest(Seq(writeSegmentFromSigs(survivors)),
      graft.ops.BatchHorizon.afterFold(h, live), sid, basedOn = Some(v))
  }

  /** MAINTENANCE compaction: merge live segments into one (row union —
    * exact) and publish a one-segment manifest; bounds per-probe segment
    * fan-out after many appends. O(index), never re-sketches.
    *
    * Replay-convergent by construction: the fold advances the
    * manifest's [[graft.ops.BatchHorizon]] past every batch-named
    * segment it merges, so a redelivery of a folded batch no-ops —
    * no coordination with the stream's checkpoint needed (this
    * replaces the round-10 caller-side "compact only past the
    * checkpoint's last committed batch" rule). Like every maintenance
    * pass here, run it in a window with no concurrent builders. */
  def compact(): Long = {
    val v = resolvedOrFail()
    val (live, h, sid) = stateAt(v)
    if (live.size <= 1) return v
    publishManifest(Seq(writeSegmentFromSigs(readUnion(live, "sigs"))),
      graft.ops.BatchHorizon.afterFold(h, live), sid, basedOn = Some(v))
  }

  private def readSeg(seg: String, table: String): DataFrame =
    spark.read.parquet(s"$indexDir/segments/$seg/$table")

  private def readUnion(segs: Seq[String], table: String): DataFrame =
    segs.map(readSeg(_, table)).reduce(_ unionByName _)

  /** All persisted signatures (doc_id, sig1..sigN) at the newest
    * manifest (resolved once — the torn-read rule). */
  def signatures(): DataFrame = readUnion(liveSegments(), "sigs")

  /** All persisted band rows (bucket, b, bkey, doc_id). */
  def bands(): DataFrame = readUnion(liveSegments(), "bands")

  /** LSH candidate pairs (doc1 < doc2) WITHIN the index — the standing
    * corpus' near-dup pair set, served from the persisted bands with no
    * sketch pass. Self-join on (b, bkey): shuffle ∝ bucket sizes, never
    * O(n²) — the same join shape as the inline query, minus its entire
    * upstream pipeline. The manifest is resolved ONCE for both sides. */
  def candidatePairs(): DataFrame = {
    val live = liveSegments()
    val b1 = readUnion(live, "bands")
    val b2 = readUnion(live, "bands")
    b1.as("x").join(b2.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
  }

  /** Banded matches of a raw delta batch against the index:
    * (doc_id = delta doc, corpus_doc). The delta is sketched with the
    * shared kernel, its band rows bucketed with the layout's own
    * expression, and the index side reads ONLY the probed buckets — the
    * distinct-bucket set is bounded by [[Buckets]] (a ≤64-value driver
    * list, never O(delta)), and directory-level partition pruning does
    * the rest. Pruning is lossless by construction (a match shares
    * (b, bkey) ⇒ the bucket). For a small batch against a 100 TB index
    * this reads a few partitions of the band table, not the index. */
  def probeMatches(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    probeMatchesFromSigs(sketch(docs, idCol, textCol))

  /** [[probeMatches]] from an ALREADY-COMPUTED delta signature frame —
    * the one-sketch-pass path [[graft.stream.MinHashIngest]] rides (its
    * screen and its index append share one signature computation). */
  private[graft] def probeMatchesFromSigs(deltaSigs: DataFrame,
      maxBucketLiterals: Int = MinHashIndex.MaxBucketLiterals): DataFrame = {
    val live = liveSegments()
    val deltaBands = graft.queries.DedupQueries
      .minhashBandsOf(deltaSigs)
      .withColumn("bucket", expr(bucketSql("b", "bkey")))
      .localCheckpoint(true) // bucket list + join probe read it once
    // The collected list is capped: today `bucket` is mod-[[Buckets]]
    // so ≤64 values come back, but the cap is the invariant the plan
    // rides on, not the constant — a deployment that widens the
    // bucket space (or a bulk backfill routed here instead of through
    // [[build]]) must not assemble a multi-million-literal In filter
    // on the driver. Past the cap the same lossless pruning runs as a
    // bucket semi-join (still a bucket-table-sized broadcast side).
    // ONE distinct-bucket frame serves both the capped driver probe and
    // the semi-join fallback (it reads from the checkpoint either way —
    // the fallback no longer re-derives its own distinct).
    val distinctBuckets = deltaBands.select("bucket").distinct()
    val bucketRows = distinctBuckets.limit(maxBucketLiterals + 1).collect()
    if (bucketRows.isEmpty) return deltaBands
      .select(col("doc_id"), col("doc_id").as("corpus_doc")).limit(0)
    val corpus = readUnion(live, "bands")
    val pruned =
      if (bucketRows.length <= maxBucketLiterals)
        corpus.where(col("bucket").isin(
          bucketRows.map(_.getLong(0)).toIndexedSeq: _*))
      else corpus.join(broadcast(distinctBuckets), Seq("bucket"), "left_semi")
    pruned.as("c")
      .join(deltaBands.as("n"),
        col("n.b") === col("c.b") && col("n.bkey") === col("c.bkey"))
      .select(col("n.doc_id").as("doc_id"), col("c.doc_id").as("corpus_doc"))
  }

  /** Delta-screening decisions — the incremental-dedup consumer
    * (`q_dedup_incremental` semantics, served from the persisted index):
    * every delta doc gets its corpus-collision count and a keep/drop
    * decision; short docs (no shingles ⇒ no sketch) default to keep. */
  def probeDecisions(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val matches = probeMatches(docs, idCol, textCol)
      .groupBy("doc_id")
      .agg(countDistinct("corpus_doc").as("n_matches"))
    docs.select(col(idCol).as("doc_id"))
      .join(matches, Seq("doc_id"), "left")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
      .withColumn("decision",
        when(col("n_matches") > 0, "drop").otherwise("keep"))
  }
}

object MinHashIndex {
  /** Band-key hash-partition count: a probe touches ≤ min(Buckets,
    * distinct delta band-keys) partitions per segment. */
  val Buckets = 64

  /** Driver-list cap for [[MinHashIndex.probeMatchesFromSigs]]'s
    * planning-time bucket prune: at or below it the probed buckets
    * become partition-pruning In literals; above it the prune runs as
    * a broadcast bucket semi-join instead. With mod-[[Buckets]]
    * bucketing the list can't exceed 64, so the live path never falls
    * back — the cap guards the INVARIANT against a widened bucket
    * space or a bulk delta that should have gone through `build`.
    * Sized at 16×[[Buckets]]: far above anything the live layout can
    * produce, but small enough that the guarded failure case collects
    * a bounded probe instead of a 10⁵-row driver list before deciding
    * to fall back. */
  val MaxBucketLiterals = 1024

  /** The layout/probe bucket rule — ONE definition (the md5-60-bit hex
    * parse idiom shared with [[LexIndex.bucketSql]]), evaluated through
    * Spark expressions on both sides so they can never disagree. */
  private[sim] def bucketSql(bCol: String, bkeyCol: String): String =
    s"CAST(conv(substring(md5(concat(CAST($bCol AS STRING), ':', $bkeyCol)), 1, 15), 16, 10) AS BIGINT) % $Buckets"
}
