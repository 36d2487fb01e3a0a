package graft.sim

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the build-once / query-many shape a production
  * vector store actually runs (the inline `q_sim_ivf_ann` rebuilds its
  * cells per query; an index amortizes that over every future search),
  * with the same SEGMENT economics as [[LexIndex]] on the sparse side:
  *
  *   - `codebooks/cb-<uuid>/` — ONE (cell, centroid) table per trained
  *     codebook, O(cells) rows. The codebook is FROZEN between builds —
  *     exactly Faiss's `add` semantics: appends assign new vectors to
  *     the existing centroids without retraining, so an append costs
  *     O(delta · cells), never O(corpus).
  *   - `segments/seg-<uuid>/` — (cell, id, vector) postings assigned
  *     against the manifest's codebook, PARTITIONED BY cell on disk, so
  *     a probe reads `probes/cells` of each segment — the scan pruning
  *     this index exists for.
  *   - `m=N` — the MANIFEST file: codebook name on the first line, live
  *     segment names after. Publication is a temp write + ONE atomic
  *     rename (shared [[graft.ops.VersionedPaths.publish]] race rules),
  *     so readers see either the old segment set or the new one, never
  *     a torn mix; data dirs unreferenced by the newest manifest are
  *     invisible.
  *
  * [[build]] trains a fresh codebook and one full segment. [[append]]
  * writes only its delta segment under the LIVE codebook — the standing
  * corpus is never re-read or re-assigned (at 100 TB the difference
  * between an ingest step and a rebuild; the price is that cell balance
  * degrades as the corpus drifts from the codebook's training set —
  * when it does, [[build]] again). [[compact]] merges the live segments
  * into one (same cell layout, a pure per-cell file union — O(index),
  * no distance math) to bound per-query segment fan-out. Batches must
  * be id-disjoint (the `DedupIngest` screen's contract, same as
  * [[LexIndex]]): a re-ingested id would surface twice in search.
  *
  * The nearest-cell rule is the shared [[Similarity.rankedCellAffinity]],
  * so the persisted index and the oracle-checked inline query cannot
  * drift. `IvfIndexSpec` pins: exact single assignment, frozen-codebook
  * append equivalence, compaction invariance of search results, the
  * publication race, and recall floors. */
final class IvfIndex(spark: SparkSession, val indexDir: String)
    extends Serializable {

  private def fs = new Path(indexDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest manifest version (name filter first — zero probes on stray
    * entries; the manifest file is atomic by rename, so existence is
    * completeness: every dir it references was fully written before the
    * manifest was published). */
  def currentVersion(): Option[Long] =
    graft.ops.VersionedPaths.listNumbered(fs, new Path(indexDir), "m=",
        dirsOnly = false)
      .map(_._2).sorted.lastOption

  /** (codebook, segments) recorded at manifest version `v`; an
    * optional `bh <id>` replay-horizon line ([[graft.ops.BatchHorizon]])
    * is split off and served by [[horizonAt]]. */
  private[sim] def manifestAt(v: Long): (String, Seq[String]) = {
    val (lines, _) = graft.ops.BatchHorizon.split(manifestLinesAt(v))
    require(lines.nonEmpty, s"empty manifest m=$v under $indexDir")
    (lines.head, lines.tail)
  }

  private def horizonAt(v: Long): Option[Long] =
    graft.ops.BatchHorizon.split(manifestLinesAt(v))._2

  private def manifestLinesAt(v: Long): Seq[String] = {
    val in = fs.open(new Path(indexDir, s"m=$v"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private def resolvedOrFail(): Long = currentVersion().getOrElse(
    throw new IllegalStateException(s"no complete index under $indexDir"))

  /** Atomic manifest publication via the shared
    * [[graft.ops.VersionedPaths.publish]] rules — a racing publisher
    * loses loudly and its temp file is discarded. */
  private[sim] def publish(tmp: Path, v: Long): Long =
    graft.ops.VersionedPaths.publish(fs, new Path(indexDir), tmp, "m=", v)

  /** Publish OPTIMISTICALLY against the version the caller's reads
    * were based on (None = no store observed): target = basedOn + 1,
    * and the versioned rename throws if it exists — an op interleaving
    * with another writer fails loudly instead of silently rebuilding
    * the manifest from stale reads (the lost-update that could drop a
    * concurrent forget's fold and resurrect erased victims). */
  private def publishManifest(codebook: String, segs: Seq[String],
      horizon: Option[Long] = None,
      basedOn: Option[Long]): Long = {
    val body = (codebook +: segs) ++ graft.ops.BatchHorizon.lines(horizon)
    val tmp = new Path(indexDir, s".manifest-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write((body.mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    publish(tmp, basedOn.map(_ + 1).getOrElse(0L))
  }


  /** Delete `paths` recursively, swallowing cleanup failures (the
    * original error is the one worth throwing). */
  private def bestEffortDelete(paths: Path*): Unit =
    paths.foreach { p =>
      try fs.delete(p, true)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Write one postings segment: `emb` assigned to each vector's single
    * nearest centroid of `cents`. Fan out first: the assignment pass (a
    * cosine against every centroid per vector) is the expensive stage,
    * and a single-file parquet input would otherwise run it on one task
    * — same rationale as the inline query's fanout. The segment dir is
    * uuid-named and unreferenced until a manifest lists it, so the
    * write needs no staging rename of its own. */
  private def writeSegment(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): String =
    writeNamedSegment(emb, idCol, vecCol, cents,
      s"seg-${java.util.UUID.randomUUID()}")

  private def writeNamedSegment(emb: DataFrame, idCol: String,
      vecCol: String, cents: DataFrame, seg: String): String = {
    val out = new Path(indexDir, s"segments/$seg")
    try {
      Similarity.rankedCellAffinity(
          graft.queries.Tables.fanout(emb.select(col(idCol), col(vecCol))),
          idCol, vecCol, cents)
        .where(col("rnk") === 1)
        .select("cell", "id", "vector")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("cell").parquet(out.toString)
    } catch {
      case e: Throwable => bestEffortDelete(out); throw e
    }
    seg
  }

  /** Full (re)build: train a fresh codebook from `seedCol` (any rough
    * partition — a label, a hash bucket, a first-round k-means
    * assignment; nearest-centroid assignment then repairs a mediocre
    * seed), assign the whole corpus into one segment, publish. Returns
    * the published manifest version. A failed build deletes its
    * uuid-named dirs (no later build would ever reclaim them). */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            seedCol: String): Long = {
    val cv = currentVersion() // the basedOn CAS anchor
    val cb = s"cb-${java.util.UUID.randomUUID()}"
    val cbPath = new Path(indexDir, s"codebooks/$cb")
    val seg =
      try {
        Similarity.centroids(emb, vecCol, seedCol)
          .write.mode(SaveMode.Overwrite).parquet(cbPath.toString)
        writeSegment(emb, idCol, vecCol,
          spark.read.parquet(cbPath.toString))
      } catch {
        case e: Throwable => bestEffortDelete(cbPath); throw e
      }
    publishManifest(cb, Seq(seg), basedOn = cv)
  }

  /** Incremental APPEND under the live FROZEN codebook: assign only the
    * delta batch, publish the manifest referencing old segments + the
    * new one. Cost ∝ delta·cells; the standing postings are never
    * re-read. Search after any append sequence equals a single
    * assignment of the full corpus against the same codebook —
    * assignment is per-vector, so segment boundaries are invisible to
    * it (pinned in `IvfIndexSpec`). */
  def append(emb: DataFrame, idCol: String, vecCol: String): Long = {
    val v0 = resolvedOrFail()
    val (cb, segs) = manifestAt(v0) // resolve BEFORE writing
    val seg = writeSegment(emb, idCol, vecCol, codebook(cb))
    publishManifest(cb, segs :+ seg, horizonAt(v0), basedOn = Some(v0))
  }

  /** IDEMPOTENT per-batch append for the streaming maintainer
    * ([[graft.stream.IvfIngest]]) — the
    * [[MinHashIndex.appendSigsAsBatch]] rule applied to postings: the
    * segment name derives from the batch id and the manifest gains it
    * at most once, so an at-least-once redelivery (same checkpointed
    * offsets ⇒ same vectors, same id) converges instead of surfacing
    * duplicate postings in search. A segment already in the live
    * manifest is a TRUE no-op (published data is never rewritten in
    * place — the crash-mid-overwrite tear rule); a crash before the
    * publish leaves an unreferenced dir the replay overwrites whole.
    * The caller passes the codebook name it serves under
    * (`requireCodebook`): assignments are only meaningful against the
    * manifest's codebook, so a rebuild that swapped codebooks
    * mid-stream fails LOUDLY here instead of publishing postings
    * assigned under dead centroids (restart the ingest to adopt a
    * rebuild — the version-pinning rule). Unlike the other appends
    * this cannot create the index: a codebook must exist to assign
    * against ([[build]] first). */
  private[graft] def appendAsBatch(emb: DataFrame, idCol: String,
      vecCol: String, batchId: Long, requireCodebook: String): Long = {
    val v0 = resolvedOrFail()
    val (cb, segs) = manifestAt(v0)
    require(cb == requireCodebook,
      s"index $indexDir now serves codebook $cb, not $requireCodebook — " +
        "a rebuild happened mid-stream; restart the ingest to adopt it")
    val h = horizonAt(v0)
    val seg = s"seg-batch-$batchId"
    // Second no-op trigger: the batch is at or below the replay
    // horizon — a forget/compact already realized (and possibly
    // redacted) its rows; re-appending would resurrect victims.
    if (segs.contains(seg) || graft.ops.BatchHorizon.realizedLoud(h, batchId, indexDir))
      return v0
    writeNamedSegment(emb, idCol, vecCol, codebook(cb), seg)
    publishManifest(cb, segs :+ seg, h, basedOn = Some(v0))
  }

  /** The live codebook's name (manifest head) — what a streaming
    * maintainer pins at construction. */
  private[graft] def codebookName(): String = manifestAt(resolvedOrFail())._1

  /** MAINTENANCE compaction: merge the live segments into one — a pure
    * per-cell union (no distance math, no re-assignment; O(index) IO)
    * — and publish a one-segment manifest under the same codebook.
    * Bounds per-query segment fan-out after many appends; search
    * results are bit-identical before and after. */
  def compact(): Long = {
    val v0 = resolvedOrFail()
    val (cb, segs) = manifestAt(v0)
    if (segs.size <= 1) return v0
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    val out = new Path(indexDir, s"segments/$seg")
    try readUnion(segs)
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(out.toString)
    catch { case e: Throwable => bestEffortDelete(out); throw e }
    // Fold advances the replay horizon (BatchHorizon): a redelivery of
    // a folded batch no-ops instead of re-adding its rows.
    publishManifest(cb, Seq(seg),
      graft.ops.BatchHorizon.afterFold(horizonAt(v0), segs),
      basedOn = Some(v0))
  }

  /** FORGET: remove `ids` from the postings — deletion propagated into
    * the derived store (the `q_report_forget_impact` governance family;
    * same semantics as [[graft.sim.KmeansModel.forget]]): live segments
    * rewrite without the victims into one new cell-partitioned segment
    * under the SAME codebook, published as a new version. One O(index)
    * filter write, no distance math; surviving postings bit-unchanged,
    * so post-forget search ≡ pre-forget search minus the victims
    * (pinned in spec). Centroids are aggregates and stay — full
    * statistical erasure is [[build]] on the redacted corpus + [[vacuum]]. */
  def forget(ids: Seq[Long]): Long =
    forgetImpl(_.where(!col("id").isin(ids: _*)))

  /** MASS-erasure forget: the victim set stays a DataFrame end to end
    * (LEFT ANTI join on `id` — no driver materialization, no broadcast
    * id literal), the shape for source-level retraction (10⁷–10⁸
    * victims) where a driver `Seq` would not fit. The frame's FIRST
    * column, cast to BIGINT, is the victim id; semantics are identical
    * to the Seq form (spec-pinned). */
  def forget(victims: DataFrame): Long = {
    val v = victims.select(
      col(victims.columns.head).cast("long").as("id"))
    forgetImpl(_.join(v, Seq("id"), "left_anti"))
  }

  private def forgetImpl(screen: DataFrame => DataFrame): Long = {
    val v0 = resolvedOrFail()
    val (cb, segs) = manifestAt(v0) // resolve BEFORE writing
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    val out = new Path(indexDir, s"segments/$seg")
    try screen(readUnion(segs))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(out.toString)
    catch { case e: Throwable => bestEffortDelete(out); throw e }
    // The fold advances the replay horizon so a redelivered pre-forget
    // batch cannot re-append and resurrect the victims just erased.
    publishManifest(cb, Seq(seg),
      graft.ops.BatchHorizon.afterFold(horizonAt(v0), segs),
      basedOn = Some(v0))
  }

  /** Retention: keep the newest `keep` versions, sweep older manifests
    * and unreferenced codebook/segment dirs ([[IndexVacuum]] — the
    * "readable until vacuumed" promise made concrete; maintenance
    * window, no concurrent builds). Compact-then-vacuum is the standard
    * maintenance pair: compaction publishes the one-segment manifest,
    * vacuum reclaims the merged inputs. */
  def vacuum(keep: Int = 1): (Int, Int) =
    IndexVacuum.vacuum(fs, indexDir, keep,
      v => { val (cb, segs) = manifestAt(v); cb +: segs },
      Seq("codebooks" -> "cb-", "segments" -> "seg-"))

  private def codebook(cb: String): DataFrame =
    spark.read.parquet(s"$indexDir/codebooks/$cb")

  private def readSeg(seg: String): DataFrame =
    spark.read.parquet(s"$indexDir/segments/$seg")

  private def readUnion(segs: Seq[String]): DataFrame =
    segs.map(readSeg).reduce(_ unionByName _)

  def centroids(): DataFrame = codebook(manifestAt(resolvedOrFail())._1)
  def postings(): DataFrame = readUnion(manifestAt(resolvedOrFail())._2)

  /** Postings as recorded at manifest version `v` — old versions stay
    * readable until their segments are vacuumed (publication never
    * rewrites in place). */
  private[sim] def postingsAt(v: Long): DataFrame =
    readUnion(manifestAt(v)._2)

  /** Top-k cosine neighbors per query over the persisted index. The
    * manifest is resolved ONCE and codebook + segments read from it —
    * resolving per-table would let a build publishing mid-search pair
    * one manifest's codebook with another's postings (cell assignments
    * from different centroids: the torn read the manifest exists to
    * prevent). */
  def search(queries: DataFrame, idCol: String, vecCol: String,
             k: Int, probes: Int): DataFrame =
    probeMatches(queries, idCol, vecCol, probes)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("int").as("rnk"),
        col("cid"), col("cos"))

  /** The UNRANKED probe scores (qid, cid, cos) over the probed cells —
    * [[search]] minus its top-k, for consumers that rank under their
    * own rules (a side filter before top-k, a margin kernel over the
    * candidate set: the bitext-mining path). Each (qid, cid) appears
    * at most once — a candidate lives in exactly one cell (rnk = 1
    * assignment), so multi-cell probing never duplicates a pair. */
  def probeMatches(queries: DataFrame, idCol: String, vecCol: String,
      probes: Int): DataFrame = {
    val (cb, segs) = manifestAt(resolvedOrFail())
    val probed = Similarity
      .rankedCellAffinity(queries.select(col(idCol), col(vecCol)),
        idCol, vecCol, codebook(cb))
      .where(col("rnk") <= probes)
      .select(col("id").as("qid"), col("vector").as("qe"), col("cell"))
    // Round 10: the probed cells also prune the postings scan at
    // PLANNING time (`PartitionFilters` on the cell partition column —
    // the MinHashIndex probe discipline; pinned in `PlanAuditSpec`).
    // The driver list is bounded by O(cells) regardless of corpus or
    // query-set size; the routing recompute for this collect is
    // O(queries·cells).
    val probedCells: Seq[Any] = probed.select("cell").distinct()
      .collect().toIndexedSeq.map(_.get(0))
    readUnion(segs).where(col("cell").isin(probedCells: _*))
      .join(broadcast(probed), Seq("cell"))
      .select(col("qid"), col("id").as("cid"),
        Similarity.cosine(col("qe"), col("vector")).as("cos"))
  }
}
