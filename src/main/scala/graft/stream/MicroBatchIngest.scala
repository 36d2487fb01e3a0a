package graft.stream

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The shared shape of the streaming maintainers ([[DedupIngest]],
  * [[CdcIngest]], [[SketchIngest]]): a per-micro-batch `processBatch`
  * attached through `foreachBatch` (the S7 engine form), plus the
  * replay-safe per-batch partition write they converge on. One
  * definition, so the replay convention cannot drift between
  * maintainers — the same rationale as
  * [[graft.ops.VersionedPaths]] for the versioned-dir rules. */
private[stream] trait MicroBatchIngest {

  /** One micro-batch; the returned count is maintainer-specific
    * (novel docs, merged keys, slice rows). */
  def processBatch(batch: DataFrame, batchId: Long): Long

  /** The STREAM IDENTITY this maintainer runs under — the checkpoint
    * location bound at [[start]] (batch ids are meaningful only per
    * checkpoint). Maintainers that publish into batch-horizon stores
    * (LM, MinHash) pass it to the store's append so a restart with a
    * FRESH checkpoint fails loudly against the store's pinned identity
    * ([[graft.ops.BatchHorizon.requireSid]]) instead of silently
    * no-opping every batch at or below the old replay horizon. None
    * when started without a checkpoint (tests, ad-hoc runs) — such
    * streams make no cross-restart batch-id promise to pin. */
  @volatile private var boundCheckpoint: Option[String] = None
  protected final def streamId: Option[String] = boundCheckpoint

  /** Attach to a streaming frame via foreachBatch. */
  final def start(source: DataFrame, queryName: String, trigger: Trigger,
                  checkpointLocation: Option[String] = None): StreamingQuery = {
    boundCheckpoint = checkpointLocation
    val w = source.writeStream
      .queryName(queryName)
      .foreachBatch((b: DataFrame, id: Long) => { processBatch(b, id); () })
      .trigger(trigger)
    checkpointLocation.foreach(w.option("checkpointLocation", _))
    w.start()
  }
}

private[graft] object MicroBatchIngest {

  /** One row per id, deterministically, ALL columns preserved —
    * conflicting texts for one id resolve to the md5-smallest (content-
    * keyed, so any partitioning and any replay pick the same winner).
    * ONE definition for every maintainer that needs it (MinHash,
    * QualityGate, CcnetScore) so the replay-determinism contract cannot
    * drift between them; [[WinnowIngest]] keeps its own PROJECTING
    * variant (it deliberately returns only (id, text)). */
  def onePerId(batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val winner = batch.groupBy(col(idCol))
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.coalesce(col(textCol), lit(""))))
        .as("__tfp"))
    batch.withColumn("__tfp",
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.coalesce(col(textCol), lit(""))))
      .join(winner, Seq(idCol, "__tfp"))
      .dropDuplicates(idCol)
      .drop("__tfp")
  }

  /** Run `f` over an eagerly-checkpointed copy of `df`, releasing the
    * checkpoint's blocks afterward — the standing-maintainer storage
    * discipline (a per-trigger checkpoint pins the batch so multiple
    * consumers — count + write, screen + append — read ONE
    * materialization; a standing stream must then release those blocks
    * or accumulate one dead set per trigger) held in ONE place instead
    * of re-implemented per maintainer: a fix to the release rule lands
    * everywhere at once. */
  def withReleasedCheckpoint[A](df: DataFrame)(f: DataFrame => A): A = {
    val pinned = df.localCheckpoint(true)
    // PRECISE attribution ([[graft.ops.CheckpointIds]]): the released
    // ids are read off the pinned frame itself — the old
    // getPersistentRDDs before/after diff claimed any RDD a CONCURRENT
    // thread persisted in the window, and unpersisting a foreign
    // lineage-truncated checkpoint breaks that frame permanently.
    try f(pinned)
    finally graft.ops.CheckpointIds.release(pinned)
  }

  /** Idempotent per-batch write: DYNAMIC overwrite of this batch's own
    * `batch_id=<id>` partition only — every other batch's output is
    * untouched, so an at-least-once redelivery (same checkpointed
    * offsets ⇒ same rows, same id) overwrites itself and the store
    * converges instead of duplicating. */
  def writeBatchPartition(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy("batch_id")
      .parquet(dir)

  /** The standing store, or `empty` (a zero-row frame with the store's
    * schema) before the first batch lands — the schema must match what
    * the first write will produce, so consumers capturing it early
    * (unions, schema-derived writers) don't diverge once data arrives.
    *
    * When the store has been [[compactBatches]]-consolidated, the frame
    * is the consolidated segment UNION the batch partitions NEWER than
    * the compaction horizon — row-identical to the uncompacted store.
    * Batch partitions at or below the horizon are ignored (their rows
    * live in the segment), which is also what keeps replay convergent
    * after compaction: a redelivered old batch rewrites a partition the
    * reader never looks at. */
  def storeOrElse(spark: SparkSession, dir: String, empty: => DataFrame): DataFrame = {
    val recent =
      try Some(spark.read.parquet(dir))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    latestCompaction(spark, dir) match {
      case None => recent.getOrElse(empty)
      case Some((horizon, segPath)) =>
        val cons = spark.read.parquet(segPath)
        recent match {
          case None => cons
          case Some(r) => cons.unionByName(
            r.withColumn("batch_id", col("batch_id").cast("long"))
              .where(col("batch_id") > horizon))
        }
    }
  }

  /** The directory holding a store's consolidated segments + manifests
    * — a SIBLING of the batch store, so parquet partition discovery
    * over the batch dir never sees non-`batch_id=` entries. */
  private def compactionDir(dir: String): Path =
    new Path(dir.stripSuffix("/") + ".c")

  /** The newest batch id with a commit file in a Structured Streaming
    * checkpoint — the replay horizon [[compactBatches]] enforces
    * (commit files are plain-integer names under `commits/`; the engine
    * writes one only after the batch's sinks completed, and never
    * re-executes a committed batch on restart). */
  private[stream] def lastCommittedBatch(spark: SparkSession,
      checkpointLocation: String): Option[Long] = {
    val commits = new Path(checkpointLocation, "commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.VersionedPaths.listNumbered(fs, commits, "", dirsOnly = false)
      .map(_._2).maxOption
  }

  /** Latest published (horizon, consolidated-segment path), if any. */
  private def latestCompaction(spark: SparkSession,
      dir: String): Option[(Long, String)] = {
    val c = compactionDir(dir)
    val fs = c.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.VersionedPaths.listNumbered(fs, c, "m=", dirsOnly = false)
      .sortBy(_._2).lastOption.map { case (p, _) =>
        val in = fs.open(p)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .map(_.trim).filter(_.nonEmpty).toList
          finally in.close()
        require(lines.size == 2, s"torn compaction manifest $p")
        (lines.head.toLong, new Path(c, lines(1)).toString)
      }
  }

  /** RETENTION compaction for `batch_id=`-partitioned stores — the
    * maintenance pass that keeps "one partition per trigger forever"
    * from becoming the small-files/unbounded-listing killer at a
    * standing monitor's time scale (the `CdcIngest` keep-window +
    * [[graft.sink.Compaction]] economics, generalized to every
    * [[MicroBatchIngest]] store): all batch partitions with
    * `batch_id` ≤ `throughBatch` — plus the previous consolidated
    * segment — are folded into ONE new segment under the sibling
    * `<dir>.c/`, published via the shared atomic-manifest rules
    * ([[graft.ops.VersionedPaths.publish]]: readers see the old view or
    * the new one, never a torn mix), and the superseded batch
    * partitions are swept best-effort (a crash leaves them ignored by
    * the horizon filter, re-swept next time — self-healing, never
    * double-counted). `batch_id` survives as a DATA column in the
    * segment, so [[storeOrElse]] stays row-identical before and after.
    *
    * `throughBatch` must lag the stream's replay horizon (batches that
    * can still be redelivered must stay partition-granular — exactly
    * the CdcIngest keep-window rule), and for a checkpointed stream
    * that contract is now ENFORCED, not trusted: pass the stream's
    * `checkpointLocation` and the call READS its `commits/` ledger —
    * a batch is past the replay horizon exactly when its commit file
    * exists (Structured Streaming re-executes only the batch after the
    * last commit on restart) — and REFUSES any horizon beyond the last
    * committed batch (IllegalArgumentException; an unsafe compact would
    * silently break the replay convergence every ingest store proves:
    * compaction erases the batch partitions whose presence makes a
    * redelivered write an overwrite-in-place). `None` is ONLY for
    * stores not fed by a checkpointed stream (batch backfills, direct
    * `processBatch` harnesses), where the caller owns the horizon.
    * Like the index vacuums, this is a maintenance-window pass: no
    * concurrent readers mid-sweep. Returns the published horizon
    * (prior horizon when a no-op). */
  def compactBatches(spark: SparkSession, dir: String,
      throughBatch: Long,
      checkpointLocation: Option[String] = None): Long = {
    checkpointLocation.foreach { ckpt =>
      val maxSafe = lastCommittedBatch(spark, ckpt).getOrElse(
        throw new IllegalArgumentException(
          s"unsafe compaction horizon $throughBatch: checkpoint $ckpt has " +
            "no committed batches — nothing is provably past the replay " +
            "horizon"))
      require(throughBatch <= maxSafe,
        s"unsafe compaction horizon $throughBatch: checkpoint $ckpt has " +
          s"committed only through batch $maxSafe; later batches can be " +
          "redelivered and must stay partition-granular")
    }
    val c = compactionDir(dir)
    val fs = c.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior = latestCompaction(spark, dir)
    val priorHorizon = prior.map(_._1).getOrElse(-1L)
    if (throughBatch <= priorHorizon) return priorHorizon
    val recent =
      try Some(spark.read.parquet(dir))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    if (recent.isEmpty && prior.isEmpty) return priorHorizon // nothing yet
    val fresh = recent.map(_
      .withColumn("batch_id", col("batch_id").cast("long"))
      .where(col("batch_id") > priorHorizon &&
        col("batch_id") <= throughBatch))
    val folded = (prior.map(p => spark.read.parquet(p._2)), fresh) match {
      case (Some(cons), Some(f)) => cons.unionByName(f)
      case (Some(cons), None)    => cons
      case (None, Some(f))       => f
      case _                     => return priorHorizon
    }
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    folded.write.mode(SaveMode.Overwrite)
      .parquet(new Path(c, seg).toString)
    val tmp = new Path(c, s".manifest-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(s"$throughBatch\n$seg\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val v = graft.ops.VersionedPaths.listNumbered(fs, c, "m=",
      dirsOnly = false).map(_._2).maxOption.getOrElse(-1L) + 1
    graft.ops.VersionedPaths.publish(fs, c, tmp, "m=", v)
    // Best-effort sweeps — all ignored-by-the-reader state: superseded
    // batch partitions, manifests older than the new one, and segments
    // the new manifest does not reference (incl. orphans of crashed
    // runs). A failure retries at the next compaction.
    try {
      val part = ("^batch_id=(-?\\d+)$").r
      fs.listStatus(new Path(dir)).toSeq.filter(_.isDirectory)
        .foreach { s =>
          s.getPath.getName match {
            case part(n) if n.toLong <= throughBatch =>
              fs.delete(s.getPath, true)
            case _ => ()
          }
        }
      graft.ops.VersionedPaths.pruneOlderThan(fs, c, "m=", dirsOnly = false,
        latest = v, keep = 1, label = "MicroBatchIngest.compact")
      fs.listStatus(c).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg-") &&
          s.getPath.getName != seg)
        .foreach(s => fs.delete(s.getPath, true))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[MicroBatchIngest.compact] sweep failed " +
          s"(will retry): $e")
    }
    throughBatch
  }

  /** EXACT ERASURE from a `batch_id=`-partitioned store — deletion
    * propagated into the maintainers' OUTPUT stores (survivor corpora,
    * mined pairs, CDC slices), with the replay contract ENFORCED
    * rather than trusted: a batch partition is this store family's
    * replay no-op marker ([[writeBatchPartition]]'s dynamic overwrite
    * recomputes a redelivered batch's rows — victims included — back
    * into its own partition), so victims may be dropped only from
    * state no live checkpoint can redeliver:
    *
    *  - the consolidated segment (compacted batches are provably past
    *    the replay horizon — [[compactBatches]] enforced it), and
    *  - batch partitions at or below the stream's last COMMITTED batch
    *    (Structured Streaming re-executes only the batch after the
    *    last commit).
    *
    * Victim rows in a LATER partition refuse loudly — erasing them
    * would silently resurrect on redelivery, the exact hazard
    * [[graft.ops.BatchHorizon]] closes for the manifest stores; here
    * the remedy is to retry after the stream commits the in-flight
    * batch. `checkpointLocation = None` only for stores not fed by a
    * checkpointed stream, where the caller owns the horizon (every
    * partition is then erasable) — the [[compactBatches]] rule.
    *
    * Scale shape: one semi-join scan finds the victim-bearing
    * partitions; ONLY those rewrite (dynamic overwrite; a partition
    * left EMPTY by the erase is deleted outright — dynamic overwrite
    * cannot write an empty partition), plus the consolidated segment
    * iff it holds victims (rewritten under a new manifest at the SAME
    * horizon). O(victim-bearing partitions + segment), never O(store).
    * The victim frame's FIRST column, cast to BIGINT, matches `idCol`
    * (the store-forget overload convention). Returns rows dropped.
    * Maintenance-window op like the compactions: no concurrent
    * writers. Wire it as a [[graft.gov.ForgetPipeline]] target for
    * cross-store erasure requests. */
  def forgetFromBatchStore(spark: SparkSession, dir: String,
      victims: DataFrame, idCol: String,
      checkpointLocation: Option[String]): Long = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val v = victims.select(
        col(victims.columns.head).cast("long").as(idCol))
      .distinct().localCheckpoint(true)
    try {
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prior = latestCompaction(spark, dir)
      val compHorizon = prior.map(_._1).getOrElse(-1L)
      val commitHorizon: Long = checkpointLocation match {
        case Some(ckpt) => lastCommittedBatch(spark, ckpt).getOrElse(-1L)
        case None       => Long.MaxValue // caller owns the horizon
      }
      var dropped = 0L
      // Batch partitions the readers actually consult (> compHorizon).
      val recent =
        try Some(spark.read.parquet(dir)
          .withColumn("batch_id", col("batch_id").cast("long"))
          .where(col("batch_id") > compHorizon))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      recent.foreach { r =>
        val hit = r.join(v, Seq(idCol), "left_semi")
          .groupBy("batch_id").count().collect()
          .map(x => x.getLong(0) -> x.getLong(1)).toMap
        val pending = hit.keySet.filter(_ > commitHorizon)
        require(pending.isEmpty,
          s"victims present in not-yet-committed batch partitions " +
            s"${pending.toSeq.sorted.mkString(",")} of $dir — a " +
            "redelivery would resurrect them; retry after the stream " +
            "commits (or pass the correct checkpointLocation)")
        if (hit.nonEmpty) {
          val affected = hit.keySet.toSeq
          val survivors = r.where(col("batch_id").isin(affected: _*))
            .join(v, Seq(idCol), "left_anti")
            .localCheckpoint(true) // partition list + write read it once
          val kept = survivors.select("batch_id").distinct()
            .collect().map(_.getLong(0)).toSet
          survivors.write
            .option("partitionOverwriteMode", "dynamic")
            .mode(SaveMode.Overwrite)
            .partitionBy("batch_id")
            .parquet(dir)
          // Partitions whose every row was a victim: dynamic overwrite
          // wrote nothing for them — remove them whole.
          (hit.keySet -- kept).foreach(b =>
            fs.delete(new Path(dir, s"batch_id=$b"), true))
          dropped += hit.values.sum
        }
      }
      // Stale partitions at or below the compaction horizon are reader-
      // ignored but still hold victim BYTES (a crashed compact sweep) —
      // erasure must remove them, not just out-reference them.
      if (fs.exists(new Path(dir))) {
        val part = "^batch_id=(-?\\d+)$".r
        fs.listStatus(new Path(dir)).toSeq.filter(_.isDirectory).foreach {
          s => s.getPath.getName match {
            case part(n) if n.toLong <= compHorizon =>
              fs.delete(s.getPath, true)
            case _ => ()
          }
        }
      }
      // The consolidated segment, iff it holds victims: rewrite under a
      // new manifest at the SAME horizon (readers see old or new, never
      // torn); the superseded segment is swept immediately, best-effort
      // (it holds the victim bytes — the next compact re-sweeps on
      // failure).
      prior.foreach { case (horizon, segPath) =>
        val c = compactionDir(dir)
        val cons = spark.read.parquet(segPath)
        val nVictims = cons.join(v, Seq(idCol), "left_semi").count()
        if (nVictims > 0) {
          val seg = s"seg-${java.util.UUID.randomUUID()}"
          cons.join(v, Seq(idCol), "left_anti")
            .write.mode(SaveMode.Overwrite)
            .parquet(new Path(c, seg).toString)
          val tmp = new Path(c, s".manifest-${java.util.UUID.randomUUID()}")
          val out = fs.create(tmp, false)
          try out.write(s"$horizon\n$seg\n".getBytes(StandardCharsets.UTF_8))
          finally out.close()
          val mv = graft.ops.VersionedPaths.listNumbered(fs, c, "m=",
            dirsOnly = false).map(_._2).maxOption.getOrElse(-1L) + 1
          graft.ops.VersionedPaths.publish(fs, c, tmp, "m=", mv)
          try {
            graft.ops.VersionedPaths.pruneOlderThan(fs, c, "m=",
              dirsOnly = false, latest = mv, keep = 1,
              label = "MicroBatchIngest.forget")
            fs.delete(new Path(segPath), true)
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[MicroBatchIngest.forget] sweep failed " +
              s"(will retry at next compact): $e")
          }
          dropped += nVictims
        }
      }
      dropped
    } finally {
      // Release this call's checkpoint blocks (victim pin + survivor
      // frames) — the withReleasedCheckpoint discipline.
      val mine = sc.getPersistentRDDs.keySet.toSet -- before
      sc.getPersistentRDDs.filter { case (id, _) => mine(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
  }
}
