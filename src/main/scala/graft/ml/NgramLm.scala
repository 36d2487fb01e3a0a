package graft.ml

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TokenOps

/** Persisted ORDER-2 n-gram language model — the CCNet/KenLM-shaped
  * perplexity filter as a learn→serve loop (the `HashedLogReg.save/load`
  * / `BpeTrainer.save/load` discipline applied to the LM family): FIT
  * pays one tokenize+count pass over a reference corpus and persists
  * the vocabulary-sized unigram AND bigram count tables; SERVE scores
  * any later batch — a delta ingest, a streaming trigger, a candidate
  * corpus — against the FROZEN model without ever re-reading the
  * reference text. That split is the production shape of perplexity
  * filtering (CCNet trains on Wikipedia once, then filters Common Crawl
  * snapshots for years); the inline `q_text_heldout_ppl` /
  * `q_text_bigram_lm` queries compute the same statistics but re-derive
  * the LM per query.
  *
  * BOTH scoring kernels are BIT-IDENTICAL to their oracle-graded inline
  * twins, because both sides evaluate the SAME shared expression
  * strings over the SAME exact-integer counts (parquet round-trips the
  * BIGINTs exactly):
  *   - [[Model.score]] ≡ [[graft.queries.TextQueries.heldoutOf]]
  *     (`HeldoutInVocabSql`/`HeldoutOovSql`/`HeldoutDocAggSql` —
  *     add-one smoothing over the trained vocabulary, one OOV surprisal
  *     for unseen terms, floor-millinat quantization per TERM TYPE,
  *     exact-integer per-doc mean) — graded by `q_text_ppl_served`,
  *     which shares `q_text_heldout_ppl`'s oracle.
  *   - [[Model.scoreBigrams]] ≡ the inline interpolated bigram kernel
  *     (`BigramSurprisalSql` — 0.75·P(w₂|w₁) + 0.25·P(w₂), one ln +
  *     floor per BIGRAM TYPE, exact-integer per-doc mean; the
  *     c1first/cuni/t_total marginals are integer sums of the bigram
  *     table, so store-derived marginals equal inline-derived ones
  *     exactly) — graded by `q_text_bigram_served`, which shares
  *     `q_text_bigram_lm`'s oracle. Both pinned in `NgramLmSpec`.
  *
  * FULL LIFECYCLE (the `LexIndex`/`MinHashIndex` segment economics —
  * n-gram counts of EVERY order are ADDITIVE, which makes every
  * operation exact at every order):
  *   - `segments/seg-<uuid>/uni/`  — (term, cnt) BIGINT rows; `cnt` may be
  *     NEGATIVE in a forget segment (below).
  *   - `segments/seg-<uuid>/bi/`   — (w1, w2, cnt) BIGINT rows, same
  *     sign convention; written from the SAME tokenize pass as `uni/`
  *     (one explode of unigram+bigram gram structs — the corpus text
  *     is read once per lifecycle operation, not once per order).
  *   - `segments/seg-<uuid>/meta/` — ONE row (t_total = Σuni cnt,
  *     v_size = uni rows, b_total = Σbi cnt, b_size = bi rows) per
  *     segment; [[load]] cross-checks EVERY live segment's BOTH tables
  *     against its meta, so a torn store (lost part-files) fails loudly
  *     instead of serving a silently-sharper LM (the explicit-width
  *     rule from the logreg store).
  *   - `m=N` manifest — live segment names, temp-write + ONE atomic
  *     rename ([[graft.ops.VersionedPaths.publish]]): readers see the
  *     old or the new segment set, never a torn mix.
  *   - [[Model.append]] counts only the delta text — exact by
  *     additivity (served scores ≡ a from-scratch fit on the union).
  *   - [[Model.forget]] writes a NEGATIVE-count segment from the victim
  *     docs' own text: the rolled-up vocabulary (zero-sum terms
  *     dropped) equals a fit on the redacted corpus BIT-FOR-BIT — exact
  *     right-to-be-forgotten for LM state, no rebuild, the reference
  *     corpus is never re-read. (Contract: forget exactly the text that
  *     was ingested, at most once — subtracting twice, or text never
  *     added, drives counts negative; [[Model.vocab]] fails loudly on
  *     any negative rolled count rather than serve an impossible LM.)
  *   - [[Model.compact]] folds live segments into one (additive sums,
  *     zero rows dropped); [[Model.vacuum]] shares [[graft.sim.IndexVacuum]].
  *
  * The vocabulary is DISTRIBUTED state (unlike the O(B) logreg weights,
  * a corpus vocabulary outgrows the driver; it stays a parquet-backed
  * frame end to end). Scale shape: fit/append are one explode +
  * hash-count over THEIR batch (map-side combined, vocabulary-sized
  * output — Heaps-sublinear); scoring a batch is one tokenize of the
  * batch + a vocabulary join (AQE broadcasts the type table when small)
  * + a doc-keyed aggregation. Nothing scales with the reference corpus
  * after fit. */
object NgramLm {

  /** Fit on a reference corpus and persist under `dir` (manifest v0, or
    * the next version over an existing store). A REBUILD over an
    * existing store is a FOLD for replay purposes: the live batch-named
    * segments vanish from the manifest, so the new manifest must carry
    * the realized-forget token ledger, an [[graft.ops.BatchHorizon]]
    * advanced past every live batch segment, and the stream-identity
    * pin — otherwise a pre-rebuild batch redelivered afterwards would
    * re-append (double-adding rows the rebuild already counted, or
    * resurrecting victims a pre-rebuild forget erased). The rebuild
    * deliberately DROPS any `gate`/`inc` lines: its one segment counts
    * every order from the (redacted) corpus the caller passes, so
    * incompleteness and serving gates end here — this is the "full
    * refit" [[Model.forget]]'s legacy-store rule points at. */
  def fit(docs: DataFrame, textCol: String, dir: String): Unit = {
    // Bound to the FRAME's session (not SparkSession.active — a
    // foreachBatch clone or a two-session test would otherwise read
    // the manifest under one session's hadoopConfiguration and write
    // segments under another's, a torn store by construction).
    val store = new Store(docs.sparkSession, dir)
    val snap = store.snapshot()
    val (tokens, horizon, sid) = snap match {
      case Some(s) => (s.tokens,
        graft.ops.BatchHorizon.afterFold(s.horizon, s.segments), s.sid)
      case None => (Set.empty[String], None, None)
    }
    store.publish(Seq(store.writeSegment(gramCountsOf(docs, textCol))),
      tokens, horizon, sid, basedOn = snap.map(_.version))
    ()
  }

  /** True iff a complete (manifest-published) store exists under `dir`. */
  def storeExists(spark: SparkSession, dir: String): Boolean =
    new Store(spark, dir).currentVersion().isDefined

  /** First-batch form of the streaming maintainer
    * ([[graft.stream.LmIngest]]): one BATCH-NAMED segment published as
    * the first manifest — replay-idempotent together with
    * [[Model.appendBatch]] (a redelivery of batch 0 after the store
    * exists routes through appendBatch and publishes nothing; a crash
    * before the first publish replays into an identical overwrite). */
  private[graft] def fitBatch(docs: DataFrame, textCol: String,
      dir: String, batchId: Long,
      streamId: Option[String] = None): Unit = {
    val store = new Store(docs.sparkSession, dir)
    // basedOn = None: the caller observed no store (m=0 expected) — a
    // concurrent first publish makes this one fail loudly instead of
    // clobbering it ([[Store.publish]]'s CAS rule).
    store.publish(Seq(store.writeNamedSegment(
      gramCountsOf(docs, textCol), s"seg-batch-$batchId")),
      sid = streamId, basedOn = None)
    ()
  }

  /** One tokenize+count pass over a batch — the single definition every
    * lifecycle operation sketches with. Unigrams, bigrams AND trigrams
    * ride ONE explode (unigram rows carry w2 = w3 = NULL, bigram rows
    * w3 = NULL), so the batch text is read once for all three orders;
    * the split into the three tables happens on the vocabulary-sized
    * aggregate at segment-write time. The n-gram construction is the
    * inline kernels': consecutive token tuples, docs under n tokens
    * contribute none at order n (the slice length clamps to 0 —
    * `sequence(1, size-n+1)` at size < n would be DESCENDING, the trap
    * the inline queries guard with `size >= n` filters). */
  private def gramCountsOf(docs: DataFrame, textCol: String): DataFrame =
    graft.queries.Tables.fanout(docs)
      .withColumn("toks", TokenOps.terms(col(textCol)))
      .select(explode(expr(
        """concat(
          |  transform(toks, w -> struct(w AS w1,
          |    CAST(NULL AS STRING) AS w2, CAST(NULL AS STRING) AS w3)),
          |  transform(slice(toks, 1, greatest(size(toks) - 1, 0)),
          |    (w, i) -> struct(w AS w1, element_at(toks, i + 2) AS w2,
          |      CAST(NULL AS STRING) AS w3)),
          |  transform(slice(toks, 1, greatest(size(toks) - 2, 0)),
          |    (w, i) -> struct(w AS w1, element_at(toks, i + 2) AS w2,
          |      element_at(toks, i + 3) AS w3)))"""
          .stripMargin)).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"), col("g.w3").as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt"))

  /** Load a LIVE handle with torn-store verification on every live
    * segment (see class doc). The checks are vocabulary-sized
    * aggregates — model-state cost, not corpus cost. A live handle
    * re-resolves the NEWEST manifest version on every read, which is
    * what the mutation-through-handle contract needs (append/forget/
    * compact on the same handle serve the post-mutation state,
    * spec-pinned); a standing scorer that must never change vocabulary
    * mid-stream wants [[loadPinned]] instead. */
  def load(spark: SparkSession, dir: String): Model = {
    val store = new Store(spark, dir)
    verifySegments(spark, store, store.snapshotOrThrow().segments)
    new Model(spark, store, pinned = None)
  }

  /** [[load]] PINNED to the newest version at load time: every later
    * read resolves exactly that version — the standing-scorer contract
    * ([[graft.stream.QualityGateIngest]]/[[graft.stream.CcnetScoreIngest]]:
    * two halves of a corpus must never be graded by different
    * vocabularies), now enforced rather than assumed (a live handle
    * would silently adopt a concurrent refit or append mid-stream).
    * A pinned handle is READ-ONLY — mutations throw. Retention note:
    * [[Model.vacuum]] sweeps old versions; keep enough history to
    * outlast the standing scorers' restart cadence, or a sweep breaks
    * their pinned reads. */
  def loadPinned(spark: SparkSession, dir: String): Model = {
    val store = new Store(spark, dir)
    val snap = store.snapshotOrThrow()
    verifySegments(spark, store, snap.segments)
    new Model(spark, store, pinned = Some(snap.version))
  }

  private def verifySegments(spark: SparkSession, store: Store,
      segs: Seq[String]): Unit = {
    val dir = store.dir
    segs.foreach { seg =>
      val metaRows = spark.read.parquet(store.segPath(seg, "meta")).collect()
      require(metaRows.length == 1,
        s"LM store at $dir/$seg has ${metaRows.length} meta rows (want 1)")
      val m = metaRows.head
      // LEGACY segments predate the bi/ (order-1 vintage) or tri/
      // (order-2 vintage) tables and declare no b_*/tri_* meta — they
      // load fine (absent transitions roll as an empty table; the
      // store stays servable, never bricked) and the first compact()
      // rewrites them in the full FORMAT. Format only: the absent
      // transitions stay absent (partial counts are the documented
      // serving semantics), compact records that with an `inc` marker,
      // and a forget against an incomplete order skips its negatives
      // and GATES that order's serving until a full refit
      // ([[Model.forget]]). The cross-check still runs on every
      // segment that DECLARES the order.
      val wanted: Seq[(String, Long, Long)] =
        Seq(("uni", m.getAs[Long]("v_size"), m.getAs[Long]("t_total"))) ++
          (if (m.schema.fieldNames.contains("b_size"))
            Seq(("bi", m.getAs[Long]("b_size"), m.getAs[Long]("b_total")))
          else Nil) ++
          (if (m.schema.fieldNames.contains("tri_size"))
            Seq(("tri", m.getAs[Long]("tri_size"), m.getAs[Long]("tri_total")))
          else Nil)
      // ONE action for all declared tables (a tagged union of the three
      // vocabulary-sized aggregates), not one job per table: load-time
      // verification sits on the serving path of every `*_served` query,
      // and three sequential tiny jobs cost ~3 job launches where one
      // suffices (round-15; semantics identical — same counts, same
      // failure messages).
      val checks = wanted.map { case (table, _, _) =>
        spark.read.parquet(store.segPath(seg, table))
          .agg(count(lit(1)).as("n"), coalesce(sum("cnt"), lit(0L)).as("s"))
          .select(lit(table).as("tbl"), col("n"), col("s"))
      }.reduce(_ unionAll _).collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      wanted.foreach { case (table, nWant, sWant) =>
        val (n, sSum) = checks(table)
        require(n == nWant,
          s"LM store at $dir is torn: segment $seg/$table has " +
            s"$n rows for declared $nWant")
        require(sSum == sWant,
          s"LM store at $dir is torn: segment $seg/$table count sum " +
            s"$sSum for declared $sWant")
      }
    }
  }

  /** One PARSED manifest read — everything a lifecycle operation needs
    * to know about the store, captured atomically from a single
    * version. Lifecycle ops read through this instead of 6–8
    * independent accessor calls (each of which re-lists the directory
    * and re-parses the manifest — on an object store that is one
    * metadata round-trip apiece), and they publish AGAINST
    * [[Snapshot.version]] ([[Store.publish]]'s basedOn rule), so two
    * interleaved writers can no longer silently drop each other's
    * lines. */
  private[NgramLm] final case class Snapshot(
      version: Long,
      segments: Seq[String],
      tokens: Set[String],
      horizon: Option[Long],
      sid: Option[String],
      gates: Set[String],
      inc: Set[String])

  /** Manifest + segment plumbing (the shared store rules). */
  private[NgramLm] final class Store(spark: SparkSession, val dir: String) {
    private def fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def currentVersion(): Option[Long] =
      graft.ops.VersionedPaths.listNumbered(fs, new Path(dir), "m=",
          dirsOnly = false)
        .map(_._2).sorted.lastOption

    /** The fully parsed state of manifest `v` (see [[Snapshot]]). */
    def snapshotAt(v: Long): Snapshot = {
      val lines = manifestLines(v)
      val payload = lines.filterNot(l => l.startsWith("tok ") ||
        l.startsWith("gate ") || l.startsWith("inc "))
      val (segs, horizon) = graft.ops.BatchHorizon.split(payload)
      Snapshot(v, segs,
        lines.collect { case s if s.startsWith("tok ") => s.drop(4) }.toSet,
        horizon,
        graft.ops.BatchHorizon.splitSid(lines),
        lines.collect { case s if s.startsWith("gate ") =>
          s.drop(5).trim }.toSet,
        lines.collect { case s if s.startsWith("inc ") =>
          s.drop(4).trim }.toSet)
    }

    def snapshot(): Option[Snapshot] = currentVersion().map(snapshotAt)

    def snapshotOrThrow(): Snapshot = snapshot().getOrElse(
      throw new IllegalStateException(s"no complete LM store under $dir"))

    private def manifestLines(v: Long): Seq[String] = {
      val in = fs.open(new Path(dir, s"m=$v"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    }

    // Manifest format, all read through [[snapshotAt]]:
    //  - one SEGMENT name per line;
    //  - `tok <token>` — the REALIZED-FORGET TOKEN LEDGER: compact()
    //    folds forget segments away (their negatives realize into the
    //    summed counts), which would otherwise erase the
    //    `seg-forget-<token>` name [[Model.forgetBatch]]'s replay
    //    no-op keys on; token lines survive every publish, so the
    //    no-op check stays true across compactions. Audit-ledger-sized
    //    growth: one short line per erasure REQUEST.
    //  - `gate <table>` — SERVING GATES: order tables an erasure ran
    //    against while incomplete; serving them would leak un-redacted
    //    transitions, so [[Model.requireServable]] throws until a full
    //    refit ([[NgramLm.fit]]) clears the line.
    //  - `inc <table>` — INCOMPLETE-ORDER markers: some live ingests
    //    predate the table (legacy vintage). Written the first time a
    //    fold or forget OBSERVES a missing table dir, carried forever
    //    (compaction's full-format rewrite blinds the missing-dir
    //    test, but the absent transitions stay absent).
    //  - `bh <id>` / `sid <token>` — the replay horizon and
    //    stream-identity pin ([[graft.ops.BatchHorizon]]).
    // Legacy manifests simply lack the optional lines; segment names
    // are all `seg-…`, so the prefixes cannot collide.
    private def segmentsAt(v: Long): Seq[String] = snapshotAt(v).segments

    def segPath(seg: String, table: String): String =
      s"$dir/segments/$seg/$table"

    /** One segment from a combined (w1, w2, cnt) gram frame (w2 NULL on
      * unigram rows — [[gramCountsOf]]'s shape); meta written AFTER
      * uni+bi from the same checkpointed counts so load's cross-checks
      * catch any torn combination. The split into the two tables runs
      * on the vocabulary-sized aggregate, not the corpus. */
    def writeSegment(grams: DataFrame): String =
      writeNamedSegment(grams, s"seg-${java.util.UUID.randomUUID()}")

    def writeNamedSegment(grams: DataFrame, seg: String): String = {
      // Table writes + meta read one materialization; RELEASED before
      // returning (precise ids — [[graft.ops.CheckpointIds]]): nothing
      // returned references it, and an unreleased per-segment pin would
      // accumulate index-sized blocks per lifecycle op on a long-lived
      // driver (the stores-own-release contract [[graft.gov.ForgetPipeline]]
      // relies on).
      val c = grams.localCheckpoint(true)
      try writeSegmentTables(c, seg)
      finally graft.ops.CheckpointIds.release(c)
    }

    private def writeSegmentTables(c: DataFrame, seg: String): String = {
      c.where(col("w2").isNull).select(col("w1").as("term"), col("cnt"))
        .write.mode(SaveMode.Overwrite).parquet(segPath(seg, "uni"))
      c.where(col("w2").isNotNull && col("w3").isNull)
        .select("w1", "w2", "cnt")
        .write.mode(SaveMode.Overwrite).parquet(segPath(seg, "bi"))
      c.where(col("w3").isNotNull).select("w1", "w2", "w3", "cnt")
        .write.mode(SaveMode.Overwrite).parquet(segPath(seg, "tri"))
      c.agg(
          coalesce(sum(when(col("w2").isNull, col("cnt"))), lit(0L))
            .as("t_total"),
          count(when(col("w2").isNull, lit(1))).as("v_size"),
          coalesce(sum(when(col("w2").isNotNull && col("w3").isNull,
            col("cnt"))), lit(0L)).as("b_total"),
          count(when(col("w2").isNotNull && col("w3").isNull, lit(1)))
            .as("b_size"),
          coalesce(sum(when(col("w3").isNotNull, col("cnt"))), lit(0L))
            .as("tri_total"),
          count(when(col("w3").isNotNull, lit(1))).as("tri_size"))
        .write.mode(SaveMode.Overwrite).parquet(segPath(seg, "meta"))
      seg
    }

    /** Publish the next manifest version, OPTIMISTICALLY: `basedOn` is
      * the version the caller's reads were based on (None = the caller
      * observed no store), and the target is exactly basedOn + 1 —
      * never a publish-time re-listing. [[graft.ops.VersionedPaths.publish]]
      * throws if that version already exists, so a lifecycle op that
      * interleaved with another writer (a standing [[graft.stream.LmIngest]]
      * append racing a [[graft.gov.ForgetPipeline]] erasure) fails
      * LOUDLY and retries against the fresh state, instead of silently
      * rebuilding the manifest from stale reads — which would drop the
      * other writer's segment and `tok` ledger lines and resurrect
      * erased victims. */
    def publish(segs: Seq[String],
        tokens: Set[String] = Set.empty,
        horizon: Option[Long] = None,
        sid: Option[String] = None,
        gates: Set[String] = Set.empty,
        inc: Set[String] = Set.empty,
        basedOn: Option[Long]): Long = {
      val body = (segs ++ tokens.toSeq.sorted.map("tok " + _) ++
        gates.toSeq.sorted.map("gate " + _) ++
        inc.toSeq.sorted.map("inc " + _) ++
        graft.ops.BatchHorizon.lines(horizon) ++
        graft.ops.BatchHorizon.sidLines(sid))
        .mkString("\n") + "\n"
      val tmp = new Path(dir, s".manifest-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      graft.ops.VersionedPaths.publish(fs, new Path(dir), tmp, "m=",
        basedOn.map(_ + 1).getOrElse(0L))
    }

    def vacuum(keep: Int): (Int, Int) =
      graft.sim.IndexVacuum.vacuum(fs, dir, keep, segmentsAt,
        Seq("segments" -> "seg-"))

    /** Union of `table` across an EXPLICIT segment set — the caller
      * resolves the set once from its snapshot (live or pinned), so a
      * multi-read operation cannot straddle two versions. */
    def readUnion(segs: Seq[String], table: String): DataFrame =
      segs.map(s => spark.read.parquet(segPath(s, table)))
        .reduce(_ unionByName _)

    /** [[readUnion]] tolerating segments that predate the table (the
      * order-1 → order-2 migration: a legacy segment simply contributes
      * no rows). Empty-schema fallback keeps downstream plans
      * well-typed when NO segment has the table. */
    def readUnionTolerant(segs: Seq[String], table: String,
        schemaDdl: String): DataFrame = {
      val present = segs.map(s => segPath(s, table))
        .filter(p => fs.exists(new Path(p)))
      if (present.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      else present.map(spark.read.parquet(_)).reduce(_ unionByName _)
    }

    /** True iff any of `segs` has no `table` directory (a legacy
      * segment from before the order existed). */
    def anyMissing(segs: Seq[String], table: String): Boolean =
      segs.exists(s => !fs.exists(new Path(segPath(s, table))))
  }

  /** A verified handle; construct via [[load]] (live — every read
    * resolves the newest manifest, so mutations through the handle are
    * visible) or [[loadPinned]] (frozen at one version, read-only —
    * the standing-scorer contract). */
  final class Model private[NgramLm] (spark: SparkSession, store: Store,
      pinned: Option[Long]) {

    /** The version this read resolves: the pin, or the newest. */
    private def ver(): Long = pinned.getOrElse(
      store.currentVersion().getOrElse(throw new IllegalStateException(
        s"no complete LM store under ${store.dir}")))

    /** One parsed manifest read for this access ([[Store.snapshotAt]]). */
    private def readSnap(): Snapshot = store.snapshotAt(ver())

    private def requireMutable(): Unit =
      if (pinned.nonEmpty) throw new IllegalStateException(
        s"LM handle on ${store.dir} is PINNED to version ${pinned.get} " +
          "(loadPinned) and read-only — load() a live handle to mutate")

    /** The shared roll-up: per-key sums across the resolved segments,
      * zero-sum keys dropped (a fully-forgotten n-gram is ABSENT,
      * exactly as in a redacted-corpus fit), loud on any negative
      * rolled count — that is a broken forget contract, not a servable
      * LM. ONE definition for all three orders so the algebra and the
      * guard cannot drift between them. */
    private def rolledNonNeg(read: DataFrame, keys: Seq[String],
        what: String): DataFrame = {
      val rolled = read.groupBy(keys.map(col): _*)
        .agg(sum("cnt").as("cnt"))
        .where(col("cnt") =!= 0L)
      val label: Seq[org.apache.spark.sql.Column] =
        lit(s"LM store at ${store.dir} rolled a negative count for $what '") +:
          keys.zipWithIndex.flatMap { case (k, i) =>
            (if (i > 0) Seq(lit(" ")) else Seq.empty[org.apache.spark.sql.Column]) :+
              col(k) } :+
          lit("' — forget subtracted text never ingested")
      rolled.withColumn("cnt",
        when(col("cnt") < 0L, raise_error(concat(label: _*)))
          .otherwise(col("cnt")))
    }

    /** The rolled-up vocabulary (term, cnt) ([[rolledNonNeg]]). */
    def vocab(): DataFrame = vocabOf(readSnap())

    private def vocabOf(snap: Snapshot): DataFrame =
      rolledNonNeg(store.readUnion(snap.segments, "uni"),
        Seq("term"), "term")

    /** Loud serving gate (`gate` manifest lines): an erasure ran while
      * this order's table was incomplete, so its rolled counts still
      * contain transitions the committed erasure claims are gone —
      * serving them would leak. The negative-count raise_error never
      * fires for this case (the forget SKIPPED the inexact negatives);
      * it remains the broken-contract guard it always was. */
    private def requireServable(snap: Snapshot, table: String): Unit =
      if (snap.gates.contains(table))
        throw new IllegalStateException(
          s"LM store at ${store.dir}: order-" +
            (if (table == "tri") "3" else "2") +
            s" serving is GATED — an erasure ran while the $table " +
            "table was incomplete (legacy segments predating it were " +
            "live), so the victims' transitions could not be " +
            "subtracted exactly and the rolled counts would leak " +
            "them. Refit the store on the redacted corpus " +
            "(NgramLm.fit over this dir) to restore this order.")

    /** The rolled-up bigram table (w1, w2, cnt) — [[rolledNonNeg]]
      * at order 2. Legacy order-1 segments contribute no rows
      * ([[Store.readUnionTolerant]]); throws when order-2 serving is
      * gated ([[requireServable]]). */
    def bigrams(): DataFrame = bigramsOf(readSnap())

    private def bigramsOf(snap: Snapshot): DataFrame = {
      requireServable(snap, "bi")
      rolledNonNeg(store.readUnionTolerant(snap.segments, "bi",
          "w1 STRING, w2 STRING, cnt BIGINT"),
        Seq("w1", "w2"), "bigram")
    }

    /** The rolled-up trigram table (w1, w2, w3, cnt) — [[rolledNonNeg]]
      * at order 3. Legacy order-2 segments contribute no rows; throws
      * when order-3 serving is gated ([[requireServable]]). */
    def trigrams(): DataFrame = trigramsOf(readSnap())

    private def trigramsOf(snap: Snapshot): DataFrame = {
      requireServable(snap, "tri")
      rolledNonNeg(store.readUnionTolerant(snap.segments, "tri",
          "w1 STRING, w2 STRING, w3 STRING, cnt BIGINT"),
        Seq("w1", "w2", "w3"), "trigram")
    }

    private def statsOf(vocabDf: DataFrame): DataFrame =
      vocabDf.agg(coalesce(sum("cnt"), lit(0L)).as("t_total"),
        count(lit(1)).as("v_size"))

    /** Score a batch under the frozen LM: (doc_id, n_tokens, n_oov,
      * heldout_mb) — the `q_text_heldout_ppl` output contract, unsorted
      * (callers order). Only the BATCH is tokenized. ONE snapshot feeds
      * the vocabulary and both totals reads — on a live handle a
      * concurrent publish between independent resolutions would
      * otherwise mix two versions' counts in one statistic. */
    def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
      val snap = readSnap()
      val voc = vocabOf(snap)
      val stats = statsOf(voc)
      val tf = docs
        .select(col(idCol).as("doc_id"),
          explode(TokenOps.terms(col(textCol))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("k"))
      val lmQ = voc.crossJoin(broadcast(stats))
        .select(col("term"),
          expr(graft.queries.TextQueries.HeldoutInVocabSql).as("mln"))
      tf.join(lmQ, Seq("term"), "left_outer")
        .crossJoin(broadcast(stats))
        .withColumn("mln_eff",
          coalesce(col("mln"), expr(graft.queries.TextQueries.HeldoutOovSql)))
        .groupBy("doc_id")
        .agg(sum("k").as("n_tokens"),
          sum(when(col("mln").isNull, col("k")).otherwise(0L)).as("n_oov"),
          expr(graft.queries.TextQueries.HeldoutDocAggSql).as("heldout_mb"))
    }

    /** The scored TYPE table of the frozen model, rolled once PER STORE
      * VERSION: the vocabulary²-sized roll-up is cached keyed on the
      * manifest version the handle currently resolves — a standing
      * [[graft.stream.QualityGateIngest]] calls [[scoreBigrams]] every
      * trigger against ONE handle and holds exactly one
      * model-state-sized block set, while an append/forget/compact
      * THROUGH the same handle moves the version and transparently
      * rebuilds (the prior design's lazy val served STALE type scores
      * after a mutation, breaking "append sequence ≡ fit on the
      * union"). The intermediate c2 roll-up's checkpoint blocks are
      * released as soon as the final scored table materializes — only
      * the serving table stays pinned — and a rebuild retires the
      * previous version's blocks ONE GENERATION LATE (see
      * `retiredBlockIds`): a [[scoreBigrams]] result held across a
      * single mutation through this handle still evaluates; only a
      * second mutation invalidates it. */
    private var bigramScoresCache: Option[(Long, DataFrame, Set[Int])] =
      None
    // ONE retired generation stays alive (blocks un-reclaimed) so a
    // DataFrame a caller obtained from [[scoreBigrams]] BEFORE the
    // latest mutation through this handle still evaluates — its
    // localCheckpoint lineage is truncated, so unpersisting it eagerly
    // would make any held result fail with missing checkpoint blocks
    // (recompute is impossible). The generation retires for good (and
    // its blocks release) only when a SECOND mutation lands: held
    // results are valid across at most one append/forget/compact.
    private var retiredBlockIds: Set[Int] = Set.empty

    private def bigramTypeScores: DataFrame = synchronized {
      // ONE snapshot supplies both the cache key and the data — on a
      // live handle, keying on ver() but letting bigrams() re-resolve
      // independently could cache version-v+1 data under key v when a
      // publish lands between the two reads.
      val snap = readSnap()
      val v = snap.version
      bigramScoresCache match {
        case Some((cv, df, _)) if cv == v => df
        case stale =>
          val sc = spark.sparkContext
          sc.getPersistentRDDs
            .filter { case (id, _) => retiredBlockIds(id) }
            .values.foreach(_.unpersist(blocking = false))
          retiredBlockIds = stale.map(_._3).getOrElse(Set.empty)
          // One read of the rolled table feeds c2 and both marginals.
          // Block attribution is PRECISE ([[graft.ops.CheckpointIds]]
          // reads the ids off the frames themselves) — a session-global
          // before/after diff would claim a concurrent thread's
          // checkpoint and unpersisting that breaks its
          // lineage-truncated frame permanently.
          val c2 = bigramsOf(snap).withColumnRenamed("cnt", "c2")
            .localCheckpoint(true)
          val cFirst = c2.groupBy("w1").agg(sum("c2").as("c1first"))
          val uni2 = c2.groupBy(col("w2").as("w")).agg(sum("c2").as("cuni"))
          val total = uni2.agg(coalesce(sum("cuni"), lit(0L)).as("t_total"))
          val scored = c2.join(cFirst, Seq("w1"))
            .join(uni2, c2("w2") === uni2("w"))
            .crossJoin(broadcast(total))
            .select(col("w1"), col("w2"),
              expr(graft.queries.TextQueries.BigramSurprisalSql)
                .as("surprisal_mb"))
            .localCheckpoint(true)
          graft.ops.CheckpointIds.release(c2)
          bigramScoresCache =
            Some((v, scored, graft.ops.CheckpointIds.of(scored)))
          scored
      }
    }

    /** The scored batch's (doc_id, w1, w2, k) bigram counts — the one
      * doc-side tokenize pass both order-2 scoring kernels share. */
    private def docBigrams(docs: DataFrame, idCol: String,
        textCol: String): DataFrame = docs
      .withColumn("toks", TokenOps.terms(col(textCol)))
      .where(size(col("toks")) >= 2)
      .select(col(idCol).as("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS w1,
          |              element_at(toks, i + 1) AS w2))""".stripMargin))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))

    /** Score a batch under the frozen INTERPOLATED BIGRAM LM:
      * (doc_id, n_bigrams, mean_surprisal_mb) — the `q_text_bigram_lm`
      * output contract, unsorted (callers order). Catches word-salad
      * documents whose unigram stats look normal but whose transitions
      * are improbable. Only the BATCH is tokenized; the c1first / cuni /
      * t_total marginals are integer sums of the stored bigram table,
      * so they equal the inline kernel's db-derived marginals exactly
      * and the shared [[graft.queries.TextQueries.BigramSurprisalSql]]
      * emission is bit-identical (graded by `q_text_bigram_served`).
      * Contract: bigrams ABSENT from the trained table drop from the
      * mean (inner join — the inline semantics, where scoring the
      * training corpus makes absence impossible); docs with < 2 tokens
      * produce no row. An order-2 OOV backoff is deliberately NOT
      * invented here — it would change the graded statistic. */
    def scoreBigrams(docs: DataFrame, idCol: String,
        textCol: String): DataFrame =
      docBigrams(docs, idCol, textCol)
        .join(bigramTypeScores, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(sum("k").as("n_bigrams"),
          expr("sum(k * surprisal_mb) DIV sum(k)").as("mean_surprisal_mb"))

    /** Interpolated KNESER–NEY scoring under the frozen order-2 store:
      * (doc_id, n_bigrams, kn_surprisal_mb) — `q_text_kn_lm`'s output
      * contract, unsorted (callers order). The discounted term and ALL
      * continuation counts (distinct continuations of w1, distinct
      * left-contexts of w2, distinct bigram types) are aggregates of
      * the rolled bigram table — additive counts, so store-derived
      * values equal inline-derived ones exactly and the shared
      * [[graft.queries.TextQueries.KnSurprisalSql]] emission is
      * bit-identical (graded by `q_text_kn_served`, which shares
      * `q_text_kn_lm`'s oracle). Same absent-bigram / short-doc
      * contract as [[scoreBigrams]]. The type roll-up is rebuilt per
      * call (vocabulary²-bounded reads of model state — no checkpoint
      * pinned, nothing cached; wire a [[bigramTypeScores]]-style cache
      * only if a standing per-trigger consumer appears). */
    def scoreKneserNey(docs: DataFrame, idCol: String,
        textCol: String): DataFrame =
      docBigrams(docs, idCol, textCol)
        .join(knTypeScores, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(sum("k").as("n_bigrams"),
          expr("sum(k * s_mb) DIV sum(k)").as("kn_surprisal_mb"))

    /** KN order-2 scored type table — the [[bigramTypeScores]]
      * generation-cache discipline (one roll per store version per
      * handle; the rolled c2 checkpoint is released as soon as the
      * scored table materializes; the previous generation retires one
      * mutation late). Added in r15: the per-call path re-read the
      * stored bigram table once per marginal (3× model-state parquet
      * scans + their stage launches per scoring call). */
    private var knScoresCache: Option[(Long, DataFrame, Set[Int])] = None
    private var knRetiredBlockIds: Set[Int] = Set.empty

    private def knTypeScores: DataFrame = synchronized {
      val snap = readSnap()
      val v = snap.version
      knScoresCache match {
        case Some((cv, df, _)) if cv == v => df
        case stale =>
          val sc = spark.sparkContext
          sc.getPersistentRDDs
            .filter { case (id, _) => knRetiredBlockIds(id) }
            .values.foreach(_.unpersist(blocking = false))
          knRetiredBlockIds = stale.map(_._3).getOrElse(Set.empty)
          val c2 = bigramsOf(snap).withColumnRenamed("cnt", "c2")
            .localCheckpoint(true)
          val cf = c2.groupBy("w1")
            .agg(sum("c2").as("c1first"), count(lit(1)).as("n1pr"))
          val cl = c2.groupBy("w2").agg(count(lit(1)).as("n1pl"))
          val nAll = c2.agg(count(lit(1)).as("n1pall"))
          val scored = c2.join(cf, Seq("w1")).join(cl, Seq("w2"))
            .crossJoin(broadcast(nAll))
            .select(col("w1"), col("w2"),
              expr(graft.queries.TextQueries.KnSurprisalSql).as("s_mb"))
            .localCheckpoint(true)
          graft.ops.CheckpointIds.release(c2)
          knScoresCache =
            Some((v, scored, graft.ops.CheckpointIds.of(scored)))
          scored
      }
    }

    /** The scored batch's (doc_id, w1, w2, w3, k) trigram counts — the
      * doc-side tokenize pass of the order-3 kernel. */
    private def docTrigrams(docs: DataFrame, idCol: String,
        textCol: String): DataFrame = docs
      .withColumn("toks", TokenOps.terms(col(textCol)))
      .where(size(col("toks")) >= 3)
      .select(col(idCol).as("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 2),
          |  i -> struct(element_at(toks, i) AS w1,
          |              element_at(toks, i + 1) AS w2,
          |              element_at(toks, i + 2) AS w3))""".stripMargin))
        .as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("k"))

    /** Interpolated TRIGRAM Kneser–Ney scoring under the frozen order-3
      * store: (doc_id, n_trigrams, kn3_surprisal_mb) — `q_text_kn3_lm`'s
      * output contract, unsorted (callers order). The full three-level
      * interpolation: discounted trigram ML, a CONTINUATION-count
      * bigram level (distinct left contexts of (w2,w3) among trigram
      * types — the Kneser–Ney correction at the middle order), and the
      * bigram-type continuation unigram the order-2 kernel already
      * uses. Every input is an integer aggregate of the rolled tri/bi
      * tables (additive counts — store-derived values equal
      * inline-derived ones exactly), and the shared
      * [[graft.queries.TextQueries.Kn3SurprisalSql]] emission is
      * bit-identical to the inline kernel's (graded by
      * `q_text_kn3_served`, which shares `q_text_kn3_lm`'s oracle).
      * Contract: trigrams absent from the trained table drop from the
      * mean (inner join); docs with < 3 tokens produce no row. Type
      * tables are vocabulary³-bounded in principle, Zipf-small in
      * practice (trigram types ≲ corpus tokens), AQE-broadcast when
      * small. */
    def scoreKneserNey3(docs: DataFrame, idCol: String,
        textCol: String): DataFrame =
      docTrigrams(docs, idCol, textCol)
        .join(kn3TypeScores, Seq("w1", "w2", "w3"))
        .groupBy("doc_id")
        .agg(sum("k").as("n_trigrams"),
          expr("sum(k * s_mb) DIV sum(k)").as("kn3_surprisal_mb"))

    /** KN order-3 scored type table — the [[bigramTypeScores]]
      * generation-cache discipline (see [[knTypeScores]]). Added in
      * r15: the per-call path re-read the stored trigram table once
      * per marginal (4× model-state parquet scans per scoring call)
      * plus the bigram table twice. ONE snapshot supplies both order
      * tables (a concurrent publish between independent resolutions
      * would otherwise interpolate across two versions). */
    private var kn3ScoresCache: Option[(Long, DataFrame, Set[Int])] = None
    private var kn3RetiredBlockIds: Set[Int] = Set.empty

    private def kn3TypeScores: DataFrame = synchronized {
      val snap = readSnap()
      val v = snap.version
      kn3ScoresCache match {
        case Some((cv, df, _)) if cv == v => df
        case stale =>
          val sc = spark.sparkContext
          sc.getPersistentRDDs
            .filter { case (id, _) => kn3RetiredBlockIds(id) }
            .values.foreach(_.unpersist(blocking = false))
          kn3RetiredBlockIds = stale.map(_._3).getOrElse(Set.empty)
          val c3 = trigramsOf(snap).withColumnRenamed("cnt", "c3")
            .localCheckpoint(true)
          val ctx = c3.groupBy("w1", "w2")
            .agg(sum("c3").as("cctx"), count(lit(1)).as("n3r"))
          val ml = c3.groupBy("w2", "w3").agg(count(lit(1)).as("n3l"))
          val mid = c3.groupBy("w2")
            .agg(count(lit(1)).as("n3mid"), countDistinct("w3").as("n3rt"))
          val c2types = bigramsOf(snap).localCheckpoint(true)
          val cl = c2types.groupBy("w2").agg(count(lit(1)).as("n1pl"))
            .withColumnRenamed("w2", "w3")
          val nAll = c2types.agg(count(lit(1)).as("n1pall"))
          val scored = c3.join(ctx, Seq("w1", "w2"))
            .join(ml, Seq("w2", "w3")).join(mid, Seq("w2"))
            .join(cl, Seq("w3")).crossJoin(broadcast(nAll))
            .select(col("w1"), col("w2"), col("w3"),
              expr(graft.queries.TextQueries.Kn3SurprisalSql).as("s_mb"))
            .localCheckpoint(true)
          graft.ops.CheckpointIds.release(c3)
          graft.ops.CheckpointIds.release(c2types)
          kn3ScoresCache =
            Some((v, scored, graft.ops.CheckpointIds.of(scored)))
          scored
      }
    }

    /** The CCNet-style gate: keep docs at or below `maxMb` mean
      * surprisal (high-surprisal docs read as gibberish/OCR noise under
      * the reference LM). A doc with NO tokens produces no tf rows and
      * no verdict — compose with the length gates that already screen
      * empty docs. */
    def gate(docs: DataFrame, idCol: String, textCol: String,
        maxMb: Long): DataFrame =
      score(docs, idCol, textCol)
        .withColumn("decision",
          when(col("heldout_mb") <= maxMb, "keep").otherwise("drop"))

    /** Incremental APPEND: count only the delta text, publish old
      * segments + the new one. Exact by additivity — served scores
      * after any append sequence equal a from-scratch fit on the union
      * (spec-pinned). Cost ∝ delta. */
    def append(docs: DataFrame, textCol: String): Long = {
      requireMutable()
      val snap = store.snapshotOrThrow() // one read, BEFORE the write
      store.publish(
        snap.segments :+ store.writeSegment(gramCountsOf(docs, textCol)),
        snap.tokens, snap.horizon, snap.sid, snap.gates, snap.inc,
        basedOn = Some(snap.version))
    }

    /** IDEMPOTENT per-batch append for the streaming maintainer
      * ([[graft.stream.LmIngest]]): batch-derived segment name, manifest
      * gains the segment at most once — an at-least-once redelivery
      * converges instead of double-counting (the
      * [[graft.sim.MinHashIndex.appendSigsAsBatch]] rule; a UUID-named
      * [[append]] under replay WOULD double-count, which is why the
      * streaming path must use this form). A segment already in the
      * live manifest is a TRUE no-op — published data is never
      * rewritten in place, so a crash mid-replay can't tear a segment
      * [[load]]'s cross-checks would then have to catch; the batch's
      * counts are deterministic, so skipping loses nothing. */
    private[graft] def appendBatch(docs: DataFrame, textCol: String,
        batchId: Long, streamId: Option[String] = None): Long = {
      requireMutable()
      val snap = store.snapshotOrThrow()
      // Identity pin FIRST (BatchHorizon.requireSid): the horizon no-op
      // below is sound only per checkpoint — a pinned store fed by a
      // different stream identity fails loudly here instead of silently
      // dropping every batch at or below the old horizon.
      graft.ops.BatchHorizon.requireSid(snap.sid, streamId,
        s"LM store ${store.dir}")
      val seg = s"seg-batch-$batchId"
      // Second no-op trigger: the batch is at or below the replay
      // horizon — a compact() already realized its counts into the
      // folded segment; re-appending would double-count them.
      if (snap.segments.contains(seg) ||
          graft.ops.BatchHorizon.realizedLoud(snap.horizon, batchId,
            store.dir))
        return snap.version
      store.writeNamedSegment(gramCountsOf(docs, textCol), seg)
      store.publish(snap.segments :+ seg, snap.tokens, snap.horizon,
        graft.ops.BatchHorizon.adoptSid(snap.sid, streamId),
        snap.gates, snap.inc, basedOn = Some(snap.version))
    }

    /** EXACT FORGET via a NEGATIVE-count segment: tokenize the victim
      * docs (their text must be exactly what was ingested, forgotten at
      * most once — the class-doc contract) and append their counts
      * NEGATED; the rolled vocabulary then equals a fit on the redacted
      * corpus bit-for-bit (spec-pinned), zero-sum terms vanishing from
      * the served vocabulary entirely. O(victim text), no rebuild.
      *
      * LEGACY stores ([[incompleteNow]]): orders whose table some live
      * ingest predates get NO negative rows (the victims' transitions
      * at that order were only partially ingested — subtracting the
      * full victim text would drive never-counted transitions
      * negative and brick serving on the raise_error guard forever,
      * surviving even compact). Instead the order is GATED
      * ([[requireServable]]) until a full refit: order-1 erasure stays
      * exact, incomplete orders stop serving rather than leak. */
    def forget(docs: DataFrame, textCol: String): Long = {
      requireMutable()
      val snap = store.snapshotOrThrow()
      val inc = incompleteNow(snap)
      store.publish(snap.segments :+ store.writeSegment(
        negGrams(gramCountsOf(docs, textCol), inc)),
        snap.tokens, snap.horizon, snap.sid, snap.gates ++ inc, inc,
        basedOn = Some(snap.version))
    }

    /** Orders whose table is INCOMPLETE in this snapshot: the
      * persisted `inc` marker (survives compaction's format rewrite),
      * any already-gated order (its counts are un-maintained by
      * definition), a missing-dir scan over the snapshot's segments
      * (the pre-marker legacy case), plus the [[auditVintage]] totals
      * cross-check — the one-time-migration guard for stores a
      * PRE-marker compact() already rewrote full-format (dirs present,
      * no `inc` line, missing-dir test blind) before this code could
      * observe their legacy vintage. */
    private def incompleteNow(snap: Snapshot): Set[String] =
      snap.inc ++ snap.gates ++
        Seq("bi", "tri").filter(t => store.anyMissing(snap.segments, t)) ++
        auditVintage(snap)

    /** Rolled (t_total, b_total, tri_total) across the snapshot's
      * segment metas — O(segments) one-row reads, the
      * [[NgramLm.verifySegments]] economics. Metas that predate an
      * order's fields contribute zero (those segments also lack the
      * dir, which the missing-dir scan flags independently). */
    private def rolledMetaTotals(snap: Snapshot): (Long, Long, Long) =
      snap.segments.foldLeft((0L, 0L, 0L)) { case ((t, b, tr), seg) =>
        val m = spark.read.parquet(store.segPath(seg, "meta")).head()
        def f(name: String): Long =
          if (m.schema.fieldNames.contains(name)) m.getAs[Long](name) else 0L
        (t + f("t_total"), b + f("b_total"), tr + f("tri_total"))
      }

    /** ONE-TIME MIGRATION AUDIT: orders whose rolled totals are
      * PROVABLY inconsistent with an exact corpus state. For any exact
      * fit (or any exact redaction of one) the per-doc identities
      * n unigrams / n−1 bigrams / max(n−2,0) trigrams force
      * `2·Σbi − Σuni ≤ Σtri ≤ Σbi` and `Σbi ≤ Σuni`; a store whose
      * trigram table only PARTIALLY covers its corpus (a legacy
      * order-2-vintage store that a pre-`inc`-marker compact() already
      * rewrote full-format, hiding it from the missing-dir test) falls
      * below the lower bound whenever the missing trigram mass exceeds
      * the one-token-doc slack. SOUND, not complete: a healthy store
      * can never trip it (zero false positives — safe to fold into
      * every forget via [[incompleteNow]]), while two incomplete
      * shapes stay inside the slack and need the documented operator
      * caveat — a partially-covered tri table whose missing mass is
      * under the one-token-doc slack, and an order-1-vintage store
      * whose partial bi AND tri came from the same post-upgrade
      * appends (internally consistent with a shorter-doc corpus; no
      * inequality can see it). Either way the rule is the same: a
      * store any of whose order tables predates some of its live
      * ingest must be gated by hand ([[gateOrders]]) before its first
      * post-upgrade forget if this audit comes back empty. */
    private[graft] def auditVintage(snap: Snapshot): Set[String] = {
      // An already-marked order's totals drift by design (forgets skip
      // its negatives), so only audit orders still believed complete —
      // and skip the O(segments) meta scan entirely when nothing the
      // audit could add is unmarked.
      def marked(o: String) = snap.inc(o) || snap.gates(o)
      if (marked("bi") && marked("tri")) return Set.empty
      val (t, b, tr) = rolledMetaTotals(snap)
      // Attribution by direction (legacy vintage only UNDER-counts):
      //  - b > t: impossible under any exact or under-counted state —
      //    corruption; gate bi.
      //  - tr > b: an under-counted TRI can only lower tr, so the
      //    upper bound can break only when BI is under-counted — and
      //    vintage ordering (the tri table postdates bi) means a store
      //    with partial bi cannot have certified-complete tri, so gate
      //    BOTH. Flagging only tri here would leave the next forget
      //    subtracting full bi negatives against the partial bi table —
      //    the exact brick this audit exists to stop.
      //  - tr < 2b − t: an under-counted bi only LOOSENS this bound,
      //    so a violation proves tri itself is short; gate tri.
      val biBad = !marked("bi") && (b > t || tr > b)
      val triBad = (!marked("tri") && !marked("bi") &&
          (tr < 2 * b - t || tr > b)) ||
        (!marked("tri") && biBad)
      (if (biBad) Set("bi") else Set.empty[String]) ++
        (if (triBad) Set("tri") else Set.empty[String])
    }

    /** [[auditVintage]] on the live snapshot — the operator-facing
      * migration check ("which orders of this store are provably not
      * full-corpus?"). */
    def auditVintage(): Set[String] = auditVintage(readSnap())

    /** MANUAL GATE — the migration path for a legacy store the totals
      * audit cannot prove inconsistent (the one-token-doc slack):
      * publishes the named orders as incomplete + gated, exactly what
      * a forget would have recorded had the pre-marker compact not
      * blinded the missing-dir test. Idempotent; cleared by a full
      * refit ([[NgramLm.fit]]), like every other gate. */
    def gateOrders(tables: Set[String]): Long = {
      requireMutable()
      require(tables.nonEmpty && tables.subsetOf(Set("bi", "tri")),
        s"gateOrders takes a non-empty subset of {bi, tri}, got $tables")
      val snap = store.snapshotOrThrow()
      if (tables.subsetOf(snap.gates) && tables.subsetOf(snap.inc))
        return snap.version
      store.publish(snap.segments, snap.tokens, snap.horizon, snap.sid,
        snap.gates ++ tables, snap.inc ++ tables,
        basedOn = Some(snap.version))
    }

    /** The NEGATED victim counts, with incomplete orders' rows
      * dropped (see [[forget]]). */
    private def negGrams(grams: DataFrame, inc: Set[String]): DataFrame = {
      val neg = grams.select(col("w1"), col("w2"), col("w3"),
        (-col("cnt")).as("cnt"))
      val noBi = if (inc("bi"))
        neg.where(!(col("w2").isNotNull && col("w3").isNull)) else neg
      if (inc("tri")) noBi.where(col("w3").isNull) else noBi
    }

    /** REQUEST-KEYED idempotent forget — the [[appendBatch]] rule
      * applied to the negative segment: the segment is named by the
      * caller's token (an erasure request id, a batch id), so an
      * at-least-once replay — a [[graft.gov.ForgetPipeline]] crash
      * between the LM forget and its ack, a redelivered trigger —
      * finds `seg-forget-<token>` already live and is a TRUE no-op
      * instead of subtracting the victims' counts a second time
      * (which would drive rolled counts negative and fail [[vocab]]
      * loudly). The UUID-named [[forget]] must never sit behind a
      * replayable orchestrator; this form is the one to wire there. */
    def forgetBatch(docs: DataFrame, textCol: String,
        token: String): Long = {
      requireMutable()
      // ASCII-only, matching the error message exactly:
      // Char.isLetterOrDigit would accept any Unicode letter, and a
      // non-ASCII segment name risks NFC/NFD path-normalization
      // differences between filesystems — the replay no-op's
      // live.contains(seg) could then miss the existing segment and
      // subtract twice, the precise failure the token exists to stop.
      require(token.nonEmpty && token.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_'),
        s"forget token must be [A-Za-z0-9_-]+, got '$token'")
      val snap = store.snapshotOrThrow()
      val seg = s"seg-forget-$token"
      // The no-op check consults BOTH the live segment name and the
      // manifest's realized-token ledger: [[compact]] folds the
      // seg-forget-<token> segment away (its negatives realize into
      // the summed counts) but the `tok <token>` manifest line
      // survives every later publish, so a replay landing AFTER a
      // compaction is still a true no-op instead of a second
      // subtraction.
      if (snap.segments.contains(seg) || snap.tokens.contains(token))
        return snap.version
      val inc = incompleteNow(snap) // the [[forget]] legacy-store rule
      store.writeNamedSegment(
        negGrams(gramCountsOf(docs, textCol), inc), seg)
      store.publish(snap.segments :+ seg, snap.tokens + token,
        snap.horizon, snap.sid, snap.gates ++ inc, inc,
        basedOn = Some(snap.version))
    }

    /** MAINTENANCE compaction: fold live segments into one (the same
      * additive algebra serving uses; zero-sum terms dropped, so
      * forget segments are REALIZED and their negatives leave the
      * store). Bounds per-score segment fan-out after many appends. */
    def compact(): Long = {
      requireMutable()
      val snap = store.snapshotOrThrow()
      if (snap.segments.size <= 1) return snap.version
      // Observe incompleteness BEFORE the fold: the rewrite below is
      // full-format (every order gets a dir), so this is the last
      // moment the missing-dir test can see a legacy segment — the
      // `inc` marker carries the fact forward for any later forget.
      val inc = incompleteNow(snap)
      val uni = store.readUnion(snap.segments, "uni")
        .groupBy("term").agg(sum("cnt").as("cnt"))
        .where(col("cnt") =!= 0L)
        .select(col("term").as("w1"),
          lit(null).cast("string").as("w2"),
          lit(null).cast("string").as("w3"), col("cnt"))
      val bi = store
        .readUnionTolerant(snap.segments, "bi",
          "w1 STRING, w2 STRING, cnt BIGINT")
        .groupBy("w1", "w2").agg(sum("cnt").as("cnt"))
        .where(col("cnt") =!= 0L)
        .select(col("w1"), col("w2"),
          lit(null).cast("string").as("w3"), col("cnt"))
      val tri = store
        .readUnionTolerant(snap.segments, "tri",
          "w1 STRING, w2 STRING, w3 STRING, cnt BIGINT")
        .groupBy("w1", "w2", "w3").agg(sum("cnt").as("cnt"))
        .where(col("cnt") =!= 0L)
      // Tokens carried verbatim: compaction realizes forget segments'
      // negatives but must NOT forget that it did ([[forgetBatch]]'s
      // post-compaction replay no-op keys on these lines). The fold
      // also advances the replay horizon so a redelivered folded batch
      // no-ops in [[appendBatch]] instead of double-counting.
      store.publish(
        Seq(store.writeSegment(uni.unionByName(bi).unionByName(tri))),
        snap.tokens,
        graft.ops.BatchHorizon.afterFold(snap.horizon, snap.segments),
        snap.sid, snap.gates, inc, basedOn = Some(snap.version))
    }

    /** Retention: keep the newest `keep` versions, sweep older
      * manifests and unreferenced segments (shared IndexVacuum rules).
      * A MUTATION for the read-only guard: a pinned handle sweeping
      * old versions could delete its own pinned manifest and brick
      * every later read. */
    def vacuum(keep: Int = 1): (Int, Int) = {
      requireMutable()
      store.vacuum(keep)
    }
  }

  /** Moore–Lewis data selection served from TWO frozen stores — the
    * CCNet production shape (train the in-domain and general selectors
    * ONCE, then score candidate shards for years) for the statistic
    * `q_text_moore_lewis` re-derives per run: per-term surprisal
    * difference between the GENERAL LM (`general`, fit on the full
    * reference corpus) and the IN-DOMAIN LM (`inDomain`, fit on the
    * domain seed), add-one smoothed over the general model's SHARED
    * vocabulary, floor-millinat per TERM TYPE, exact-integer per-doc
    * mean — bit-identical to the inline kernel because both evaluate
    * the SAME shared expression strings
    * ([[graft.queries.TextQueries.MooreLewisAllSql]] /
    * [[graft.queries.TextQueries.MooreLewisInSql]]) over exact BIGINT
    * counts (graded by `q_text_moore_lewis_served`, which shares the
    * inline query's verbatim oracle; pinned in `NgramLmSpec`).
    *
    * Contract mirrors the inline query: the smoothing vocabulary V is
    * the GENERAL store's vocabulary (the in-domain store must be fit on
    * a subset of the general corpus for `t_in` to match the inline
    * in-source token total — the graded construction); batch terms
    * outside V drop from the mean (inner join — when scoring the
    * training corpus absence is impossible; on a NEW candidate batch
    * this is the declared OOV rule, same as [[Model.scoreBigrams]]).
    * Only the BATCH is tokenized — nothing scales with either reference
    * corpus after fit. */
  def mooreLewis(general: Model, inDomain: Model, docs: DataFrame,
      idCol: String, srcCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        explode(TokenOps.terms(col(textCol))).as("term"))
      .groupBy("doc_id", "source", "term").agg(count(lit(1)).as("k"))
    // Vocabulary-sized left join of the two frozen count tables; it
    // feeds both the totals aggregate and the type scores and is
    // RECOMPUTED per consumer (two model-state-sized parquet reads) —
    // the [[Model.scoreKneserNey]] no-pinned-blocks rule. A per-call
    // localCheckpoint here would leak its blocks until GC (the result
    // frame depends on it, so this path could never release it
    // deterministically); a standing per-trigger consumer should wire
    // a [[Model.bigramTypeScores]]-style generation cache instead.
    val counts = general.vocab().withColumnRenamed("cnt", "c_all")
      .join(inDomain.vocab().withColumnRenamed("cnt", "c_in"),
        Seq("term"), "left_outer")
      .select(col("term"), col("c_all"),
        coalesce(col("c_in"), lit(0L)).as("c_in"))
    val consts = counts.agg(sum("c_all").as("t_all"),
      sum("c_in").as("t_in"), count(lit(1)).as("v"))
    val typeScores = counts.crossJoin(broadcast(consts))
      .select(col("term"),
        expr(graft.queries.TextQueries.MooreLewisAllSql).as("s_all_mb"),
        expr(graft.queries.TextQueries.MooreLewisInSql).as("s_in_mb"))
    tf.join(typeScores, Seq("term"))
      .groupBy("doc_id", "source")
      .agg(sum("k").as("n_tokens"),
        expr("sum(k * (s_all_mb - s_in_mb)) DIV sum(k)").as("ml_score_mb"))
  }
}
