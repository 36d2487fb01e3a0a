package graft.gov

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-store right-to-be-forgotten orchestration — the missing top of
  * the governance stack: every persisted store already proves an EXACT
  * per-store forget ([[graft.sim.IvfIndex.forget]],
  * [[graft.sim.PqIvfIndex.forget]], [[graft.sim.MinHashIndex.forget]],
  * [[graft.sim.LexIndex.forget]], [[graft.sim.KmeansModel.forget]],
  * [[graft.ml.NgramLm]]'s negative-segment forget), but a real erasure
  * request must reach ALL of them, survive a crash halfway through, and
  * leave an audit trail a regulator can read. This pipeline adds
  * exactly that — and nothing else: deletion semantics stay in the
  * stores, where they are individually spec-pinned.
  *
  * Contract:
  *
  *   - A request is (requestId, victim ids, targets). Targets are
  *     (name, forget thunk) pairs so stores with different forget
  *     signatures (NgramLm takes the victim DOCUMENTS for its negative
  *     segment) adapt behind one shape.
  *   - Execution is SEQUENTIAL IN NAME ORDER — deterministic, and a
  *     crash leaves a PREFIX of stores forgotten.
  *   - The LEDGER commit is the LAST step: `<ledgerDir>/request=<id>/`
  *     is written (one row per victim × store: request_id, id, store,
  *     version) only after every target has published. A request dir
  *     with Spark's `_SUCCESS` marker therefore means "propagated
  *     everywhere"; its absence after a crash makes the replay re-run
  *     every target. Replay CONVERGES because each store's forget is
  *     idempotent in effect — rewriting live segments without victims
  *     that are already gone publishes a new version with identical
  *     content (per-store spec'd) — so at-least-once execution is safe
  *     and a COMPLETED request replays as a pure ledger read (version
  *     numbers are not re-bumped: the no-op replay rule).
  *   - [[tombstones]] serves the audit question ("was id X erased, and
  *     did every store acknowledge?") as one partition-pruned scan of
  *     `request=` dirs. The ledger retains the victim IDS — standard
  *     tombstone practice: erasure targets content and derived
  *     statistics; the fact-of-erasure record is access-controlled
  *     metadata a regulator requires, not content.
  *
  * What this deliberately does NOT do: retention of the ledger itself
  * (a legal-hold policy question), and cross-system scope (Kafka
  * topics, bronze files) — those are [[graft.sink.Sinks]]-side
  * concerns; the pipeline's targets seam is where they would plug in. */
final class ForgetPipeline(spark: SparkSession, val ledgerDir: String) {

  private def fs = new Path(ledgerDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def requestPath(requestId: String): Path = {
    require(requestId.nonEmpty && requestId.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'),
      s"requestId must be [A-Za-z0-9_-]+, got '$requestId'")
    new Path(ledgerDir, s"request=$requestId")
  }

  /** True iff `requestId` has fully propagated (ledger committed). */
  def isComplete(requestId: String): Boolean =
    fs.exists(new Path(requestPath(requestId), "_SUCCESS"))

  /** Propagate one erasure request to every target, commit the ledger,
    * return its rows (request_id, id, store, version). A replay of a
    * COMPLETED request runs NO forgets and returns the committed rows;
    * a replay after a crash re-runs every target (safe — see class
    * doc) and commits. */
  def execute(requestId: String, ids: Seq[Long],
              targets: Seq[(String, Seq[Long] => Long)]): DataFrame = {
    val path = requestPath(requestId)
    if (isComplete(requestId)) {
      // A completed id replays as a pure read — but ONLY for the same
      // request. A reused id with different victims or targets would
      // otherwise silently skip erasure while returning success-looking
      // rows: the worst possible failure mode for this pipeline.
      val committed = spark.read.parquet(path.toString)
      val gotIds = committed.select("id").distinct()
        .collect().map(_.getLong(0)).toSet
      val gotStores = committed.select("store").distinct()
        .collect().map(_.getString(0)).toSet
      require(gotIds == ids.toSet && gotStores == targets.map(_._1).toSet,
        s"request '$requestId' is already committed for ids " +
          s"${gotIds.toSeq.sorted.mkString(",")} / stores " +
          s"${gotStores.toSeq.sorted.mkString(",")} — refusing to treat " +
          "a DIFFERENT victim or target set as a replay; use a fresh " +
          "request id")
      return committed
    }
    require(ids.nonEmpty, "empty victim set")
    require(targets.map(_._1).distinct.size == targets.size,
      "duplicate target names")
    val acks = targets.sortBy(_._1).map { case (name, forget) =>
      name -> forget(ids)
    }
    import spark.implicits._
    val rows = for { id <- ids; (store, version) <- acks }
      yield (requestId, id, store, version)
    rows.toDF("request_id", "id", "store", "version")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path.toString)
    spark.read.parquet(path.toString)
  }

  /** The standing tombstone ledger: every committed request's rows.
    * One scan of the `request=` dirs; empty frame when no request has
    * committed yet. */
  def tombstones(): DataFrame = {
    val root = new Path(ledgerDir)
    val dirs = (if (fs.exists(root)) fs.listStatus(root)
                else Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("request="))
      .map(_.getPath.toString)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
    if (dirs.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, Long, String, Long)]
        .toDF("request_id", "id", "store", "version")
    } else spark.read.parquet(dirs.toIndexedSeq: _*)
      .select("request_id", "id", "store", "version")
  }

  /** Per-store acknowledgement summary for one request — the audit
    * answer: which stores erased, at which published version, how many
    * victims. Empty when the request has not committed. */
  def audit(requestId: String): DataFrame = {
    val path = requestPath(requestId)
    if (!isComplete(requestId)) {
      import spark.implicits._
      Seq.empty[(String, Long, Long)].toDF("store", "version", "n_ids")
    } else spark.read.parquet(path.toString)
      .groupBy("store").agg(max("version").as("version"),
        count(lit(1)).as("n_ids"))
      .orderBy("store")
  }
}
