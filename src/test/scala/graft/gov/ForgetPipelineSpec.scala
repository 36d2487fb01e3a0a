package graft.gov

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** The orchestration contract over REAL heterogeneous stores: ledger
  * commits last, completed requests replay as pure reads (no version
  * bumps), crashed requests re-run every target and converge, and the
  * audit surfaces answer per-request and standing questions. Deletion
  * CORRECTNESS per store is each store's own spec; here we spot-check
  * only that propagation reached them. */
class ForgetPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb  = Tables.t(spark, dir, "embeddings")
  private lazy val docs = Tables.t(spark, dir, "documents")
  private lazy val corpus = emb.where(col("vec_id") >= 5)

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/x"

  test("one request reaches every store; ledger commits after all acks") {
    val ivf = new graft.sim.IvfIndex(spark, tmp("fp_ivf"))
    ivf.build(corpus, "vec_id", "embedding", "label")
    val pq = new graft.sim.PqIvfIndex(spark, tmp("fp_pq"))
    pq.build(corpus, "vec_id", "embedding", "label", 8, 8, 16)
    val mh = new graft.sim.MinHashIndex(spark, tmp("fp_mh"))
    mh.build(docs, "doc_id", "text")
    val lmDir = tmp("fp_lm")
    graft.ml.NgramLm.fit(docs, "text", lmDir)

    val victims = Seq(7L, 11L)
    val victimDocs = docs.where(col("doc_id").isin(victims: _*))
      .localCheckpoint(true) // pin content BEFORE any store mutates
    val targets = Seq[(String, Seq[Long] => Long)](
      "ivf" -> (ids => ivf.forget(ids)),
      "ivfpq" -> (ids => pq.forget(ids)),
      "minhash" -> (ids => mh.forget(ids)),
      "lm" -> (_ => graft.ml.NgramLm.load(spark, lmDir)
        .forget(victimDocs, "text")))

    val fp = new ForgetPipeline(spark, tmp("fp_ledger"))
    assert(!fp.isComplete("req-001"))
    val rows = fp.execute("req-001", victims, targets)
    assert(fp.isComplete("req-001"))
    // One row per victim × store.
    assert(rows.count() == victims.size.toLong * targets.size)
    assert(rows.select("store").distinct().count() == targets.size)
    // Propagation spot checks: id-keyed stores no longer serve victims.
    assert(ivf.postings().where(col("id").isin(victims: _*)).isEmpty)
    assert(pq.postings().where(col("id").isin(victims: _*)).isEmpty)
    assert(mh.signatures().where(col("doc_id").isin(victims: _*)).isEmpty)

    // COMPLETED replay: pure ledger read — no store publishes again.
    val versionsBefore = Seq(ivf.currentVersion(), pq.currentVersion(),
      mh.currentVersion())
    val replay = fp.execute("req-001", victims, targets)
    assert(replay.collect().toSet == rows.collect().toSet)
    assert(Seq(ivf.currentVersion(), pq.currentVersion(),
      mh.currentVersion()) == versionsBefore,
      "a completed request re-ran a forget")

    // Audit surfaces.
    val audit = fp.audit("req-001").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(audit.keySet == targets.map(_._1).toSet)
    assert(audit.values.forall(_ == victims.size.toLong))
    assert(fp.tombstones().where(col("id") === 7L).count() ==
      targets.size.toLong)
  }

  test("crash before ledger commit: replay re-runs targets and converges") {
    val ivf = new graft.sim.IvfIndex(spark, tmp("fp2_ivf"))
    ivf.build(corpus, "vec_id", "embedding", "label")
    val fp = new ForgetPipeline(spark, tmp("fp2_ledger"))
    val victims = Seq(9L)

    // Simulated crash: the store forgot, the ledger never committed.
    ivf.forget(victims)
    assert(!fp.isComplete("req-crash"))

    // Replay runs the target AGAIN (at-least-once) — the second forget
    // finds nothing to remove and publishes identical content — then
    // commits. Postings are the converged set, not doubled, not stale.
    var calls = 0
    val rows = fp.execute("req-crash", victims,
      Seq("ivf" -> (ids => { calls += 1; ivf.forget(ids) })))
    assert(calls == 1)
    assert(fp.isComplete("req-crash"))
    assert(rows.count() == 1)
    assert(ivf.postings().where(col("id") === 9L).isEmpty)
    assert(ivf.postings().count() == corpus.count() - 1)
  }

  test("guards: empty victims, duplicate targets, bad request ids") {
    val fp = new ForgetPipeline(spark, tmp("fp3_ledger"))
    intercept[IllegalArgumentException] {
      fp.execute("req-x", Seq.empty, Seq("a" -> (_ => 0L)))
    }
    intercept[IllegalArgumentException] {
      fp.execute("req-x", Seq(1L),
        Seq("a" -> (_ => 0L), "a" -> (_ => 0L)))
    }
    intercept[IllegalArgumentException] {
      fp.execute("../escape", Seq(1L), Seq("a" -> (_ => 0L)))
    }
    // Nothing committed by the failed attempts.
    assert(fp.tombstones().isEmpty)
  }

  test("a reused request id with a different victim set refuses loudly") {
    val fp = new ForgetPipeline(spark, tmp("fp4_ledger"))
    var calls = 0
    val targets = Seq[(String, Seq[Long] => Long)](
      "a" -> (_ => { calls += 1; 7L }))
    fp.execute("req-reuse", Seq(1L, 2L), targets)
    assert(calls == 1)
    // Same request replayed verbatim: pure read, no forget runs.
    fp.execute("req-reuse", Seq(1L, 2L), targets)
    assert(calls == 1)
    // Different victims under the same id: the silent-skip hazard —
    // must throw, must run nothing, must leave the ledger unchanged.
    val e = intercept[IllegalArgumentException] {
      fp.execute("req-reuse", Seq(42L), targets)
    }
    assert(e.getMessage.contains("fresh request id"))
    assert(calls == 1)
    // Different target set under the same id: same refusal.
    intercept[IllegalArgumentException] {
      fp.execute("req-reuse", Seq(1L, 2L),
        targets :+ ("b" -> ((_: Seq[Long]) => 0L)))
    }
    assert(calls == 1)
    assert(fp.tombstones().count() == 2)
  }
}
