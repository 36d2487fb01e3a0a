package graft.gov

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** FIT-HORIZON STAMP for persisted trainer artifacts — the missing link
  * between the right-to-be-forgotten ledger and the MODELS fit on the
  * corpus. The seven derived stores erase exactly
  * ([[ForgetPipeline]]), but a trained artifact (a
  * [[graft.ml.HashedLogReg]] weight table, a
  * [[graft.ops.BpeTrainer]] merge list) is a lossy summary of whatever
  * corpus state it was fit on: it cannot be redacted in place, only
  * refit. A regulator's question is therefore temporal — "which
  * persisted models were fit BEFORE erasure request R propagated, i.e.
  * potentially on R's victims?" — and answering it needs the fit time
  * anchored to the ledger, not to a wall clock (clocks drift; the
  * ledger is the authority on what had been erased).
  *
  * The stamp is the set of COMMITTED erasure-request ids at fit time
  * ([[ForgetPipeline.committedRequests]]) — request-count-bounded audit
  * metadata, the same O(requests) class as the ledger itself. A model
  * is then STALE with respect to exactly the committed requests its
  * stamp does not cover ([[ForgetPipeline.staleFits]]): those erasures
  * landed after the fit, so the fit may have seen their victims. An
  * UNSTAMPED artifact (pre-upgrade vintage) is conservatively stale
  * with respect to every committed request — absence of evidence is
  * not evidence of a clean fit.
  *
  * CAPTURE ORDER IS THE CALLER'S HALF OF THE CONTRACT: read
  * `committedRequests()` BEFORE the first training read of the corpus,
  * and pass that pre-read snapshot to `save(...)`. A horizon captured
  * at save time over-covers — an erasure committing DURING a
  * multi-minute fit would be stamped as covered although the fit's
  * input predates it, and [[ForgetPipeline.staleFits]] would then
  * under-report (the one direction the audit must never fail). The
  * stamp API takes a value rather than reading the ledger itself
  * precisely so the caller can pin the capture to the read point.
  *
  * On-disk: one `_fit_horizon` text file INSIDE the artifact's
  * directory (underscore-prefixed, so parquet readers ignore it like
  * `_SUCCESS`), `n <count>` header + one request id per line, written
  * temp-then-rename so it is either absent or complete — a torn stamp
  * reads as unstamped, which fails SAFE (flags more, never fewer,
  * stale pairs). */
object FitHorizon {

  val FileName = "_fit_horizon"

  /** Stamp `dir`'s artifact with the committed-request horizon. */
  def stamp(spark: SparkSession, dir: String,
      covered: Set[String]): Unit = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = covered.toSeq.sorted
    val body = (s"n ${ids.size}" +: ids).mkString("\n") + "\n"
    val tmp = new Path(p.getParent,
      s".${p.getName}-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(p, false) // re-stamp after a refit replaces the horizon
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"could not publish fit stamp $p")
    }
  }

  /** The stamped horizon, or None for an unstamped / torn artifact
    * (the header count guards truncation — a stamp that lost lines
    * reads as absent, never as a narrower horizon). */
  def read(spark: SparkSession, dir: String): Option[Set[String]] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    lines match {
      case head :: ids if head.startsWith("n ") &&
          head.drop(2).trim.toIntOption.contains(ids.size) =>
        Some(ids.toSet)
      case _ => None
    }
  }
}
