package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.TrainMain

/** Hot model reload for a long-running stream — the serving upgrade the
  * reference's load-once engine can't do: a retrain that overwrites the
  * saved model lands in the running stream at the NEXT micro-batch, no
  * restart, no downtime. The driver caches (fingerprint, model, labels)
  * and re-loads when the saved metadata changes; the per-batch check is
  * one FileSystem listing of the metadata dir plus one small GET per
  * metadata file (the content hash — a few KB of JSON), driver-side,
  * amortized over the whole micro-batch. foreachBatch runs the check on
  * the driver, so executors always see a consistent broadcast model for
  * any one batch (reloads are batch-aligned, never mid-batch).
  *
  * A half-written save (metadata present, stages missing) fails the
  * load; the previous model keeps serving and the reload retries next
  * batch — a bad deploy degrades to "stale model", never to a dead
  * stream. */
final class ModelReloader(modelDir: String,
    initial: Option[ValidatedModel] = None) {

  @volatile private var fp: String = null
  @volatile private var model: PipelineModel = _
  @volatile private var labels: DataFrame = _
  private var loads = 0

  /** Spec hook: how many times a (re)load actually happened. */
  private[ml] def loadCount: Int = synchronized(loads)

  private[ml] def fingerprint(spark: SparkSession): String =
    ModelReloader.fingerprint(spark, modelDir)

  private def ensureCurrent(spark: SparkSession): Unit = synchronized {
    // A caller that already validated-by-loading the model (PipelineMain's
    // startup probe) hands it in as `initial` — adopted on the first
    // batch WITHOUT a second dir load. Its fingerprint was captured
    // BEFORE that load, so a retrain overwriting the dir since then reads
    // as a mismatch below and triggers a clean reload — never a stale
    // model pinned behind a fresh fingerprint.
    if (fp == null) initial.foreach { vm =>
      model = vm.model
      labels = NlpPipeline.topicLabels(spark, vm.model)
      fp = vm.fingerprint
    }
    val now = fingerprint(spark)
    if (fp == null || (now != fp && now.nonEmpty)) {
      try {
        val m = NlpPipeline.load(modelDir)
        labels = NlpPipeline.topicLabels(spark, m)
        model = m
        fp = now
        loads += 1
      } catch {
        case scala.util.control.NonFatal(e) if model != null =>
          // Mid-save or corrupt overwrite: keep serving the last good
          // model, retry the reload on the next batch.
          System.err.println(
            s"[reload] new model at $modelDir unloadable (${e.getMessage}); keeping previous")
      }
    }
  }

  /** The per-batch transform: prepare → (current model) infer. */
  def infer(batch: DataFrame): DataFrame = {
    ensureCurrent(batch.sparkSession)
    NlpPipeline.inferBatch(TrainMain.prepare(batch), model, labels)
  }
}

/** A model paired with the fingerprint captured BEFORE it was loaded —
  * what a validating caller hands to the serving path so the checked
  * artifact is the served artifact (no second load). Capture order makes
  * the pairing safe: if a retrain overwrites the dir mid-load, the stale
  * fingerprint mismatches at the next batch and triggers a clean
  * reload. */
final case class ValidatedModel(model: PipelineModel, fingerprint: String)

object ModelReloader {

  /** Metadata-dir fingerprint: (name, length, content-md5) of every
    * metadata file — a completed overwrite always changes it. mtime is
    * deliberately NOT part of the fingerprint: a retrain completing
    * within the filesystem's timestamp granularity (1 s on many
    * HDFS/object stores) with identically-sized files would read as
    * unchanged and the new model would silently never load. The content
    * hash has no such blind spot — Spark ML's metadata JSON embeds the
    * writer's uid and timestamp, so a completed save always changes the
    * bytes. The files are a few KB (one part file + _SUCCESS), so the
    * per-batch driver-side read is trivial next to the micro-batch. */
  private[graft] def fingerprint(spark: SparkSession, modelDir: String): String = {
    val meta = new Path(modelDir, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) ""
    else fs.listStatus(meta).filter(_.isFile)
      .sortBy(_.getPath.getName)
      .map { st =>
        // A file that cannot be read (mid-write, checksum mismatch on a
        // torn overwrite) hashes as a distinct sentinel instead of
        // throwing: the fingerprint then differs from the last good one,
        // the reload is attempted, its load failure is absorbed by
        // ensureCurrent's keep-serving catch, and the retry happens next
        // batch — the same degradation path as a corrupt-but-readable
        // save.
        val content =
          try {
            val md = java.security.MessageDigest.getInstance("MD5")
            val in = fs.open(st.getPath)
            try {
              val buf = new Array[Byte](8192)
              var n = in.read(buf)
              while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
            } finally in.close()
            md.digest().map("%02x".format(_)).mkString
          } catch {
            case scala.util.control.NonFatal(_) => "unreadable"
          }
        s"${st.getPath.getName}:${st.getLen}:$content"
      }
      .mkString("|")
  }
}
