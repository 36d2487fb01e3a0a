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
  * one FileSystem listing of the metadata dir — O(1), driver-side,
  * amortized over the whole micro-batch. foreachBatch runs the check on
  * the driver, so executors always see a consistent broadcast model for
  * any one batch (reloads are batch-aligned, never mid-batch).
  *
  * A half-written save (metadata present, stages missing) fails the
  * load; the previous model keeps serving and the reload retries next
  * batch — a bad deploy degrades to "stale model", never to a dead
  * stream. */
final class ModelReloader(modelDir: String) {

  @volatile private var fp: String = null
  @volatile private var model: PipelineModel = _
  @volatile private var labels: DataFrame = _
  private var loads = 0

  /** Spec hook: how many times a (re)load actually happened. */
  private[ml] def loadCount: Int = synchronized(loads)

  /** Metadata-dir fingerprint: (name, length, mtime) of every metadata
    * file — a completed overwrite always changes it. */
  private def fingerprint(spark: SparkSession): String = {
    val meta = new Path(modelDir, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) ""
    else fs.listStatus(meta).filter(_.isFile)
      .sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .mkString("|")
  }

  private def ensureCurrent(spark: SparkSession): Unit = synchronized {
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
