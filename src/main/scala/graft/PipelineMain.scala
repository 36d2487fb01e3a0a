package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Orchestration parity with the reference's 2-task Airflow DAG
  * (reference `airflow/dags/orchestration_pipeline.py:14-38`: task 1
  * `spark-submit model_training.py` → task 2 starts the streaming
  * engine), expressed as one sequenced entry point: train IF the model
  * is absent, then stream. The presence check makes restarts idempotent
  * — the DAG retrains unconditionally on every run; skipping when a
  * saved model exists is the restart-safe form of the same dependency
  * edge (the stream task still never starts before a model exists).
  *
  * Usage: `graft.PipelineMain <corpus.json> <streamArgs...>` where
  * `<streamArgs...>` is exactly [[StreamMain]]'s argument list (the
  * model dir inside it is the train output and the stream input):
  * {{{
  *   graft.PipelineMain corpus.json kafka <servers> <topic> <modelDir> <outDir> <fallbackDir> <ckptDir>
  *   graft.PipelineMain corpus.json file <inputDir> <modelDir> <outDir> <fallbackDir> <ckptDir>
  * }}}
  */
object PipelineMain {

  /** A usable saved model, LOADED: metadata present AND the model
    * actually loads — returned so the caller can SERVE the exact
    * artifact it validated. Presence alone is not enough —
    * PipelineModel.save writes `metadata/` BEFORE the stage dirs, so a
    * crash mid-save leaves a metadata-only husk that would otherwise
    * permanently disable retraining while the stream fails at load on
    * every restart. A failed load here means "retrain over it" (save()
    * overwrites). Returning the model (instead of a boolean the caller
    * re-loads behind) kills both the double full-model load at startup
    * and the TOCTOU window in which a concurrent retrain overwriting the
    * dir between check and load reintroduces the half-written-model
    * failure the check exists to prevent. */
  private[graft] def loadIfUsable(spark: SparkSession,
      modelDir: String): Option[graft.ml.ValidatedModel] = {
    val p = new Path(modelDir, "metadata")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) None
    else {
      // Fingerprint BEFORE the load: pairing the model with a fingerprint
      // taken afterwards could bind a fresh fingerprint to a stale model
      // if a retrain overwrites mid-load; the stale-fingerprint pairing
      // degrades to one extra (clean) reload instead.
      val fp = graft.ml.ModelReloader.fingerprint(spark, modelDir)
      try Some(graft.ml.ValidatedModel(graft.ml.NlpPipeline.load(modelDir), fp))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[pipeline] model at $modelDir present but unloadable (${e.getMessage}); retraining")
        None
      }
    }
  }

  /** Boolean view of [[loadIfUsable]] (spec surface; production callers
    * should take the model, not re-load behind the check). */
  private[graft] def modelExists(spark: SparkSession, modelDir: String): Boolean =
    loadIfUsable(spark, modelDir).isDefined

  /** Train-if-absent → stream. Returns the running query (callers own
    * awaitTermination), plus whether this run trained. The validated
    * model is handed to the stream so the checked artifact IS the served
    * artifact (one load, no check-to-load window). */
  def run(spark: SparkSession, corpusPath: String,
          cfg: StreamMain.Config): (StreamingQuery, Boolean) = {
    val (preloaded, trained) = loadIfUsable(spark, cfg.modelDir) match {
      case some @ Some(_) => (some, false)
      case None =>
        TrainMain.run(spark, corpusPath, cfg.modelDir)
        (None, true)
    }
    (StreamMain.run(spark, cfg, preloaded), trained)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1,
      "usage: graft.PipelineMain <corpus.json> <StreamMain args...>")
    val cfg = StreamMain.parse(args.drop(1))
    val spark = Sessions.local("graft-pipeline")
    try {
      val (query, trained) = run(spark, args(0), cfg)
      println(s"[pipeline] trained=$trained model=${cfg.modelDir}; streaming started")
      query.awaitTermination()
    } finally spark.stop()
  }
}
