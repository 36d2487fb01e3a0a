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

  /** A usable saved model: metadata present AND the model actually
    * loads. Presence alone is not enough — PipelineModel.save writes
    * `metadata/` BEFORE the stage dirs, so a crash mid-save leaves a
    * metadata-only husk that would otherwise permanently disable
    * retraining while the stream fails at load on every restart. A
    * failed load here means "retrain over it" (save() overwrites). */
  private[graft] def modelExists(spark: SparkSession, modelDir: String): Boolean = {
    val p = new Path(modelDir, "metadata")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p) &&
      (try { graft.ml.NlpPipeline.load(modelDir); true }
       catch { case scala.util.control.NonFatal(e) =>
         System.err.println(
           s"[pipeline] model at $modelDir present but unloadable (${e.getMessage}); retraining")
         false
       })
  }

  /** Train-if-absent → stream. Returns the running query (callers own
    * awaitTermination), plus whether this run trained. */
  def run(spark: SparkSession, corpusPath: String,
          cfg: StreamMain.Config): (StreamingQuery, Boolean) = {
    val trained =
      if (modelExists(spark, cfg.modelDir)) false
      else {
        TrainMain.run(spark, corpusPath, cfg.modelDir)
        true
      }
    (StreamMain.run(spark, cfg), trained)
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
