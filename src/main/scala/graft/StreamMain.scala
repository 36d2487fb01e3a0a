package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ml.NlpPipeline
import graft.sink.{JsonLinesSink, ParquetSink}
import graft.stream.StreamEngine

/** The runnable streaming-inference entry point — the counterpart of the
  * reference's flagship `spark/run.py:7-8` → `RedditInferenceEngine`
  * (`spark/engine.py:13-39,252-258`), wired from the already-spec'd parts:
  *
  *   source (Kafka, or a JSON-lines file stream carrying the same
  *   envelope) → CAST(value AS STRING) → from_json(CorpusSchema) + flatten
  *   → per-micro-batch: prepare (null-drop, clean chain, calendar
  *   features, sentiment) → PipelineModel.transform → topic argmax + label
  *   broadcast join ("Autre" storage default) → virality + rounded score →
  *   sink projection (`init.cql:8-18` shape) → parquet primary with
  *   distributed JSON-lines fallback — 20 s processing-time trigger,
  *   checkpointed.
  *
  * Usage:
  *   graft.StreamMain kafka <servers> <topic> <modelDir> <outDir> <fallbackDir> <ckptDir>
  *   graft.StreamMain file <inputDir> <modelDir> <outDir> <fallbackDir> <ckptDir>
  *
  * The `file` source reads each line of `<inputDir>` as one Kafka value —
  * the broker-less twin the spec drives end to end; the kafka source is
  * the production path (connector jar required at runtime).
  */
object StreamMain {

  sealed trait SourceSpec
  final case class KafkaSource(servers: String, topic: String) extends SourceSpec
  final case class FileSource(inputDir: String) extends SourceSpec

  final case class Config(
      source: SourceSpec,
      modelDir: String,
      outDir: String,
      fallbackDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("20 seconds"), // T1
      maxOffsetsPerTrigger: Long = 50,                         // T2
      reloadModel: Boolean = false,  // hot-reload on retrain (ModelReloader)
      epochLedger: Option[String] = None) // exactly-once batch markers

  /** The raw stream with a string-castable `value` column — Kafka's
    * envelope, or one JSON record per text-file line (same shape the
    * producer writes, reference `kafka/producer.py`). */
  def rawSource(spark: SparkSession, cfg: Config): DataFrame = cfg.source match {
    case KafkaSource(servers, topic) =>
      StreamEngine.kafkaSource(spark, servers, topic, cfg.maxOffsetsPerTrigger)
    case FileSource(dir) =>
      spark.readStream.text(dir)
  }

  /** The whole wired body: load model once on the driver (or through the
    * hot-reloading wrapper when `cfg.reloadModel` — a retrain lands at
    * the next micro-batch without restarting the query), derive the
    * O(topics) label table, start the checkpointed foreachBatch engine.
    * Returns the running query (callers own awaitTermination).
    *
    * `preloaded` lets a caller that already validated-by-loading the
    * model (PipelineMain's startup probe) hand it in, so the checked
    * artifact is the served artifact — no second full-model load and no
    * window for a concurrent retrain to swap a half-written save under
    * the stream. Under `reloadModel` the pair seeds the reloader's
    * initial state (adopted at the first batch, re-fingerprinted every
    * batch thereafter) — both serving paths load the model exactly
    * once. */
  def run(spark: SparkSession, cfg: Config,
          preloaded: Option[graft.ml.ValidatedModel] = None): StreamingQuery = {
    val transform: DataFrame => DataFrame =
      if (cfg.reloadModel) new graft.ml.ModelReloader(cfg.modelDir, preloaded).infer
      else {
        val model = preloaded.map(_.model)
          .getOrElse(NlpPipeline.load(cfg.modelDir))           // S3
        val labels = NlpPipeline.topicLabels(spark, model)     // J1 dim side
        batch => NlpPipeline.inferBatch(TrainMain.prepare(batch), model, labels)
      }
    val engine = new StreamEngine(
      transform = transform,
      primary = new ParquetSink(cfg.outDir),                   // S4 stand-in
      fallback = new JsonLinesSink(cfg.fallbackDir),           // S5/S8
      trigger = cfg.trigger,
      checkpointLocation = Some(cfg.checkpointDir),            // T4
      onBatch = (id, n) => println(s"[stream] batch $id: $n rows"),
      epochLedger = cfg.epochLedger)
    engine.start(
      StreamEngine.decodeEnvelope(rawSource(spark, cfg), TrainMain.CorpusSchema),
      "graft-stream-inference")
  }

  private val usage =
    """usage: graft.StreamMain kafka <servers> <topic> <modelDir> <outDir> <fallbackDir> <ckptDir>
      |       graft.StreamMain file <inputDir> <modelDir> <outDir> <fallbackDir> <ckptDir>""".stripMargin

  private[graft] def parse(args: Array[String]): Config = args.toList match {
    case "kafka" :: servers :: topic :: model :: out :: fb :: ckpt :: Nil =>
      Config(KafkaSource(servers, topic), model, out, fb, ckpt)
    case "file" :: in :: model :: out :: fb :: ckpt :: Nil =>
      Config(FileSource(in), model, out, fb, ckpt)
    case _ => throw new IllegalArgumentException(usage)
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = Sessions.local("graft-stream")
    try run(spark, cfg).awaitTermination()
    finally spark.stop()
  }
}
