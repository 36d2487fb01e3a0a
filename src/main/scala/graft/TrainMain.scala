package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.{LexiconSentiment, NlpPipeline, SentimentScorer}
import graft.ops.{TextOps, TimeOps}

/** The offline training entry point — S1's real multi-line-JSON form plus
  * the whole `model_training.py` linear job as one runnable main
  * (reference `spark/model_training.py:21-252`):
  *
  *   read JSON corpus (explicit schema, multiLine) → epoch→timestamp →
  *   drop null text → clean chain → calendar features → sentiment →
  *   `NlpPipeline.fit` (Tokenizer→StopWords→Word2Vec→CountVectorizer→LDA→
  *   StringIndexer×2→VectorAssembler→RandomForest, reference seeds) →
  *   one `PipelineModel` save (vs the reference's six hand-saved files).
  *
  * Usage: `graft.TrainMain <corpus.json> <modelOutDir>`.
  *
  * The sentiment stage defaults to the deterministic [[LexiconSentiment]];
  * wire `new RemoteSentiment(HttpSentimentTransport(url))` for the
  * reference-faithful remote scorer (`spark/model_training.py:95-132`).
  */
object TrainMain {

  /** The corpus schema, field-for-field (reference
    * `spark/model_training.py:21-29`). */
  val CorpusSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("author", StringType),
    StructField("subreddit", StringType),
    StructField("text", StringType),
    StructField("timestamp", DoubleType),
    StructField("score", IntegerType),
    StructField("num_replies", IntegerType)))

  /** S1 (JSON form): explicit schema + multiLine — the reader never
    * schema-infers (an extra full pass at scale) and parses JSON *arrays*
    * the way the reference corpus is laid out
    * (reference `spark/model_training.py:31`). */
  def readCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(CorpusSchema).option("multiLine", "true").json(path)

  /** The pre-fit preparation chain: null-drop → clean → time features →
    * sentiment (reference `spark/model_training.py:33-132`). Everything
    * here is native expressions — one codegen'd pass over the corpus
    * before the ML fits. */
  def prepare(df: DataFrame,
              scorer: SentimentScorer = new LexiconSentiment()): DataFrame = {
    val cleaned = df
      .withColumn("timestamp", TimeOps.epochToTimestamp(col("timestamp"))) // D1
      .na.drop(Seq("text"))                                                // P3
      .withColumn("text", TextOps.cleanText(col("text")))                  // F1–F4
    scorer.withSentiment(
      TimeOps.withTimeFeatures(cleaned, col("timestamp")),                 // D4
      "text")                                                              // U1
  }

  /** Full job: read → prepare → fit → save. Returns the fitted model. */
  def run(spark: SparkSession, corpusPath: String, modelOut: String,
          scorer: SentimentScorer = new LexiconSentiment()): PipelineModel = {
    val model = NlpPipeline.fit(prepare(readCorpus(spark, corpusPath), scorer))
    NlpPipeline.save(model, modelOut)
    model
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.TrainMain <corpus.json> <modelOutDir>")
    val spark = Sessions.local("graft-train")
    try {
      run(spark, args(0), args(1))
      println(s"[train] model saved to ${args(1)}")
    } finally spark.stop()
  }
}
