package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M1–M3 scoring operators and the J1 topic-label broadcast join
  * (SURVEY.md §2.10, §2.3).
  */
object ScoreOps {

  /** Storage-path virality thresholds (reference `spark/engine.py:186-189`
    * — the authoritative set; display path and README disagree, see
    * SURVEY.md §2.10 M2). */
  val HotThreshold = 3.0
  val UpThreshold  = 1.5

  /** M2: virality bucketing CASE WHEN (reference `spark/engine.py:186-189`). */
  def virality(score: Column,
               hot: Double = HotThreshold, up: Double = UpThreshold): Column =
    when(score > hot, "HOT").when(score > up, "UP").otherwise("LOW")

  /** M1: `round(prediction, 2)` (reference `spark/engine.py:185`). */
  def roundedScore(c: Column, scale: Int = 2): Column = round(c, scale)

  /** M3: argmax over an array column — native expressions only (the
    * reference does `vector.argmax()` inside a row-at-a-time Python UDF,
    * `spark/engine.py:115,181`; here it is codegen-friendly).
    * `array_position` returns the FIRST index of the max, matching
    * `Vector.argmax` first-max tie-break. 0-based, int. */
  def argmax(arr: Column): Column =
    (array_position(arr, array_max(arr)) - 1).cast("int")

  /** J1: topic-id → label via a broadcast hash join against a tiny label
    * dimension, replacing the reference's closure-captured dict UDF
    * (reference `spark/engine.py:113-122`). Unmatched ids default to
    * "Sujet {id}" on the display path (reference `spark/engine.py:117`);
    * the storage path uses the constant "Autre" instead (reference
    * `spark/engine.py:181-183`) — pass `default = Some(lit("Autre"))`.
    *
    * Scale shape: `broadcast()` hint — the label table is O(topics) rows,
    * so this is a map-side join with no shuffle of the fact side. */
  def withTopicLabel(df: DataFrame, topicId: Column, labels: DataFrame,
                     default: Option[Column] = None): DataFrame = {
    val keyed = df.withColumn("topic_id", topicId)
    val fallback = default.getOrElse(concat(lit("Sujet "), col("topic_id")))
    keyed.join(broadcast(labels), Seq("topic_id"), "left")
      .withColumn("sujet", coalesce(col("label"), fallback))
      .drop("label")
  }

  /** The default 6-topic label table (reference trains LDA with k=6,
    * `spark/model_training.py:167-173`; labels are the top-3 topic words
    * joined with "-", `spark/engine.py:64`). */
  def defaultTopicLabels(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      0 -> "btc-price-moon", 1 -> "eth-gas-defi", 2 -> "market-crash-fed",
      3 -> "wallet-exchange-fees", 4 -> "nft-art-mint", 5 -> "doge-meme-elon"
    ).toDF("topic_id", "label")
  }
}
