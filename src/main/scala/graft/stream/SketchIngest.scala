package graft.stream

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{QuantileSketch, ThetaSketch}

/** Streaming maintainer for the SLICE-SKETCH STORE — the piece that turns
  * the sketch family ([[graft.functions.ThetaSketch]] distinct/overlap,
  * [[graft.functions.QuantileSketch]] distributions,
  * [[graft.ops.SketchOps]] HLL) from a batch convenience into standing
  * infrastructure: every micro-batch folds its rows into one compact
  * observability row per slice — exact row count, theta sketch of the id
  * column, KLL sketch of the metric column — and appends it to a parquet
  * store. Any later question (daily distinct users, week-over-week
  * retention overlap, score-distribution drift) is answered from the
  * store in O(slices × k), never by rescanning the stream's history.
  *
  * Replay safety follows [[DedupIngest]]'s convention: each batch writes
  * its slice rows as a `batch_id=<id>` partition via DYNAMIC partition
  * overwrite, so an at-least-once redelivery (same checkpointed offsets ⇒
  * same rows, same id) overwrites its own partition and the store
  * converges instead of double-counting. The store is parquet, not
  * stream-engine state, deliberately: it must survive restarts, outlive
  * any watermark horizon, and stay readable by plain batch queries.
  *
  * Semantics under cross-batch duplicates: theta estimates are DISTINCT
  * counts, so a value recurring in later batches is correctly not
  * re-counted by the rollup union; `n_rows` and the KLL weight count
  * every delivered row — they measure the stream, not the identity set.
  *
  * Scale shape: the per-batch aggregation is one partial+final exchange
  * carrying ≤ ~32 KB per (slice × partition); the store grows by
  * O(slices) rows per trigger regardless of batch width, and
  * [[rollup]]'s cost is O(store rows), independent of the data volume
  * the sketches summarize. */
final class SketchIngest(
    spark: SparkSession,
    sliceCol: String,
    idCol: String,
    metricCol: String,
    storeDir: String,
    lgK: Int = ThetaSketch.DefaultLgK) extends Serializable {

  /** One micro-batch → one store row per slice present in the batch.
    * Returns the number of slice rows written. */
  def processBatch(batch: DataFrame, batchId: Long): Long = {
    if (batch.isEmpty) return 0L
    val slices = batch.groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n_rows"),
        ThetaSketch.sketchAgg(col(idCol), lgK).as("distinct_sk"),
        QuantileSketch.sketchAgg(col(metricCol)).as("metric_sk"))
    val n = slices.count()
    if (n > 0)
      slices.withColumn("batch_id", lit(batchId))
        .write
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite)
        .partitionBy("batch_id")
        .parquet(storeDir)
    n
  }

  /** The standing store (empty-schema'd before the first batch lands). */
  def store(): DataFrame =
    try spark.read.parquet(storeDir)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.range(0).select(lit(0L).as(sliceCol), lit(0L).as("n_rows"),
          lit(Array.empty[Byte]).as("distinct_sk"),
          lit(Array.empty[Byte]).as("metric_sk"), lit(0L).as("batch_id"))
          .where(lit(false))
    }

  /** Merge the per-batch slice rows down to one row per slice — the
    * read path every consumer starts from. Never touches base data. */
  def rollup(): DataFrame =
    store().groupBy(col(sliceCol))
      .agg(sum("n_rows").as("n_rows"),
        ThetaSketch.unionAgg(col("distinct_sk"), lgK).as("distinct_sk"),
        QuantileSketch.mergeAgg(col("metric_sk")).as("metric_sk"))

  /** Rolled-up store with the sketches opened into human answers:
    * distinct-id estimate and metric quantiles per slice. */
  def summary(): DataFrame =
    rollup().select(col(sliceCol), col("n_rows"),
      ThetaSketch.estimateCol(col("distinct_sk")).as("distinct_ids"),
      QuantileSketch.quantileCol(col("metric_sk"), lit(0.5)).as("p50"),
      QuantileSketch.quantileCol(col("metric_sk"), lit(0.99)).as("p99"))

  /** Attach to a streaming frame via foreachBatch (the S7 engine shape). */
  def start(source: DataFrame, queryName: String,
            trigger: org.apache.spark.sql.streaming.Trigger,
            checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = source.writeStream
      .queryName(queryName)
      .foreachBatch((b: DataFrame, id: Long) => { processBatch(b, id); () })
      .trigger(trigger)
    checkpointLocation.foreach(w.option("checkpointLocation", _))
    w.start()
  }
}
