package graft.stream

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The shared shape of the streaming maintainers ([[DedupIngest]],
  * [[CdcIngest]], [[SketchIngest]]): a per-micro-batch `processBatch`
  * attached through `foreachBatch` (the S7 engine form), plus the
  * replay-safe per-batch partition write they converge on. One
  * definition, so the replay convention cannot drift between
  * maintainers — the same rationale as
  * [[graft.ops.VersionedPaths]] for the versioned-dir rules. */
private[stream] trait MicroBatchIngest {

  /** One micro-batch; the returned count is maintainer-specific
    * (novel docs, merged keys, slice rows). */
  def processBatch(batch: DataFrame, batchId: Long): Long

  /** Attach to a streaming frame via foreachBatch. */
  final def start(source: DataFrame, queryName: String, trigger: Trigger,
                  checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = source.writeStream
      .queryName(queryName)
      .foreachBatch((b: DataFrame, id: Long) => { processBatch(b, id); () })
      .trigger(trigger)
    checkpointLocation.foreach(w.option("checkpointLocation", _))
    w.start()
  }
}

private[stream] object MicroBatchIngest {

  /** Idempotent per-batch write: DYNAMIC overwrite of this batch's own
    * `batch_id=<id>` partition only — every other batch's output is
    * untouched, so an at-least-once redelivery (same checkpointed
    * offsets ⇒ same rows, same id) overwrites itself and the store
    * converges instead of duplicating. */
  def writeBatchPartition(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy("batch_id")
      .parquet(dir)

  /** The standing store, or `empty` (a zero-row frame with the store's
    * schema) before the first batch lands — the schema must match what
    * the first write will produce, so consumers capturing it early
    * (unions, schema-derived writers) don't diverge once data arrives. */
  def storeOrElse(spark: SparkSession, dir: String, empty: => DataFrame): DataFrame =
    try spark.read.parquet(dir)
    catch { case _: org.apache.spark.sql.AnalysisException => empty }
}
