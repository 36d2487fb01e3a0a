package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.sim.KmeansModel

/** Streaming CLUSTER-ASSIGNMENT maintainer — the standing form of the
  * [[graft.sim.KmeansModel]] serving path: every micro-batch of
  * arriving embeddings is assigned against the model's FROZEN
  * centroids (resolved ONCE at construction — a mid-stream refit must
  * not let two halves of one batch score against different codebooks;
  * restart the ingest to adopt a new version) and lands in a
  * replay-safe per-batch partition store. This is what keeps a
  * SemDeDup/cluster-balanced-sampling corpus CURRENT between refits:
  * the ingest-time cost is O(batch·K·dim) assignment only — the
  * standing corpus is never re-read, the Lloyd fit is never re-run.
  *
  * Above [[flatAssignMaxK]] centroids the maintainer switches to the
  * model's two-level [[KmeansModel.assignApprox]] path (probes
  * configurable) — the hierarchical serving shape for
  * SemDeDup-scale K ∝ corpus, where flat per-batch assignment would
  * pay O(batch·K) every trigger.
  *
  * Replay safety is the shared [[MicroBatchIngest]] convention: each
  * batch's assignments land as a dynamic-overwrite `batch_id=<id>`
  * partition, so at-least-once redelivery converges. The store schema
  * is the model's assignment schema (id, cid, d2_ppm) — a consumer
  * can union it with the fitted corpus segments directly. */
final class KmeansIngest(
    spark: SparkSession,
    modelDir: String,
    idCol: String,
    vecCol: String,
    storeDir: String,
    probes: Int = 2,
    flatAssignMaxK: Int = 4096) extends MicroBatchIngest with Serializable {

  private val model = new KmeansModel(spark, modelDir)

  /** The codebook version this ingest serves — pinned at construction
    * (the torn-read rule, lifted to stream lifetime). */
  val servedVersion: Long = model.currentVersion().getOrElse(
    throw new IllegalStateException(
      s"no fitted KmeansModel under $modelDir — fit before streaming"))

  private val k: Long = model.centroids().count()

  /** One micro-batch → assignments partition. Returns rows assigned. */
  override def processBatch(batch: DataFrame, batchId: Long): Long = {
    if (batch.isEmpty) return 0L
    val prepared = batch.select(col(idCol),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("__v"))
    val assigned =
      if (k <= flatAssignMaxK) model.assign(prepared, idCol, "__v")
      else model.assignApprox(prepared, idCol, "__v", probes)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = assigned.localCheckpoint(true) // count + write both read it
    val mine = sc.getPersistentRDDs.keySet.toSet -- before
    try {
      val n = out.count()
      if (n > 0)
        MicroBatchIngest.writeBatchPartition(
          out.withColumnRenamed(idCol, "id"), storeDir, batchId)
      n
    } finally
      // Standing-monitor storage discipline (the DriftIngest rule).
      sc.getPersistentRDDs.filter { case (id, _) => mine(id) }
        .values.foreach(_.unpersist(blocking = false))
  }

  /** The standing assignment store: (id, cid, d2_ppm, batch_id). */
  def store(): DataFrame =
    MicroBatchIngest.storeOrElse(spark, storeDir,
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("id", LongType),
          StructField("cid", LongType),
          StructField("d2_ppm", LongType),
          StructField("batch_id", LongType)))))
      .withColumn("batch_id", col("batch_id").cast("long"))

  /** Live cluster occupancy including streamed arrivals — the corpus
    * segments union the stream store, the frame a cluster-balanced
    * sampler or SemDeDup pass reads to stay current between refits. */
  def occupancy(): DataFrame =
    model.assignments().select("id", "cid")
      .unionByName(store().select("id", "cid"))
      .groupBy("cid").agg(count(lit(1)).as("n_members"))
      .orderBy("cid")
}
