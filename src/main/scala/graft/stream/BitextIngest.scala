package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.IvfIndex

/** STREAMING bitext miner — the standing form of `q_sim_bitext_served`
  * (every batch family here gets a maintainer; this is the mining
  * loop's): the TARGET-language corpus is a pinned, already-built
  * [[IvfIndex]]; each micro-batch of (id, text, embedding) documents is
  * langid-classified with the SHARED classifier
  * ([[graft.queries.TextQueries.langScored]] — the graded queries' own
  * definition), its source-language rows probe the index
  * (cell-partition-pruned [[IvfIndex.probeMatches]] — per trigger the
  * corpus cost is the probed cells' postings, never the corpus), and
  * FORWARD-margin pairs land in a replay-convergent `batch_id=`
  * partition store.
  *
  * FORWARD margin (CCMatrix's `forward` strategy): streaming cannot
  * intersect with the backward direction — the standing side's argmax
  * over ALL batch vectors ever seen is unbounded state. The production
  * answer (and this miner's): precompute each TARGET vector's
  * neighborhood mean ONCE at setup (self-probe of the index, self-pairs
  * excluded, integer mean of the floor-ppm top-k cosines, persisted
  * under `nnDir` behind a `_SUCCESS` gate — deterministic content, so a
  * crashed write recomputes into an identical overwrite), then score
  * margin(x,y) = cos/((avg_x + avg_y)/2) per trigger with avg_x from
  * the batch's own top-k — exact integer arithmetic end to end
  * (margin_ppk = cp·2000·ka DIV (asum + ka·avg_nn_ppm)). Per source doc
  * the best target survives iff margin ≥ `marginMinPpk`. Targets with
  * NO measurable neighborhood (no positive-cosine non-self neighbor in
  * the probed cells) don't mine — inner-join semantics, declared.
  *
  * Replay safety: the batch's pairs are deterministic in the batch
  * (frozen codebook + frozen neighborhood table ⇒ same scores), and the
  * output write is [[MicroBatchIngest.writeBatchPartition]] — a
  * redelivery overwrites its own partition with identical rows. The
  * codebook is PINNED at construction (the [[IvfIngest]] rule): a
  * rebuild mid-stream fails the next trigger loudly instead of mining
  * under swapped centroids. */
final class BitextIngest(
    spark: SparkSession,
    indexDir: String,
    outDir: String,
    nnDir: String,
    idCol: String,
    textCol: String,
    vecCol: String,
    srcLang: String = "en",
    k: Int = 4,
    probes: Int = 2,
    marginMinPpk: Long = 1050L) extends MicroBatchIngest with Serializable {

  private val index = new IvfIndex(spark, indexDir)

  /** Pinned at construction: streaming against an unbuilt index is a
    * configuration error, not a wait state. */
  private val servedCodebook: String = index.codebookName()

  /** The target-side neighborhood table (tgt_id, avg_nn_ppm), computed
    * once per miner setup from the pinned index and read per trigger. */
  private def ensureNeighborhood(): DataFrame = {
    val fs = new Path(nnDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(nnDir, "_SUCCESS"))) {
      val posts = index.postings().select(col("id"), col("vector"))
      val scores = index.probeMatches(posts, "id", "vector", probes)
        .where(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"),
          floor(lit(1000000) * col("cos")).cast("long").as("cp"))
        .where(col("cp") > 0)
      graft.plans.GraftOps.topKPerKey(scores, Seq("qid"),
          Seq("cp" -> false, "cid" -> true), k)
        .groupBy(col("qid").as("tgt_id"))
        .agg(expr("sum(cp) DIV count(1)").as("avg_nn_ppm"))
        .write.mode(SaveMode.Overwrite).parquet(nnDir)
    }
    spark.read.parquet(nnDir)
  }
  ensureNeighborhood() // eager — setup cost paid once, not on trigger 1

  /** ERASURE propagation into the miner's DERIVED state — the
    * [[graft.gov.ForgetPipeline]] target shape for this maintainer:
    * victims' rows drop from the neighborhood table (their avg_nn_ppm
    * is a statistic of the victim's own vector) and from the mined
    * pairs store under BOTH roles (a victim document may have mined as
    * source or been mined as target). The pairs store erasure is
    * horizon-enforced ([[MicroBatchIngest.forgetFromBatchStore]] —
    * victims in a still-redeliverable partition refuse loudly); the nn
    * rewrite is a full overwrite of a model-state-sized table whose
    * recompute-on-torn-dir path ([[ensureNeighborhood]]'s `_SUCCESS`
    * gate) reads the INDEX — run the index's own forget in the same
    * request, as the pipeline's per-request targets naturally do.
    * Neighborhood means of SURVIVING targets are deliberately not
    * re-derived (they summarize a neighborhood that once contained the
    * victim — an aggregate, like the IVF centroids the store forgets
    * keep; full statistical erasure is a setup rebuild). Returns rows
    * dropped across the three surfaces. */
  def forget(victims: DataFrame,
      checkpointLocation: Option[String]): Long = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val v = victims.select(
        col(victims.columns.head).cast("long").as("__vid"))
      .distinct().localCheckpoint(true)
    try {
      val nn = ensureNeighborhood()
      val nVictims = nn.join(v, nn("tgt_id") === v("__vid"), "left_semi")
        .count()
      if (nVictims > 0) {
        // Overwrite is crash-safe here: a torn nn dir loses its
        // _SUCCESS marker and ensureNeighborhood recomputes from the
        // (already redacted) index — convergent, never torn-served.
        val survivors = nn
          .join(v, nn("tgt_id") === v("__vid"), "left_anti")
          .localCheckpoint(true)
        survivors.write.mode(SaveMode.Overwrite).parquet(nnDir)
      }
      val pairsDropped =
        MicroBatchIngest.forgetFromBatchStore(spark, outDir,
          v, "src_id", checkpointLocation) +
        MicroBatchIngest.forgetFromBatchStore(spark, outDir,
          v, "tgt_id", checkpointLocation)
      nVictims + pairsDropped
    } finally {
      // Release this call's checkpoint blocks (victim pin + nn
      // survivors) — the withReleasedCheckpoint discipline.
      val mine = sc.getPersistentRDDs.keySet.toSet -- before
      sc.getPersistentRDDs.filter { case (id, _) => mine(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
  }

  /** One micro-batch → mined forward-margin pairs into the batch's own
    * partition. Returns the number of pairs mined (a replayed batch
    * recomputes — and re-reports — the same count). */
  override def processBatch(batch: DataFrame, batchId: Long): Long = {
    if (batch.isEmpty) return 0L
    require(index.codebookName() == servedCodebook,
      s"index $indexDir now serves a different codebook — a rebuild " +
        "happened mid-stream; restart the miner (and recompute nnDir) " +
        "to adopt it")
    val src = graft.queries.TextQueries.langScored(batch, textCol)
      .where(col("predicted") === srcLang)
      .select(col(idCol).as("id"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("__v"))
    MicroBatchIngest.withReleasedCheckpoint(src) { pinned =>
      if (pinned.isEmpty) {
        // No partition is written for a source-free batch: dynamic
        // overwrite of a zero-row frame creates no directory (the
        // forgetFromBatchStore rule), so "empty" is represented by
        // ABSENCE — and a redelivery recomputes the same absence (if
        // the first delivery mined rows, the redelivery mines the same
        // rows and overwrites; deterministic either way).
        0L
      } else {
        val scores = index.probeMatches(pinned, "id", "__v", probes)
          .select(col("qid"), col("cid"),
            floor(lit(1000000) * col("cos")).cast("long").as("cp"))
          .where(col("cp") > 0)
        val top = graft.plans.GraftOps.topKPerKey(scores, Seq("qid"),
          Seq("cp" -> false, "cid" -> true), k)
        MicroBatchIngest.withReleasedCheckpoint(top) { t =>
          val aagg = t.groupBy("qid")
            .agg(sum("cp").as("asum"), count(lit(1)).as("ka"))
          val best = t.join(aagg, Seq("qid"))
            .join(ensureNeighborhood(),
              t("cid") === col("tgt_id"))
            .select(col("qid"), col("cid"),
              expr("CAST((cp * 2000 * ka) DIV (asum + ka * avg_nn_ppm) AS BIGINT)")
                .as("margin_ppk"))
            .withColumn("r", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("qid")
                .orderBy(col("margin_ppk").desc, col("cid").asc)))
            .where(col("r") === 1 && col("margin_ppk") >= marginMinPpk)
            .select(col("qid").as("src_id"), col("cid").as("tgt_id"),
              col("margin_ppk"))
          MicroBatchIngest.withReleasedCheckpoint(best) { b =>
            MicroBatchIngest.writeBatchPartition(b, outDir, batchId)
            b.count()
          }
        }
      }
    }
  }
}
