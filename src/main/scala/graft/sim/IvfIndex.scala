package graft.sim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the build-once / query-many shape a production
  * vector store actually runs (the inline `q_sim_ivf_ann` rebuilds its
  * cells per query; an index amortizes that over every future search,
  * the same economics `ops/SketchOps` gives cardinality rollups).
  *
  * Storage is VERSIONED like `stream/CdcIngest`'s snapshots — builds are
  * atomic-by-publication, never in-place: build N writes
  * `indexDir/v=N/centroids` then `indexDir/v=N/postings`, and readers
  * use the newest version whose BOTH tables carry `_SUCCESS`. A reader
  * can therefore never join new centroids against old postings (the
  * failure mode of overwrite-in-place), and an interrupted build leaves
  * only an ignored incomplete version.
  *
  * Layout per version:
  *   - `centroids/` — (cell, centroid array<double>), O(cells) rows
  *   - `postings/`  — (cell, id, vector), every corpus vector assigned
  *     to its single nearest cell, PARTITIONED BY cell on disk
  *
  * Search probes the top-`probes` cells per query against the broadcast
  * centroids, joins ONLY those cells' postings, scores exact cosine,
  * and keeps top-k per query. At 100 TB the cell-partitioned postings
  * mean a probe reads `probes/cells` of the corpus — the scan pruning
  * this index exists for. The nearest-cell rule is the shared
  * [[Similarity.rankedCellAffinity]], so the persisted index and the
  * oracle-checked inline query cannot drift. */
final class IvfIndex(spark: SparkSession, val indexDir: String)
    extends Serializable {

  /** Newest version whose centroids AND postings are complete — the
    * shared [[graft.ops.VersionedPaths]] listing: the `v=N` name filter
    * runs BEFORE the `_SUCCESS` probes, so unrelated or stale
    * directories under `indexDir` (including `.staging-*`) cost zero
    * existence RPCs (they matter on object stores, where every probe is
    * a round trip). */
  def currentVersion(): Option[Long] = {
    val dir = new Path(indexDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.VersionedPaths.listNumbered(fs, dir, "v=", dirsOnly = true)
      .filter { case (p, _) =>
        fs.exists(new Path(p, "centroids/_SUCCESS")) &&
          fs.exists(new Path(p, "postings/_SUCCESS")) }
      .map(_._2)
      .sorted.lastOption
  }

  /** Build and PUBLISH the next index version from an embedding table.
    * `seedCol` seeds the cells (any rough partition — a label, a hash
    * bucket, a first-round k-means assignment); vectors are then
    * assigned to their NEAREST seeded centroid, which repairs a
    * mediocre seed. Returns the published version.
    *
    * Concurrent-builder safe: both tables are written into a hidden
    * `.staging-<uuid>` dir under `indexDir` (same filesystem, invisible
    * to [[currentVersion]]'s `v=` filter), and publication is ONE
    * atomic rename to `v=N` via [[publish]] — of two interleaved
    * builders exactly one renames first; the loser's publication fails
    * loudly and its staging is discarded, never interleaved into the
    * winner's version. The target version is resolved AFTER the heavy
    * writes, so the collision window is the rename itself. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            seedCol: String): Long = {
    val staging = new Path(indexDir, s".staging-${java.util.UUID.randomUUID()}")
    val out = staging.toString
    // A failed build must not leak its corpus-sized staging dir (the
    // uuid name means no later build would ever reclaim it): delete on
    // any write failure, then rethrow. publish() owns cleanup on the
    // lose() paths past this point.
    try {
      val cents = Similarity.centroids(emb, vecCol, seedCol)
      cents.write.mode(SaveMode.Overwrite).parquet(s"$out/centroids")
      // Fan out first: the assignment pass (a cosine against every
      // centroid per vector) is the expensive stage, and a single-file
      // parquet input would otherwise run it all on one task — same
      // rationale as the inline query's fanout.
      Similarity.rankedCellAffinity(
          graft.queries.Tables.fanout(emb.select(col(idCol), col(vecCol))),
          idCol, vecCol, spark.read.parquet(s"$out/centroids"))
        .where(col("rnk") === 1)
        .select("cell", "id", "vector")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("cell").parquet(s"$out/postings")
    } catch {
      case e: Throwable =>
        try staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(staging, true)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    publish(staging, currentVersion().map(_ + 1).getOrElse(0L))
  }

  /** Atomic staged publication — the shared
    * [[graft.ops.VersionedPaths.publish]] rule (one definition for every
    * versioned index; the race/degraded-rename guarantees are documented
    * there and pinned by `IvfIndexSpec`). */
  private[sim] def publish(staging: Path, v: Long): Long =
    graft.ops.VersionedPaths.publish(
      staging.getFileSystem(spark.sparkContext.hadoopConfiguration),
      new Path(indexDir), staging, "v=", v)

  private def resolvedOrFail(): Long = currentVersion().getOrElse(
    throw new IllegalStateException(s"no complete index under $indexDir"))

  private def read(v: Long, table: String): DataFrame =
    spark.read.parquet(s"$indexDir/v=$v/$table")

  def centroids(): DataFrame = read(resolvedOrFail(), "centroids")
  def postings(): DataFrame = read(resolvedOrFail(), "postings")

  /** Top-k cosine neighbors per query over the persisted index. The
    * version is resolved ONCE and both tables read at it — resolving
    * per-table would let a build publishing mid-search pair version-N
    * centroids with version-N+1 postings (cell assignments from
    * different centroids: the torn read the versioning exists to
    * prevent). */
  def search(queries: DataFrame, idCol: String, vecCol: String,
             k: Int, probes: Int): DataFrame = {
    val v = resolvedOrFail()
    val probed = Similarity
      .rankedCellAffinity(queries.select(col(idCol), col(vecCol)),
        idCol, vecCol, read(v, "centroids"))
      .where(col("rnk") <= probes)
      .select(col("id").as("qid"), col("vector").as("qe"), col("cell"))
    read(v, "postings").join(broadcast(probed), Seq("cell"))
      .select(col("qid"), col("id").as("cid"),
        Similarity.cosine(col("qe"), col("vector")).as("cos"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("int").as("rnk"),
        col("cid"), col("cos"))
  }
}
