package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the maintenance pass a streaming corpus store
  * needs: every micro-batch append (see [[graft.stream.DedupIngest]],
  * `JsonLinesSink`) adds task-count files, and at 100 TB a table quietly
  * accumulates millions of kilobyte files whose per-file open/footer cost
  * dominates scans. Compaction rewrites a directory into
  * ceil(bytes/target) files of ~`targetBytes` each.
  *
  * Shape: one distributed read → round-robin repartition to the computed
  * file count → write to a NEW directory. The destination is
  * caller-provided rather than an in-place rewrite: swapping directories
  * atomically is filesystem-specific (rename on HDFS, copy on object
  * stores), so the swap is left to the orchestration layer and the
  * library stays non-destructive.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int,
                         bytes: Long, rows: Long)

  /** Data files under `dir` (ignores _SUCCESS and checksums). Flat
    * layouts only, enforced: on a Hive-partitioned table the listing
    * would see 0 bytes while the read pulls every row — the rewrite
    * would silently collapse the table into one unpartitioned file.
    * Partitioned tables are compacted per LEAF directory (which also
    * preserves the partitioning). */
  private def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val entries = fs.listStatus(p).toSeq
    // '.'-prefixed dirs are hidden temp state (e.g. .spark-staging-* left
    // by an interrupted write), not partitions — ignore them like hidden
    // files, or a leftover staging dir fails compact() with a misleading
    // "partitioned layout" error.
    val subdirs = entries.filter(s =>
      s.isDirectory && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
    require(subdirs.isEmpty,
      s"$dir has a partitioned/nested layout (e.g. ${subdirs.headOption.map(_.getPath.getName).getOrElse("")}); " +
        "compact each leaf partition directory instead")
    entries
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Target output-file count for `dir` at `targetBytes` per file. */
  def plannedFiles(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = dataFiles(spark, dir).map(_._2).sum
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite `srcDir` (parquet) into `dstDir` as ~`targetBytes` files.
    * Stats.rows is observed DURING the rewrite (`Dataset.observe`), not
    * by re-reading the destination — a maintenance pass motivated by scan
    * cost must not pay a second full scan of what it just wrote. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
              targetBytes: Long): Stats = {
    val before = dataFiles(spark, srcDir)
    val n = plannedFiles(spark, srcDir, targetBytes)
    val obs = new org.apache.spark.sql.Observation("compact_rows")
    spark.read.parquet(srcDir)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
      .repartition(n).write.mode(SaveMode.ErrorIfExists).parquet(dstDir)
    Stats(before.length, dataFiles(spark, dstDir).length,
      before.map(_._2).sum, obs.get("rows").asInstanceOf[Long])
  }
}
