package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout — Spark's CO-LOCATED join / pre-shuffled
  * aggregation mechanism, the storage-level answer to "this equi-join
  * shuffles the corpus every night".
  *
  * A table written with `bucketBy(n, key)` hash-partitions its FILES by
  * the key once, at write time; every later equi-join or aggregation on
  * that key finds the scan already hash-distributed (the scan reports
  * `HashPartitioning(key, n)`), so EnsureRequirements inserts ZERO
  * exchanges on the bucketed side(s). Pay the shuffle once, amortize it
  * over every nightly join against the table — at 100 TB this converts
  * the recurring dominant cost of snapshot-vs-delta joins
  * ([[graft.stream.CdcIngest]]), fingerprint-index probes
  * ([[graft.stream.DedupIngest]], [[graft.stream.WinnowIngest]]) and
  * fact-to-fact joins into a bucket-aligned local merge. Those files'
  * "bucketed by key at 100 TB" prose claims are THIS mechanism;
  * `BucketedTablesSpec` pins the exchange elision they rest on, per
  * side, with an unbucketed negative control.
  *
  * Spark only honors bucketing through the catalog (`saveAsTable` —
  * a path write drops the metadata), which is why this helper publishes
  * a table, not a directory; pass `path` to keep the data external.
  */
object BucketedTables {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table.
    *
    * The pre-repartition onto the bucket key uses the same murmur3
    * bucket function as the file writer, so each bucket lands in
    * exactly ONE file per write. Without it, every write task emits its
    * own file for every bucket it sees — tasks × buckets small files —
    * and Spark treats a bucket's data as sorted only when the bucket
    * holds a single file, so the `sortBy` metadata (and the merge-join
    * sort elision it buys) would silently stop applying too. */
  def publish(df: DataFrame, name: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w.saveAsTable(name))(p => w.option("path", p).saveAsTable(name))
  }
}
