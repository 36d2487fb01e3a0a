package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch distinct counting — the architecture that makes
  * cardinality queries incremental at 100 TB: build ONE compact
  * DataSketches HLL sketch per partition slice (day, source, shard) at
  * ingest, persist the binary sketches, and answer any later
  * distinct-count rollup by MERGING sketches instead of rescanning data.
  * `approx_count_distinct` (q_a2_approx_distinct) answers one query in
  * one pass; persisted sketches answer every FUTURE rollup in O(slices).
  *
  * Uses Spark 4's built-in Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) — the
  * sketch column is a plain BINARY, so it round-trips through parquet
  * and unions associatively across any partitioning. lgConfigK = 12
  * (4 KB per sketch, ~1.6% rsd) is the storage/accuracy default.
  */
object SketchOps {

  val DefaultLgK = 12

  /** Per-slice sketch build: one row per group, carrying the slice's
    * exact row count and its HLL sketch of `of`. */
  def sliceSketches(df: DataFrame, of: String, groupBy: String*): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col(of), lit(DefaultLgK)).as("sketch"))

  /** Roll persisted slice sketches up to any coarser grain (or global
    * with no keys): merges binaries, never touches the base data. An
    * EMPTY store rolls up to an empty frame on both paths — without the
    * filter, the global (no-key) aggregate would emit one all-NULL row
    * whose NULL sketch breaks the documented `estimate(...)` pattern. */
  def rollup(sketches: DataFrame, groupBy: String*): DataFrame = {
    val aggs = Seq(sum(col("n_rows")).as("n_rows"),
      hll_union_agg(col("sketch"), lit(false)).as("sketch"))
    val grouped =
      if (groupBy.isEmpty) sketches.agg(aggs.head, aggs.tail: _*)
      else sketches.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
    grouped.where(col("sketch").isNotNull)
  }

  /** The estimate a merged (or per-slice) sketch answers with. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
