package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Linear-counting occupancy sketch as a typed [[Aggregator]] — the
  * custom-typed-aggregation extension path (SURVEY.md §7.1 preference (b),
  * next to the codegen expressions and the TopKPerKey whole-operator).
  *
  * Counts OCCUPIED BUCKETS of a pre-bucketed stream with a fixed
  * `k`-bit bitmap buffer (`k/64` longs — 8 KB at k = 65536):
  * `reduce` sets a bit, `merge` ORs two bitmaps, `finish` popcounts.
  * Agrees bit-for-bit with `count(DISTINCT bucket)` — the declared
  * `q_a2_linear_count` uses it for its hash-verified `n_occupied`
  * column, so the aggregator itself is DuckDB-oracle-checked.
  *
  * Why not `countDistinct` at 100 TB: distinct aggregation buffers every
  * distinct value per group and shuffles them all to the final phase.
  * The bitmap is O(k) per group REGARDLESS of input size, the map-side
  * partial is already a full sketch, and the exchange carries one 8 KB
  * payload per (group × partition) — the same partial/final economics as
  * HLL, but portable across engines (any side that can compute the
  * bucket id can reproduce the sketch exactly).
  *
  * Inputs outside [0, k) and nulls are ignored (matching
  * `count(DISTINCT ...)`'s null behavior).
  */
final class LinearCountSketch(k: Int)
  extends Aggregator[java.lang.Long, Array[Long], Long] {
  require(k > 0 && k % 64 == 0, s"k must be a positive multiple of 64, got $k")

  override def zero: Array[Long] = new Array[Long](k / 64)

  override def reduce(b: Array[Long], x: java.lang.Long): Array[Long] = {
    if (x != null) {
      val v = x.longValue
      if (v >= 0L && v < k) b((v >> 6).toInt) |= 1L << (v & 63L)
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object LinearCountSketch {
  /** Column form: occupied-bucket count of `bucket` over a `k`-bit bitmap. */
  def occupied(bucket: Column, k: Int = 65536): Column =
    udaf(new LinearCountSketch(k)).apply(bucket)
}
