package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over plain `ArrayType(FloatType)` columns
  * (testdata `embeddings.embedding`) — native higher-order expressions, no
  * UDFs, so the whole pipeline stays inside Catalyst.
  *
  * Everything is computed in double precision (cast once, up front).
  */
object Similarity {

  private def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product via zip_with + aggregate (sequential left-to-right sum —
    * deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane-style LSH bucket from the signs of the first
    * `bits` dimensions (axis-aligned hyperplanes — deterministic and
    * SQL-portable; swap in seeded random planes for production skew
    * resistance). Vectors in the same bucket are cosine-close with high
    * probability; ANN search only scans one bucket per query. */
  def signBucket(a: Column, bits: Int = 6): Column =
    concat((1 to bits).map(d =>
      when(element_at(a, d) >= 0, "1").otherwise("0")): _*)
}
