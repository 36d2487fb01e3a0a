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

  /** Cosine similarity — a custom codegen Expression (one fused loop per
    * pair, no intermediate array; see graft.functions.CosineSimilarity).
    * Bit-identical to [[cosineHof]], the composed built-in form. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.toColumn(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.graftshim.ColumnShim.toExpression(a),
        org.apache.spark.sql.graftshim.ColumnShim.toExpression(b)))

  /** Cosine via composed built-ins (aggregate/zip_with) — kept as the
    * cross-check oracle for the native expression. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** IVF coarse quantizer, step 1: elementwise-mean centroid per cell
    * (one distributed pass: posexplode → per-(cell,dim) avg → re-assemble
    * in dim order). `seedCol` seeds the cells — any rough partition works
    * (a hash bucket, a first-round k-means assignment); the centroids are
    * what IVF search actually uses. Output: (cell, centroid array<double>),
    * O(cells) rows — broadcastable by construction. */
  def centroids(emb: org.apache.spark.sql.DataFrame, vecCol: String,
                seedCol: String): org.apache.spark.sql.DataFrame =
    emb.select(col(seedCol).as("cell"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("cell", "pos").agg(avg("v").as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), x => x.getField("m")).as("centroid"))

  /** Cell affinity of every vector against broadcast centroids, ranked
    * per vector by (cosine desc, cell asc) — ONE definition of the
    * nearest-cell rule shared by the inline `q_sim_ivf_ann` query and
    * the persisted [[IvfIndex]] (assignment = rnk 1, probing =
    * rnk ≤ probes); a tie-break fix lands in all of them at once.
    * Output: (id, vector, cell, aff, rnk). */
  def rankedCellAffinity(vecs: org.apache.spark.sql.DataFrame, idCol: String,
                         vecCol: String, cents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    vecs.select(col(idCol).as("id"), col(vecCol).as("vector"))
      .join(broadcast(cents))
      .select(col("id"), col("vector"), col("cell"),
        cosine(col("vector"), col("centroid")).as("aff"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("aff").desc, col("cell").asc)))

  /** Random-hyperplane-style LSH bucket from the signs of the first
    * `bits` dimensions (axis-aligned hyperplanes — deterministic and
    * SQL-portable; swap in seeded random planes for production skew
    * resistance). Vectors in the same bucket are cosine-close with high
    * probability; ANN search only scans one bucket per query. */
  def signBucket(a: Column, bits: Int = 6): Column =
    concat((1 to bits).map(d =>
      when(element_at(a, d) >= 0, "1").otherwise("0")): _*)

  /** Seeded random-hyperplane LSH bucket (the production form): `bits`
    * hyperplanes with Gaussian weights drawn deterministically from `seed`
    * on the driver and baked into the plan as array literals — identical
    * across executors, runs, and clusters, yet rotation-invariant, so
    * correlated embedding dimensions (where the axis-aligned form above
    * collapses everything into one bucket) still split evenly. Cosine-close
    * vectors agree on each plane's sign with probability 1 − θ/π, the
    * standard SRP-LSH guarantee. Projection is zip_with·aggregate per
    * plane — native expressions, codegen'd, no UDF. */
  def signBucket(a: Column, bits: Int, dim: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rnd.nextGaussian())
    val ad = asDouble(a)
    concat(planes.map { w =>
      val proj = aggregate(
        zip_with(ad, typedLit(w.toSeq), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, "1").otherwise("0")
    }.toSeq: _*)
  }
}
