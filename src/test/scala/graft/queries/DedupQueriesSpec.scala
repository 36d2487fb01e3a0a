package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TokenOps

/** Local checks for the dedup family's scale rewrites. The result values
  * themselves are oracle-verified by the driver; these specs assert the
  * invariants the rewrites rely on.
  */
class DedupQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** q_dedup_ngram_jaccard feature-hashes terms with xxhash64 instead of
    * building a global dictionary. Jaccard over hashed ids equals Jaccard
    * over terms iff the hash is injective on the corpus vocabulary — the
    * one-aggregation audit a production run schedules alongside the job. */
  test("xxhash64 is collision-free on the documents vocabulary") {
    val terms = Tables.t(spark, sfDir, "documents")
      .select(explode(array_distinct(TokenOps.terms(col("text")))).as("term"))
    val counts = terms.agg(
      countDistinct(col("term")).as("n_terms"),
      countDistinct(xxhash64(col("term"))).as("n_ids")).head()
    assert(counts.getLong(0) > 0)
    assert(counts.getLong(0) == counts.getLong(1),
      "xxhash64 term-id collision: Jaccard over hashed ids would drift")
  }
}
