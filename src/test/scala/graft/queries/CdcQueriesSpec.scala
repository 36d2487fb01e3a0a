package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the CDC family and the two round-4 report/
  * dedup additions — value correctness is the DuckDB oracle's job; these
  * pin the CONTRACTS a consumer relies on. */
class CdcQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("q_cdc_upsert: one row per key, and no key whose latest op is a delete") {
    val out = q("q_cdc_upsert").cache()
    try {
      assert(out.groupBy("user_id").count().where(col("count") > 1).isEmpty,
        "snapshot must be compacted to one row per key")
      // A key whose LATEST overall event is the tombstone type must be
      // absent: replay the changelog independently of the query.
      val latest = Tables.t(spark, dir, "events")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy(col("ts").desc, col("event_id").desc)))
        .where(col("rn") === 1)
      val deletedKeys = latest.where(col("event_type") === "error")
        .select("user_id")
      assert(out.join(deletedKeys, Seq("user_id"), "left_semi").isEmpty,
        "keys with a trailing tombstone must not appear in the merged state")
      // And every key whose latest event is live IS present with that row.
      val liveLatest = latest.where(col("event_type") =!= "error")
      assert(liveLatest.join(out, Seq("user_id"), "left_anti").isEmpty,
        "keys with a trailing live event must appear")
    } finally out.unpersist()
  }

  test("q_cdc_scd2: intervals are contiguous per key with exactly one current row") {
    val out = q("q_cdc_scd2").cache()
    try {
      val perUser = out.groupBy("user_id").agg(
        sum("is_current").as("n_current"),
        count(lit(1)).as("n_rows"))
      assert(perUser.where(col("n_current") =!= 1).isEmpty,
        "each key has exactly one open interval")
      // Half-open contiguity: valid_to of row k equals valid_from of row
      // k+1 (ordered by valid_from) — no gaps, no overlaps.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("valid_from")
      val gaps = out
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .where(col("next_from").isNotNull &&
          col("valid_to") =!= col("next_from"))
      assert(gaps.isEmpty, "validity intervals must tile the key's history")
      // Runs are maximal: consecutive intervals never share event_type.
      val dupRuns = out
        .withColumn("next_type", lead("event_type", 1).over(w))
        .where(col("next_type").isNotNull &&
          col("event_type") === col("next_type"))
      assert(dupRuns.isEmpty, "adjacent intervals must change event_type")
    } finally out.unpersist()
  }

  test("q_report_drift: PSI contributions sum to a non-negative total") {
    // PSI = Σ (p2−p1)·ln(p2/p1) is ≥ 0 term-wise NO — only in total; each
    // term (p2−p1)·ln(p2/p1) IS ≥ 0 individually (same sign factors), so
    // every micronat emission must be ≥ −1 (floor slack).
    val out = q("q_report_drift")
    assert(out.where(col("psi_unat") < -1).isEmpty)
    val total = out.agg(sum("psi_unat")).head.getLong(0)
    assert(total >= 0, s"total PSI must be non-negative, got $total")
  }

  test("q_dedup_dupngrams: fraction bounded and consistent with counts") {
    val out = q("q_dedup_dupngrams")
    val bad = out.where(
      col("dup_bp") < 0 || col("dup_bp") > 10000 ||
        col("n_shared") > col("n_shingles") ||
        col("dup_bp") =!= expr("(10000 * n_shared) div n_shingles"))
    assert(bad.isEmpty)
  }
}
