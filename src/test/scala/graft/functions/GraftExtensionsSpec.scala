package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_similarity is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)), (Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT round(cosine_similarity(a, b), 9) AS c FROM vecs ORDER BY c")
      .as[Double].collect().toSeq
    assert(out == Seq(0.0, 1.0))
  }

  test("sorted_intersection_size is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT sorted_intersection_size(array(1, 3, 5, 9), array(3, 4, 9))")
      .head().getInt(0)
    assert(n == 2)
  }

  test("the sketch family is SQL-surfaced end to end") {
    GraftExtensions.register(spark)
    spark.range(1000).createOrReplaceTempView("ids")
    // theta: exact mode at 1000 ids — the estimate IS the count.
    assert(spark.sql(
      "SELECT CAST(theta_estimate(theta_sketch_agg(id)) AS BIGINT) FROM ids")
      .head().getLong(0) == 1000L)
    // two-level: per-group sketches unioned back, with an explicit lgK.
    assert(spark.sql(
      """SELECT CAST(theta_estimate(theta_union_agg(sk, 12)) AS BIGINT)
        |FROM (SELECT id % 4 AS g, theta_sketch_agg(id, 12) AS sk
        |      FROM ids GROUP BY 1)""".stripMargin)
      .head().getLong(0) == 1000L)
    // set algebra over sketches straight from SQL.
    assert(spark.sql(
      """SELECT CAST(theta_estimate(theta_a_not_b(a.sk, b.sk)) AS BIGINT)
        |FROM (SELECT theta_sketch_agg(id) AS sk FROM ids) a,
        |     (SELECT theta_sketch_agg(id) AS sk FROM ids WHERE id < 400) b"""
        .stripMargin).head().getLong(0) == 600L)
    // kll: exact n and exact extremes; rank/quantile inverse pair.
    val kll = spark.sql(
      """SELECT kll_n(sk), kll_quantile(sk, 1.0), kll_rank(sk, -1.0)
        |FROM (SELECT kll_sketch_agg(CAST(id AS DOUBLE)) AS sk FROM ids)"""
        .stripMargin).head()
    assert(kll.getLong(0) == 1000L && kll.getDouble(1) == 999.0 &&
      kll.getDouble(2) == 0.0)
    // freq: exact-mode counts under the purge capacity.
    val fr = spark.sql(
      """SELECT freq_n(sk), freq_estimate(sk, 7), freq_max_error(sk)
        |FROM (SELECT freq_sketch_agg(id % 10) AS sk FROM ids)"""
        .stripMargin).head()
    assert(fr.getLong(0) == 1000L && fr.getLong(1) == 100L &&
      fr.getLong(2) == 0L)
    // kll_auc: separated classes read ~1 from pure SQL.
    val auc = spark.sql(
      """SELECT kll_auc(p.sk, n.sk) FROM
        | (SELECT kll_sketch_agg(CAST(id + 5000 AS DOUBLE)) AS sk FROM ids) p,
        | (SELECT kll_sketch_agg(CAST(id AS DOUBLE)) AS sk FROM ids) n"""
        .stripMargin).head().getDouble(0)
    assert(auc > 0.99, s"separated classes must read ~1, got $auc")
  }

  test("registration survives mixed float/double array arguments") {
    GraftExtensions.register(spark)
    val c = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 2.0D), array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
