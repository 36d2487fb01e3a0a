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

  test("registration survives mixed float/double array arguments") {
    GraftExtensions.register(spark)
    val c = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 2.0D), array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
