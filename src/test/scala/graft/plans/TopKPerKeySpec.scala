package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom top-K operator must be exactly the window-rank composition,
  * minus the sort: same rows, two-phase plan, no SortExec. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.queries.Tables
    .t(spark, "/root/testdata/sf0.01", "events")
    .select("event_id", "user_id", "value")

  test("topKPerKey matches the rank-window composition exactly") {
    val custom = GraftOps.topKPerKey(events, Seq("user_id"),
        Seq("value" -> false, "event_id" -> true), k = 3)
      .orderBy("user_id", "event_id")
      .collect().toSeq
    val viaWindow = events
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy($"value".desc, $"event_id")))
      .where($"rn" <= 3).drop("rn")
      .orderBy("user_id", "event_id")
      .collect().toSeq
    assert(custom.nonEmpty)
    assert(custom == viaWindow)
  }

  test("plans as partial+final heaps with no sort") {
    val plan = GraftOps.topKPerKey(events, Seq("user_id"),
      Seq("value" -> false), k = 5).queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(plan).size == 2, plan) // partial + final
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), plan) // WindowExec would need one
    assert(!plan.contains("Window"), plan)
  }

  test("k larger than any group degenerates to the identity set") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = GraftOps.topKPerKey(df, Seq("k"), Seq("v" -> true), k = 10)
      .as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 3)))
  }

  test("partial-phase key cap passes overflow rows through, still exact") {
    // Cap the partial phase at ONE heap: nearly every key overflows and
    // reaches the final phase unpruned — the result must not change.
    def run() = GraftOps.topKPerKey(events, Seq("user_id"),
        Seq("value" -> false, "event_id" -> true), 3)
      .orderBy("user_id", "event_id").collect().toSeq
    val uncapped = run()
    spark.conf.set(TopKPerKeyStrategy.MaxPartialKeysConf, "1")
    try {
      val capped = run()
      assert(capped == uncapped)
    } finally spark.conf.unset(TopKPerKeyStrategy.MaxPartialKeysConf)
  }

  test("null order values match the window's NULLS LAST/FIRST semantics") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", Some(5)), ("a", None), ("a", Some(9)), ("a", Some(1)),
        ("b", None), ("b", None), ("b", Some(2)))
      .toDF("k", "v")
    // DESC default = NULLS LAST (same as Window.orderBy($"v".desc)): the
    // nulls only surface when a group runs out of non-null rows.
    val custom = GraftOps.topKPerKey(df, Seq("k"), Seq("v" -> false), 2)
      .orderBy("k", "v").collect().toSeq
    val viaWindow = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("v").desc)))
      .where(col("rn") <= 2).drop("rn")
      .orderBy("k", "v").collect().toSeq
    assert(custom == viaWindow)
    assert(custom.map(r => (r.getString(0), Option(r.get(1)))) ==
      Seq(("a", Some(5)), ("a", Some(9)), ("b", None), ("b", Some(2))))
  }

  test("ascending order keeps the smallest") {
    val df = Seq(("a", 5), ("a", 1), ("a", 3), ("b", 9), ("b", 2)).toDF("k", "v")
    val out = GraftOps.topKPerKey(df, Seq("k"), Seq("v" -> true), k = 1)
      .as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("b", 2)))
  }
}
