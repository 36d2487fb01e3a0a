package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The opt-in optimizer rewrite must re-plan rank-limit window filters
  * through TopKPerKey with byte-identical results — and must NOT fire on
  * the patterns it cannot prove equivalent. */
class RankLimitToTopKSpec extends SparkSpec {

  // Fresh session: extraOptimizations are session-state, so the rewrite
  // stays scoped to this suite (the shared session keeps stock plans).
  private lazy val s2 = {
    val s = spark.newSession()
    GraftOps.installRewrite(s)
    s
  }

  private def events(s: org.apache.spark.sql.SparkSession) =
    graft.queries.Tables.t(s, "/root/testdata/sf0.01", "events")
      .select("event_id", "user_id", "value")

  private def rankLimited(s: org.apache.spark.sql.SparkSession, k: Int) =
    events(s)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))))
      .where(col("rn") <= k)

  test("rewrites row_number <= K and keeps results byte-identical") {
    val rewritten = rankLimited(s2, 3)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(plan).size == 2, plan)
    val expect = rankLimited(spark, 3) // stock session: plain window plan
    assert(!expect.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(rewritten.orderBy("user_id", "rn").collect().toSeq ==
      expect.orderBy("user_id", "rn").collect().toSeq)
  }

  test("rewrites the rn = 1 dedup-first pattern") {
    val df = events(s2)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("event_id"))))
      .where(col("rn") === 1)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(df.count() == events(s2).select("user_id").distinct().count())
  }

  test("does not fire on rank(), global windows, or extra window exprs") {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc)
    val viaRank = events(s2)
      .withColumn("rn", rank().over(w)).where(col("rn") <= 3)
    assert(!viaRank.queryExecution.executedPlan.toString.contains("TopKPerKey"))

    val global = events(s2)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("value").desc))).where(col("rn") <= 3)
    assert(!global.queryExecution.executedPlan.toString.contains("TopKPerKey"))

    val twoExprs = events(s2)
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max("value").over(w))
      .where(col("rn") <= 3)
    assert(!twoExprs.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // and the unrewritten forms still compute correct window semantics
    assert(viaRank.count() >= 3)
  }
}
