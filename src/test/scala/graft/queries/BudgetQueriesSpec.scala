package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the budget-selection family (top-P, percent-norm, ANN
  * recall) — values are oracle-verified by the driver; these pin the
  * semantic contracts. */
class BudgetQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("sequence export caps a degenerate key at the declared bound") {
    import spark.implicits._
    // One bot with 10× the cap, one human with 3 events: the bot's path
    // holds exactly the NEWEST SeqExportMaxEvents (ts, event_id)-ordered
    // events while its n_events reports the full stream.
    val cap = RelationalQueries.SeqExportMaxEvents
    val bot = (0 until 10 * cap).map(i =>
      (7L, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        i.toLong, if (i >= 10 * cap - cap) "tail" else "head"))
    val human = (0 until 3).map(i =>
      (8L, java.sql.Timestamp.valueOf(s"2024-01-01 01:00:0$i"),
        10000L + i, "view"))
    val ev = (bot ++ human).toDF("user_id", "ts", "event_id", "event_type")
      .repartition(8)
    val out = RelationalQueries.seqExportFrame(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val (nBot, pathBot) = out(7L)
    assert(nBot == 10L * cap, "n_events must count the full stream")
    val toks = pathBot.split(">")
    assert(toks.length == cap, s"path holds ${toks.length} events, want $cap")
    assert(toks.forall(_ == "tail"), "cap must keep the NEWEST events")
    assert(out(8L) == ((3L, "view>view>view")), "uncapped keys unchanged")
  }

  test("top-P selection covers ≥ P of each group's mass, minimally") {
    val events = Tables.t(spark, dir, "events")
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val totals = events.groupBy("event_type").agg(sum("cents").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val picked = q("q_w2_top_p").collect()
      .groupBy(_.getAs[String]("event_type"))
    for ((tpe, rows) <- picked) {
      val mass = rows.map(_.getAs[Long]("cents")).sum
      val total = totals(tpe)
      assert(10000L * mass >= 5000L * total, s"$tpe under the P budget")
      // Minimality: dropping the smallest selected row falls below P.
      val withoutMin = mass - rows.map(_.getAs[Long]("cents")).min
      assert(10000L * withoutMin < 5000L * total, s"$tpe not minimal")
    }
  }

  test("percent-rank and cume-dist stay in [0, 10000] and hit the top") {
    val out = q("q_w2_percent_norm")
    assert(out.where(col("pr_bp") < 0 || col("pr_bp") > 10000 ||
      col("cd_bp") <= 0 || col("cd_bp") > 10000).count() == 0)
    // Every group's maximum value carries cd_bp = 10000 (all rows ≤ it).
    val tops = out.groupBy("event_type").agg(max("cd_bp").as("top"))
    assert(tops.where(col("top") =!= 10000).count() == 0)
  }

  test("ANN recall audit: per-query recall is bounded and self-consistent") {
    val out = q("q_sim_recall").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 5)
      assert(r.getAs[Long]("recall_bp") == 10000L * hits / 5)
    }
  }
}
