package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("epochToTimestamp: double seconds → timestamp (D1 reference semantics)") {
    val out = Seq(1700000000.5).toDF("e")
      .select(TimeOps.epochToTimestamp($"e").cast("double")).as[Double].head()
    assert(out == 1700000000.5) // seconds-since-epoch round-trips exactly
  }

  test("fromUnixSeconds(toUnixSeconds(ts)) truncates to whole seconds (D2)") {
    val df = Seq("2024-03-05 10:20:30.654321").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val (orig, round) = df.select(
      date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
      date_format(TimeOps.fromUnixSeconds(TimeOps.toUnixSeconds($"ts")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[(String, String)].head()
    assert(orig == "2024-03-05 10:20:30.654321")
    assert(round == "2024-03-05 10:20:30.000000")
  }

  test("withTimeFeatures produces the full calendar set (D4)") {
    val row = TimeOps.withTimeFeatures(
      Seq("2024-03-05 10:20:30").toDF("s").withColumn("ts", to_timestamp($"s")), col("ts"))
      .select("year", "month", "day", "hour", "minute", "second",
        "day_of_week", "day_of_year")
      .as[(Int, Int, Int, Int, Int, Int, Int, Int)].head()
    assert(row == ((2024, 3, 5, 10, 20, 30, 3, 65))) // Tue = 3 (Spark: 1=Sunday)
  }
}
