package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive Query Execution is a load-bearing part of the 100 TB story
  * ("AQE for runtime re-plan", SURVEY §7.5): skewed shuffle partitions
  * split at runtime, small post-shuffle sides promote to broadcast,
  * and tiny shuffles coalesce. None of that is visible in a static
  * EXPLAIN — these tests pin the RUNTIME re-plans on fixtures built to
  * trigger each one, so a session-builder config regression (AQE off,
  * skew thresholds broken) fails here instead of in production skew. */
class AqeSpec extends SparkSpec {

  import spark.implicits._

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def withConf[T](kv: (String, String)*)(f: => T): T = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // The skew detector compares each partition to the MEDIAN: the
      // test session's 2 shuffle partitions would make the hot one its
      // own median, so spread the uniform keys across 8 first. Coalesce
      // is disabled here to observe the skew split in isolation.
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB") {
      // One hot key holding ~all left rows vs a uniform right side: the
      // hot key's shuffle partition dwarfs the median and must split.
      val left = spark.range(200000).toDF("i")
        .select(when(col("i") % 100 === 0, col("i") % 50).otherwise(lit(7L))
          .as("k"), col("i").as("payload"))
      val right = spark.range(50).toDF("k")
        .select(col("k"), (col("k") * 10).as("dim"))
      val joined = left.join(right, Seq("k"))
      val p = finalPlan(joined)
      assert(p.contains("skew=true"),
        s"skewed partition was not split at runtime:\n$p")
    }
  }

  test("AQE promotes a runtime-small side to broadcast after the shuffle") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // The adaptive threshold DEFAULTS to the static one, so -1 above
      // would disable the runtime promotion too — set it explicitly:
      // static planning must not broadcast, runtime re-measurement may.
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1MB") {
      val big = spark.range(100000).toDF("k")
        .select((col("k") % 1000).as("k"), col("k").as("v"))
      val smallAgg = spark.range(100000).toDF("i")
        .select((col("i") % 10).as("k")).groupBy("k")
        .agg(count(lit(1)).as("n"))
      val joined = big.join(smallAgg, Seq("k"))
      val init = joined.queryExecution.executedPlan.toString
      assert(init.contains("SortMergeJoin") || init.contains("ShuffledHashJoin"),
        s"fixture broken — static plan already broadcasts:\n$init")
      val p = finalPlan(joined)
      assert(p.contains("BroadcastHashJoin"),
        s"runtime-small side was not promoted to broadcast:\n$p")
    }
  }

  test("AQE coalesces a tiny shuffle's partitions below the static count") {
    val agg = spark.range(1000).toDF("i")
      .select((col("i") % 5).as("k")).groupBy("k")
      .agg(count(lit(1)).as("n"))
    // Query-stage wrappers don't expose the executed subtree as plan
    // children (a tree collect sees nothing), so the pin reads the
    // final-plan STRING: `AQEShuffleRead coalesced` is printed exactly
    // when the runtime merged shuffle partitions below the static count.
    val p = finalPlan(agg)
    assert(p.contains("AQEShuffleRead coalesced"),
      s"tiny shuffle was not coalesced:\n$p")
  }
}
