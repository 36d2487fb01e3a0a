package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinearCountSketchSpec extends SparkSpec {
  import spark.implicits._

  test("popcount equals count(DISTINCT bucket) and ignores null/out-of-range") {
    val df = Seq[(String, java.lang.Long)](
      ("a", 0L), ("a", 0L), ("a", 63L), ("a", 64L), ("a", 65535L),
      ("a", null), ("a", -1L), ("a", 70000L), // ignored: null + out-of-range
      ("b", 5L), ("b", 5L))
      .toDF("g", "bucket")
    val out = df.groupBy("g")
      .agg(LinearCountSketch.occupied($"bucket").as("occ"),
        count_distinct(when($"bucket" >= 0 && $"bucket" < 65536, $"bucket"))
          .as("exact"))
      .orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 4L, 4L), ("b", 1L, 1L)))
  }

  test("sketch agrees with count(DISTINCT) on the md5 bucket of real keys") {
    // 5000 hashed keys over a 65536-bit bitmap — the q_a2_linear_count shape.
    val df = spark.range(5000).select($"id" % 7 as "g",
      pmod(hash($"id"), lit(65536)).cast("long").as("bucket"))
    val rows = df.groupBy("g")
      .agg(LinearCountSketch.occupied($"bucket").as("occ"),
        count_distinct($"bucket").as("exact"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._2 == r._3))
  }
}
