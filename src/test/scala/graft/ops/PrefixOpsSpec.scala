package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-phase distributed prefix sum must be BIT-IDENTICAL to the
  * single-window forms it replaces (the round-4 `weak` family) — these
  * tests run both formulations on real testdata (shuffle.partitions = 2
  * here, so offsets genuinely cross partition boundaries) and assert
  * set equality. Plan shape is pinned separately in `PlanAuditSpec`. */
class PrefixOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def events: DataFrame = spark.read.parquet(s"$dir/events.parquet")
  private def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "prefix-sum result diverges from the single-window form")
  }

  test("withGlobalRowNumber equals a global row_number window (total order)") {
    val base = events.select("event_id", "value")
    val ord = Seq(col("value").desc, col("event_id").asc)
    val got = PrefixOps.withGlobalRowNumber(base, ord, "rn")
      .select("event_id", "rn")
    val want = base
      .withColumn("rn", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select("event_id", "rn")
    assertSame(got, want)
  }

  test("withPrefixOffsets rank/count equal per-group windows WITH ties") {
    // value has heavy ties per event_type at sf0.001 — the peer-locality
    // guarantee (range partitioning keeps equal keys together) is load-bearing.
    val base = events.select("event_id", "event_type", "value")
    val pref = PrefixOps.withPrefixOffsets(base, Seq("event_type"),
      Seq(col("value").asc), Seq("cnt" -> lit(1L)))
    val wLoc = Window.partitionBy("event_type", PrefixOps.PidCol)
      .orderBy(col("value").asc)
    val got = pref.select(col("event_id"),
      (col("cnt_off") + rank().over(wLoc)).as("rnk"),
      (col("cnt_off") + count(lit(1)).over(wLoc)).as("cum"),
      col("cnt_tot").as("n"))
    val byType = Window.partitionBy("event_type")
    val ordered = byType.orderBy(col("value").asc)
    val want = base.select(col("event_id"),
      rank().over(ordered).cast("long").as("rnk"),
      count(lit(1)).over(ordered).as("cum"),
      count(lit(1)).over(byType).as("n"))
    assertSame(got, want)
  }

  test("prefix running sum equals the per-group exclusive cumsum window") {
    val base = docs.withColumn("tok", expr("n_chars DIV 4"))
      .select("doc_id", "source", "tok")
    val pref = PrefixOps.withPrefixOffsets(base, Seq("source"),
      Seq(col("doc_id").asc), Seq("tok" -> col("tok")))
    val wLoc = Window.partitionBy("source", PrefixOps.PidCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = pref.select(col("doc_id"),
      (col("tok_off") + coalesce(sum("tok").over(wLoc), lit(0L))).as("before"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = base.select(col("doc_id"),
      coalesce(sum("tok").over(w), lit(0L)).as("before"))
    assertSame(got, want)
  }

  test("positional quartiles equal the percentile() aggregate exactly") {
    import spark.implicits._
    // q_a1_quartiles_scale uses cents ×4, percentile() uses raw
    // quantities: qk_x4 == 400 · percentile(l_quantity, k/4) exactly
    // (same interpolation rule; cents are exact integers).
    val scale = graft.SparkEntry.queries("q_a1_quartiles_scale")(spark, dir)
      .select("l_returnflag", "q1_x4", "q2_x4", "q3_x4")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val exact = graft.SparkEntry.queries("q_a1_percentile")(spark, dir)
      .selectExpr("l_returnflag", "q1 * 400", "median * 400", "q3 * 400")
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    assert(scale.length == exact.length && scale.nonEmpty)
    for (((f1, a, b, c), (f2, x, y, z)) <- scale.zip(exact)) {
      assert(f1 == f2)
      assert(a.toDouble == x && b.toDouble == y && c.toDouble == z,
        s"$f1: positional ($a,$b,$c) != percentile·400 ($x,$y,$z)")
    }
  }

  test("ntileFromRowNumber reproduces ntile() including remainders and n < tiles") {
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 4, 5, 7, 8, 150)) {
      val base = (1 to n).map(i => (i.toLong, s"u$i")).toDF("v", "id")
      val ord = Seq(col("v").asc, col("id").asc)
      val want = base
        .withColumn("q", ntile(4).over(Window.orderBy(ord: _*)).cast("long"))
        .select("id", "q")
      val got = PrefixOps.withGlobalRowNumber(base, ord, "rn")
        .withColumn("q", PrefixOps.ntileFromRowNumber("rn", "rn_n", 4))
        .select("id", "q")
      assertSame(got, want)
    }
  }
}
