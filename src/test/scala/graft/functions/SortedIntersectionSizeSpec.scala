package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.scalacheck.Gen

import graft.SparkSpec

class SortedIntersectionSizeSpec extends SparkSpec {
  import spark.implicits._

  private def interSize(a: Column, b: Column): Column =
    ColumnShim.toColumn(SortedIntersectionSize(
      ColumnShim.toExpression(a), ColumnShim.toExpression(b)))

  test("matches size(array_intersect) on random sorted distinct int sets") {
    val gen = Gen.listOf(Gen.choose(0, 50)).map(_.distinct.sorted)
    val pairs = Iterator.continually((gen.sample, gen.sample))
      .collect { case (Some(a), Some(b)) => (a, b) }.take(60).toSeq
    val df = pairs.toDF("a", "b")
    val mismatches = df.select(
      interSize($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).as("ref"))
      .where($"fast" =!= $"ref").count()
    assert(mismatches == 0)
  }

  test("matches size(array_intersect) on random sorted distinct long sets") {
    val gen = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)).map(_.distinct.sorted)
    val small = Gen.listOf(Gen.choose(-25L, 25L)).map(_.distinct.sorted)
    val pairs = Iterator.continually((small.sample, small.sample))
      .collect { case (Some(a), Some(b)) => (a, b) }.take(60).toSeq ++
      Iterator.continually((gen.sample, gen.sample))
        .collect { case (Some(a), Some(b)) => (a, b) }.take(20).toSeq
    val df = pairs.toDF("a", "b")
    val mismatches = df.select(
      interSize($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).as("ref"))
      .where($"fast" =!= $"ref").count()
    assert(mismatches == 0)
  }

  test("edge cases: empty, disjoint, identical") {
    val df = Seq(
      (Seq.empty[Int], Seq(1, 2, 3)),
      (Seq(1, 3, 5), Seq(2, 4, 6)),
      (Seq(1, 2, 3), Seq(1, 2, 3))).toDF("a", "b")
    assert(df.select(interSize($"a", $"b")).as[Int].collect().toSeq == Seq(0, 0, 3))
  }

  test("accepts inputs differing only in element nullability") {
    // toDF arrays are containsNull=true; array(lit) literals are
    // containsNull=false — the type check must compare element types only.
    val df = Seq(Seq(1, 2, 3)).toDF("a")
    val out = df.select(
      interSize($"a", array(lit(2), lit(3), lit(4)))).as[Int].head()
    assert(out == 2)
  }
}
