package graft.ops

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows share one hot key — the salting target.
  private lazy val fact = ((1 to 90).map(i => ("hot", i.toLong)) ++
    (1 to 10).map(i => (s"k$i", i.toLong))).toDF("k", "v")
  private lazy val dim = (Seq("hot") ++ (1 to 10).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"name$i") }.toDF("k", "name")

  test("saltedJoin matches the plain join result") {
    val plain = fact.join(dim, "k").select("k", "v", "name")
      .as[(String, Long, String)].collect().toSet
    val salted = JoinOps.saltedJoin(fact, dim, "k", buckets = 4, saltOn = Seq("v"))
      .select("k", "v", "name").as[(String, Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 100)
  }

  test("asofJoin picks the latest right row with ts <= left ts per key") {
    val left = Seq((1L, 10L, "a"), (1L, 15L, "t"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "v")
    val right = Seq((1L, 5L, "x"), (1L, 15L, "y"), (1L, 25L, "z"))
      .toDF("k", "ts", "w")
    val out = JoinOps.asofJoin(left, right, Seq("k"), "ts", Seq("w"))
      .select("k", "ts", "v", "w")
      .as[(Long, Long, String, String)].collect().toSet
    assert(out == Set(
      (1L, 10L, "a", "x"),
      (1L, 15L, "t", "y"),   // equal-ts right matches (<= semantics)
      (1L, 20L, "b", "y"),
      (2L, 5L, "c", null)))  // no prior right row for key 2
  }

  test("saltedSum matches the plain aggregation") {
    val plain = fact.groupBy("k").sum("v").as[(String, Long)].collect().toMap
    val salted = JoinOps.saltedSum(fact, "k", "v", buckets = 4, saltOn = Seq("v"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(salted("hot") == (1 to 90).sum.toLong)
  }
}
