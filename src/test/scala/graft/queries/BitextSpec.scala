package graft.queries

import graft.SparkSpec

/** The bitext-mining contract beyond the oracle hash: mutual-best
  * margin pairs form a MATCHING (each source and each target document
  * appears at most once — the forward-backward intersection's defining
  * property), both language sides are actually populated by the langid
  * labeling, and the IVF-served form mines a non-trivial subset of the
  * corpus the brute-force form mines. */
class BitextSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mutual-best pairs form a matching on a populated fixture") {
    val pairs = graft.SparkEntry
      .queries("q_sim_bitext_margin")(spark, dir).collect()
    assert(pairs.nonEmpty, "fixture mined no pairs — langid sides empty?")
    val src = pairs.map(_.getLong(0))
    val tgt = pairs.map(_.getLong(1))
    assert(src.distinct.length == src.length,
      "a source doc appears in two mutual-best pairs")
    assert(tgt.distinct.length == tgt.length,
      "a target doc appears in two mutual-best pairs")
    assert(pairs.forall(_.getLong(2) > 0L), "non-positive margin emitted")
  }

  test("the IVF-served form mines pairs and stays a matching") {
    val pairs = graft.SparkEntry
      .queries("q_sim_bitext_served")(spark, dir).collect()
    assert(pairs.nonEmpty, "served form mined no pairs")
    val src = pairs.map(_.getLong(0))
    val tgt = pairs.map(_.getLong(1))
    assert(src.distinct.length == src.length)
    assert(tgt.distinct.length == tgt.length)
  }
}
