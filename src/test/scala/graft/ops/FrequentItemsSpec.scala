package graft.ops

import graft.SparkSpec

/** The Misra–Gries contract the heavy-hitters query leans on: the
  * candidate union never misses a true heavy hitter (no false
  * negatives), and each partition emits at most k rows (bounded
  * shuffle). False positives are allowed — the query's exact pass
  * removes them. */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("candidates form a bounded superset of every item above n/k") {
    val k = 10
    // Skewed stream: two genuine hitters buried in a long unique tail,
    // interleaved so hitters are spread across all partitions.
    val stream = (0 until 6000).map { i =>
      if (i % 3 == 0) "hot" else if (i % 5 == 0) "warm" else s"tail$i"
    }
    val n = stream.size
    val items = spark.createDataset(stream).repartition(4)
    val cands = FrequentItems.candidates(items, k).collect()
    val trueHitters = stream.groupBy(identity)
      .collect { case (v, occ) if occ.size * k > n => v }.toSet
    assert(trueHitters.nonEmpty, "fixture must contain real hitters")
    assert(trueHitters.subsetOf(cands.toSet),
      s"sketch missed hitters: ${trueHitters -- cands.toSet}")
    assert(cands.length <= 4 * k, "each partition must emit at most k")
  }

  test("an all-unique stream yields at most k candidates per partition") {
    val items = spark.createDataset((0 until 1000).map(i => s"u$i")).repartition(2)
    assert(FrequentItems.candidates(items, 5).collect().length <= 10)
  }
}
