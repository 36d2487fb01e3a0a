package graft.gov

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scaling block's fixture is itself load-bearing evidence — a
  * broken one would measure a no-op, not mass erasure. Pins: one
  * frame() call commits a ledger of victims × all EIGHT store shapes,
  * the victims are really gone from each store, and successive calls
  * use disjoint slices (fresh work per timed pass, never a replayed
  * no-op). */
class ForgetScaleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("one frame() = one committed eight-store erasure; slices disjoint") {
    val ledger1 = ForgetScale.frame(spark, dir).localCheckpoint(true)
    val stores = ledger1.select("store").distinct()
      .collect().map(_.getString(0)).toSet
    assert(stores == Set("batchstore", "bq", "ivf", "ivfpq", "kmeans",
      "lex", "lm", "minhash"), s"stores: $stores")
    val victims1 = ledger1.select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(victims1.nonEmpty)
    assert(ledger1.count() == victims1.size.toLong * 8)
    // All victim ids share one slice residue (the slice contract).
    assert(victims1.map(_ % ForgetScale.VictimMod).size == 1)
    // A second call erases a DIFFERENT slice — fresh work, no overlap.
    val victims2 = ForgetScale.frame(spark, dir).select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(victims2.nonEmpty && victims1.intersect(victims2).isEmpty,
      "successive passes reused a victim slice")
    // lastFrame is the MEASURED request's ledger — the out-of-clock
    // rows read must count the erasure the clock saw, not a new one.
    assert(ForgetScale.lastFrame(spark, dir).count() ==
      victims2.size.toLong * 8)
  }

  test("slice exhaustion rebuilds a fresh fixture instead of failing") {
    // mod = 1: one slice (the whole corpus) per fixture — the second
    // call exhausts it and must transparently rebuild, not throw.
    val l1 = ForgetScale.frameAt(spark, dir, mod = 1)
    assert(l1.select("id").distinct().count() > 0)
    val l2 = ForgetScale.frameAt(spark, dir, mod = 1)
    assert(l2.select("id").distinct().count() ==
      l1.select("id").distinct().count(),
      "rebuilt fixture must erase the same-shaped victim slice")
  }
}
