package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm / cosine match hand computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f))).toDF("a", "b")
    val (d, na, cos) = df.select(
      Similarity.dot($"a", $"b"), Similarity.norm($"a"),
      Similarity.cosine($"a", $"b")).as[(Double, Double, Double)].head()
    assert(d == 1.0 * 4 - 2 * 5 + 3 * 6)            // 12
    assert(math.abs(na - math.sqrt(14)) < 1e-12)
    val expect = 12.0 / (math.sqrt(14) * math.sqrt(16 + 25 + 36))
    assert(math.abs(cos - expect) < 1e-12)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(2.0f, 0.0f), Seq(2.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f))).toDF("a", "b")
    val out = df.select(round(Similarity.cosine($"a", $"b"), 9)).as[Double].collect().toSeq
    assert(out == Seq(1.0, 0.0))
  }

  test("native cosine expression matches the higher-order-function form bit-for-bit") {
    val vecs = (0 until 50).map { i =>
      (Seq.tabulate(64)(d => math.sin(i * 64 + d).toFloat),
        Seq.tabulate(64)(d => math.cos(i * 64 + d).toFloat))
    }
    val df = vecs.toDF("a", "b")
    val mismatches = df.select(
      Similarity.cosine($"a", $"b").as("native"),
      Similarity.cosineHof($"a", $"b").as("hof"))
      .where($"native" =!= $"hof").count()
    assert(mismatches == 0)
  }

  test("signBucket encodes signs of leading dims") {
    val out = Seq(Seq(1.0f, -2.0f, 0.0f, 3.0f)).toDF("a")
      .select(Similarity.signBucket($"a", 4)).as[String].head()
    assert(out == "1011") // >= 0 → '1'
  }

  test("seeded signBucket is deterministic and splits correlated data the axis-aligned form cannot") {
    // All-positive embeddings (every dim in [0.5, 1.5]) — the worst case
    // for axis-aligned planes: every vector has the same leading signs.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i =>
      (i, Seq.fill(16)(0.5f + rnd.nextFloat())))
    val df = vecs.toDF("id", "a")
    val axis = df.select(Similarity.signBucket($"a", 6)).as[String]
      .collect().distinct
    assert(axis.length == 1, "fixture must be degenerate for axis-aligned LSH")
    val seeded = df.select(Similarity.signBucket($"a", 6, 16, seed = 42L))
      .as[String].collect()
    assert(seeded.distinct.length > 4,
      s"seeded planes should spread the degenerate corpus (got ${seeded.distinct.length} buckets)")
    // Determinism: same seed → identical buckets on a fresh plan.
    val again = df.select(Similarity.signBucket($"a", 6, 16, seed = 42L))
      .as[String].collect()
    assert(seeded.toSeq == again.toSeq)
  }

  test("seeded signBucket keeps near-duplicates in one bucket (SRP-LSH recall)") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 60).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val pairs = base.map { case (i, v) =>
      (i, v, v.map(x => x + (rnd.nextFloat() - 0.5f) * 1e-4f)) // ~identical copy
    }
    val df = pairs.toDF("id", "a", "b")
    val together = df.select(
        (Similarity.signBucket($"a", 6, 16, seed = 42L) ===
          Similarity.signBucket($"b", 6, 16, seed = 42L)).as("same"))
      .where($"same").count()
    // cos θ ≈ 1 ⇒ per-plane agreement 1 − θ/π ≈ 1; tiny perturbations may
    // still cross a plane a vector sits exactly on, so allow a sliver.
    assert(together >= 58, s"only $together/60 near-dup pairs share a bucket")
  }
}
