package graft.queries

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The DP count release's mechanism contract: noise is actually applied
  * and Laplace-calibrated (mean |noise| ≈ b), the release is
  * deterministic (auditable), and sensitivity-1 behavior holds — moving
  * one document changes one source's release by exactly its count delta
  * (the noise term is key-seeded, so the mechanism's add/remove-one
  * geometry is directly visible). */
class DpReleaseSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def release() = graft.SparkEntry
    .queries("q_report_dp_counts")(spark, dir)
    .collect()
    .map(r => r.getString(0) -> r.getAs[Long]("noisy_docs_milli")).toMap

  private def trueCounts() = Tables.t(spark, dir, "documents")
    .groupBy("source").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("noise is applied and Laplace-calibrated") {
    val rel = release()
    val tru = trueCounts()
    val noise = rel.map { case (s, m) => m - 1000L * tru(s) }
    // floor() makes an exactly-zero noise term a measure-zero accident;
    // every released count should differ from the scaled true count.
    assert(noise.count(_ != 0L) == noise.size)
    // E|Laplace(b)| = b (2000 milli); with 20 draws the sample mean sits
    // within a loose 3× band — a wrong scale (b=1? b=4?) lands outside.
    val meanAbs = noise.map(n => math.abs(n).toDouble).sum / noise.size
    assert(meanAbs > 2000.0 / 3 && meanAbs < 2000.0 * 3,
      s"mean |noise| $meanAbs not calibrated to b=2000 milli")
    // Both signs occur (the sign branch is exercised).
    assert(noise.exists(_ > 0) && noise.exists(_ < 0))
  }

  test("the release is deterministic (auditable replay)") {
    assert(release() == release())
  }

  test("the artifact carries its mechanism label") {
    val mechs = graft.SparkEntry.queries("q_report_dp_counts")(spark, dir)
      .select("mechanism").distinct().collect().map(_.getString(0)).toSet
    assert(mechs == Set("seeded-deterministic-audit"),
      s"graded release must be labeled as the audit mechanism, got $mechs")
  }

  /** The NoiseSource seam (round-9 verdict task 6): swapping the source
    * changes the DRAWS but not the mechanism geometry — both impls feed
    * the same emission expression, so scale b and sensitivity are
    * impl-independent by construction; the spec verifies each impl's
    * u column actually drives that expression, and that Fresh draws
    * move between releases while Seeded draws do not. */
  test("NoiseSource swap: draws change, the e-scale does not") {
    import org.apache.spark.sql.functions._
    val counts = Tables.t(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    def releaseWith(ns: graft.ops.NoiseSource): Map[String, Long] =
      CurationQueries.dpRelease(counts, ns)
        .collect()
        .map(r => r.getString(0) -> r.getAs[Long]("noisy_docs_milli")).toMap
    val seeded = new graft.ops.NoiseSource.Seeded("dp1")
    assert(releaseWith(seeded) == releaseWith(seeded)) // auditable replay
    val f1 = releaseWith(new graft.ops.NoiseSource.Fresh())
    val f2 = releaseWith(new graft.ops.NoiseSource.Fresh())
    assert(f1 != f2, "fresh releases must not repeat draws")
    // Same mechanism under every source: re-derive the emission from
    // each impl's own u column in scala — the scale constant (b = 2000
    // milli) and inverse CDF are shared, so both must match exactly.
    Seq[graft.ops.NoiseSource](seeded, new graft.ops.NoiseSource.Fresh())
      .foreach { ns =>
        // u may surface as DECIMAL (the seeded impl's SQL literals) or
        // DOUBLE (Fresh's rand) — the emission expr handles both; the
        // scala recompute reads a double.
        val rows = ns.withUniform(counts, "source", "u")
          .select(col("n_docs"), col("u").cast("double").as("ud"),
            expr(CurationQueries.dpNoisyMilliExpr).as("m"))
          .collect()
        assert(rows.nonEmpty)
        rows.foreach { r =>
          val (n, u, m) = (r.getLong(0), r.getDouble(1), r.getLong(2))
          assert(u > 0.0 && u < 1.0, s"u=$u escaped (0,1)")
          val sgn = if (u >= 0.5) 1.0 else -1.0
          val want = math.floor(
            1000.0 * n - 2000.0 * sgn * math.log(1.0 - 2.0 * math.abs(u - 0.5))
          ).toLong
          assert(m == want, s"${ns.mechanism}: emission $m != recomputed $want")
        }
      }
  }

  test("sensitivity-1 geometry: one document moves one count by one") {
    val docs = Tables.t(spark, dir, "documents")
    val victim = docs.select("doc_id", "source").orderBy("doc_id").head()
    val (vid, vsrc) = (victim.getLong(0), victim.getString(1))
    // Re-run the mechanism body over the redacted corpus: counts shift
    // by exactly one for the victim's source; the key-seeded noise term
    // is unchanged, so the released value moves by exactly 1000 milli.
    val redacted = docs.where(col("doc_id") =!= vid)
      .groupBy("source").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .withColumn("hv", org.apache.spark.sql.functions.expr(
        "CAST(conv(substring(md5(concat(source, ':dp1')), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("u", org.apache.spark.sql.functions.expr(
        "(hv + 1.0) / 1152921504606846977.0"))
      .select(col("source"), org.apache.spark.sql.functions.expr(
        CurationQueries.dpNoisyMilliExpr).as("noisy_docs_milli"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = release()
    full.foreach { case (s, m) =>
      val expected = if (s == vsrc) m - 1000L else m
      assert(redacted(s) == expected,
        s"source $s moved by ${m - redacted(s)} milli, want " +
          s"${if (s == vsrc) 1000 else 0}")
    }
  }
}
