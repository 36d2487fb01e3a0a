package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The scale-amplification evidence (`SCALING_r6.json`) is only as good
  * as the amplifier: a broken one (verbatim copies, collapsed keys,
  * dropped rows) would measure the fixture, not the plan. Pins the
  * amplification contract on real sf0.001 tables. */
class ScalingSpec extends SparkSpec {
  import spark.implicits._

  private val src = "/root/testdata/sf0.001"

  test("amplify multiplies rows AND key cardinality, never verbatim dups") {
    val dst = Files.createTempDirectory("graft-scale-spec").toString
    val factor = 3
    Scaling.amplify(spark, src, dst, factor)
    for (t <- Seq("documents", "events", "lineitem")) {
      val base = graft.queries.Tables.t(spark, src, t)
      val amp = graft.queries.Tables.t(spark, dst, t)
      assert(amp.count() == factor * base.count(), s"$t row count")
    }
    val baseDocs = graft.queries.Tables.t(spark, src, "documents")
    val ampDocs = graft.queries.Tables.t(spark, dst, "documents")
    // Keys stay distinct across copies — cardinality grows with the data.
    assert(ampDocs.select(countDistinct("doc_id")).as[Long].head() ==
      factor * baseDocs.select(countDistinct("doc_id")).as[Long].head())
    // Content is tagged per copy: exact-dedup must NOT collapse the
    // amplified corpus back to the base corpus (the K² manufactured-
    // duplicate failure mode the tag exists to prevent).
    assert(ampDocs.select(countDistinct(md5(coalesce(col("text"), lit(""))))).as[Long].head() ==
      factor * baseDocs.select(countDistinct(md5(coalesce(col("text"), lit(""))))).as[Long].head(),
      "amplified copies are verbatim — dedup pair counts would grow K², not K")
    // Events time range spreads (ts shifted per copy), so windows grow.
    val spanDays = graft.queries.Tables.t(spark, dst, "events")
      .agg((unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("s"))
      .as[Long].head()
    val baseSpan = graft.queries.Tables.t(spark, src, "events")
      .agg((unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("s"))
      .as[Long].head()
    assert(spanDays >= baseSpan + (factor - 1) * 86400L - 1,
      s"ts copies not spread: $spanDays vs base $baseSpan")
  }

  test("copy 0 is the identity — the base corpus survives amplification") {
    val base = graft.queries.Tables.t(spark, src, "documents")
    assert(Scaling.shifted(base, 0).collect().toSet == base.collect().toSet)
  }

  /** The per-regime scale bars, re-asserted on the COMMITTED artifact —
    * so the prose claim ("output-linear queries stay sub-linear; pair
    * families' time grows no faster than their result") can never again
    * drift from the measured numbers without a red test. */
  test("committed scaling artifact honors the per-regime bars") {
    val p = java.nio.file.Paths.get("SCALING_r7.json")
    assume(Files.exists(p), "SCALING_r7.json not generated yet this round")
    val txt = new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val block = """"(q_[a-z0-9_]+)":\{([^}]*)\}""".r
    def num(body: String, k: String): Option[Double] =
      ("\"" + k + "\":(-?[0-9.E+]+)").r.findFirstMatchIn(body)
        .map(_.group(1).toDouble)
    var checked = 0
    for (m <- block.findAllMatchIn(txt)) {
      val (name, body) = (m.group(1), m.group(2))
      for (t1 <- num(body, "t1"); t8 <- num(body, "t8");
           r1 <- num(body, "rows1"); r8 <- num(body, "rows8")) {
        checked += 1
        if (Scaling.OutputBound(name))
          assert(t8 / t1 <= r8 / math.max(1.0, r1),
            f"$name [output_bound]: t8/t1 ${t8 / t1}%.2f outgrew rows8/rows1 ${r8 / r1}%.2f")
        else
          num(body, "g8").foreach { g8 =>
            assert(g8 <= Scaling.GBar,
              f"$name [output_linear]: g8 $g8%.3f > ${Scaling.GBar}")
          }
      }
    }
    assert(checked >= 10, s"artifact parsed only $checked audited blocks")
  }
}
