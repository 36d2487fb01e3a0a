package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The order-independent digest family's contract: (n_rows, xor_digest,
  * sum_digest) is a true MULTISET digest — the round-12 upgrade closes
  * the xor accumulator's even-multiplicity blind spot — and a planted
  * mismatch is DEBUGGABLE: the explain mode re-emits the pre-aggregate
  * row form and [[Tables.digestDiff]] names the offending rows (the
  * 1-row graded output carries no diff to read). Spark↔DuckDB parity of
  * the new sum column is graded by the 8 digest oracle rows in
  * CORRECTNESS (same md5-60-bit hashes, both engines mod 1e9+7). */
class DigestSpec extends SparkSpec {
  import spark.implicits._

  private def digestOf(df: DataFrame): (Long, Long, Long) = {
    val r = Tables.resultDigest(df, Seq("v")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("sum_digest catches the even-multiplicity swap xor is blind to") {
    // Swapping two copies of row X for two copies of row Y preserves
    // n_rows AND the xor (h^h cancels); the modular sum moves by
    // 2*(h(Y)-h(X)) mod p != 0.
    val a = Seq("x", "x", "b").toDF("v")
    val b = Seq("y", "y", "b").toDF("v")
    val (na, xa, sa) = digestOf(a)
    val (nb, xb, sb) = digestOf(b)
    assert(na == nb && xa == xb,
      "fixture broken: the swap was supposed to be xor-invisible")
    assert(sa != sb, "sum_digest missed an even-multiplicity swap")
  }

  test("any single changed, extra, or re-multiplied row flips a column") {
    val base = Seq("a", "b", "c").toDF("v")
    val changed = Seq("a", "b", "d").toDF("v")
    val extra = Seq("a", "b", "c", "c").toDF("v")
    val remult = Seq("a", "a", "c").toDF("v")
    val d0 = digestOf(base)
    for ((other, what) <- Seq(changed -> "changed", extra -> "extra",
        remult -> "re-multiplied"))
      assert(digestOf(other) != d0, s"digest blind to a $what row")
  }

  test("digestDiff names the rows behind a mismatch; empty when equal") {
    val a = Seq("x", "x", "b").toDF("v")
    val b = Seq("y", "y", "b").toDF("v")
    val diff = Tables.digestDiff(a, b, Seq("v")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(diff == Set(("a", "x", 2L), ("b", "y", 2L)))
    assert(Tables.digestDiff(a, Seq("b", "x", "x").toDF("v"), Seq("v"))
      .isEmpty, "multiset-equal frames produced a diff")
  }

  test("explain mode re-emits the row form; a planted mismatch yields " +
      "a readable row-level delta") {
    val a = Seq("x", "x", "b").toDF("v")
    val b = Seq("y", "y", "b").toDF("v")
    sys.props("graft.digest.explain") = "1"
    try {
      val ra = Tables.resultDigest(a, Seq("v"))
      assert(ra.columns.toSeq == Seq("h", "row_str"))
      val rowsA = ra.collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rowsA.sorted.sameElements(rowsA), "explain rows not sorted")
      assert(rowsA.length == 3 && rowsA.count(_._2 == "x") == 2)
      val rowsB = Tables.resultDigest(b, Seq("v")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // The dumps differ exactly on the planted rows — the manual diff
      // a digest mismatch investigation reads.
      val onlyA = rowsA.toSeq.diff(rowsB.toSeq).map(_._2).distinct
      val onlyB = rowsB.toSeq.diff(rowsA.toSeq).map(_._2).distinct
      assert(onlyA == Seq("x") && onlyB == Seq("y"))
    } finally sys.props.remove("graft.digest.explain")
    // Back in graded mode the 1-row emission returns.
    assert(Tables.resultDigest(a, Seq("v")).columns.toSeq ==
      Seq("n_rows", "xor_digest", "sum_digest"))
  }

  test("a graded digest query flips between graded and explain form") {
    // End-to-end: the real q_dedup_containment builder rides the same
    // Tables.resultDigest seam, so the flag turns its 1-row digest into
    // the row dump a mismatch investigation needs — without touching
    // the query code.
    val dir = "/root/testdata/sf0.001"
    val graded = graft.SparkEntry.queries("q_dedup_containment")(spark, dir)
    assert(graded.columns.toSeq == Seq("n_rows", "xor_digest", "sum_digest"))
    val n = graded.head().getLong(0)
    sys.props("graft.digest.explain") = "1"
    try {
      val rows = graft.SparkEntry.queries("q_dedup_containment")(spark, dir)
      assert(rows.columns.toSeq == Seq("h", "row_str"))
      assert(rows.count() == n, "explain row count != graded n_rows")
    } finally sys.props.remove("graft.digest.explain")
  }
}
