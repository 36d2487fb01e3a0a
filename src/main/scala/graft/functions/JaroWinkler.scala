package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity kernel — the fuzzy-match scorer entity
  * resolution uses where edit distance is too coarse (it weights shared
  * prefixes and tolerates transpositions, the two dominant typo shapes
  * in names and dictionary terms).
  *
  * Semantics replicate the textbook definition as DuckDB implements it
  * (empirically probed, so the oracle can verify bp-quantized scores):
  *  - empty string on either side → 0.0 (including both-empty);
  *  - zero matches → 0.0;
  *  - transpositions = (out-of-order matched positions) / 2, integer;
  *  - Winkler prefix boost ONLY when jaro > 0.7, prefix capped at 4,
  *    weight 0.1, applied as `jaro + p·0.1·(1 − jaro)`.
  *
  * The double arithmetic follows the same operation order as the
  * reference implementations, and every consumer quantizes through an
  * epsilon-floor (`floor(10000·jw + 1e-6)`) so a last-ulp divergence
  * between engines cannot flip a bucket. Comparison is over UTF-16 code
  * units (BMP-equivalent to DuckDB's codepoint walk; the corpus is
  * ASCII after the clean chain).
  *
  * This object is top-level with no companion class, so Scala emits
  * static forwarders — generated whole-stage code calls
  * `graft.functions.JaroWinkler.similarity` directly.
  */
object JaroWinkler {

  /** Column-API wrapper (the `Similarity.cosine` pattern) — the one
    * place the ColumnShim wrapping lives; call sites and specs share
    * it. */
  def column(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.ColumnShim.toColumn(
      JaroWinklerSim(
        org.apache.spark.sql.graftshim.ColumnShim.toExpression(a),
        org.apache.spark.sql.graftshim.ColumnShim.toExpression(b)))

  def similarity(l: UTF8String, r: UTF8String): Double = {
    val s1 = l.toString
    val s2 = r.toString
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val c = s1.charAt(i)
      var j = math.max(i - window, 0)
      val hi = math.min(i + window, len2 - 1)
      var done = false
      while (j <= hi && !done) {
        if (!matched2(j) && s2.charAt(j) == c) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var outOfOrder = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) outOfOrder += 1
        k += 1
      }
      i += 1
    }
    val t = outOfOrder / 2
    val md = m.toDouble
    val jaro = (md / len1 + md / len2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pmax = math.min(math.min(len1, len2), 4)
    while (p < pmax && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(s1, s2)` as a whole-stage-codegen expression (SURVEY.md
  * §7.1 preference order (b)): one static call per row, no UDF
  * serialization boundary — the scorer stays inside the generated loop
  * of the blocked self-join that feeds it, exactly like the built-in
  * `levenshtein`. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case _: StringType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects string inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}
