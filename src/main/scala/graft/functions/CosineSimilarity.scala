package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native whole-stage-codegen cosine similarity over two numeric array
  * columns (SURVEY.md §7.1 preference order (b): a custom Catalyst
  * `Expression` where the composed built-ins are the bottleneck).
  *
  * The composable form — `aggregate(zip_with(a,b,*), 0d, +) / (norms)` —
  * is semantically identical but allocates an intermediate array and
  * interprets three higher-order lambdas per row; on O(pairs) near-dup
  * verification that interpretation dominates the runtime. This expression
  * generates one fused loop (dot and both norms in a single pass, no
  * allocation), keeping ANN/dedup verification inside WholeStageCodegen.
  *
  * Accumulation order matches the sequential higher-order form (ascending
  * index), so results are bit-identical to the composed version.
  * Array elements are assumed non-null (embedding vectors); a null array
  * on either side yields null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(et, _) => et == FloatType || et == DoubleType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(xa.numElements(), xb.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = if (lf) xa.getFloat(i).toDouble else xa.getDouble(i)
      val y = if (rf) xb.getFloat(i).toDouble else xb.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(e: Expression, arr: String, i: String): String =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = ${getter(left, a, i)};
         |  double y = ${getter(right, b, i)};
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}
