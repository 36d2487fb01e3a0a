package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED-ascending, duplicate-free int or long arrays
  * (both sides the same element type), as one two-pointer merge:
  * O(|A|+|B|), zero allocation, no hashing.
  *
  * `size(array_intersect(a, b))` computes the same number but builds a
  * hash set AND materializes the intersection array per call — pure
  * overhead when only the count is needed, and the dominant per-pair cost
  * in blocked near-dup verification (SURVEY.md §7.5). Inputs here are
  * produced by `array_sort(collect_set(...))`, which guarantees the
  * precondition; on unsorted input the result is undefined (garbage-in).
  */
case class SortedIntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  // Element types must match; containsNull may differ (an array literal is
  // containsNull=false while the same values read from parquet are true —
  // the merge below never dereferences a null slot either way).
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if lt == rt && (lt == IntegerType || lt == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersection_size expects matching array<int>/array<bigint> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (na, nb) = (xa.numElements(), xb.numElements())
    var i = 0; var j = 0; var c = 0
    if (isLong) {
      while (i < na && j < nb) {
        val x = xa.getLong(i); val y = xb.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val x = xa.getInt(i); val y = xb.getInt(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val c = ctx.freshName("c"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val (jt, get) = if (isLong) ("long", "getLong") else ("int", "getInt")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  $jt $x = $a.$get($i); $jt $y = $b.$get($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectionSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersection_size"
}
