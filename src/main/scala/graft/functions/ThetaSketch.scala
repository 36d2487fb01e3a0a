package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch SET ALGEBRA over distinct counts — the piece HLL cannot
  * give: HLL sketches union, but never intersect or subtract, so
  * "users active on day d AND d+1" (retention), "docs in source A but
  * not B" (contamination audit), or any overlap question still needs a
  * full rescan. A theta sketch is a uniform hash-sample of the distinct
  * set (the k smallest hashes, KMV-style), so union / intersection /
  * difference compose CLOSED over sketches: build one compact sketch
  * per slice at ingest, answer every later overlap query in O(slices ×
  * k) without touching the base data.
  *
  * Architecture mirrors Spark's own DataSketches HLL integration
  * (`HllSketchAgg`, catalyst `datasketchesAggregates.scala`): the
  * aggregates are [[TypedImperativeAggregate]]s over a live
  * [[Union]] — the buffer object lives on the heap between rows and
  * serializes (as its compact result, which carries the retained
  * hashes + theta, i.e. the union's whole state) only at the
  * partial/final exchange. The map-side partial is already a full
  * sketch, so the shuffle moves ≤ 16·2^lgK bytes per (group ×
  * partition) regardless of input size.
  *
  * Determinism: the hash is seeded (default 9001) and the retained set
  * is "the k smallest hash values" — order-insensitive and
  * partitioning-invariant. Below 2^lgK distinct values the sketch is in
  * EXACT mode (theta = 1, nothing discarded): estimates are exact
  * integers and so are intersections/differences of exact sketches —
  * which is what lets `q_sketch_retention` be DuckDB-oracle-checked
  * with plain COUNT(DISTINCT) arithmetic at test scale while the same
  * plan degrades gracefully to ±1.6% estimates at 100 TB.
  *
  * Scalar set ops are codegen expressions calling the static
  * forwarders below (the [[JaroWinkler]] pattern) — they run over the
  * O(slices) sketch frame, never the event stream.
  */
object ThetaSketch {

  /** 2^12 = 4096 nominal entries (~32 KB compact worst case, 1.6% rsd
    * in estimation mode) — same storage/accuracy default tier as
    * [[graft.ops.SketchOps.DefaultLgK]]. */
  val DefaultLgK = 12

  private def heapify(b: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(b))

  def unionOf(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  // Static forwarders — whole-stage codegen calls these directly.

  /** Rounded distinct estimate; exact mode returns the exact count. */
  def estimate(b: Array[Byte]): Long =
    Math.round(heapify(b).getEstimate)

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection()
      .intersect(heapify(a), heapify(b)).toByteArray

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(heapify(a), heapify(b)).toByteArray

  // Column API (the ColumnShim wrapping lives here, like JaroWinkler.column).

  def sketchAgg(c: Column, lgK: Int = DefaultLgK): Column =
    ColumnShim.toColumn(
      ThetaSketchAgg(ColumnShim.toExpression(c), lgK).toAggregateExpression())

  def unionAgg(c: Column, lgK: Int = DefaultLgK): Column =
    ColumnShim.toColumn(
      ThetaUnionAgg(ColumnShim.toExpression(c), lgK).toAggregateExpression())

  def estimateCol(c: Column): Column =
    ColumnShim.toColumn(ThetaEstimate(ColumnShim.toExpression(c)))

  def intersectionCol(a: Column, b: Column): Column =
    ColumnShim.toColumn(
      ThetaIntersectionExpr(ColumnShim.toExpression(a), ColumnShim.toExpression(b)))

  def aNotBCol(a: Column, b: Column): Column =
    ColumnShim.toColumn(
      ThetaANotBExpr(ColumnShim.toExpression(a), ColumnShim.toExpression(b)))
}

/** Shared base: a [[TypedImperativeAggregate]] whose buffer is a live
  * theta [[Union]], serialized as its compact result at exchange
  * boundaries (result ≡ state for union composition). */
sealed trait ThetaAggBase extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {
  def lgK: Int

  final override def createAggregationBuffer(): Union = ThetaSketch.unionOf(lgK)

  final override def merge(b: Union, other: Union): Union = {
    b.union(other.getResult); b
  }

  final override def eval(b: Union): Any = b.getResult.toByteArray

  final override def serialize(b: Union): Array[Byte] =
    b.getResult.toByteArray

  final override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.unionOf(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false
}

/** `theta_sketch_agg(value, lgK)` — build a sketch of the distinct
  * values of `child` per group. Accepts integral, string, and binary
  * inputs (nulls ignored, matching COUNT(DISTINCT)). Strings hash by
  * their UTF-8 bytes, so the sketch agrees across engines that store
  * text as UTF-8. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = ThetaSketch.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | _: StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects bigint/int/string/binary, got ${t.catalogString}")
  }

  override def update(b: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case LongType      => b.update(v.asInstanceOf[Long])
      case IntegerType   => b.update(v.asInstanceOf[Int].toLong)
      case _: StringType => b.update(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType    => b.update(v.asInstanceOf[Array[Byte]])
      case _             => ()
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "theta_sketch_agg"
}

/** `theta_union_agg(sketch, lgK)` — roll serialized sketches up to a
  * coarser grain (or global): merges binaries, never re-reads data —
  * the theta twin of [[graft.ops.SketchOps.rollup]]. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = ThetaSketch.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects a binary sketch column, got ${t.catalogString}")
  }

  override def update(b: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) b.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
  override def prettyName: String = "theta_union_agg"
}

/** `theta_estimate(sketch)` → BIGINT (exact in exact mode). */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects a binary sketch column, got ${t.catalogString}")
  }

  override protected def nullSafeEval(b: Any): Any =
    ThetaSketch.estimate(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ThetaSketch.estimate($b)")

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
  override def prettyName: String = "theta_estimate"
}

sealed trait ThetaBinarySetOp extends BinaryExpression {
  final override def dataType: DataType = BinaryType

  final override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two binary sketch columns, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
}

/** `theta_intersection(a, b)` → sketch of A ∩ B. */
case class ThetaIntersectionExpr(left: Expression, right: Expression)
    extends ThetaBinarySetOp {
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketch.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaSketch.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectionExpr =
    copy(left = l, right = r)
  override def prettyName: String = "theta_intersection"
}

/** `theta_a_not_b(a, b)` → sketch of A \ B. */
case class ThetaANotBExpr(left: Expression, right: Expression)
    extends ThetaBinarySetOp {
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketch.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaSketch.aNotB($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaANotBExpr =
    copy(left = l, right = r)
  override def prettyName: String = "theta_a_not_b"
}
