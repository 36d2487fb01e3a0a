package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketches (DataSketches KLL) — the distribution
  * monitor of the sketch-store family: [[graft.ops.SketchOps]] (HLL)
  * answers "how many distinct", [[ThetaSketch]] answers "how much
  * overlap", this answers "how are values DISTRIBUTED" — doc lengths,
  * quality scores, token counts — per slice, mergeable to any coarser
  * grain without re-reading data. `percentile_approx` answers one
  * query in one pass; a persisted KLL store answers every later
  * quantile/rank question in O(slices × k).
  *
  * Same [[TypedImperativeAggregate]] architecture as [[ThetaSketch]]:
  * live heap sketch between rows, ~O(k·log(n/k)) bytes (k = 200 →
  * single-digit KB) at exchange boundaries; partial sketches merge
  * losslessly (KLL's error bound is preserved under merge, the
  * property naive sampled-percentile schemes lack).
  *
  * UNLIKE theta/HLL, KLL compaction draws random offsets, so two runs
  * over the same data can retain different samples once n ≫ k. The
  * contracts are therefore spec-pinned ERROR BARS (normalized rank
  * error ≤ 1.65% at k = 200, `QuantileSketchSpec`), plus the exact
  * invariants that survive randomness: `kll_n` (total weight) is exact,
  * and min/max quantiles (rank 0/1) are exact extremes. No DuckDB
  * oracle — the sketch store is the ScalaTest-graded tier, like
  * `ops/SketchOps`. */
object QuantileSketch {

  /** k = 200 → ~1.65% one-sided normalized rank error, ≈5 KB typical. */
  val DefaultK = 200

  private def heapify(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))

  // Static forwarders for codegen.

  /** Quantile at `rank` ∈ [0,1] (INCLUSIVE criteria — the DataSketches
    * default); NaN for an empty sketch (0 rows sketched). */
  def quantile(b: Array[Byte], rank: Double): Double = {
    val sk = heapify(b)
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }

  /** Normalized rank of `value` ∈ [0,1]; NaN for an empty sketch. */
  def rank(b: Array[Byte], value: Double): Double = {
    val sk = heapify(b)
    if (sk.isEmpty) Double.NaN
    else sk.getRank(value, QuantileSearchCriteria.INCLUSIVE)
  }

  /** EXACT total stream weight — survives merge regardless of
    * compaction randomness (the store's consistency check). */
  def n(b: Array[Byte]): Long = heapify(b).getN

  /** Integration grid for [[aucEstimate]]: equal-mass slices of the
    * negative distribution. Discretization error ≲ 1/grid, far under
    * the sketches' own ~1.65% rank error at [[DefaultK]]. */
  val AucGrid = 256

  /** AUC of a detector FROM THE STORE — no corpus rescan: with the two
    * per-class score sketches, AUC = P(S⁺ > S⁻) ≈ ∫ (1 − F⁺(x)) dF⁻(x),
    * midpoint rule over [[AucGrid]] equal-mass slices of the negative
    * distribution (x = the j+½ quantile of F⁻). This is what makes the
    * streaming slice store ([[graft.stream.SketchIngest]]) an EVAL
    * substrate: keep one KLL per (slice, label) and every slice's AUC
    * is answerable in O(grid) sketch probes at any corpus size.
    *
    * INCLUSIVE ranks give score ties zero credit where the exact
    * Mann-Whitney estimator gives half — negligible for near-continuous
    * scores, a known downward bias on heavily-tied integer scores (use
    * the exact `q_ml_auc` plan when ties dominate). Total error ≲
    * 1/grid + 2·(KLL rank error); spec-pinned against the exact
    * estimator. */
  def aucEstimate(pos: Array[Byte], neg: Array[Byte],
      grid: Int = AucGrid): Double = {
    require(n(pos) > 0 && n(neg) > 0,
      s"empty class sketch: n_pos=${n(pos)} n_neg=${n(neg)}")
    var s = 0.0
    var j = 0
    while (j < grid) {
      s += 1.0 - rank(pos, quantile(neg, (j + 0.5) / grid))
      j += 1
    }
    s / grid
  }

  // Column API.

  def sketchAgg(c: Column, k: Int = DefaultK): Column =
    ColumnShim.toColumn(
      KllSketchAgg(ColumnShim.toExpression(c), k).toAggregateExpression())

  def mergeAgg(c: Column, k: Int = DefaultK): Column =
    ColumnShim.toColumn(
      KllMergeAgg(ColumnShim.toExpression(c), k).toAggregateExpression())

  def quantileCol(sketch: Column, rank: Column): Column =
    ColumnShim.toColumn(KllQuantile(
      ColumnShim.toExpression(sketch), ColumnShim.toExpression(rank)))

  def rankCol(sketch: Column, value: Column): Column =
    ColumnShim.toColumn(KllRank(
      ColumnShim.toExpression(sketch), ColumnShim.toExpression(value)))

  def nCol(sketch: Column): Column =
    ColumnShim.toColumn(KllN(ColumnShim.toExpression(sketch)))

  def aucCol(posSketch: Column, negSketch: Column): Column =
    ColumnShim.toColumn(KllAuc(
      ColumnShim.toExpression(posSketch), ColumnShim.toExpression(negSketch)))
}

sealed trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {
  def k: Int

  final override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  final override def merge(b: KllDoublesSketch,
                           o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  final override def eval(b: KllDoublesSketch): Any = b.toByteArray

  final override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

  final override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false
}

/** `kll_sketch_agg(value, k)` — sketch the distribution of a numeric
  * column per group (nulls ignored). */
case class KllSketchAgg(
    child: Expression,
    k: Int = QuantileSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg expects a numeric column, got ${t.catalogString}")
  }

  override def update(b: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case DoubleType  => b.update(v.asInstanceOf[Double])
      case FloatType   => b.update(v.asInstanceOf[Float].toDouble)
      case LongType    => b.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => b.update(v.asInstanceOf[Int].toDouble)
      case _           => ()
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
  override def prettyName: String = "kll_sketch_agg"
}

/** `kll_merge_agg(sketch, k)` — roll slice sketches up to a coarser
  * grain; merges binaries, never re-reads data. */
case class KllMergeAgg(
    child: Expression,
    k: Int = QuantileSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg expects a binary sketch column, got ${t.catalogString}")
  }

  override def update(b: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
  override def prettyName: String = "kll_merge_agg"
}

sealed trait KllScalarBase extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  final override def dataType: DataType = DoubleType

  // ImplicitCastInputTypes so SQL-surface callers can pass any numeric
  // literal (`kll_quantile(sk, 0.5)` — a DECIMAL(1,1) literal in SQL):
  // the analyzer inserts the double cast instead of failing the check.
  final override def inputTypes: Seq[ColumnShim.ADT] =
    Seq(BinaryType, DoubleType)

  final override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary sketch, double), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
}

/** `kll_quantile(sketch, rank)` → value at normalized rank. */
case class KllQuantile(left: Expression, right: Expression)
    extends KllScalarBase {
  override protected def nullSafeEval(b: Any, r: Any): Any =
    QuantileSketch.quantile(b.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, r) => s"graft.functions.QuantileSketch.quantile($b, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
  override def prettyName: String = "kll_quantile"
}

/** `kll_rank(sketch, value)` → normalized rank of value. */
case class KllRank(left: Expression, right: Expression)
    extends KllScalarBase {
  override protected def nullSafeEval(b: Any, v: Any): Any =
    QuantileSketch.rank(b.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, v) => s"graft.functions.QuantileSketch.rank($b, $v)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllRank = copy(left = l, right = r)
  override def prettyName: String = "kll_rank"
}

/** `kll_n(sketch)` → exact total sketched weight (BIGINT). */
case class KllN(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_n expects a binary sketch column, got ${t.catalogString}")
  }

  override protected def nullSafeEval(b: Any): Any =
    QuantileSketch.n(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.QuantileSketch.n($b)")

  override protected def withNewChildInternal(c: Expression): KllN =
    copy(child = c)
  override def prettyName: String = "kll_n"
}

/** `kll_auc(pos_sketch, neg_sketch)` → sketch-served AUC estimate
  * (DOUBLE) — see [[QuantileSketch.aucEstimate]] for the integration
  * and its error/ties contract. */
case class KllAuc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_auc expects two binary sketch columns, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(p: Any, n: Any): Any =
    QuantileSketch.aucEstimate(p.asInstanceOf[Array[Byte]],
      n.asInstanceOf[Array[Byte]], QuantileSketch.AucGrid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, n) =>
      s"graft.functions.QuantileSketch.aucEstimate($p, $n, " +
        s"graft.functions.QuantileSketch.AucGrid())")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllAuc = copy(left = l, right = r)
  override def prettyName: String = "kll_auc"
}
