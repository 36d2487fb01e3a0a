package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's custom expressions as SQL functions.
  *
  * Two entry points, same builder:
  *  - cluster config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the idiomatic SparkSessionExtensions path);
  *  - live session: `GraftExtensions.register(spark)` for sessions built
  *    without the config (tests, notebooks).
  *
  * After either: `SELECT cosine_similarity(a, b)` anywhere SQL runs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    ext.injectFunction(GraftExtensions.intersectionDescriptor)
    ext.injectFunction(GraftExtensions.jaroDescriptor)
    GraftExtensions.sketchDescriptors.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RankLimitToTopK)
  }
}

object GraftExtensions {

  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"cosine_similarity expects 2 arguments, got ${args.length}")
    CosineSimilarity(args.head, args(1))
  }

  private def intersectionBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"sorted_intersection_size expects 2 arguments, got ${args.length}")
    SortedIntersectionSize(args.head, args(1))
  }

  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    cosineBuilder)

  val intersectionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersection_size"),
    new ExpressionInfo(classOf[SortedIntersectionSize].getName, "sorted_intersection_size"),
    intersectionBuilder)

  private def jaroBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"jaro_winkler expects 2 arguments, got ${args.length}")
    JaroWinklerSim(args.head, args(1))
  }

  val jaroDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
    jaroBuilder)

  // ---- the sketch family as SQL functions --------------------------------
  // The whole sketch store becomes SQL-surfaced: a notebook or BI layer
  // can `SELECT kll_quantile(metric_sk, 0.5) FROM store` with no Scala
  // imports. Aggregate builders return the TypedImperativeAggregate
  // directly — the analyzer wraps it, exactly as for built-in aggregates.

  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: the size parameter must be an INT literal, got $other")
  }

  /** (name, class, builder) for every sketch function; 1-arg aggregate
    * forms use the family default size, the optional second argument is
    * a literal lgK/k/lgMax. */
  private val sketchBuilders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("theta_sketch_agg", classOf[ThetaSketchAgg], (as: Seq[Expression]) => as match {
      case Seq(c) => ThetaSketchAgg(c)
      case Seq(c, k) => ThetaSketchAgg(c, litInt(k, "theta_sketch_agg"))
      case _ => throw new IllegalArgumentException("theta_sketch_agg(col[, lgK])")
    }),
    ("theta_union_agg", classOf[ThetaUnionAgg], (as: Seq[Expression]) => as match {
      case Seq(c) => ThetaUnionAgg(c)
      case Seq(c, k) => ThetaUnionAgg(c, litInt(k, "theta_union_agg"))
      case _ => throw new IllegalArgumentException("theta_union_agg(sketch[, lgK])")
    }),
    ("theta_estimate", classOf[ThetaEstimate], (as: Seq[Expression]) => as match {
      case Seq(c) => ThetaEstimate(c)
      case _ => throw new IllegalArgumentException("theta_estimate(sketch)")
    }),
    ("theta_intersection", classOf[ThetaIntersectionExpr], (as: Seq[Expression]) => as match {
      case Seq(a, b) => ThetaIntersectionExpr(a, b)
      case _ => throw new IllegalArgumentException("theta_intersection(a, b)")
    }),
    ("theta_a_not_b", classOf[ThetaANotBExpr], (as: Seq[Expression]) => as match {
      case Seq(a, b) => ThetaANotBExpr(a, b)
      case _ => throw new IllegalArgumentException("theta_a_not_b(a, b)")
    }),
    ("kll_sketch_agg", classOf[KllSketchAgg], (as: Seq[Expression]) => as match {
      case Seq(c) => KllSketchAgg(c)
      case Seq(c, k) => KllSketchAgg(c, litInt(k, "kll_sketch_agg"))
      case _ => throw new IllegalArgumentException("kll_sketch_agg(col[, k])")
    }),
    ("kll_merge_agg", classOf[KllMergeAgg], (as: Seq[Expression]) => as match {
      case Seq(c) => KllMergeAgg(c)
      case Seq(c, k) => KllMergeAgg(c, litInt(k, "kll_merge_agg"))
      case _ => throw new IllegalArgumentException("kll_merge_agg(sketch[, k])")
    }),
    ("kll_quantile", classOf[KllQuantile], (as: Seq[Expression]) => as match {
      case Seq(a, b) => KllQuantile(a, b)
      case _ => throw new IllegalArgumentException("kll_quantile(sketch, rank)")
    }),
    ("kll_rank", classOf[KllRank], (as: Seq[Expression]) => as match {
      case Seq(a, b) => KllRank(a, b)
      case _ => throw new IllegalArgumentException("kll_rank(sketch, value)")
    }),
    ("kll_n", classOf[KllN], (as: Seq[Expression]) => as match {
      case Seq(c) => KllN(c)
      case _ => throw new IllegalArgumentException("kll_n(sketch)")
    }),
    ("kll_auc", classOf[KllAuc], (as: Seq[Expression]) => as match {
      case Seq(a, b) => KllAuc(a, b)
      case _ => throw new IllegalArgumentException("kll_auc(pos_sketch, neg_sketch)")
    }),
    ("freq_sketch_agg", classOf[FreqSketchAgg], (as: Seq[Expression]) => as match {
      case Seq(c) => FreqSketchAgg(c)
      case Seq(c, k) => FreqSketchAgg(c, litInt(k, "freq_sketch_agg"))
      case _ => throw new IllegalArgumentException("freq_sketch_agg(col[, lgMax])")
    }),
    ("freq_merge_agg", classOf[FreqMergeAgg], (as: Seq[Expression]) => as match {
      case Seq(c) => FreqMergeAgg(c)
      case Seq(c, k) => FreqMergeAgg(c, litInt(k, "freq_merge_agg"))
      case _ => throw new IllegalArgumentException("freq_merge_agg(sketch[, lgMax])")
    }),
    ("freq_estimate", classOf[FreqEstimate], (as: Seq[Expression]) => as match {
      case Seq(a, b) => FreqEstimate(a, b)
      case _ => throw new IllegalArgumentException("freq_estimate(sketch, item)")
    }),
    ("freq_n", classOf[FreqN], (as: Seq[Expression]) => as match {
      case Seq(c) => FreqN(c)
      case _ => throw new IllegalArgumentException("freq_n(sketch)")
    }),
    ("freq_max_error", classOf[FreqMaxError], (as: Seq[Expression]) => as match {
      case Seq(c) => FreqMaxError(c)
      case _ => throw new IllegalArgumentException("freq_max_error(sketch)")
    }),
    ("freq_items_over", classOf[FreqItemsOver], (as: Seq[Expression]) => as match {
      case Seq(a, b) => FreqItemsOver(a, b)
      case _ => throw new IllegalArgumentException("freq_items_over(sketch, min)")
    }))

  val sketchDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    sketchBuilders.map { case (name, cls, b) =>
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), b)
    }

  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "cosine_similarity", cosineBuilder)
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "sorted_intersection_size", intersectionBuilder)
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "jaro_winkler", jaroBuilder)
    sketchBuilders.foreach { case (name, _, b) =>
      org.apache.spark.sql.graftshim.ColumnShim.registerFunction(spark, name, b)
    }
  }
}
