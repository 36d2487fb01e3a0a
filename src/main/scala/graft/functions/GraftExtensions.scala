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

  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "cosine_similarity", cosineBuilder)
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "sorted_intersection_size", intersectionBuilder)
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "jaro_winkler", jaroBuilder)
  }
}
