package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-key top-K as a first-class operator — the whole-operator extension
  * path (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, SURVEY.md
  * §7.1 preference (c)).
  *
  * The composable form (`rank() OVER (PARTITION BY k ORDER BY v) <= K`,
  * declared as `q_w2_analytics`) plans as Exchange → **full Sort of every
  * partition** → WindowExec: at 100 TB the sort dominates — O(n log n)
  * comparisons and a spill-prone buffered partition per key. Top-K needs
  * none of that: a bounded heap per key is O(n log K) with K·keys rows of
  * state.
  *
  * Physical shape (mirrors partial/final aggregation):
  *
  *   TopKPerKeyExec(final)            ≤ K rows per key, exact
  *     +- ShuffleExchange(key)        carries ≤ K · keys · partitions rows
  *        +- TopKPerKeyExec(partial)  map-side heaps: the shuffle sees the
  *           +- child                 pre-pruned stream, NEVER the corpus
  *
  * The partial phase hard-caps its own state at `maxPartialKeys` heaps
  * (conf `spark.graft.topk.maxPartialKeys`); rows of keys beyond the cap
  * stream through unpruned and the final phase re-heaps them, so results
  * stay exact while map-side memory stays bounded.
  *
  * Registered by [[graft.functions.GraftExtensions]]
  * (`injectPlannerStrategy`) or per-session via
  * `GraftOps.install(spark)`; constructed by [[GraftOps.topKPerKey]],
  * which resolves key/order columns by name against the analyzed child so
  * no analyzer rule is required.
  */
case class TopKPerKey(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** The bounded-heap physical operator. `partial = true` runs on the
  * child's existing partitioning (map-side prune before the exchange);
  * `partial = false` declares `ClusteredDistribution(keys)` so
  * EnsureRequirements inserts the one hash exchange, then finalizes.
  * Identical kernel both phases: top-K of a top-K union is the top-K. */
case class TopKPerKeyExec(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    maxPartialKeys: Int = TopKPerKeyExec.DefaultMaxPartialKeys)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // Locals only in the task closure — capturing fields would serialize
    // this operator (and its whole child plan) into every task.
    val localKeys = keys
    val localOrder = order
    val localK = k
    val childOutput = child.output
    val keyCap = if (partial) maxPartialKeys else Int.MaxValue
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(localKeys, childOutput)
      val better = GenerateOrdering.generate(localOrder, childOutput)
      // Heap root = the WORST retained row, so a full heap admits a new
      // row iff it beats the root — O(log K) per admit, O(1) per reject,
      // and rejects dominate on real data. scala.PriorityQueue keeps its
      // MAXIMUM at the head, and `better.compare(a, b) > 0` means "a sorts
      // after b" — so `better` itself is the heap ordering (head = worst).
      // Memory discipline, the map-side-combine contract: the PARTIAL
      // phase is an opportunistic prune, so its state is hard-capped at
      // maxPartialKeys heaps; rows of keys beyond the cap pass through
      // unpruned (still exact — the final phase re-heaps everything).
      // The FINAL phase runs after the hash exchange and must be exact,
      // so it is uncapped: its state is keys-in-partition × K rows, the
      // same memory class as a hash aggregate's group map.
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      new Iterator[InternalRow] {
        private var overflow: InternalRow = _   // at most one pending row
        private var drain: Iterator[InternalRow] = _
        override def hasNext: Boolean = {
          if (overflow != null) return true
          if (drain != null) return drain.hasNext
          while (iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row) // reused buffer — copy only on first sight
            heaps.get(key) match {
              case Some(heap) =>
                if (heap.size < localK) heap.enqueue(row.copy())
                else if (better.compare(row, heap.head) < 0) {
                  heap.dequeue(); heap.enqueue(row.copy())
                }
              case None if heaps.size < keyCap =>
                val heap = mutable.PriorityQueue.empty[InternalRow](better)
                heap.enqueue(row.copy())
                heaps.update(key.copy(), heap)
              case None =>
                // Cap hit: stream the row through uncopied (the consumer
                // serializes it before the next hasNext call).
                overflow = row
                return true
            }
          }
          drain = heaps.valuesIterator.flatMap(_.iterator)
          drain.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          if (overflow != null) { val r = overflow; overflow = null; r }
          else drain.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** 128 K heaps ≈ a few hundred MB at K·row ≈ 1 KB — the scale of a
    * map-side combiner, far under executor budgets. */
  val DefaultMaxPartialKeys: Int = 1 << 17
}

/** Plans the logical node as the partial/final pair. The partial-phase
  * key cap is tunable per session via `spark.graft.topk.maxPartialKeys`
  * (read at planning time through the active SQLConf). */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  val MaxPartialKeysConf = "spark.graft.topk.maxPartialKeys"
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val cap = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(MaxPartialKeysConf,
          TopKPerKeyExec.DefaultMaxPartialKeys.toString).toInt
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child),
          maxPartialKeys = cap)) :: Nil
    case _ => Nil
  }
}

/** User-facing construction (name-resolved, so no analyzer rule). */
object GraftOps {

  /** Idempotently add the strategy to a live session (the extensions
    * config path is `spark.sql.extensions=graft.functions.GraftExtensions`). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
  }

  /** Additionally enable the [[RankLimitToTopK]] rewrite for the session:
    * every `row_number() <= K` window filter re-plans through TopKPerKey.
    * Opt-in and separate from [[install]] — it changes the plans of
    * queries the caller did not write with this operator in mind. */
  def installRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    install(spark)
    spark.conf.set(RankLimitToTopK.EnabledConf, "true")
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RankLimitToTopK))
      spark.experimental.extraOptimizations = cur :+ RankLimitToTopK
  }

  /** Exact top-`k` rows per `keys` group under `orderBy` (column name →
    * ascending?; e.g. `Seq("value" -> false, "id" -> true)` = highest
    * value, id-ascending tie-break). Output order within groups is
    * unspecified — compose `.orderBy` downstream as with any aggregate. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    org.apache.spark.sql.graftshim.ColumnShim.ofRows(spark,
      TopKPerKey(keyCols.map(attr), order, k, analyzed))
  }
}
