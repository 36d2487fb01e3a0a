package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J2 companions: join utilities for the shapes Catalyst does not pick
  * automatically (SURVEY.md §2.3, §4.2).
  *
  * Catalyst already handles broadcast-vs-sort-merge selection, and AQE
  * (on by default) splits skewed SMJ partitions at runtime. Salting is
  * the remaining tool for the case AQE cannot fix: a shuffle-agg or
  * shuffle-join key so hot that one task gets most of the data AND the
  * build side must be replicated to meet it.
  */
object JoinOps {

  /** Salted equi-join of a skewed fact against a dimension: the fact side
    * gets a deterministic salt in [0, buckets) (hash of the whole row's
    * join payload would do; monotonically_increasing_id is avoided — not
    * stable under retries), the dim side is exploded ×buckets, and the
    * join key becomes (key, salt) — one hot key now spreads over
    * `buckets` tasks.
    *
    * Use ONLY on measured skew: the dim side pays ×buckets replication.
    * Deterministic: salt = pmod(hash(fact columns…), buckets). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, saltOn: Seq[String]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = fact.withColumn("__salt",
      pmod(hash(saltOn.map(col): _*), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** As-of join: for each left row, the LATEST right row with
    * `right.ts <= left.ts` within the same key — implemented as the
    * distributed merge, NOT a pair join: tag both sides, union, one
    * window over (keys, ts) carrying the last non-null right payload
    * forward, keep left rows. One shuffle on the keys, O(n log n) local
    * sort, zero per-pair work — this is the 100 TB shape (a range join
    * would be O(left × right-per-key)).
    *
    * Tie semantics: a right row at exactly left.ts matches (≤, like
    * DuckDB/pandas ASOF). Right rows must be unique per (keys, ts) —
    * pre-aggregate otherwise, or the carried value among same-ts rights
    * is unspecified. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               ts: String, rightCols: Seq[String]): DataFrame = {
    require(rightCols.intersect(left.columns.toSeq).isEmpty,
      s"right payload columns ${rightCols.mkString(",")} collide with left schema")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.withColumn("__side", lit(0))
      .select((leftCols.map(c =>
          if (keys.contains(c) || c == ts) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side")) ++
        rightCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .where(col("__side") === 1)
      .drop("__side")
  }

  /** Salted two-phase aggregation for a hot groupBy key: partial
    * aggregate on (key, salt), final aggregate on key. Spark's
    * HashAggregate already does map-side partial aggregation, which
    * handles most skew; this explicit form is for algebraic aggregates
    * over a key so hot that even the post-combine partitions are
    * unbalanced. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                buckets: Int, saltOn: Seq[String]): DataFrame =
    df.withColumn("__salt", pmod(hash(saltOn.map(col): _*), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as(s"sum_$valueCol"))
}
