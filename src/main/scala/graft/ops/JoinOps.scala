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
