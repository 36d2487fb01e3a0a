package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the property every "bucketed by key at 100 TB" claim in the
  * streaming-index scaladocs rests on: a join or aggregation keyed on a
  * bucketed table's bucket key plans NO exchange for that side. Counts
  * are taken from the FINAL adaptive plan after execution, broadcast
  * joins disabled so the shuffle behavior is what's measured (at real
  * scale neither side broadcasts — that is the point of bucketing). */
class BucketedTablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def customer = graft.queries.Tables.t(spark, dir, "customer")
    .select("c_custkey", "c_name", "c_nationkey")
  private def orders = graft.queries.Tables.t(spark, dir, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Hash-data shuffles in the final (post-AQE) physical plan — the
    * adaptive plan string appends an `== Initial Plan ==` section that
    * would double-count, so cut there first. */
  private def shuffles(df: DataFrame): Int = {
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "Exchange hashpartitioning".r.findAllIn(p).length
  }

  private def noBroadcast[T](f: => T): T = {
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
    try f
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def joined(c: DataFrame, o: DataFrame): DataFrame =
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"),
        sum("o_totalprice").as("total"))

  test("both sides bucketed: equi-join + agg plan zero exchanges") {
    BucketedTables.publish(customer, "bk_customer", "c_custkey", 4)
    BucketedTables.publish(orders, "bk_orders", "o_custkey", 4)
    noBroadcast {
      val bk = joined(spark.table("bk_customer"), spark.table("bk_orders"))
      assert(shuffles(bk) == 0,
        s"bucketed join shuffled:\n${bk.queryExecution.executedPlan}")
      // Same rows as the unbucketed plan — layout must not change results.
      val plain = joined(customer, orders)
      assert(bk.collect().toSet == plain.collect().toSet)
    }
  }

  test("one side bucketed: only the unbucketed side shuffles") {
    BucketedTables.publish(customer, "bk_customer1", "c_custkey", 4)
    noBroadcast {
      val half = joined(spark.table("bk_customer1"), orders)
      assert(shuffles(half) == 1,
        s"expected exactly the orders-side exchange:\n${half.queryExecution.executedPlan}")
    }
  }

  test("negative control: unbucketed join shuffles both sides") {
    noBroadcast {
      assert(shuffles(joined(customer, orders)) == 2)
    }
  }

  test("aggregation on the bucket key reads pre-shuffled") {
    BucketedTables.publish(orders, "bk_orders2", "o_custkey", 4)
    noBroadcast {
      val agg = spark.table("bk_orders2").groupBy("o_custkey")
        .agg(sum("o_totalprice").as("total"))
      assert(shuffles(agg) == 0,
        s"bucket-keyed aggregation shuffled:\n${agg.queryExecution.executedPlan}")
    }
  }

  test("publish writes exactly one file per bucket") {
    BucketedTables.publish(orders, "bk_orders3", "o_custkey", 4)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED bk_orders3")
      .where(col("col_name") === "Location").select("data_type").head.getString(0)
    val files = new java.io.File(new java.net.URI(loc))
      .listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 4,
      s"expected 4 bucket files, got ${files.map(_.getName).toSeq}")
  }
}
