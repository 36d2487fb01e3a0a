package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Each query is forced through the `noop` datasource sink so the full
  * plan executes (a bare `count()` would let Catalyst prune projections
  * and measure only the scan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT + parquet-footer warmup, not timed: a scan (footer/IO paths),
    // a text query (regex + higher-order-lambda + hash codegen), and the
    // two sketch builders (md5-explode + wide conditional aggregates) —
    // the shared primitives the pair queries lean on. Measured times are
    // then steady-state throughput, not first-run C2-compilation.
    for (w <- Seq("q_s1_scan", "q_text_fingerprint",
        "q_dedup_simhash_sig", "q_dedup_minhash_sig"))
      try SparkEntry.queries.get(w)
        .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
      catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
