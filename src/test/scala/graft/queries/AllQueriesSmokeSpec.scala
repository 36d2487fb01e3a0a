package graft.queries

import graft.SparkSpec

/** Every declared query must at least BUILD and RUN at sf0.001 — the
  * in-suite floor under the driver's DuckDB-oracle gate, so a runtime
  * break (init order, bad SQL, unresolved column) surfaces from
  * `sbt test` alone, without the verify harness. Values are the oracle's
  * job; this asserts only execution and non-empty output. */
class AllQueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every declared query runs and returns rows at sf0.001") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try {
          val n = q(spark, dir).count()
          if (n > 0) None else Some(s"$name: 0 rows")
        } catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("every declared oracle key has a matching query") {
    val orphans = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
