package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState accumulates per-key state ACROSS micro-batches") {
    val ms = MemoryStream[(Long, Long, Double)](spark, numPartitions = 2)
    val name = s"stateful${System.nanoTime()}"
    val q = Stateful.runningStats(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(Stateful.outputMode).start()
    try {
      ms.addData(Seq((1L, 10L, 2.0), (1L, 20L, 3.0), (2L, 5L, 7.0)))
      q.processAllAvailable()
      ms.addData(Seq((1L, 30L, 5.0)))           // second batch touches key 1 only
      q.processAllAvailable()
      // memory sink in update mode appends each emission; take the latest per key
      val latest = spark.table(name).as[Stateful.KeyStats].collect()
        .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.n) }
      assert(latest(1L) == Stateful.KeyStats(1L, 3L, 10.0, 30L)) // state survived batch 1 → 2
      assert(latest(2L) == Stateful.KeyStats(2L, 1L, 7.0, 5L))
    } finally q.stop()
  }
}
