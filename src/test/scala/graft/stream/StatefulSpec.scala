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

  test("flatMapGroupsWithState sessionize stitches sessions across batches, emits only closed ones") {
    val ms = MemoryStream[(Long, Long, Double)](spark, numPartitions = 2)
    val name = s"sess${System.nanoTime()}"
    val q = Stateful.sessionize(ms.toDS(), gapSeconds = 100L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      ms.addData(Seq((1L, 1000L, 0.0), (1L, 1050L, 0.0)))   // open session [1000,1050]
      q.processAllAvailable()
      assert(spark.table(name).count() == 0)                // nothing closed yet
      ms.addData(Seq((1L, 1100L, 0.0)))                     // gap 50 ≤ 100 → extends
      q.processAllAvailable()
      ms.addData(Seq((1L, 5000L, 0.0)))                     // gap 3900 → closes [1000,1100]
      q.processAllAvailable()
      val sessions = spark.table(name).as[Stateful.Session].collect().toSeq
      assert(sessions == Seq(Stateful.Session(1L, 1000L, 1100L, 3L)))
    } finally q.stop()
  }
}
