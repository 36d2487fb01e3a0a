package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.Dataset

/** Misra–Gries heavy-hitter candidate generation — the sketch phase of
  * the two-pass EXACT heavy-hitters pipeline (`q_text_heavyhitters`):
  *
  *  1. candidate pass (here): each partition keeps at most `k` counters
  *     in O(k) memory; the decrement step charges one arrival against k
  *     tracked items, so any item with partition frequency > n_p/(k+1)
  *     still holds a counter at partition end. An item with GLOBAL
  *     frequency > n/k must exceed n_p/k on at least one partition (the
  *     averaging argument), so the union of partition candidates is a
  *     guaranteed superset of the global heavy hitters — no false
  *     negatives, ever.
  *  2. exact pass (in the query): count ONLY the candidate items and
  *     filter count·k > n — false positives from the sketch die here,
  *     so the final answer is exact and oracle-checkable.
  *
  * At 100 TB this is the only shape that works: a full groupBy on a
  * heavy-tailed key space shuffles the whole corpus; the sketch pass
  * shuffles ≤ k·partitions candidate rows, and the exact pass counts a
  * candidate set that fits in a broadcast. This is genuine per-partition
  * imperative state — the documented `mapPartitions` case. */
object FrequentItems {

  /** Per-partition Misra–Gries candidates (each partition emits ≤ k
    * items; duplicates across partitions are fine — callers distinct). */
  def candidates(items: Dataset[String], k: Int): Dataset[String] = {
    require(k > 0, "k must be positive")
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      while (it.hasNext) {
        val x = it.next()
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // Decrement-all: one arrival cancels one count on each of the
            // k tracked items; zeros drop out, the new item is not added.
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }
  }
}
