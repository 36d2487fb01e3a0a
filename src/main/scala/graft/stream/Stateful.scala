package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T5+ custom keyed state (absent in the reference; the idiomatic
  * Structured Streaming upgrade path — SURVEY.md §2.13): per-key
  * accumulators via `mapGroupsWithState` / `flatMapGroupsWithState`.
  *
  * State is per key and lives in the state store (RocksDB/HDFS-backed on
  * a cluster), so memory is bounded by live-key cardinality, not stream
  * length; pair with watermark-based timeouts to retire idle keys at
  * 100 TB/day ingest.
  */
object Stateful {

  /** Running per-key stats, updated across micro-batches. */
  case class KeyStats(key: Long, n: Long, sum: Double, lastTs: Long)

  /** Internal accumulator (public: the state-store encoder generates
    * bytecode that constructs it). */
  case class Acc(n: Long, sum: Double, lastTs: Long)

  /** (key, ts, value) stream → running (n, sum, lastTs) per key, emitted
    * once per key per micro-batch (update output mode). Works on batch
    * Datasets too (state starts empty, one "batch" of groups). */
  def runningStats(events: Dataset[(Long, Long, Double)]): Dataset[KeyStats] = {
    implicit val accEnc = Encoders.product[Acc]
    implicit val outEnc = Encoders.product[KeyStats]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[Acc]) =>
          val prev = state.getOption.getOrElse(Acc(0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { case (a, (_, ts, v)) =>
            Acc(a.n + 1, a.sum + v, math.max(a.lastTs, ts))
          }
          state.update(next)
          KeyStats(key, next.n, next.sum, next.lastTs)
      }
  }

  /** Required sink mode for [[runningStats]] streams. */
  val outputMode: OutputMode = OutputMode.Update()

  /** A closed session: [start, end] with its event count. */
  case class Session(key: Long, start: Long, end: Long, n: Long)

  /** Open-session state carried between micro-batches. */
  case class OpenSession(start: Long, end: Long, n: Long)

  /** Gap-based sessionization with custom state (`flatMapGroupsWithState`
    * — emits 0..n rows per key per batch): events extend the key's open
    * session while the gap ≤ `gapSeconds`; a larger gap CLOSES the
    * previous session (emitted) and opens a new one. The final open
    * session stays in state until more events or teardown — streams
    * never "end", so closure is always gap- (or timeout-) driven.
    * Batch-mode twin of q_w2_sessionize; streaming adds cross-batch
    * session stitching that the window form cannot do. */
  def sessionize(events: Dataset[(Long, Long, Double)],
                 gapSeconds: Long = 1800L): Dataset[Session] = {
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[OpenSession]) =>
          val ts = rows.map(_._2).toSeq.sorted
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          ts.foreach { t =>
            open = open match {
              case Some(o) if t - o.end <= gapSeconds =>
                Some(o.copy(end = t, n = o.n + 1))
              case Some(o) =>
                closed += Session(key, o.start, o.end, o.n)
                Some(OpenSession(t, t, 1))
              case None => Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
