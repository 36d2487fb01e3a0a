package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener-bus drain — the only reliable
  * way to read COMPLETE per-stage metrics right after an action: listener
  * events are delivered asynchronously, and a tally read without a drain
  * races the queue (missing the last stages of exactly the job being
  * measured). Same pattern as the Column↔Expression graftshim: a
  * two-line visibility bridge, no behavior. */
object ListenerShim {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException =>
      // A saturated queue yields an under-count, never a hang; callers
      // treat shuffle bytes as measurement, not correctness.
      System.err.println("[graftshim] listener bus drain timed out")
    }
}
