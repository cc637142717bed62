package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bench-only bridge: flush the async listener bus so per-query metric
  * snapshots (shuffle bytes, spill, task counts) are EXACT, not racing
  * the event queue. `SparkContext.listenerBus` is `private[spark]`, so
  * this one-liner lives under the `org.apache.spark` package — the same
  * technique Spark's own test utilities use; no behavior is modified.
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
