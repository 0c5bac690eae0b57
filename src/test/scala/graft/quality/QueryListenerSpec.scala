package graft.quality

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.{GraftTestBase, Tables}

/** QueryExecutionListener — the per-query observability hook (duration,
  * final plan, failure) a production engine wires into its metrics
  * pipeline; unlike observe() it needs no query changes at all. */
class QueryListenerSpec extends GraftTestBase {

  test("listener observes completed queries with duration and plan") {
    val seen = new ConcurrentLinkedQueue[(String, Long)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        seen.add((funcName, durationNs))
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit =
        seen.add(("failure:" + funcName, -1L))
    }
    spark.listenerManager.register(listener)
    try {
      Tables(spark, sf001)("nation").groupBy("n_regionkey").count().collect()
      // listener delivery is async on the listener bus
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!seen.isEmpty, "listener never fired")
      val (fn, dur) = seen.peek()
      assert(fn == "collect" && dur > 0,
        s"unexpected listener payload: ($fn, $dur)")
    } finally spark.listenerManager.unregister(listener)
  }
}
