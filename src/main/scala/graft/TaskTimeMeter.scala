package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Accumulates executor CPU task-time across all jobs — the
  * contention-invariant bench signal.
  *
  * Why CPU time and not wall: the bench box is shared, and a wall-only
  * suite total has a noise floor of several seconds (SCALE.md's
  * "suite-total noise floor" adjudication); in round 12 box contention
  * inflated four un-flagged gates 2.4–6.5× and misread the best round
  * as the second-worst. `TaskMetrics.executorCpuTime` (+ the
  * deserialize CPU slice) counts nanoseconds the task threads were
  * actually ON a core — time spent descheduled by competing processes
  * does not accrue — so on frozen code it is stable under load where
  * wall is not. It is also the number that predicts 100 TB cost: a
  * cluster bills CPU-seconds, not bench-box wall.
  *
  * What it does NOT capture: driver-side work (planning, codegen
  * compile, bounded collects) and pure I/O wait. That is fine for a
  * regression signal — every gate's driver slice is constant across
  * rounds on frozen code — and wall is still recorded next to it.
  *
  * Snapshots drain the (asynchronous) listener bus first via
  * [[org.apache.spark.graftbridge.ListenerBusDrain]] so a gate's
  * task-end events never bleed into the next gate's reading. */
final class TaskTimeMeter(sc: SparkContext) {
  private val cpuNs = new AtomicLong(0L)
  sc.addSparkListener(new SparkListener {
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null)
        cpuNs.addAndGet(m.executorCpuTime + m.executorDeserializeCpuTime)
    }
  })

  /** Total accumulated task CPU seconds (drains the bus first). */
  def snapshotSec(): Double = {
    org.apache.spark.graftbridge.ListenerBusDrain.drain(sc)
    cpuNs.get() / 1e9
  }
}
