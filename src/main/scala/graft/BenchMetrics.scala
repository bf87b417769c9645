package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query resource counters for the bench: shuffle-spill and peak-
  * memory REGIME effects measured, not inferred (SCALING.md round 9
  * flagged 3x cold-vs-warm spreads on identical work — disk/page-cache
  * regime — with nothing in the bench output to prove it). Counters
  * accumulate across a query's timed iterations and are snapshot-reset
  * between queries; call [[graft.BenchMetrics.flush]] first so queued
  * listener events land on the query that produced them. */
class BenchMetricsListener extends SparkListener {
  private val diskSpill = new AtomicLong(0L)
  private val memSpill = new AtomicLong(0L)
  private val shuffleWrite = new AtomicLong(0L)
  private val peakExec = new AtomicLong(0L)

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      diskSpill.addAndGet(m.diskBytesSpilled)
      memSpill.addAndGet(m.memoryBytesSpilled)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      // max over tasks: the per-task high-water mark is what says
      // "this stage ran at the edge of its execution-memory share"
      var done = false
      while (!done) {
        val cur = peakExec.get()
        done = m.peakExecutionMemory <= cur ||
          peakExec.compareAndSet(cur, m.peakExecutionMemory)
      }
    }
  }

  /** (diskSpillBytes, memSpillBytes, shuffleWriteBytes, maxTaskPeakExecMem),
    * then zero the counters for the next query. */
  def snapshotAndReset(): (Long, Long, Long, Long) = {
    val s = (diskSpill.getAndSet(0L), memSpill.getAndSet(0L),
      shuffleWrite.getAndSet(0L), peakExec.getAndSet(0L))
    s
  }
}

object BenchMetrics {
  /** Drain the listener bus so every queued task-end event is
    * attributed to the query that generated it (events are delivered
    * asynchronously; without the drain, a fast query's spill could land
    * on the next query's row). */
  def flush(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(spark.sparkContext, 10000L)
}
