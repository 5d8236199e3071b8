package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query scheduler metrics for [[Bench]]'s stderr diagnostics —
  * the local stand-in for the Spark UI's stage table (UI is off in
  * the harness). Counts jobs/stages/tasks and sums task run time and
  * shuffle bytes between `reset()` calls, so each bench row can be
  * classified as protocol-bound (many tiny jobs, task time ≪ wall)
  * vs compute-bound (task time ≈ wall × cores) — the guide-§1 first
  * question, answered per query.
  *
  * Counters are atomics because listener events post on the listener
  * bus thread; `drain` (listener-bus flush via the package-private
  * bus, reflection-free) makes the attribution exact at query
  * boundaries.
  */
final class BenchMetrics extends SparkListener {
  val jobs = new AtomicLong
  val stages = new AtomicLong
  val tasks = new AtomicLong
  val taskMs = new AtomicLong
  val shufReadB = new AtomicLong
  val shufWriteB = new AtomicLong

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    jobs.incrementAndGet(); ()
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stages.incrementAndGet()
    tasks.addAndGet(e.stageInfo.numTasks.toLong)
    val m = e.stageInfo.taskMetrics
    if (m != null) {
      taskMs.addAndGet(m.executorRunTime)
      shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
    ()
  }

  def reset(): Unit = {
    jobs.set(0); stages.set(0); tasks.set(0)
    taskMs.set(0); shufReadB.set(0); shufWriteB.set(0)
  }

  def line: String = {
    f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d " +
      f"taskTime=${taskMs.get / 1000.0}%7.1fs " +
      f"shufR=${shufReadB.get / 1048576.0}%7.1fMB " +
      f"shufW=${shufWriteB.get / 1048576.0}%7.1fMB"
  }
}

object BenchMetrics {
  /** Install on the context; returns the collector. */
  def install(sc: SparkContext): BenchMetrics = {
    val m = new BenchMetrics
    sc.addSparkListener(m)
    m
  }
}
