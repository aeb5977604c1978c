package org.apache.spark

import org.apache.spark.scheduler.TaskSchedulerImpl

/** Test-only bridge: `SparkContext.taskScheduler` is private[spark],
  * but the scheduler's `checkSpeculatableTasks()` — the exact pass
  * the speculation timer runs — is public. Local mode never STARTS
  * that timer (TaskSchedulerImpl.start gates it on !isLocal), so the
  * SchedulingSpec drives the same entry point by hand to exercise
  * the real straggler-detection logic. */
object SchedulerProbe {
  def checkSpeculatableTasks(sc: SparkContext): Unit =
    sc.taskScheduler.asInstanceOf[TaskSchedulerImpl]
      .checkSpeculatableTasks()
}
