package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Max-observed per-task metrics across every job run while registered.
  *
  * The point of per-TASK maxima (vs wall time): they are
  * load-insensitive. A busy box stretches wall-clock but does not change
  * how many bytes the worst task read or shuffled — so a bench row whose
  * seconds regressed but whose task maxima are unchanged is a load
  * window, and a row whose maxima grew is a real plan regression. These
  * are also the numbers that decide 100 TB survival: the largest task is
  * what an executor must hold, regardless of cluster size.
  *
  * Shared by [[Bench]] (per-query metrics in bench.json) and
  * [[ScaleRehearsal]] (skew rehearsal table). Reset between measured
  * units; flush the listener bus (ListenerBridge.flushListenerBus)
  * before reading — task-end events are delivered asynchronously.
  */
final class TaskMaxListener extends SparkListener {
  @volatile var maxInputBytes = 0L
  @volatile var maxShuffleReadBytes = 0L
  @volatile var maxShuffleReadRecords = 0L
  @volatile var maxShuffleWriteBytes = 0L
  @volatile var spillBytes = 0L // summed disk spill across tasks
  @volatile var tasks = 0L

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) synchronized {
      tasks += 1
      maxInputBytes = math.max(maxInputBytes, m.inputMetrics.bytesRead)
      maxShuffleReadBytes =
        math.max(maxShuffleReadBytes, m.shuffleReadMetrics.totalBytesRead)
      maxShuffleReadRecords =
        math.max(maxShuffleReadRecords, m.shuffleReadMetrics.recordsRead)
      maxShuffleWriteBytes =
        math.max(maxShuffleWriteBytes, m.shuffleWriteMetrics.bytesWritten)
      spillBytes += m.diskBytesSpilled
    }
  }

  def reset(): Unit = synchronized {
    maxInputBytes = 0L; maxShuffleReadBytes = 0L
    maxShuffleReadRecords = 0L; maxShuffleWriteBytes = 0L
    spillBytes = 0L; tasks = 0L
  }

  /** One compact JSON object of the current maxima (MB at 1 decimal —
    * enough to separate a 16 MB task from a 160 MB one). */
  def snapshotJson: String = synchronized {
    def mb(b: Long): String = f"${b / 1e6}%.1f"
    s"""{"max_task_input_mb":${mb(maxInputBytes)},""" +
      s""""max_task_shuffle_read_mb":${mb(maxShuffleReadBytes)},""" +
      s""""max_task_shuffle_write_mb":${mb(maxShuffleWriteBytes)},""" +
      s""""max_task_shuffle_records":$maxShuffleReadRecords,""" +
      s""""spill_mb":${mb(spillBytes)},"tasks":$tasks}"""
  }

  def summaryLine: String = synchronized {
    f"maxTaskIn=${maxInputBytes / 1e6}%.0fMB " +
      f"maxShufRead=${maxShuffleReadBytes / 1e6}%.0fMB " +
      f"maxShufWrite=${maxShuffleWriteBytes / 1e6}%.0fMB " +
      f"maxShufRecords=$maxShuffleReadRecords spill=${spillBytes / 1e6}%.0fMB"
  }
}
