package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Exact per-measurement shuffle attribution via job groups, shared by
  * [[Bench]] and [[graft.tools.ScaleValidate]].
  *
  * Wall time alone can't tell a plan regression from machine weather,
  * but bytes/records shuffled are a pure plan property — a new exchange
  * shows up even on a noisy box. Attribution is EXACT: every
  * measurement's actions run under `setJobGroup(key)`, `onJobStart`
  * records which stages belong to which group (AQE's re-planned jobs
  * inherit the thread-local group), and stage-completed events credit
  * their own group no matter how late the async listener bus delivers
  * them. One [[drain]] at the end replaces per-measurement stability
  * polls and their misattribution cap.
  */
final class ShuffleByGroup extends SparkListener {
  private val totalBytes = new java.util.concurrent.atomic.AtomicLong(0L)
  private val stageGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
  private val groupBytes =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val groupRecs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val g =
      if (js.properties == null) null
      else js.properties.getProperty("spark.jobGroup.id")
    if (g != null)
      js.stageInfos.foreach(si => stageGroup.put(si.stageId, g))
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      val b = m.shuffleWriteMetrics.bytesWritten
      val r = m.shuffleWriteMetrics.recordsWritten
      totalBytes.addAndGet(b)
      val g = stageGroup.get(sc.stageInfo.stageId)
      if (g != null) {
        groupBytes
          .computeIfAbsent(g, _ => new java.util.concurrent.atomic.AtomicLong)
          .addAndGet(b)
        groupRecs
          .computeIfAbsent(g, _ => new java.util.concurrent.atomic.AtomicLong)
          .addAndGet(r)
      }
    }
  }

  /** Run `body` with all its jobs tagged to `key`. */
  def measure[A](sc: SparkContext, key: String)(body: => A): A = {
    sc.setJobGroup(key, key, interruptOnCancel = false)
    try body finally sc.clearJobGroup()
  }

  /** Wait for the async listener bus to go quiet so every
    * stage-completed event has credited its group. */
  def drain(): Unit = {
    var last = -1L
    var stable = 0
    var waited = 0
    while (stable < 4 && waited < 10000) {
      Thread.sleep(50L); waited += 50
      val cur = totalBytes.get()
      if (cur == last) stable += 1 else { stable = 0; last = cur }
    }
  }

  def mbOf(key: String): Double =
    Option(groupBytes.get(key)).fold(0.0)(_.get() / 1048576.0)
  def recOf(key: String): Long =
    Option(groupRecs.get(key)).fold(0L)(_.get())
}
