package graft.plans

import graft.SparkTestSession
import graft.streaming.StormStream
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Diffs every streaming twin's executed micro-batch outline against the
  * committed `plans_streaming.lock` — the streaming counterpart of
  * `PlanLockSpec`. A lost watermark, a state-store operator swap, or a
  * dedup that stops compiling to `StreamingDeduplicate` fails HERE even
  * though every batch gate stays green. */
class StreamingPlanLockSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("every streaming twin's micro-batch plan matches plans_streaming.lock") {
    val locked = StreamingPlanDigest.readLock(StreamingPlanDigest.LockPath)
    val current = StreamingPlanDigest.all(spark)
    assert(current.map(_._1).toSet == locked.keySet,
      "twin registry and lockfile disagree — regenerate plans_streaming.lock")
    val drifted = current.collect {
      case (name, outline) if locked(name) != outline =>
        s"$name:\n  locked:\n${locked(name)}\n  current:\n$outline"
    }
    assert(drifted.isEmpty,
      s"streaming plan drift (regenerate ONLY if intentional):\n${drifted.mkString("\n\n")}")
  }

  test("locked outlines carry the stateful operators and watermarks") {
    val locked = StreamingPlanDigest.readLock(StreamingPlanDigest.LockPath)
    // the contracts the lock exists to protect, stated positively
    assert(locked("storm_dedup_watermark").contains("StreamingDeduplicate"))
    assert(locked("storm_dedup_watermark").contains("EventTimeWatermark"))
    assert(locked("interval_join").contains("StreamingSymmetricHashJoin"))
    assert(locked("interval_join").contains("EventTimeWatermark"))
    assert(locked("event_sessions_mgws").contains("FlatMapGroupsWithState"))
    assert(locked("session_windows_native").contains("EventTimeWatermark"))
    assert(locked("session_windows_native").toLowerCase.contains("session"))
    assert(locked("hll").contains("StateStoreSave"))
    assert(locked("storm_hourly_severity").contains("StateStoreSave"))
  }

  test("a deliberately removed watermark is caught (red path)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    val env = mem.toDF()
      .withColumn("timestamp", to_timestamp(lit("2024-04-26 00:00:00")))
    // tampered twin: same dedup, watermark dropped — unbounded state
    val tampered = StormStream.transform(env)
      .filter(!col("parse_error"))
      .dropDuplicates("id")
    val q = tampered.writeStream.format("noop").outputMode("append").start()
    val outline = try {
      mem.addData("x")
      q.processAllAvailable()
      StreamingPlanDigest.outlineOf(
        q.asInstanceOf[StreamingQueryWrapper].streamingQuery
          .lastExecution.executedPlan)
    } finally q.stop()
    val locked = StreamingPlanDigest.readLock(StreamingPlanDigest.LockPath)
    assert(outline != locked("storm_dedup_watermark"),
      "lock failed to distinguish the watermark-free dedup")
    assert(!outline.contains("EventTimeWatermark"))
    assert(locked("storm_dedup_watermark").contains("EventTimeWatermark"))
  }
}
