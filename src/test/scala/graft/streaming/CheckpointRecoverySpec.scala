package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import graft.storm.Model
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T2: offsets live in the checkpoint, not the query object — a restarted
  * query resumes where the previous one stopped and does not reprocess
  * already-committed input. (File source stands in for Kafka: both track
  * consumed input in the same checkpoint machinery.) */
class CheckpointRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val record1 =
    """{"Time":"1510","Size":"125","Location":"8 ESE Chappel","County":"San Saba",
      |"State":"TX","Lat":"31.02","Lon":"-98.44","Comments":"(SJT)","EventType":"hail"}"""
      .stripMargin.replace("\n", "")
  private val record2 = record1
    .replace("1510", "1600").replace("hail", "wind").replace("125", "")

  test("restarted query resumes from the checkpoint without reprocessing") {
    val in = Files.createTempDirectory("ckpt_in").toString
    val ckpt = Files.createTempDirectory("ckpt_meta").toString
    var seen = Vector.empty[Row]

    def runOnce(): Unit = {
      val src = spark.readStream.schema(Model.rawSchema).json(in)
        .withColumn("value", to_json(struct(Model.rawFieldNames.map(col): _*)))
        .withColumn("timestamp", to_timestamp(lit("2024-04-26 00:00:00")))
      val q = src.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen = seen ++ StormStream.transform(batch)
            .filter(!col("parse_error")).select("id").collect()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    Files.writeString(Paths.get(s"$in/f1.json"), record1)
    runOnce()
    assert(seen.map(_.getString(0)) == Vector("hail-5d91dda0f56ba124"))

    // new file arrives while no query is running; restart from checkpoint
    Files.writeString(Paths.get(s"$in/f2.json"), record2)
    runOnce()
    val ids = seen.map(_.getString(0))
    assert(ids.length == 2, s"file1 reprocessed or file2 missed: $ids")
    assert(ids.head == "hail-5d91dda0f56ba124")
    assert(ids(1).startsWith("wind-"))
  }
}
