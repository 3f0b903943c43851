package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-index novelty stream must emit exactly the arriving
  * (doc, trigram) pairs absent from the at-rest corpus, regardless of
  * micro-batching — and an arriving doc made entirely of corpus text
  * must emit nothing. */
class StreamNoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed novel grams equal the batch anti-join across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // localCheckpoint, NOT cache() — see StreamSeasonalSpec: a cached
    // plan would leak into the plan-lock spec's identical build
    val frozen = StreamNovelty.frozenGrams(spark, sf).localCheckpoint(true)
    val corpusGrams = frozen.collect().map(_.getString(0)).toSet

    // arrivals: one pure-corpus doc (the first at-rest doc's text), one
    // pure-novel doc, one mixed doc straddling batches
    val firstText = graft.Tables(spark, sf, "documents")
      .orderBy("doc_id").select("text").head().getString(0)
    val arrivals = Seq(
      (900001L, firstText),
      (900002L, "zq zr zs zt zu"),
      (900003L, s"zq zr ${firstText.split(" ").take(3).mkString(" ")}"))

    val mem = MemoryStream[(Long, String)]
    val q = StreamNovelty.novelOverStream(
      mem.toDS().toDF("doc_id", "text"), frozen)
      .writeStream.format("memory").queryName("novelty_stream")
      .outputMode(StreamNovelty.outputMode).start()
    try {
      arrivals.foreach { a => mem.addData(a); q.processAllAvailable() }
      val streamed = spark.table("novelty_stream").collect()
        .map(r => (r.getLong(1), r.getString(0))).toSet

      // driver replay: distinct trigrams of each arrival minus corpus
      val want = arrivals.flatMap { case (id, text) =>
        val w = text.split(" ").filter(_.nonEmpty)
        val g = if (w.length < 3) Set.empty[String]
                else w.sliding(3).map(_.mkString(" ")).toSet
        (g -- corpusGrams).map(id -> _)
      }.toSet
      assert(streamed == want)
      assert(streamed.nonEmpty)
      // the pure-corpus doc contributed nothing
      assert(!streamed.exists(_._1 == 900001L))
      // the pure-novel doc contributed all its grams
      assert(streamed.count(_._1 == 900002L) == 3)
    } finally q.stop()
  }
}
