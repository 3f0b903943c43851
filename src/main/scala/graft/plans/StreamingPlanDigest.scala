package graft.plans

import graft.streaming._
import graft.text.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Plan locks for the STREAMING twins — the `plans.lock` counterpart for
  * the 15 micro-batch pipelines. The batch lock cannot see them: a lost
  * `withWatermark` (state grows forever), a `dropDuplicates` that stops
  * compiling to `StreamingDeduplicate`, or a session/state operator swap
  * all keep every batch digest green while silently changing streaming
  * state semantics at scale.
  *
  * Each twin runs ONE micro-batch of tiny hand data through a noop sink;
  * the lock pins the executed physical plan's OPERATOR OUTLINE (node
  * names only — `StateStoreSave`, `EventTimeWatermark`,
  * `StreamingSymmetricHashJoin`, `FlatMapGroupsWithState`, … — nothing
  * data- or run-dependent). `StreamingPlanLockSpec` re-derives all
  * outlines every test run and diffs against `plans_streaming.lock`;
  * regenerate intentionally via `runMain graft.plans.StreamingPlanLockMain`.
  */
object StreamingPlanDigest {

  val LockPath = "plans_streaming.lock"

  /** Fixture dir for the one twin needing a trained corpus index. */
  val IndexSfDir = "/root/testdata/sf0.001"

  def outlineOf(p: SparkPlan): String = {
    def walk(n: SparkPlan, d: Int): Seq[String] = n match {
      // A stateless micro-batch with an exchange gets wrapped in AQE
      // (stateful operators suppress it, which is why the other twins
      // never hit this); the wrapper node alone would pin nothing —
      // descend into the final executed plan it settled on.
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        (" " * d + a.nodeName) +: walk(a.executedPlan, d + 1)
      // Query stages are leaves by `children`; their actual subtree
      // hangs off `plan`.
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        (" " * d + q.nodeName) +: walk(q.plan, d + 1)
      case _ =>
        (" " * d + n.nodeName) +: n.children.flatMap(walk(_, d + 1))
    }
    walk(p, 0).mkString("\n")
  }

  /** Start → feed one batch → capture the micro-batch physical outline. */
  private def run(df: DataFrame, mode: OutputMode)(feed: => Unit): String = {
    val q = df.writeStream.format("noop").outputMode(mode).start()
    try {
      feed
      q.processAllAvailable()
      val exec =
        q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution
      require(exec != null, "no micro-batch executed")
      outlineOf(exec.executedPlan)
    } finally q.stop()
  }

  /** One outline per streaming twin, sorted by name. Models/stats that
    * the real twins train are replaced by tiny frozen literals where the
    * signature allows (the PLAN shape is what's locked, and it does not
    * depend on model contents) — only the near-dup index is built from
    * the fixture corpus, as its plan embeds the index DataFrames. */
  def all(spark: SparkSession): Seq[(String, String)] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp: SparkSession = spark
    import spark.implicits._

    def envelope(mem: MemoryStream[String]): DataFrame =
      mem.toDF()
        .withColumn("timestamp", to_timestamp(lit("2024-04-26 00:00:00")))

    val ts0 = Timestamp.valueOf("2024-01-01 10:00:00")

    val twins = Seq[(String, () => String)](
      "storm_transform" -> { () =>
        val mem = MemoryStream[String]
        run(StormStream.transform(envelope(mem)), OutputMode.Append()) {
          mem.addData("x")
        }
      },
      "storm_dedup_watermark" -> { () =>
        val mem = MemoryStream[String]
        run(StormStream.dedupByIdWithinWatermark(
          StormStream.transform(envelope(mem)).filter(!col("parse_error"))),
          OutputMode.Append()) { mem.addData("x") }
      },
      "storm_hourly_severity" -> { () =>
        val mem = MemoryStream[String]
        run(StormStream.hourlySeverityCounts(
          StormStream.transform(envelope(mem))),
          OutputMode.Update()) { mem.addData("x") }
      },
      "event_sessions_mgws" -> { () =>
        val mem = MemoryStream[EventSessions.Event]
        run(EventSessions.sessionize(mem.toDS()).toDF(),
          OutputMode.Update()) {
          mem.addData(EventSessions.Event(1L, ts0, "click"))
        }
      },
      "session_windows_native" -> { () =>
        val mem = MemoryStream[(Long, Timestamp, Double)]
        run(StreamSessionWindows.sessions(
          mem.toDS().toDF("user_id", "ts", "value")),
          StreamSessionWindows.outputMode) { mem.addData((1L, ts0, 1.0)) }
      },
      "interval_join" -> { () =>
        val pMem = MemoryStream[(Long, Long, Timestamp)]
        val cMem = MemoryStream[(Long, Long, Timestamp)]
        run(StreamIntervalJoin.attributionJoin(
          pMem.toDS().toDF("purchase_id", "user_id", "ts"),
          cMem.toDS().toDF("c_event_id", "c_user_id", "c_ts")),
          OutputMode.Append()) {
          pMem.addData((1L, 1L, ts0)); cMem.addData((2L, 1L, ts0))
        }
      },
      "near_dup" -> { () =>
        val mem = MemoryStream[(Long, String)]
        val idx = StreamNearDup.buildIndex(spark, IndexSfDir)
        run(StreamNearDup.matchesOverStream(
          mem.toDS().toDF("doc_id", "text"), idx),
          StreamNearDup.outputMode) { mem.addData((1L, "a b c d e f")) }
      },
      "simhash_hamming" -> { () =>
        val mem = MemoryStream[(Long, String)]
        val idx = StreamSimhash.buildIndex(spark, IndexSfDir)
        run(StreamSimhash.matchesOverStream(
          mem.toDS().toDF("doc_id", "text"), idx),
          StreamSimhash.outputMode) { mem.addData((1L, "a b c d e f")) }
      },
      "bm25" -> { () =>
        val mem = MemoryStream[(Long, String)]
        run(StreamBm25.scoreOverStream(
          mem.toDS().toDF("doc_id", "text"),
          Retrieval.CorpusStats(Map("dup" -> 1L), 2L, 10L)),
          StreamBm25.outputMode) { mem.addData((1L, "dup text")) }
      },
      "hll" -> { () =>
        val mem = MemoryStream[(String, String)]
        run(StreamHll.distinctOverStream(
          mem.toDS().toDF("source", "text"), 0.05),
          StreamHll.outputMode) { mem.addData(("a", "some text")) }
      },
      "kmv" -> { () =>
        val mem = MemoryStream[StreamKmv.HashEvent]
        run(StreamKmv.distinctOverStream(mem.toDS()).toDF(),
          StreamKmv.outputMode) { mem.addData(StreamKmv.HashEvent("a", 7L)) }
      },
      "count_min" -> { () =>
        val mem = MemoryStream[(String, String)]
        run(StreamCountMin.countersOverStream(
          mem.toDS().toDF("source", "t")),
          StreamCountMin.outputMode) { mem.addData(("a", "w1")) }
      },
      "tokenize" -> { () =>
        val mem = MemoryStream[(Long, String, String)]
        run(StreamTokenize.countsOverStream(
          mem.toDS().toDF("doc_id", "source", "text"), Seq("th", "he")),
          StreamTokenize.outputMode) { mem.addData((1L, "a", "the theme")) }
      },
      "lm_score" -> { () =>
        val mem = MemoryStream[(Long, String)]
        run(StreamLmScore.scoreOverStream(
          mem.toDS().toDF("doc_id", "text"), Seq(("the", 5L)), 10L),
          StreamLmScore.outputMode) { mem.addData((1L, "the text")) }
      },
      "bigram" -> { () =>
        val mem = MemoryStream[(Long, String)]
        run(StreamBigram.scoreOverStream(
          mem.toDS().toDF("doc_id", "text"),
          Map(("a", "b") -> (1L, 2L)), 4L),
          StreamBigram.outputMode) { mem.addData((1L, "a b c")) }
      },
      "dsir" -> { () =>
        val mem = MemoryStream[(Long, String)]
        run(StreamDsir.scoreOverStream(
          mem.toDS().toDF("doc_id", "text"), Seq((0L, 1L)), 0L, 10L, 5L),
          StreamDsir.outputMode) { mem.addData((1L, "some text")) }
      },
      "chunk" -> { () =>
        val mem = MemoryStream[(Long, String)]
        run(StreamChunk.chunksOverStream(
          mem.toDS().toDF("doc_id", "text")),
          StreamChunk.outputMode) { mem.addData((1L, "a b c")) }
      },
      "drift" -> { () =>
        val mem = MemoryStream[StreamDrift.VecEvent]
        run(StreamDrift.sumsOverStream(mem.toDS()).toDF(),
          StreamDrift.outputMode) {
          mem.addData(StreamDrift.VecEvent(1, 0, Array(1L, 2L), 3L))
        }
      },
      "cohort" -> { () =>
        val mem = MemoryStream[StreamCohort.UserEvent]
        run(StreamCohort.incrementsOverStream(mem.toDS()).toDF(),
          StreamCohort.outputMode) {
          mem.addData(StreamCohort.UserEvent(1L, new Timestamp(0L)))
        }
      },
      "transitions" -> { () =>
        val mem = MemoryStream[StreamTransitions.Ev]
        run(StreamTransitions.stepsOverStream(mem.toDS()).toDF(),
          StreamTransitions.outputMode) {
          mem.addData(StreamTransitions.Ev(1L, new Timestamp(0L), 1L, "view"))
        }
      },
      "classifier" -> { () =>
        val mem = MemoryStream[(Long, String)]
        run(StreamClassifier.scoreOverStream(
          mem.toDS().toDF("doc_id", "text"),
          Array(0.1, 0.01, 0.0, 0.0, 0.0, 0.0)),
          StreamClassifier.outputMode) { mem.addData((1L, "some words")) }
      },
      "url_canonical" -> { () =>
        val mem = MemoryStream[(Long, String)]
        run(StreamUrlCanonical.canonicalOverStream(
          mem.toDS().toDF("doc_id", "u")),
          StreamUrlCanonical.outputMode) {
          mem.addData((1L, "HTTP://A.B:80/x?utm_a=1&p=2#f"))
        }
      },
      "html_extract" -> { () =>
        val mem = MemoryStream[(Long, String)]
        run(StreamHtmlExtract.extractOverStream(
          mem.toDS().toDF("doc_id", "page")),
          StreamHtmlExtract.outputMode) {
          mem.addData((1L, "<html><body><div><p>words here</p></div>" +
            "<footer>ft</footer></body></html>"))
        }
      },
      "media" -> { () =>
        val mem = MemoryStream[graft.multimodal.Multimodal.MediaRecord]
        run(StreamMedia.featuresOverStream(mem.toDS()),
          StreamMedia.outputMode) {
          // (audio/video fingerprint twins share this decode shape — the
          // registry pins them separately below)
          mem.addData(graft.multimodal.Multimodal.MediaRecord(
            1L, "audio", graft.multimodal.MediaCodec.encodeWav(
              Array[Byte](1, 2, 3))))
        }
      },
      "media_audio_fp" -> { () =>
        val mem = MemoryStream[graft.multimodal.Multimodal.MediaRecord]
        run(StreamMedia.audioFpOverStream(mem.toDS()),
          StreamMedia.outputMode) {
          mem.addData(graft.multimodal.Multimodal.MediaRecord(
            1L, "audio", graft.multimodal.MediaCodec.encodeWav(
              Array[Byte](1, 2, 3))))
        }
      },
      "media_video_fp" -> { () =>
        val mem = MemoryStream[graft.multimodal.Multimodal.MediaRecord]
        run(StreamMedia.videoFpOverStream(mem.toDS()),
          StreamMedia.outputMode) {
          mem.addData(graft.multimodal.Multimodal.MediaRecord(
            1L, "video", graft.multimodal.MediaCodec.encodeVideo(1000,
              Seq(graft.multimodal.MediaCodec.encodeImage(8, 8,
                _ => 100.toByte)))))
        }
      },
      "cdc" -> { () =>
        val mem = MemoryStream[graft.multimodal.Multimodal.MediaRecord]
        run(StreamCdc.chunksOverStream(mem.toDS()),
          StreamCdc.outputMode) {
          mem.addData(graft.multimodal.Multimodal.MediaRecord(
            1L, "audio", graft.multimodal.MediaCodec.encodeWav(
              Array[Byte](1, 2, 3))))
        }
      },
      "split_leakage" -> { () =>
        val mem = MemoryStream[(Long, String)]
        val idx = StreamNearDup.buildIndex(spark, IndexSfDir)
        val splits = StreamSplitLeakage.splitTable(spark, IndexSfDir)
        run(StreamSplitLeakage.leakageOverStream(
          mem.toDS().toDF("doc_id", "text"), idx, splits),
          StreamSplitLeakage.outputMode) {
          mem.addData((900001L, "a b c d e f"))
        }
      },
      "ewma" -> { () =>
        val mem = MemoryStream[StreamEwma.Ev]
        run(StreamEwma.flagsOverStream(mem.toDS()).toDF(),
          StreamEwma.outputMode) {
          mem.addData(StreamEwma.Ev(1L, ts0, 1L, 10.0))
        }
      },
      "quantile_norm" -> { () =>
        val mem = MemoryStream[(Long, String, String)]
        val cdf = StreamQuantileNorm.frozenCdf(
          graft.text.QuantileNorm.scored(spark, IndexSfDir))
        run(StreamQuantileNorm.scoreOverStream(
          mem.toDS().toDF("doc_id", "source", "text"), cdf),
          StreamQuantileNorm.outputMode) {
          mem.addData((1L, "src0", "a b c"))
        }
      },
      "seasonal" -> { () =>
        val mem = MemoryStream[(Long, String, Timestamp, Double)]
        val cells = StreamSeasonal.frozenCells(spark, IndexSfDir)
        run(StreamSeasonal.flagsOverStream(
          mem.toDS().toDF("event_id", "event_type", "ts", "value"), cells),
          StreamSeasonal.outputMode) {
          mem.addData((1L, "click", ts0, 10.0))
        }
      },
      "streaks" -> { () =>
        val mem = MemoryStream[StreamStreaks.Ev]
        run(StreamStreaks.profilesOverStream(mem.toDS()).toDF(),
          StreamStreaks.outputMode) {
          mem.addData(StreamStreaks.Ev(1L, ts0, 1L))
        }
      },
      "novelty" -> { () =>
        val mem = MemoryStream[(Long, String)]
        val frozen = StreamNovelty.frozenGrams(spark, IndexSfDir)
        run(StreamNovelty.novelOverStream(
          mem.toDS().toDF("doc_id", "text"), frozen),
          StreamNovelty.outputMode) {
          mem.addData((900001L, "zq zr zs zt"))
        }
      },
      // foreachBatch twin: pins the micro-batch plan feeding the
      // composed release maintainer (versioned manifest + k-anon +
      // ladder + leak + contamination + release composition) —
      // STATELESS like all five underlying stores (everything heavy is
      // foreachBatch-internal batch work against frozen feeds)
      "release_report_stream" -> { () =>
        val mem = MemoryStream[(Long, String, String, String)]
        def t(n: String) =
          java.nio.file.Files.createTempDirectory(n).toString
        val b = StreamRelease.Bases(t("graft-rel-twin-m"),
          t("graft-rel-twin-k"), t("graft-rel-twin-l"),
          t("graft-rel-twin-lk"), t("graft-rel-twin-c"),
          t("graft-rel-twin-r"))
        val ckpt = t("graft-rel-twin-ckpt")
        val feeds = StreamRelease.pairFeeds(spark, IndexSfDir)
        val q = StreamRelease.maintain(
          mem.toDS().toDF("doc_id", "text", "lang", "source"),
          b, feeds, ckpt)
        try {
          mem.addData((1L, "a b", "en", "s"))
          q.processAllAvailable()
          val exec = q.asInstanceOf[StreamingQueryWrapper]
            .streamingQuery.lastExecution
          require(exec != null, "no micro-batch executed")
          outlineOf(exec.executedPlan)
        } finally {
          q.stop()
          cleanDirs(b.all :+ ckpt: _*)
        }
      },
      // the manifest maintainer — STATELESS (no StateStore/watermark
      // nodes), the O(0)-engine-state claim in StreamManifest's scaladoc
      "corpus_manifest_stream" -> { () =>
        val mem = MemoryStream[(Long, String, String)]
        val base = java.nio.file.Files
          .createTempDirectory("graft-manifest-twin").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-manifest-twin-ckpt").toString
        val q = StreamManifest.maintain(
          mem.toDS().toDF("doc_id", "text", "source"), base, ckpt)
        try {
          mem.addData((1L, "a b", "s"))
          q.processAllAvailable()
          val exec = q.asInstanceOf[StreamingQueryWrapper]
            .streamingQuery.lastExecution
          require(exec != null, "no micro-batch executed")
          outlineOf(exec.executedPlan)
        } finally q.stop()
      },
      // the online k-anonymity auditor — STATELESS like the manifest
      // maintainer (the versioned class-count merge is foreachBatch
      // work, not stream state)
      "k_anonymity_stream" -> { () =>
        val mem = MemoryStream[(Long, String, String, String)]
        val base = java.nio.file.Files
          .createTempDirectory("graft-kanon-twin").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-kanon-twin-ckpt").toString
        val q = StreamKAnonymity.maintain(
          mem.toDS().toDF("doc_id", "text", "lang", "source"), base, ckpt)
        try {
          mem.addData((1L, "a b", "en", "s"))
          q.processAllAvailable()
          val exec = q.asInstanceOf[StreamingQueryWrapper]
            .streamingQuery.lastExecution
          require(exec != null, "no micro-batch executed")
          outlineOf(exec.executedPlan)
        } finally {
          q.stop()
          cleanDirs(base, ckpt)
        }
      },
      "pca" -> { () =>
        val mem = MemoryStream[(Long, Array[Float])]
        run(StreamPca.projectionsOverStream(
          mem.toDS().toDF("vec_id", "embedding"),
          graft.sim.EmbedPca.Model(2, Array(0.0, 0.0),
            Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0)),
            Array(1.0, 1.0, 1.0, 1.0))),
          StreamPca.outputMode) { mem.addData((1L, Array(0.5f, 0.5f))) }
      },
      "shard_plan" -> { () =>
        val mem = MemoryStream[StreamShardPlan.DocIn]
        run(StreamShardPlan.placedOverStream(mem.toDS()).toDF(),
          StreamShardPlan.outputMode) {
          mem.addData(StreamShardPlan.DocIn("s", 1L, 10L))
        }
      },
      // foreachBatch twin: pins the micro-batch plan feeding the wave
      // miner — STATELESS (the standing corpus is a static relation,
      // not stream state; each wave's mining is batch work inside
      // foreachBatch)
      "bitext_waves" -> { () =>
        val mem = MemoryStream[(Long, String, Array[Float])]
        val cands = spark.range(1).selectExpr("2L AS doc_id",
          "'xx' AS lang", "array(0.5f, 0.5f) AS embedding")
        val base = java.nio.file.Files
          .createTempDirectory("graft-bitext-twin").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-bitext-twin-ckpt").toString
        val q = StreamBitext.mineWaves(
          mem.toDS().toDF("doc_id", "lang", "embedding"), cands, base, ckpt)
        try {
          mem.addData((1L, "en", Array(1f, 0f)))
          q.processAllAvailable()
          val exec = q.asInstanceOf[StreamingQueryWrapper]
            .streamingQuery.lastExecution
          require(exec != null, "no micro-batch executed")
          outlineOf(exec.executedPlan)
        } finally {
          q.stop()
          // the digest's wave output + checkpoint are side effects of
          // plan construction, not artifacts — remove them so repeated
          // digest runs don't accumulate garbage under the temp dir
          cleanDirs(base, ckpt)
        }
      },
      // the pruned production loop: standing candidates carry their
      // quantizer cell, each wave is masked to its queries' top-P probe
      // cells from the shipped centroid artifact
      "bitext_waves_multiprobe" -> { () =>
        val mem = MemoryStream[(Long, String, Array[Float])]
        val cands = spark.range(1).selectExpr("2L AS doc_id",
          "'xx' AS lang", "array(0.5f, 0.5f) AS embedding", "0 AS cell")
        val centers = Array(Array(1.0, 0.0), Array(0.0, 1.0))
        val base = java.nio.file.Files
          .createTempDirectory("graft-bitext-mp-twin").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-bitext-mp-twin-ckpt").toString
        val q = StreamBitext.mineWavesPruned(
          mem.toDS().toDF("doc_id", "lang", "embedding"), cands, centers,
          np = 1, base, ckpt)
        try {
          mem.addData((1L, "en", Array(1f, 0f)))
          q.processAllAvailable()
          val exec = q.asInstanceOf[StreamingQueryWrapper]
            .streamingQuery.lastExecution
          require(exec != null, "no micro-batch executed")
          outlineOf(exec.executedPlan)
        } finally {
          q.stop()
          cleanDirs(base, ckpt)
        }
      },
      // the tuned production loop: each candidate language mines at the
      // depth a tiny literal choice table assigns it (the shipped
      // bitext_probe_choice artifact stand-in)
      "bitext_waves_tuned" -> { () =>
        val mem = MemoryStream[(Long, String, Array[Float])]
        val cands = spark.range(1).selectExpr("2L AS doc_id",
          "'xx' AS lang", "array(0.5f, 0.5f) AS embedding", "0 AS cell")
        val centers = Array(Array(1.0, 0.0), Array(0.0, 1.0))
        val choice = spark.range(1)
          .selectExpr("'xx' AS lang", "2L AS nprobe")
        val base = java.nio.file.Files
          .createTempDirectory("graft-bitext-tn-twin").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-bitext-tn-twin-ckpt").toString
        val q = StreamBitext.mineWavesTuned(
          mem.toDS().toDF("doc_id", "lang", "embedding"), cands, centers,
          choice, base, ckpt)
        try {
          mem.addData((1L, "en", Array(1f, 0f)))
          q.processAllAvailable()
          val exec = q.asInstanceOf[StreamingQueryWrapper]
            .streamingQuery.lastExecution
          require(exec != null, "no micro-batch executed")
          outlineOf(exec.executedPlan)
        } finally {
          q.stop()
          cleanDirs(base, ckpt)
        }
      },
      // the fully-calibrated loop: both per-language dials from a tiny
      // literal stand-in of the shipped ChoiceModel artifact
      "bitext_waves_calibrated" -> { () =>
        val mem = MemoryStream[(Long, String, Array[Float])]
        val cands = spark.range(1).selectExpr("2L AS doc_id",
          "'xx' AS lang", "array(0.5f, 0.5f) AS embedding", "0 AS cell")
        val centers = Array(Array(1.0, 0.0), Array(0.0, 1.0))
        val dials = spark.range(1).selectExpr("'xx' AS tgt_lang",
          "2L AS chosen_probe", "1.05 AS chosen_threshold",
          "true AS met_target")
        val base = java.nio.file.Files
          .createTempDirectory("graft-bitext-cal-twin").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-bitext-cal-twin-ckpt").toString
        val q = StreamBitext.mineWavesCalibrated(
          mem.toDS().toDF("doc_id", "lang", "embedding"), cands, centers,
          dials, base, ckpt)
        try {
          mem.addData((1L, "en", Array(1f, 0f)))
          q.processAllAvailable()
          val exec = q.asInstanceOf[StreamingQueryWrapper]
            .streamingQuery.lastExecution
          require(exec != null, "no micro-batch executed")
          outlineOf(exec.executedPlan)
        } finally {
          q.stop()
          cleanDirs(base, ckpt)
        }
      })

    twins.map { case (n, f) => n -> f() }.sortBy(_._1)
  }

  /** Remove twin side-effect directories (wave outputs, checkpoints)
    * so repeated digest runs don't accumulate temp garbage. */
  private def cleanDirs(dirs: String*): Unit =
    dirs.foreach { d =>
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(root)) {
        val s = java.nio.file.Files.walk(root)
        try s.iterator().asScala.toSeq
          .reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
        finally s.close()
      }
    }

  // Lock I/O — same minimal JSON subset as PlanDigest (no JSON dep).
  private def esc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case c => sb += c; i += 2
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }

  def writeLock(spark: SparkSession, path: String): Unit = {
    val body = all(spark).map { case (name, outline) =>
      s"  ${esc(name)}: {\n    ${esc("outline")}: ${esc(outline)}\n  }"
    }.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
  }

  def readLock(path: String): Map[String, String] = {
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    // The outline VALUE is scanned by hand: a `(?:[^"\\]|\\.)*` regex
    // builds one backtracking frame per character and overflows the
    // stack once an outline (a whole physical plan) passes a few tens
    // of KB — the split_leakage twin's index plan got there first.
    val head = "\"([a-z0-9_]+)\":\\s*\\{\\s*\"outline\":\\s*\"".r
    val out = Map.newBuilder[String, String]
    head.findAllMatchIn(txt).foreach { m =>
      val sb = new StringBuilder
      var i = m.end
      var done = false
      while (!done && i < txt.length) {
        txt.charAt(i) match {
          case '\\' =>
            sb.append(txt.charAt(i)).append(txt.charAt(i + 1)); i += 2
          case '"' => done = true
          case c => sb.append(c); i += 1
        }
      }
      out += m.group(1) -> unesc(sb.toString)
    }
    out.result()
  }
}

/** Regenerate `plans_streaming.lock` (intentional changes only; the diff
  * in review is the approval record). Session shape mirrors the test
  * session so the spec reproduces the outlines. */
object StreamingPlanLockMain {
  def main(args: Array[String]): Unit = {
    val lockPath =
      if (args.nonEmpty) args(0) else StreamingPlanDigest.LockPath
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-planlock")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StreamingPlanDigest.writeLock(spark, lockPath)
    println(s"wrote $lockPath")
    spark.stop()
  }
}
