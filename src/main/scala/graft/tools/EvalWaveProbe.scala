package graft.tools

import graft.sim.BitextMine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures `bitext_decontam`'s cost along the EVAL-WAVE axis — the one
  * axis the ×10/×30 corpus replicas never exercise (they replicate
  * candidates while the eval slice stays fixed at `DecontamEvalDocs`).
  * The decontam wave is exhaustive BY DESIGN (a missed translation is
  * eval leakage), so its cost law is |eval| × |candidates|; this probe
  * holds the candidate corpus fixed and mines eval waves of ×1/×4/×10
  * the standard slice, printing one JSON line per wave with wall secs
  * and exact shuffle bytes/records (the [[graft.ShuffleByGroup]]
  * discipline). SCALE.md records the measured law.
  *
  * `sbt "runMain graft.tools.EvalWaveProbe /root/testdata/sf0.1"`
  */
object EvalWaveProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EvalWaveProbe <sfDir> [waveMultipliers…]")
    val dir = args.head
    val mults =
      if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-eval-wave-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm-up
    val shuffle = new graft.ShuffleByGroup
    spark.sparkContext.addSparkListener(shuffle)

    val dv = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .join(graft.Tables(spark, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    val cands = dv.filter(col("lang") =!= BitextMine.SrcLang)
      .localCheckpoint(true)
    val nCand = cands.count()
    val en = dv.filter(col("lang") === BitextMine.SrcLang)
      .localCheckpoint(true)
    // ×1 = the gate's own eval slice size; larger waves take the first
    // k×base en docs by id (the same docs plus their successors, so
    // each wave contains the previous one)
    val base = en.filter(col("doc_id") <
      graft.dedup.DedupQueries.DecontamEvalDocs).count().toInt.max(1)

    mults.foreach { k =>
      val w = base * k
      val wave = en.orderBy("doc_id").limit(w).localCheckpoint(true)
      val nWave = wave.count()
      val t0 = System.nanoTime()
      var flagged = -1L
      shuffle.measure(spark.sparkContext, s"wave$k") {
        flagged = BitextMine.mineWave(wave, cands, useCell = false)
          .filter(col("margin") >= BitextMine.MarginThresh)
          .count()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      shuffle.drain()
      println(f"""{"wave_mult":$k,"n_wave":$nWave,"n_cand":$nCand,""" +
        f""""pairs":${nWave * nCand},"flagged":$flagged,""" +
        f""""sec":$sec%.2f,"shuffle_mb":${shuffle.mbOf(s"wave$k")}%.2f,""" +
        f""""shuffle_rec":${shuffle.recOf(s"wave$k")}%d}""")
    }
    spark.stop()
  }
}
