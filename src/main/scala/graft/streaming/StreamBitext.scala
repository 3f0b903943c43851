package graft.streaming

import graft.sim.BitextMine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of the bitext miner — the production mining LOOP made
  * literal: source-language documents arrive in micro-batches (each
  * micro-batch IS one mining wave, exactly the bounded batch unit the
  * batch gate models with its QMod/QCap slice) and every wave is mined
  * against the standing candidate corpus with the batch pipeline
  * VERBATIM ([[BitextMine.mineWave]] — shared code, not a twin
  * reimplementation). `foreachBatch` is the right face because a wave's
  * margins are intentionally wave-relative (the y-penalty is each
  * candidate's density over THIS batch — the Artetxe & Schwenk batched
  * shape), so the stream/batch law is per-wave equivalence:
  * each micro-batch's mined output equals `mineWave(batch, candidates)`
  * run in batch mode — `StreamBitextSpec` proves it wave by wave.
  *
  * Scale: per wave, the candidate corpus is scanned once behind the
  * broadcast wave row (zero shuffle until the pair explode); engine
  * streaming state is O(0) — the standing corpus is a static relation,
  * not stream state (the [[StreamManifest]] discipline). */
object StreamBitext {

  /** Start mining waves: each micro-batch of `(doc_id, lang, embedding)`
    * source docs is mined against `candidates` (a STATIC
    * `(doc_id, lang, embedding)` relation, pre-filtered to non-source
    * languages) and the wave's mined pairs land as one parquet
    * directory `base/wave=<batchId>` — the shipped-artifact sink, and
    * replay-idempotent: a retried batch overwrites ITS OWN wave
    * directory only (the [[StreamManifest]] versioned-write
    * discipline). */
  def mineWaves(waves: DataFrame, candidates: DataFrame,
                base: String, checkpoint: String): StreamingQuery =
    waves.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BitextMine.mineWave(batch, candidates, useCell = false)
          .filter(org.apache.spark.sql.functions.col("margin") >=
            BitextMine.MarginThresh)
          .write.mode("overwrite").parquet(s"$base/wave=$batchId")
        ()
      }
      .start()

  /** The PRUNED mining loop — the regime that actually runs at 100 TB:
    * the standing candidate corpus carries its quantizer `cell`
    * assignment (a one-off batch job against the shipped
    * [[graft.sim.IvfModel]] artifact) and each wave is masked to its
    * queries' top-`np` probe cells via
    * [[BitextMine.mineWavePruned]] — shared code with the
    * `bitext_mine_multiprobe` gate, proven wave ≡ batch in
    * StreamBitextSpec. Per wave: one candidate scan behind the
    * broadcast wave row, pair cost np/cells of brute; engine streaming
    * state O(0). */
  def mineWavesPruned(waves: DataFrame, candidatesWithCell: DataFrame,
                      centers: Array[Array[Double]], np: Int,
                      base: String, checkpoint: String): StreamingQuery =
    waves.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BitextMine.mineWavePruned(batch, candidatesWithCell, centers, np)
          .filter(org.apache.spark.sql.functions.col("margin") >=
            BitextMine.MarginThresh)
          .write.mode("overwrite").parquet(s"$base/wave=$batchId")
        ()
      }
      .start()

  /** The TUNED mining loop — the pruned loop with the per-language
    * probe-depth table `choice(lang, nprobe)` consumed instead of a
    * fixed global depth ([[BitextMine.mineWaveChosen]] — shared code
    * with the `bitext_mine_tuned` gate): each wave retrieves every
    * candidate language at its certified minimal depth, so wave pair
    * cost is Σ_lang P(lang)/cells of brute. The choice table is the
    * artifact `bitext_probe_choice` certifies, shipped next to the
    * quantizer exactly like the centroid array. */
  def mineWavesTuned(waves: DataFrame, candidatesWithCell: DataFrame,
                     centers: Array[Array[Double]], choice: DataFrame,
                     base: String, checkpoint: String): StreamingQuery =
    waves.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BitextMine.mineWaveChosen(batch, candidatesWithCell, centers, choice)
          .filter(org.apache.spark.sql.functions.col("margin") >=
            BitextMine.MarginThresh)
          .write.mode("overwrite").parquet(s"$base/wave=$batchId")
        ()
      }
      .start()

  /** The FULLY-calibrated mining loop — both per-language dials consumed
    * from the shipped artifact ([[graft.sim.ChoiceModel]]'s reloaded
    * `dials(tgt_lang, chosen_probe, chosen_threshold, met_target)`
    * table): each wave retrieves every candidate language at its
    * certified depth and cuts pairs at that language's calibrated
    * threshold instead of the global default — the streaming face of
    * `bitext_mine_calibrated`, shared code end to end. */
  def mineWavesCalibrated(waves: DataFrame, candidatesWithCell: DataFrame,
                          centers: Array[Array[Double]], dials: DataFrame,
                          base: String, checkpoint: String): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val probe = dials.select(col("tgt_lang").as("lang"),
      col("chosen_probe").as("nprobe"))
    val thresh = dials.select(col("tgt_lang"), col("chosen_threshold"))
    waves.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // applyThresholds (shared with the batch gate's fallback law)
        // degrades an uncertified language to the GLOBAL threshold —
        // mirroring mineWaveChosen's depth fallback; an inner join here
        // would silently drop every pair of a language the dial
        // artifact predates
        BitextMine.applyThresholds(
            BitextMine.mineWaveChosen(batch, candidatesWithCell, centers,
              probe), thresh)
          .write.mode("overwrite").parquet(s"$base/wave=$batchId")
        ()
      }
      .start()
  }
}
