package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-language mining-dial persistence — the sixth leg of the
  * model-artifact lifecycle ([[IvfModel]] centroids, [[PqModel]]
  * codebooks, [[graft.text.BpeModel]] merges, [[graft.text
  * .QualityModel]] weights, [[PcaModel]] moments): the probe-depth and
  * margin-threshold tables ([[BitextMine.bitextProbeChoice]] /
  * [[BitextMine.bitextThresholdChoice]]) are exactly the per-language
  * configuration a production miner ships NEXT TO the quantizer
  * (CCMatrix tunes both per pair), so they get the same versioned,
  * checksummed, rollback-proven treatment. The gate derives both dials,
  * writes them as one index-keyed parquet artifact beside a checksummed
  * manifest (language count, the recall target the depths were chosen
  * against, the sweep thresholds, and a sha over the canonical
  * serialization), reloads the newest committed valid version
  * ([[graft.sources.ModelStore]]), and emits the RELOADED table against
  * an oracle that re-derives both dials from scratch — hash-green ⇔ the
  * storage round trip preserved every depth and threshold exactly.
  *
  * Scale: the artifact is languages × one row (strings + a long + a
  * double + a bool) — trivially broadcast to any fleet; deriving the
  * dials rides the memoized certification relations. */
object ChoiceModel {

  def modelDir(dir: String): String =
    graft.sources.ModelStore.modelDir("bitext_choice", dir)

  private def fmtD(d: Double): String = java.lang.Double.toString(d)

  /** Language-keyed canonical checksum — any corrupted depth, flipped
    * threshold, dropped language, or toggled calibration flag changes
    * the string. */
  def choiceSha(rows: Seq[(String, Long, Double, Boolean)]): String = {
    val canon = rows.sortBy(_._1)
      .map { case (l, p, t, m) => s"$l:$p:${fmtD(t)}:$m" }.mkString(";")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Write one artifact version. `quantizerSha` BINDS the dials to the
    * quantizer they were certified against ([[IvfModel.centroidSha]] of
    * the centers the certification sweep actually probed): a dial table
    * is only meaningful for the index it was tuned on, so the sha rides
    * the manifest and [[readLatestValid]] refuses versions certified on
    * a different (e.g. since-retrained) quantizer. */
  def writeModel(s: SparkSession, path: String,
                 rows: Seq[(String, Long, Double, Boolean)],
                 quantizerSha: String): Unit = {
    import s.implicits._
    rows.toDF("tgt_lang", "chosen_probe", "chosen_threshold", "met_target")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/dials")
    Seq((rows.length,
        BitextMine.RecallTargetNum, BitextMine.RecallTargetDen,
        BitextMine.CurveThresholds.mkString(","), choiceSha(rows),
        quantizerSha))
      .toDF("n_langs", "recall_num", "recall_den", "sweep", "choice_sha",
        "quantizer_sha")
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** One read of a version: (rows sorted by language, manifest_ok,
    * quantizer_sha) — exactly one dials read + one manifest read, the
    * unit [[readLatestValid]]'s walk issues per probed version. */
  private def readFull(s: SparkSession, path: String):
      (Seq[(String, Long, Double, Boolean)], Boolean, String) = {
    // decode by NAME, not position — a column reorder in a future
    // writeModel must fail checksum validation, never silently swap
    // fields into the wrong dial
    val rows = s.read.parquet(s"$path/dials")
      .select("tgt_lang", "chosen_probe", "chosen_threshold", "met_target")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val mf = s.read.parquet(s"$path/manifest").head()
    val ok = mf.getAs[String]("choice_sha") == choiceSha(rows) &&
      mf.getAs[Int]("n_langs") == rows.length &&
      mf.getAs[Long]("recall_num") == BitextMine.RecallTargetNum &&
      mf.getAs[Long]("recall_den") == BitextMine.RecallTargetDen &&
      mf.getAs[String]("sweep") == BitextMine.CurveThresholds.mkString(",")
    (rows, ok, mf.getAs[String]("quantizer_sha"))
  }

  /** Reload + verify. Returns (rows sorted by language, manifest_ok). */
  def readModel(s: SparkSession, path: String):
      (Seq[(String, Long, Double, Boolean)], Boolean) = {
    val (rows, ok, _) = readFull(s, path)
    (rows, ok)
  }

  /** Newest committed, manifest-valid version (the IvfModel rollback
    * discipline). When `quantizerSha` is given, a version is valid ONLY
    * if it was certified against THAT quantizer — a dial artifact that
    * predates a quantizer retrain is stale (its depths/thresholds were
    * swept on another geometry) and silently mis-probes the new index,
    * so the walk skips it exactly like a torn write: an OLDER matching
    * version keeps serving, and if none matches the reload fails loudly
    * (re-certify before mining). */
  def readLatestValid(s: SparkSession, base: String,
                      quantizerSha: Option[String] = None):
      (Int, Seq[(String, Long, Double, Boolean)], Boolean) = {
    // the walk's predicate CAPTURES its read, so the winning version is
    // decoded exactly once (the walk stops at the first valid version,
    // so the last capture IS the winner) — no re-read of dials or
    // manifest after the walk returns
    var hit: Option[(Seq[(String, Long, Double, Boolean)], Boolean)] = None
    val (v, _) = graft.sources.ModelStore.latestValid(base, { p =>
      val (rows, ok, qsha) = readFull(s, p)
      val valid = ok && quantizerSha.forall(_ == qsha)
      if (valid) hit = Some((rows, ok))
      valid
    })
      .getOrElse(sys.error(s"no valid committed model under $base" +
        quantizerSha.fold("")(q => s" certified against quantizer $q — " +
          "re-run the certification sweep against the current index")))
    val (rows, ok) = hit.get
    (v, rows, ok)
  }

  /** Gate: derive both dials (memo-riding) → versioned write → reload
    * latest valid → emit the RELOADED table, oracled against a from-
    * scratch re-derivation of both dials. */
  def bitextChoiceRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val trained = BitextMine.bitextProbeChoice(s, dir)
      .select(col("tgt_lang"), col("chosen_probe"))
      .join(BitextMine.bitextThresholdChoice(s, dir)
        .select(col("tgt_lang"), col("chosen_threshold"),
          col("met_target")), "tgt_lang")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val base = modelDir(dir)
    // the quantizer the certification sweep actually probed (set by the
    // memoized assignment join the probe-choice derivation rides) —
    // bound into the manifest and demanded back at reload, so a dial
    // version certified on a since-retrained index can never serve
    val qsha = IvfModel.centroidSha(BitextMine.centersNow.getOrElse(
      sys.error("choice derivation did not train a quantizer")))
    graft.sources.ModelStore.write(base,
      p => writeModel(s, p, trained, qsha))
    val (_, reloaded, ok) = readLatestValid(s, base, Some(qsha))
    synchronized {
      lastOracle = Some(BitextMine.dialsSql(BitextMine.centersNow.get))
    }
    reloaded
      .toDF("tgt_lang", "chosen_probe", "chosen_threshold", "met_target")
      .withColumn("manifest_ok", lit(ok))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bitext_choice_roundtrip" -> bitextChoiceRoundtrip)

  private var lastOracle: Option[String] = None

  def oracles: Map[String, String] = synchronized(lastOracle) match {
    case Some(sql) => Map("bitext_choice_roundtrip" -> sql)
    case None => Map.empty
  }
}
