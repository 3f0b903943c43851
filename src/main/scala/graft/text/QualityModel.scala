package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality-classifier weight persistence — the fourth leg of the
  * model-artifact lifecycle ([[graft.sim.IvfModel]] centroids,
  * [[graft.sim.PqModel]] codebooks, [[BpeModel]] merges): through round
  * 10 the distilled quality probe's weights lived only in the
  * in-session memo, so a scoring fleet could not exist without
  * retraining per session. The gate writes the 6 ridge weights
  * (intercept first) as an index-keyed parquet artifact beside a
  * checksummed manifest (feature count, the training λ and decision
  * threshold — the hyperparameters a scorer must agree on — and the
  * sha over the shortest-round-trip decimal serialization), reloads the
  * newest committed valid version ([[graft.sources.ModelStore]]), and
  * re-scores the corpus with the RELOADED weights against an oracle
  * built from the TRAINED ones — hash-green ⇔ the storage round trip
  * preserved every weight to the ulp (the score is a multiply-add chain
  * over those exact doubles; one lost bit moves a z past the rounding
  * or the threshold somewhere in the corpus).
  *
  * Scale: the artifact is 6 doubles + a manifest row — the cheapest
  * possible ship-to-1000-executors payload; scoring is the standard
  * zero-shuffle literal projection. */
object QualityModel {

  def modelDir(dir: String): String =
    graft.sources.ModelStore.modelDir("quality_model", dir)

  private def fmtD(d: Double): String = java.lang.Double.toString(d)

  /** Index-keyed shortest-round-trip decimal checksum — any corrupted
    * coefficient, reorder, or dropped row changes the string. */
  def weightsSha(w: Array[Double]): String = {
    val canon = w.zipWithIndex
      .map { case (x, i) => s"$i:${fmtD(x)}" }.mkString(";")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  def writeModel(s: SparkSession, path: String, w: Array[Double]): Unit = {
    import s.implicits._
    w.zipWithIndex.map { case (x, i) => (i, x) }.toSeq
      .toDF("i", "w")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/weights")
    Seq((w.length, QualityClassifier.Lambda, QualityClassifier.Threshold,
        weightsSha(w)))
      .toDF("n_weights", "lambda", "threshold", "weights_sha")
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Reload + verify. Returns (weights intercept-first, manifest_ok). */
  def readModel(s: SparkSession, path: String): (Array[Double], Boolean) = {
    val w = s.read.parquet(s"$path/weights").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    val mf = s.read.parquet(s"$path/manifest").head()
    val ok = mf.getAs[String]("weights_sha") == weightsSha(w) &&
      mf.getAs[Int]("n_weights") == w.length &&
      mf.getAs[Double]("lambda") == QualityClassifier.Lambda &&
      mf.getAs[Double]("threshold") == QualityClassifier.Threshold
    (w, ok)
  }

  /** Newest committed, manifest-valid version (the IvfModel rollback
    * discipline). */
  def readLatestValid(s: SparkSession, base: String):
      (Int, Array[Double], Boolean) = {
    // the walk's predicate CAPTURES its read (the ChoiceModel pattern):
    // the walk stops at the first valid version, so the last capture IS
    // the winner — no second parquet parse of weights + manifest
    var hit: Option[(Array[Double], Boolean)] = None
    val (v, _) = graft.sources.ModelStore.latestValid(base, { p =>
      val r = readModel(s, p)
      if (r._2) hit = Some(r)
      r._2
    }).getOrElse(sys.error(s"no valid committed model under $base"))
    val (w, ok) = hit.get
    (v, w, ok)
  }

  /** Gate: train (memoized) → versioned write → reload latest valid →
    * re-score the corpus from the RELOADED weights, oracled against the
    * trained ones. */
  def qualityModelRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val trained = QualityClassifier.weights(s, dir)
    val base = modelDir(dir)
    graft.sources.ModelStore.write(base, p => writeModel(s, p, trained))
    val (_, reloaded, ok) = readLatestValid(s, base)
    synchronized {
      lastOracle = Some(
        s"""${QualityClassifier.scoredCtes(trained)}
          |SELECT doc_id, label, round(z, 4) AS score,
          |  (z >= ${QualityClassifier.Threshold}) AS pred,
          |  ${trained.length}::BIGINT AS n_weights, TRUE AS manifest_ok
          |FROM s""".stripMargin)
    }
    QualityClassifier.scoreWith(Tables.parallel(s, dir, "documents"), reloaded)
      .withColumn("n_weights", lit(reloaded.length.toLong))
      .withColumn("manifest_ok", lit(ok))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_model_roundtrip" -> qualityModelRoundtrip)

  private var lastOracle: Option[String] = None

  def oracles: Map[String, String] = synchronized(lastOracle) match {
    case Some(sql) => Map("quality_model_roundtrip" -> sql)
    case None => Map.empty
  }
}
