package graft.sim

import graft.Tables
import graft.sim.SimilarityQueries.dot
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid 2011, IVFADC family) —
  * the memory-compression leg of the ANN tier beside the coarse IVF
  * quantizer: the 64-dim float vector (256 B) collapses to one packed
  * 32-bit PQ code ([[M]]=8 subspaces × [[Ks]]=16 centroids = 4 bits
  * each), a 64× compression that is what makes billion-vector search
  * fit in RAM at 100 TB corpus scale.
  *
  * Same portability discipline as [[Ivf]]: training (per-subspace
  * k-means on the deterministic 1-in-[[Ivf.SampleMod]] sample of
  * L2-normalized vectors) is engine-private, but ENCODING is a pure
  * argmin over literal sub-centroids — for subvector x_m of an
  * L2-normalized x̂, d(x̂_m, c)² = const + (‖c‖² − 2·(x_m·c)/‖x‖), so
  * the code is the (score, k) argmin both engines evaluate
  * bit-identically, and the oracle inlines the trained codebook
  * literals after training. The ADC query ranks by a driver-computed
  * 8×16 lookup table inlined as array literals — the approximate
  * distance is a FIXED-ORDER chain of 8 additions (no aggregate, so no
  * summation-order hazard) — then exact-cosine re-ranks the top
  * [[RerankK]] candidates (the standard ADC + re-rank pipeline).
  * Encode is one projection (zero shuffle); the query is a
  * TakeOrdered over the scan. */
object Pq {

  val M = 8        // subspaces
  val Ds = 8       // dims per subspace (M * Ds = 64)
  val Ks = 16      // centroids per subspace (4-bit codes)
  val RerankK = 50 // ADC candidates re-ranked exactly
  val TopK = 5

  // one-slot memo, same policy as Ivf.assignments
  private var lastTrained:
    Option[((SparkSession, String, Long), (DataFrame, Array[Array[Array[Double]]]))] =
    None

  /** Train the product codebook and encode every vector: returns the
    * cached (vec_id, label, embedding, pq_code) relation and the
    * [[M]]×[[Ks]]×[[Ds]] codebook. */
  def encoded(s: SparkSession, dir: String):
      (DataFrame, Array[Array[Array[Double]]]) = synchronized {
    val key = (s, dir, Tables.sourceStamp(dir, "embeddings"))
    lastTrained match {
      case Some((k, v)) if k == key => v
      case prev =>
        prev.foreach(_._2._1.unpersist())
        val v = trainEncode(s, dir)
        lastTrained = Some((key, v))
        v
    }
  }

  def release(): Unit = synchronized {
    lastTrained.foreach(_._2._1.unpersist())
    lastTrained = None
  }

  private def trainEncode(s: SparkSession, dir: String):
      (DataFrame, Array[Array[Array[Double]]]) = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings")
    // L2-normalized subvectors, one row per (vec, subspace) — trains all
    // M sub-quantizers from one cached pass
    val subs = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        val d = emb.map(_.toDouble)
        val n = math.sqrt(d.map(x => x * x).sum)
        val nd = if (n == 0.0) d else d.map(_ / n)
        (0 until M).map(m =>
          (id, m, Vectors.dense(nd.slice(m * Ds, (m + 1) * Ds))))
      }
      .toDF("vec_id", "m", "features")
      .filter(pmod(col("vec_id"), lit(Ivf.SampleMod)) === 0)
      .cache()
    subs.count() // force the shared sample cache once, before the fits race
    // One aggregation decides the tiny-fixture fallback for ALL M
    // subspaces (was a per-m limit().count() — 8 driver-bound jobs on
    // the warm path that always answered "big enough" at bench SFs).
    // The sample is 1-in-SampleMod of vectors × one row per subspace,
    // so every m has the same sample count: one count() suffices.
    val samplePerM = subs.filter(col("m") === 0).count()
    // The M sub-quantizer fits are INDEPENDENT (disjoint `m` slices, per-m
    // seeds) — overlap them via the shared pool helper (optimization guide
    // §2.6: concurrent driver actions back-fill executors idled by each
    // fit's per-iteration job tail; graft.Pools adds the bounded wait +
    // job-group cancellation the round-13 advisor asked for). Results are
    // bit-identical to the sequential loop: same slice, same seed per m.
    val codebook = graft.Pools.runAll(s, "pq-fits")((0 until M).map { m => () =>
      val trainSet =
        if (samplePerM >= Ks * 4L) subs.filter(col("m") === m)
        else {
          // tiny-fixture fallback: widen to every vector's m-th slice
          e.select(col("vec_id"), col("embedding"))
            .as[(Long, Array[Float])]
            .map { case (_, emb) =>
              val d = emb.map(_.toDouble)
              val n = math.sqrt(d.map(x => x * x).sum)
              val nd = if (n == 0.0) d else d.map(_ / n)
              Tuple1(Vectors.dense(nd.slice(m * Ds, (m + 1) * Ds)))
            }.toDF("features")
        }
      new KMeans()
        .setK(Ks).setSeed(1000L + m).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("code")
        .fit(trainSet)
        .clusterCenters.map(_.toArray)
    }).toArray
    subs.unpersist()
    // encode through the portable literal argmin (not model.transform)
    val enc = e.select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("pq_code", packedCode(codebook))
      .cache()
    enc.count()
    (enc, codebook)
  }

  /** Per-subspace scores (‖c‖² − 2·(x_m·c)/‖x‖) for subspace `m`. */
  private def subScores(cents: Array[Array[Double]], m: Int): Array[Column] = {
    val xn = sqrt(dot(col("embedding"), col("embedding")))
    val xm = slice(col("embedding"), m * Ds + 1, Ds)
    cents.map { c =>
      val c2 = c.map(x => x * x).sum
      lit(c2) - lit(2.0) * dot(xm, array(c.map(lit).toSeq: _*)) / xn
    }
  }

  /** Argmin code for subspace `m`, ties to the smallest k (the same
    * when-chain as [[Ivf]]'s cellExpr). */
  private def codeExpr(cents: Array[Array[Double]], m: Int): Column = {
    val scores = subScores(cents, m)
    val mn = least(scores.toSeq: _*)
    scores.zipWithIndex.tail
      .foldLeft(when(scores(0) === mn, 0)) { case (acc, (sc, k)) =>
        acc.when(sc === mn, k)
      }
  }

  /** The packed [[M]]×4-bit code expression for a codebook — shared by
    * the trainer's encode and [[PqModel]]'s reloaded-codebook encode. */
  private[sim] def packedCode(codebook: Array[Array[Array[Double]]]): Column =
    (0 until M).map { m =>
      shiftleft(codeExpr(codebook(m), m).cast("long"), 4 * m)
    }.reduceLeft(_ + _)

  /** Gate query: every vector's packed PQ code. */
  def pqEncode(s: SparkSession, dir: String): DataFrame = {
    val (enc, codebook) = encoded(s, dir)
    synchronized { lastEncodeOracle = Some(encodeOracleSql(codebook)) }
    enc.select(col("vec_id"), col("label"), col("pq_code"))
  }

  /** Gate query: ADC top-[[RerankK]] candidates for query vec 0, exact
    * cosine re-rank to top-[[TopK]]. */
  def pqTopk(s: SparkSession, dir: String): DataFrame = {
    val (enc, codebook) = encoded(s, dir)
    val qnd = queryVec(s, enc)
    val lut = lutFor(codebook, qnd)
    synchronized { lastTopkOracle = Some(topkOracleSql(codebook, lut)) }
    adcQuery(enc, lut)
  }

  /** L2-normalized query embedding (vec 0) — one driver-side head(). */
  private[sim] def queryVec(s: SparkSession, enc: DataFrame): Array[Double] = {
    import s.implicits._
    val q = enc.filter(col("vec_id") === 0)
      .select(col("embedding")).as[Array[Float]].head()
    val qd = q.map(_.toDouble)
    val qn = math.sqrt(qd.map(x => x * x).sum)
    if (qn == 0.0) qd else qd.map(_ / qn)
  }

  /** LUT[m][k] = ‖c‖² − 2·(q̂_m·c): adc(x) = Σ_m LUT[m][code_m(x)]
    * ranks ‖q̂ − x̃‖² up to the constant ‖q̂‖² = 1. */
  private[sim] def lutFor(codebook: Array[Array[Array[Double]]],
      qnd: Array[Double]): Array[Array[Double]] =
    (0 until M).map { m =>
      codebook(m).map { c =>
        val qm = qnd.slice(m * Ds, (m + 1) * Ds)
        c.map(x => x * x).sum - 2.0 * qm.zip(c).map { case (a, b) => a * b }.sum
      }
    }.toArray

  /** ADC candidate scan + exact re-rank over an encoded relation —
    * shared with [[PqModel]]'s reloaded-codebook replay. */
  private[sim] def adcQuery(enc: DataFrame,
      lut: Array[Array[Double]]): DataFrame = {
    val adc = (0 until M).map { m =>
      element_at(array(lut(m).map(lit).toSeq: _*),
        (shiftright(col("pq_code"), 4 * m).bitwiseAND(lit(15L)) + 1L)
          .cast("int"))
    }.reduceLeft(_ + _)
    val qe = enc.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qnc"))
    enc.filter(col("vec_id") =!= 0)
      .withColumn("adc", adc)
      .orderBy(asc("adc"), asc("vec_id"))
      .limit(RerankK)
      .crossJoin(broadcast(qe))
      .withColumn("cos",
        dot(col("embedding"), col("qe")) /
          (sqrt(dot(col("embedding"), col("embedding"))) * col("qnc")))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(TopK)
      .select(col("vec_id"), col("label"),
        round(col("adc"), 6).as("adc"),
        round(col("cos"), 4).as("cosine"))
  }

  private var lastEncodeOracle: Option[String] = None
  private var lastTopkOracle: Option[String] = None

  private def fmtD(d: Double): String = java.lang.Double.toString(d)

  /** (m, k, c2, c) codebook VALUES rows. */
  private def cbRows(codebook: Array[Array[Array[Double]]]): String =
    (for (m <- 0 until M; k <- 0 until Ks) yield {
      val c = codebook(m)(k)
      s"($m, $k, ${fmtD(c.map(x => x * x).sum)}, " +
        s"[${c.map(fmtD).mkString(", ")}]::DOUBLE[])"
    }).mkString(",\n    ")

  /** Sub-slice dot: Σ_i embedding[m·Ds+i]·c[i] (same order as ArrayDot). */
  private def sqlSubDot(emb: String, m: String, c: String): String =
    s"list_sum(list_transform(range(1, $Ds + 1), " +
      s"i -> $emb[$m * $Ds + i]::DOUBLE * $c[i]::DOUBLE))"

  private def codesCte(codebook: Array[Array[Array[Double]]]): String =
    s"""cb(m, k, c2, c) AS (VALUES
       |    ${cbRows(codebook)}),
       |sc AS (SELECT e.vec_id, e.label, cb.m, cb.k,
       |         cb.c2 - 2 * (${sqlSubDot("e.embedding", "cb.m", "cb.c")})
       |           / sqrt(${SimilarityQueries.sqlDot("e.embedding", "e.embedding")})
       |           AS score
       |       FROM embeddings e CROSS JOIN cb),
       |codes AS (SELECT vec_id, label,
       |          sum(k * (1::BIGINT << (4 * m)))::BIGINT AS pq_code
       |        FROM (SELECT *, row_number() OVER (
       |                PARTITION BY vec_id, m ORDER BY score ASC, k ASC) AS rn
       |              FROM sc)
       |        WHERE rn = 1 GROUP BY vec_id, label)""".stripMargin

  private def encodeOracleSql(codebook: Array[Array[Array[Double]]]): String =
    s"""WITH ${codesCte(codebook)}
       |SELECT vec_id, label, pq_code FROM codes""".stripMargin

  private[sim] def topkOracleSql(codebook: Array[Array[Array[Double]]],
      lut: Array[Array[Double]]): String = {
    // fixed-order addition chain, matching the Spark expression exactly
    val adc = (0 until M).map { m =>
      s"([${lut(m).map(fmtD).mkString(", ")}]::DOUBLE[])" +
        s"[((pq_code >> ${4 * m}) & 15) + 1]"
    }.mkString("\n    + ")
    s"""WITH ${codesCte(codebook)},
       |cand AS (SELECT vec_id, label, pq_code,
       |    $adc AS adc
       |  FROM codes WHERE vec_id <> 0
       |  ORDER BY adc ASC, vec_id ASC LIMIT $RerankK),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |d AS (SELECT c.vec_id, c.label, c.adc,
       |  ${SimilarityQueries.sqlDot("e.embedding", "qe")} AS dp,
       |  ${SimilarityQueries.sqlDot("e.embedding", "e.embedding")} AS na,
       |  ${SimilarityQueries.sqlDot("qe", "qe")} AS nq
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN q)
       |SELECT vec_id, label, round(adc, 6) AS adc,
       |  round(dp / (sqrt(na) * sqrt(nq)), 4) AS cosine
       |FROM d ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC
       |LIMIT $TopK""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pq_encode" -> pqEncode,
    "pq_topk" -> pqTopk)

  def oracles: Map[String, String] = {
    val a = synchronized(lastEncodeOracle) match {
      case Some(sql) => Map("pq_encode" -> sql)
      case None => Map.empty[String, String]
    }
    synchronized(lastTopkOracle) match {
      case Some(sql) => a + ("pq_topk" -> sql)
      case None => a
    }
  }
}
