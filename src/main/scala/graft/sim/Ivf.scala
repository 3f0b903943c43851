package graft.sim

import graft.Tables
import graft.sim.SimilarityQueries.dot
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path next to the LSH variant: k-means partitions the vector space
  * into `NLists` cells, every vector is assigned to its nearest centroid,
  * and a query compares against the NLists centroids only (driver-side,
  * O(NLists)) to pick `NProbe` cells, then exact-cosine re-ranks just those
  * cells' members — scanning ~NProbe/NLists of the corpus. At 10⁹ vectors
  * the assignment is a one-off batch job and the probe is a partition-
  * pruned scan when the table is written partitioned by cell.
  *
  * The approximate query (`ivf_topk`) has no SQL oracle (k-means cells are
  * not reproducible in DuckDB) — the driver records a rows-only check and
  * `IvfSpec` asserts recall against the exact top-k. The probe-ALL variant
  * (`ivf_topk_probeall`, nprobe = NLists) scans every cell and therefore
  * IS the brute-force top-k, so it carries a full DuckDB hash oracle —
  * the IVF machinery's correctness bound, gate-checked.
  */
object Ivf {

  val NLists = 16
  val NProbe = 4
  val TopK = 5

  /** Train the coarse quantizer on a deterministic 1-in-SampleMod subset
    * (`vec_id % SampleMod == 0`): centroids fitted on a uniform sample are
    * statistically identical to full-corpus centroids, and fitting is the
    * dominant cost — assignment and the probe path still cover every
    * vector. Deterministic (vs `df.sample`): immune to partitioning. */
  val SampleMod = 5

  // memoize the most recent quantizer only (the usual working set is one
  // corpus; a bounded slot avoids pinning stopped sessions/stale dirs and
  // the synchronization avoids concurrent duplicate training)
  private var lastTrained:
    Option[((SparkSession, String), (DataFrame, Array[Array[Double]]))] = None

  /** Train the coarse quantizer and assign every vector to a cell
    * (memoized per most-recent (session, dir); the assignment DataFrame is
    * cached once and unpersisted on eviction). */
  def assignments(s: SparkSession, dir: String):
      (DataFrame, Array[Array[Double]]) = synchronized {
    lastTrained match {
      case Some((k, v)) if k == (s, dir) => v
      case prev =>
        prev.foreach(_._2._1.unpersist())
        val v = trainAssignments(s, dir)
        lastTrained = Some(((s, dir), v))
        v
    }
  }

  private def trainAssignments(s: SparkSession, dir: String):
      (DataFrame, Array[Array[Double]]) = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings")
    val features = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, emb) =>
        // L2-normalize so Euclidean k-means approximates spherical k-means —
        // cells then align with the cosine geometry the probe uses
        val d = emb.map(_.toDouble)
        val n = math.sqrt(d.map(x => x * x).sum)
        (id, Vectors.dense(if (n == 0.0) d else d.map(_ / n)))
      }
      .toDF("vec_id", "features")
      .cache() // read once, feed both fit (sampled) and transform (full)
    val sampled = features.filter(pmod(col("vec_id"), lit(SampleMod)) === 0)
    // tiny fixtures can undersample k-means below NLists points — fall back
    // to the full set there; at scale the sample always dominates NLists
    val trainSet =
      if (sampled.limit(NLists * 4).count() >= NLists * 4L) sampled
      else features
    val model = new KMeans()
      .setK(NLists).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(trainSet)
    val assigned = e
      .join(model.transform(features).select("vec_id", "cell"), "vec_id")
      .cache()
    assigned.count() // materialize before dropping the feature cache
    features.unpersist()
    (assigned, model.clusterCenters.map(_.toArray))
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Top-5 cosine neighbors of vec_id 0, probing the `nprobe` cells whose
    * centroids are nearest the query (the IVF query path). Recall scales
    * with nprobe/NLists times the corpus's cluster structure — uniform
    * random vectors (this testdata) are the worst case; real embedding
    * corpora concentrate neighbors in few cells. */
  def ivfTopk(s: SparkSession, dir: String): DataFrame =
    ivfTopkProbing(s, dir, NProbe)

  def ivfTopkProbing(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val (assigned, centers) = assignments(s, dir)
    import s.implicits._
    val qEmb = assigned.filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head().map(_.toDouble)
    // O(NLists) centroid comparison picks the probe set
    val probeCells = centers.zipWithIndex
      .map { case (ctr, i) => (cosine(qEmb, ctr), i) }
      .sortBy(-_._1).take(nprobe).map(_._2)
    val q = assigned.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    assigned
      .filter(col("vec_id") =!= 0 && col("cell").isin(probeCells.toSeq: _*))
      .crossJoin(broadcast(q))
      .withColumn("cos",
        dot(col("embedding"), col("qe")) /
          (sqrt(dot(col("embedding"), col("embedding"))) * col("qn")))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(TopK)
      .select(col("vec_id"), col("label"), col("cell"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Probe-all gate query: nprobe = NLists ⇒ exhaustive scan ⇒ exactly the
    * brute-force cosine top-k, minus the `cell` column (which is k-means
    * dependent and not oracle-reproducible). */
  def ivfTopkProbeAll(s: SparkSession, dir: String): DataFrame =
    ivfTopkProbing(s, dir, NLists).drop("cell")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ivf_topk" -> ivfTopk, // rows-only (approximate; see scaladoc)
    "ivf_topk_probeall" -> ivfTopkProbeAll)

  val oracles: Map[String, String] = Map(
    "ivf_topk_probeall" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT vec_id, label,
        |  ${SimilarityQueries.sqlDot("embedding", "qe")} AS dp,
        |  ${SimilarityQueries.sqlDot("embedding", "embedding")} AS na,
        |  ${SimilarityQueries.sqlDot("qe", "qe")} AS nq
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT vec_id, label,
        |  round(dp / (sqrt(na) * sqrt(nq)), 4) AS cosine
        |FROM d ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC
        |LIMIT $TopK""".stripMargin)
}
