package graft.functions

import graft.SparkTestSession
import graft.operators.ZOrder
import graft.text.Winnow
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the sketch/fingerprint/layout operators: KMV accuracy,
  * exactness below k, and partitioning-independence (the mergeability
  * witness); winnowing density bounds; z-order round-trip. */
class SketchLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("kmv estimate lands within 3 sigma of the exact distinct count") {
    val r = Kmv.kmvDistinct(spark, sf).cache()
    // estimator path actually exercised (cardinality above k)
    assert(r.filter(col("n_kept") === Kmv.K).count() > 0)
    val sigma = 3.0 / math.sqrt(Kmv.K - 2)
    val off = r.filter(col("n_kept") === Kmv.K &&
      abs(col("est_distinct") - col("n_exact")) > col("n_exact") * sigma)
    assert(off.count() == 0)
    r.unpersist()
  }

  test("kmv is exact below k and independent of partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    val kmv = udaf(new Kmv.KmvAgg(Kmv.K), Encoders.scalaLong)
    val small = Seq.tabulate(40)(i => s"v$i") ++ Seq.fill(60)("v0")
    val est = small.toDF("v").groupBy(lit(1))
      .agg(kmv(graft.text.TextQueries.hex32(col("v"))).as("sk"))
      .select(size(col("sk"))).as[Int].head()
    assert(est == 40) // 40 distinct < k => sketch IS the distinct set
    // mergeability/determinism: 1 vs 13 partitions, identical sketch
    val big = Seq.tabulate(5000)(i => s"doc$i").toDF("v")
    def sketch(parts: Int) = big.repartition(parts).groupBy(lit(1))
      .agg(kmv(graft.text.TextQueries.hex32(col("v"))).as("sk"))
      .select(col("sk")).as[Seq[Long]].head()
    assert(sketch(1) == sketch(13))
  }

  test("gate column estimator equals the shared scalar estimator") {
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    // the gate query's Column-expression estimate and Kmv.estimate (the
    // definition StreamKmv and the specs use) must be the same function —
    // recompute per-source sketches and compare value-for-value
    val kmv = udaf(new Kmv.KmvAgg(Kmv.K), Encoders.scalaLong)
    val sketches = graft.Tables(spark, sf, "documents")
      .withColumn("w", graft.text.TextQueries.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("source"),
        explode(graft.text.TextQueries.trigrams(col("w"))).as("sg"))
      .groupBy("source")
      .agg(kmv(graft.text.TextQueries.hex32(col("sg"))).as("sk"))
      .as[(String, Seq[Long])].collect()
      .map { case (src, sk) =>
        src -> BigDecimal(Kmv.estimate(Kmv.Buf(sk.toVector)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    val gate = Kmv.kmvDistinct(spark, sf)
      .select("source", "est_distinct")
      .as[(String, Double)].collect().toMap
    assert(gate == sketches)
  }

  test("winnowing density sits between the guaranteed bounds") {
    val w = Winnow.winnowFingerprints(spark, sf).cache()
    // at least one fingerprint per window position block, at most all grams
    val bad = w.filter(col("n_fp") > col("n_grams") ||
      col("n_fp") * Winnow.WinnowWindow < col("n_grams") - Winnow.WinnowWindow + 1)
    assert(bad.count() == 0)
    // expected density ~2/(w+1): corpus-wide average within loose bounds
    import spark.implicits._
    val (fp, gr) = w.agg(sum("n_fp"), sum("n_grams")).as[(Long, Long)].head()
    val density = fp.toDouble / gr
    assert(density > 0.1 && density < 0.45, s"density $density")
    w.unpersist()
  }

  test("identical shingle runs yield identical selected fingerprints") {
    import spark.implicits._
    // two docs sharing their entire text must share every fingerprint
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "a b c d e f g h i j k l m n o p q r s t")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnow")
    try {
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val viaTmp = Winnow.winnowFingerprints(spark, dir.toString).collect()
      assert(viaTmp.length == 2)
      assert(viaTmp(0).getLong(1) == viaTmp(1).getLong(1)) // n_fp equal
      assert(viaTmp(0).getLong(2) == viaTmp(1).getLong(2)) // checksum equal
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("zkey/unzkey round-trips and orders locally") {
    import spark.implicits._
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zkey(col("x"), col("y")))
    val broken = pts.filter(
      ZOrder.unzkey(col("z"), 0) =!= col("x") ||
        ZOrder.unzkey(col("z"), 1) =!= col("y"))
    assert(broken.count() == 0)
    // distinct inputs -> distinct keys (bijectivity on the grid)
    assert(pts.select("z").distinct().count() == 64L * 64L)
  }
}
