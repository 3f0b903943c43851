package graft.sim

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ codebook round-trip: reloaded coefficients bit-equal trained,
  * the replayed ADC query equals the in-session pq_topk, and one
  * corrupted coefficient reds the manifest. */
class PqModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("write -> reload is bit-exact; manifest certifies it") {
    val (_, trained) = Pq.encoded(spark, dir)
    val path = "target/pq_model_spec/clean"
    PqModel.writeModel(spark, path, trained)
    val (reloaded, ok) = PqModel.readModel(spark, path)
    assert(ok)
    assert(reloaded.length == trained.length)
    for (m <- trained.indices; k <- trained(m).indices)
      assert(java.util.Arrays.equals(reloaded(m)(k), trained(m)(k)),
        s"sub-centroid ($m,$k) must reload bit-exactly")
  }

  test("query from the reloaded codebook == in-session pq_topk") {
    val fromModel = PqModel.pqModelRoundtrip(spark, dir)
    assert(fromModel.select(min(col("manifest_ok"))).head().getBoolean(0))
    val got = fromModel.select("vec_id", "label", "adc", "cosine")
      .collect().map(_.toSeq).toSeq
    val expected = Pq.pqTopk(spark, dir).collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("one corrupted sub-centroid coefficient reds the manifest") {
    val (_, trained) = Pq.encoded(spark, dir)
    val clean = "target/pq_model_spec/clean2"
    PqModel.writeModel(spark, clean, trained)
    val corrupt = "target/pq_model_spec/corrupt"
    spark.read.parquet(s"$clean/codebook")
      .select(col("m"), col("k"), transform(col("c"), (x, i) =>
        when(col("m") === 2 && col("k") === 7 && i === 0, x - lit(1e-14))
          .otherwise(x)).as("c"))
      .repartition(1).write.mode("overwrite").parquet(s"$corrupt/codebook")
    spark.read.parquet(s"$clean/manifest")
      .write.mode("overwrite").parquet(s"$corrupt/manifest")
    val (_, ok) = PqModel.readModel(spark, corrupt)
    assert(!ok)
  }
}
