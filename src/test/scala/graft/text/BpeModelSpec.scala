package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer-merge round-trip: the reloaded ordered merge list equals
  * the trained one, the replayed encode equals bpe_encode, and BOTH
  * corruption classes red the manifest — a changed token byte and a
  * rank swap (BPE is order-sensitive, so the checksum must be
  * rank-keyed). */
class BpeModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def trained: Seq[(String, String)] =
    Bpe.trainMerges(Bpe.symbolizeWeighted(
      graft.Tables(spark, dir, "documents")), Bpe.KMerges).map(_._1)

  test("write -> reload preserves every merge and its rank") {
    val m = trained
    val path = "target/bpe_model_spec/clean"
    BpeModel.writeModel(spark, path, m)
    val (reloaded, ok) = BpeModel.readModel(spark, path)
    assert(ok)
    assert(reloaded == m, "ordered merge lists must be identical")
  }

  test("encode from the reloaded merges == in-session bpe_encode") {
    val fromModel = BpeModel.bpeModelRoundtrip(spark, dir)
    assert(fromModel.select(min(col("manifest_ok"))).head().getBoolean(0))
    val got = fromModel
      .select("source", "n_words", "chars_before", "tokens_after")
      .collect().map(_.toSeq).toSet
    val expected = Bpe.bpeEncode(spark, dir).collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("a flipped token byte and a rank swap both red the manifest") {
    val m = trained
    val clean = "target/bpe_model_spec/clean2"
    BpeModel.writeModel(spark, clean, m)

    val byteFlip = "target/bpe_model_spec/byteflip"
    spark.read.parquet(s"$clean/merges")
      .select(col("rank"),
        when(col("rank") === 1, concat(col("a"), lit("x")))
          .otherwise(col("a")).as("a"), col("b"))
      .repartition(1).write.mode("overwrite").parquet(s"$byteFlip/merges")
    spark.read.parquet(s"$clean/manifest")
      .write.mode("overwrite").parquet(s"$byteFlip/manifest")
    assert(!BpeModel.readModel(spark, byteFlip)._2)

    // same pair SET, ranks 0 and 1 exchanged — order is the model
    val rankSwap = "target/bpe_model_spec/rankswap"
    spark.read.parquet(s"$clean/merges")
      .select(when(col("rank") === 0, 1).when(col("rank") === 1, 0)
        .otherwise(col("rank")).as("rank"), col("a"), col("b"))
      .repartition(1).write.mode("overwrite").parquet(s"$rankSwap/merges")
    spark.read.parquet(s"$clean/manifest")
      .write.mode("overwrite").parquet(s"$rankSwap/manifest")
    assert(!BpeModel.readModel(spark, rankSwap)._2)
  }
}
