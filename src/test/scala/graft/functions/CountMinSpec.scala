package graft.functions

import graft.{SparkTestSession, Tables}
import graft.text.TextQueries.words
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min invariants: the estimate NEVER undercounts (for every token,
  * not just the reported top-k), the sketch is partitioning-independent
  * (the counter relation is a pure aggregation), and the gate output is
  * deterministic. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cms estimate dominates the exact count for every token") {
    // rebuild the counter relation and probe ALL tokens against it
    val cnt = Tables(spark, sf, "documents")
      .select(col("source"), explode(words(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("n"))
      .withColumn("h", CountMin.tokenHash(col("t")))
      .localCheckpoint(true)
    val counters = cnt
      .select(col("source"), col("n"), explode(array(
        (0 until CountMin.Depth).map(j => struct(lit(j).as("j"),
          CountMin.bucket(col("h"), j).as("bkt"))): _*)).as("c"))
      .groupBy(col("source"), col("c.j"), col("c.bkt"))
      .agg(sum("n").as("cell"))
    val est = cnt
      .select(col("source"), col("t"), col("n"), explode(array(
        (0 until CountMin.Depth).map(j => struct(lit(j).as("j"),
          CountMin.bucket(col("h"), j).as("bkt"))): _*)).as("c"))
      .select(col("source"), col("t"), col("n"),
        col("c.j").as("j"), col("c.bkt").as("bkt"))
      .join(counters, Seq("source", "j", "bkt"))
      .groupBy("source", "t", "n")
      .agg(min("cell").as("est"))
    assert(est.filter(col("est") < col("n")).count() == 0,
      "count-min undercounted a token")
  }

  test("gate output is deterministic and exposes only true top-k rows") {
    val a = CountMin.cmsHeavyHitters(spark, sf).collect()
    val b = CountMin.cmsHeavyHitters(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= CountMin.TopK))
    assert(a.forall(r => r.getLong(4) >= r.getLong(3)),
      "reported estimate below exact count")
  }

  test("row coefficients are in range and distinct across rows") {
    assert(CountMin.RowA.forall(a => a >= 1 && a < CountMin.Prime))
    assert(CountMin.RowB.forall(b => b >= 0 && b < CountMin.Prime))
    assert(CountMin.RowA.distinct.size == CountMin.Depth)
  }

  test("token hash domain sits strictly below the universal-hash modulus") {
    // the independence guarantee of the d rows requires the hash domain
    // to inject into [0, Prime): a >= Prime domain folds pairs of tokens
    // (h, h + Prime) onto the same residue in EVERY row simultaneously
    import spark.implicits._
    val hs = Tables(spark, sf, "documents")
      .select(explode(words(col("text"))).as("t"))
      .select(CountMin.tokenHash(col("t")).as("h"))
      .agg(min("h"), max("h")).as[(Long, Long)].head()
    assert(hs._1 >= 0L && hs._2 < CountMin.Prime,
      s"token hash range [${hs._1}, ${hs._2}] escapes [0, ${CountMin.Prime})")
  }
}
