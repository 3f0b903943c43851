package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the corpus-shaping operators (their VALUES are
  * hash-oracled by the gate; these pin the properties the oracles can't
  * express): determinism across runs, split totality, packing geometry. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("train_split covers every document exactly once and is deterministic") {
    val a = Sampling.trainSplit(spark, sf).cache()
    val total = graft.Tables(spark, sf, "documents").count()
    assert(a.count() == total)
    assert(a.select("doc_id").distinct().count() == total)
    // group-aware column is constant within a source
    assert(a.groupBy("source")
      .agg(countDistinct("group_split").as("n")).filter(col("n") > 1)
      .count() == 0)
    // deterministic: a second evaluation yields the identical assignment
    val b = Sampling.trainSplit(spark, sf)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    a.unpersist()
  }

  test("stratified_sample keeps only rows under their stratum threshold, deterministically") {
    val a = Sampling.stratifiedSample(spark, sf).cache()
    assert(a.filter(col("h") >= col("threshold")).count() == 0)
    assert(a.filter(col("h") < 0 || col("h") > 99 ||
      col("threshold") < 0 || col("threshold") > 99).count() == 0)
    val b = Sampling.stratifiedSample(spark, sf)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    a.unpersist()
  }

  test("negative_pairs are deterministic, in-corpus, and never self-paired") {
    val a = Sampling.negativePairs(spark, sf).cache()
    assert(a.filter(col("neg_id") === col("doc_id")).count() == 0)
    val nDocs = graft.Tables(spark, sf, "documents").count()
    assert(a.filter(col("neg_id") < 0 || col("neg_id") >= nDocs).count() == 0)
    // every anchor keeps at least NegPerAnchor - 1 draws (at most one
    // self-collision per anchor is plausible; zero draws is not)
    assert(a.groupBy("doc_id").count()
      .filter(col("count") < Sampling.NegPerAnchor - 1).count() == 0)
    val b = Sampling.negativePairs(spark, sf)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    a.unpersist()
  }

  test("pack_sequences bins are contiguous per source and conserve tokens") {
    val bins = Sampling.packSequences(spark, sf).cache()
    import spark.implicits._
    // every source starts at bin 0, and no bin id exceeds what the
    // source's token total allows (a doc longer than the budget spans
    // bins, so ids may legitimately skip — contiguity is NOT guaranteed)
    val sourceTokens = graft.Tables(spark, sf, "documents")
      .groupBy("source")
      .agg(sum(size(TextQueries.words(col("text"))).cast("long")).as("tok"))
    val bad = bins.groupBy("source")
      .agg(min("bin_id").as("mn"), max("bin_id").as("mx"))
      .join(sourceTokens, "source")
      .filter(col("mn") =!= 0 ||
        col("mx") > col("tok") / Sampling.PackBinTokens)
    assert(bad.count() == 0)
    // token conservation: bin totals sum to the corpus token count
    val corpusTokens = graft.Tables(spark, sf, "documents")
      .select(size(TextQueries.words(col("text"))).cast("long").as("n"))
      .agg(sum("n")).as[Long].head()
    assert(bins.agg(sum("bin_tokens")).as[Long].head() == corpusTokens)
    // doc ranges are ordered and non-overlapping across consecutive bins
    val overlapping = bins.as("a").join(bins.as("b"),
      col("a.source") === col("b.source") &&
        col("a.bin_id") + 1 === col("b.bin_id") &&
        col("a.last_doc") >= col("b.first_doc"))
    assert(overlapping.count() == 0)
    bins.unpersist()
  }

  test("split_leakage is exactly the cross-split subset of the LSH pair relation") {
    val splits = Sampling.trainSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val pairs = graft.dedup.DedupQueries.dedupMinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val want = pairs.filter { case (a, b, _) => splits(a) != splits(b) }
      .map { case (a, b, j) => (a, b, splits(a), splits(b), j) }.toSet
    val got = Sampling.splitLeakage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSet
    assert(got == want)
    assert(got.nonEmpty, "gate corpus must surface at least one leakage pair")
    assert(got.size < pairs.length, "some pairs must stay within a split")
  }

  test("mix_weights_temp: each column normalizes to 1, T flattens monotonically, T=2 equals mix_weights") {
    val rows = Sampling.mixWeightsTemp(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length >= 2, "needs several sources to mean anything")
    def colOf(i: Int) = rows.map(_._2.productElement(i).asInstanceOf[Double])
    (0 to 3).foreach { i =>
      assert(math.abs(colOf(i).sum - 1.0) < 1e-3, s"column $i not normalized")
    }
    // flattening: the dominant source's share shrinks as T grows, the
    // smallest source's share grows; uniform is the flattest
    val maxes = (0 to 3).map(i => colOf(i).max)
    val mins = (0 to 3).map(i => colOf(i).min)
    assert(maxes(0) >= maxes(1) && maxes(1) >= maxes(2) && maxes(2) >= maxes(3) - 1e-9,
      s"max share must shrink with T: $maxes")
    assert(mins(0) <= mins(1) && mins(1) <= mins(2) && mins(2) <= mins(3) + 1e-9,
      s"min share must grow with T: $mins")
    // the T=2 column IS the mix_weights gate output
    val w2 = Sampling.mixWeights(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    rows.foreach { case (src, (_, t2, _, _)) =>
      assert(math.abs(t2 - w2(src)) < 1e-9, s"T=2 mismatch at $src")
    }
  }

  test("length_buckets: integer bucket law bucket/2 < n <= bucket " +
    "for every length 1..1030 (covers the power-of-two boundaries)") {
    import spark.implicits._
    val buckets = (1 to 1030)
      .map(n => (n.toLong, "x " * n)) // n whitespace tokens
      .toDF("n", "text")
      .selectExpr("n",
        """CASE WHEN n <= 1 THEN CAST(1 AS BIGINT)
          |ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n - 1)))
          |END AS bucket""".stripMargin)
      .collect()
    buckets.foreach { r =>
      val (n, b) = (r.getLong(0), r.getLong(1))
      assert(n <= b && (b == 1 || n > b / 2), s"n=$n bucket=$b")
      assert((b & (b - 1)) == 0, s"bucket $b must be a power of two")
    }
    // the gate query partitions the corpus docs (empty docs excluded)
    val out = Sampling.lengthBuckets(spark, "/root/testdata/sf0.001")
      .collect()
    val nonEmpty = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(size(TextQueries.words(col("text"))) >= 1).count()
    assert(out.map(_.getLong(1)).sum == nonEmpty)
    out.foreach(r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 0.5 + 1e-9,
        "power-of-two padding wastes at most half the bucket"))
  }
}
