package graft.text

import graft.SparkTestSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Water-filling laws for the epoch-capped budget allocator, checked on
  * generated (mass, cap) tables: the boundary is unique (output has one
  * row per source), capped sources sit exactly at cap·mass, uncapped
  * sources share one water level (alloc = floor(e·mass), so realized
  * epochs agree to within 1/mass), nobody exceeds its cap, and the
  * total allocation reaches the budget up to the per-source floor
  * losses. */
class EpochCapMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val tableGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(2, 12).flatMap { n =>
      Gen.listOfN(n, for {
        mass <- Gen.chooseNum(1L, 100000L)
        cap <- Gen.chooseNum(1L, 5L)
      } yield (mass, cap))
    }

  test("water-filling laws hold on generated cap tables") {
    (0 until 30).foreach { i =>
      val rows = tableGen(Gen.Parameters.default, Seed(1000L + i)).get
      import spark.implicits._
      val srcs = rows.zipWithIndex
        .map { case ((m, c), j) => (s"s$j", m, c) }
        .toDF("source", "mass", "cap")
      val out = Sampling.waterFill(spark, srcs).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))

      assert(out.length == rows.length, s"case $i: boundary must be unique")
      val budget =
        Sampling.EpochBudgetNum * rows.map(_._1).sum / Sampling.EpochBudgetDen
      out.foreach { case (src, mass, cap, capped, alloc) =>
        assert(alloc <= cap * mass, s"case $i: $src exceeds its cap")
        if (capped == 1L)
          assert(alloc == cap * mass, s"case $i: $src capped short")
      }
      val un = out.filter(_._4 == 0L)
      if (un.nonEmpty) {
        // all uncapped sources share the water level e = num/den: their
        // exact rational epochs differ only by the floor, i.e. within
        // 1/mass of each other
        val eps = un.map { case (_, mass, _, _, alloc) =>
          (alloc.toDouble / mass, 1.0 / mass)
        }
        val hi = eps.map(_._1).max
        eps.foreach { case (e, tol) =>
          assert(e > hi - tol - 1e-12,
            s"case $i: uncapped epochs must share a level")
        }
        // budget is exhausted up to one floor loss per source
        val total = out.map(_._5).sum
        assert(total <= budget && budget - total < out.length,
          s"case $i: total $total vs budget $budget")
      } else {
        // everyone capped: allocation is the full capped mass <= budget
        assert(out.map(_._5).sum <= budget, s"case $i")
      }
    }
  }

  test("gate corpus: cap-1 sources bind at exactly one epoch") {
    val rows = Sampling.epochCapMix(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 20)
    val capped = rows.filter(_.getLong(3) == 1L)
    assert(capped.nonEmpty && capped.length < rows.length,
      "gate must exercise BOTH branches")
    capped.foreach(r => assert(r.getDouble(5) == r.getLong(2).toDouble))
  }
}
