package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity contract: classes partition the corpus, the risk flag
  * is exactly `size < K`, and a planted singleton class is flagged. */
class KAnonymitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("classes partition the corpus; flag is size < K") {
    val rows = KAnonymity.kAnonymity(spark, dir).collect()
    val total = graft.Tables(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("class_size")).sum == total,
      "classes must partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("at_risk") ==
        (r.getAs[Long]("class_size") < KAnonymity.KAnon))
    }
    // both flag values must occur on the fixture or the gate is trivial
    assert(rows.exists(_.getAs[Boolean]("at_risk")) &&
      rows.exists(!_.getAs[Boolean]("at_risk")),
      "fixture must carry both at-risk and safe classes")
  }

  test("apply fails loudly when no ladder level satisfies the budget " +
    "(corpus smaller than K) instead of emitting an empty relation") {
    import spark.implicits._
    val tiny = java.nio.file.Files
      .createTempDirectory("graft-kanon-tiny").toString
    // 2 docs < K=5: even the everything-in-one-class level 4 is sub-K,
    // so 100% of the corpus would need suppression — over any budget
    Seq((1L, "alpha bravo charlie", "en", "a"),
        (2L, "delta echo foxtrot", "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tiny/documents.parquet")
    // the DEDICATED budget type, so ReleaseReport's degrade path can
    // catch exactly this and nothing else
    val e = intercept[KAnonymity.BudgetUnsatisfiableException] {
      KAnonymity.kAnonApply(spark, tiny)
    }
    assert(e.getMessage.contains("suppression budget"),
      s"must name the unsatisfiable budget: ${e.getMessage}")
    // the ladder readout itself stays total (all 5 rows, none chosen)
    val gen = KAnonymity.kAnonGeneralize(spark, tiny).collect()
    assert(gen.length == 5 && gen.forall(!_.getAs[Boolean]("chosen")))
  }

  test("generalization ladder: suppressed mass is monotone non-increasing, " +
    "the chosen level is the minimal one within budget, and level 0 " +
    "agrees with the audit gate") {
    val rows = KAnonymity.kAnonGeneralize(spark, dir).collect()
      .map(r => r.getAs[Long]("level") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_at_risk"),
          r.getAs[Long]("suppressed"), r.getAs[Boolean]("within_budget"),
          r.getAs[Boolean]("chosen"))))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // each ladder step strictly coarsens ⇒ classes and suppressed mass
    // can only fall (a merged class is at least as large as its parts)
    rows.map(_._2).sliding(2).foreach { pair =>
      if (pair.length == 2) {
        assert(pair(1)._1 <= pair(0)._1, "coarsening must not split classes")
        assert(pair(1)._3 <= pair(0)._3,
          "coarsening must not increase suppressed mass")
      }
    }
    // exactly one chosen level; it is within budget and every finer
    // level is not (minimality)
    val chosen = rows.filter(_._2._5)
    assert(chosen.length == 1, s"exactly one chosen level: $chosen")
    val lvl = chosen.head._1
    assert(chosen.head._2._4, "chosen level must be within budget")
    rows.filter(_._1 < lvl).foreach { case (l, (_, _, _, wb, _)) =>
      assert(!wb, s"level $l below the chosen one must violate the budget")
    }
    // level 0 IS the audit gate's key: its stats must agree
    val audit = KAnonymity.kAnonymity(spark, dir).collect()
    val (c0, r0, s0, _, _) = rows.head._2
    assert(c0 == audit.length)
    assert(r0 == audit.count(_.getAs[Boolean]("at_risk")))
    assert(s0 == audit.filter(_.getAs[Boolean]("at_risk"))
      .map(_.getAs[Long]("class_size")).sum)
    // the final level is one class holding the whole corpus — zero
    // suppression whenever the corpus itself reaches K
    val (c4, _, s4, wb4, _) = rows.last._2
    assert(c4 == 1L && s4 == 0L && wb4)
  }

  test("apply agrees with generalize: same chosen level, same suppressed " +
    "mass, suppression exactly the sub-K classes") {
    val gen = KAnonymity.kAnonGeneralize(spark, dir).collect()
    val chosenRow = gen.find(_.getAs[Boolean]("chosen")).get
    val level = chosenRow.getAs[Long]("level")
    val suppressed = chosenRow.getAs[Long]("suppressed")
    val applied = KAnonymity.kAnonApply(spark, dir).collect()
    assert(applied.forall(_.getAs[Long]("level") == level),
      "every doc must be keyed at the generalize gate's chosen level")
    assert(applied.count(_.getAs[Boolean]("suppressed")).toLong == suppressed,
      "per-doc suppression mass must equal the generalize readout")
    val total = graft.Tables(spark, dir, "documents").count()
    assert(applied.length.toLong == total, "one verdict per document")
  }

  test("coarsening monotonicity: wider buckets can only merge classes") {
    // the same corpus bucketed at 1-char granularity has at least as
    // many classes (and so at least as much risk) as the gate's
    // LenBucket — the direction a release review coarsens toward
    val fine = graft.Tables(spark, dir, "documents")
      .groupBy(col("lang"), col("source"), length(col("text")).as("b"))
      .count().count()
    val coarse = KAnonymity.kAnonymity(spark, dir).count()
    assert(coarse <= fine, "coarsening must not split classes")
  }
}
