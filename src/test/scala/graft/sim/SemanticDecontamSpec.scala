package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic decontamination contract on a HAND corpus with known
  * geometry (fixture-independent), plus gate consistency. */
class SemanticDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // eval ids are multiples of EvalMod (50). Build:
  //  - eval vector 50 along axis 0
  //  - corpus 1: identical direction (cos 1.0)           → flagged
  //  - corpus 2: 45° in the (0,1) plane (cos ≈ 0.707)    → flagged at 0.4
  //  - corpus 3: orthogonal axis 2 (cos 0)               → clean
  //  - corpus 4: negative direction (cos −1)             → clean
  //  - eval vector 100 along axis 3; corpus 5 matches it → flagged (hit on
  //    a SECOND eval doc, not the first)
  private def vec(axis: Int, scale: Float = 2f): Array[Float] = {
    val a = Array.fill(8)(0f); a(axis) = scale; a
  }

  private lazy val result = {
    import spark.implicits._
    val diag = Array.tabulate(8)(i => if (i <= 1) 1f else 0f) // 45° in (0,1)
    val e = Seq(
      (50L, vec(0)), (100L, vec(3)),
      (1L, vec(0, 7f)), (2L, diag), (3L, vec(2)),
      (4L, vec(0).map(-_)), (5L, vec(3, 0.5f)))
      .toDF("vec_id", "embedding")
    SemanticDecontam.decontamOver(e, SemanticDecontam.GateContamCos)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
  }

  test("flags exactly the vectors within threshold of SOME eval vector") {
    assert(result.keySet == Set(1L, 2L, 5L))
    assert(result(1L) == (1L, 1.0))            // exact duplicate of eval 50
    assert(result(5L) == (1L, 1.0))            // duplicate of eval 100
    assert(result(2L)._1 == 1L)
    assert(math.abs(result(2L)._2 - 0.7071) < 1e-9) // 45°, rounded to 4
  }

  test("eval vectors themselves and anti-parallel/orthogonal vectors are never flagged") {
    assert(!result.contains(50L) && !result.contains(100L),
      "eval side leaked into the corpus scan")
    assert(!result.contains(3L), "orthogonal vector flagged")
    assert(!result.contains(4L), "anti-parallel vector flagged (cos −1)")
  }

  test("production threshold is stricter: 45° survives at ContamCos") {
    import spark.implicits._
    val diag = Array.tabulate(8)(i => if (i <= 1) 1f else 0f)
    val e = Seq((50L, vec(0)), (1L, vec(0, 7f)), (2L, diag))
      .toDF("vec_id", "embedding")
    val strict = SemanticDecontam.decontamOver(e, SemanticDecontam.ContamCos)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
  }

  test("strict gate: every paraphrase source is flagged at 0.95, at all SFs") {
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val flagged = SemanticDecontam.decontamSemanticStrict(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(flagged.nonEmpty, s"strict relation empty at sf$sf")
      // every EvalMod-th vector is its own paraphrase's source: cosine to
      // its displaced twin is ≥ 1/√(1+δ²) = 0.970 by construction, so the
      // full source set must be flagged, each with ≥ 1 hit
      val sources = graft.Tables.parallel(spark, dir, "embeddings")
        .filter(org.apache.spark.sql.functions.col("vec_id")
          % SemanticDecontam.EvalMod === 0)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(sources.subsetOf(flagged.keySet),
        s"unflagged paraphrase sources at sf$sf: ${sources -- flagged.keySet}")
      flagged.foreach { case (id, (hits, maxCos)) =>
        assert(hits >= 1L)
        assert(maxCos >= SemanticDecontam.ContamCos - 1e-4,
          s"$id flagged below the production threshold")
      }
      // sources sit at the own-paraphrase floor 1/√(1+δ²) ≈ 0.970 for
      // exactly unit-norm v; fixture norms are float-rounded near 1, so
      // assert a slightly widened floor (observed minimum 0.9685)
      sources.foreach { id =>
        assert(flagged(id)._2 >= 0.965,
          s"source $id below the approximate own-paraphrase floor")
      }
    }
  }

  test("gate query is non-empty on the fixture and every flag is real") {
    val rows = SemanticDecontam
      .decontamSemantic(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty, "gate relation empty — threshold no longer " +
      "exercises the fixture (regen sensitivity: re-derive GateContamCos)")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getDouble(2) >= SemanticDecontam.GateContamCos - 1e-4)
    }
  }
}
