package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Margin-mining contract on a HAND geometry (fixture-independent):
  * the planted translation pair must be mined mutual-best, and the
  * margin must SUPPRESS a hub vector that raw cosine would mine — the
  * property the ratio margin exists for (Artetxe & Schwenk 2019 §3).
  * Plus gate-level consistency on the fixture corpus. */
class BitextMineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // Batch queries (lang en, doc_id % QMod == 0) on axes 0–3 of R⁸.
  // Targets (lang xx):
  //  - 101: planted translation of q0 (cos ≈ 0.994)
  //  - 102: HUB — cos 0.5 to EVERY query (the vector raw cosine
  //    over-mines: it is the raw-cosine argmax for q10/q20/q30)
  //  - 104/105/106: per-axis partners with cos < 0.5 to their query
  // en doc 5 is NOT ≡ 0 mod QMod — must never appear as a source.
  private lazy val fwd = {
    import spark.implicits._
    val dv = Seq(
      (0L, "en", v(1, 0, 0, 0, 0, 0, 0, 0)),
      (10L, "en", v(0, 1, 0, 0, 0, 0, 0, 0)),
      (20L, "en", v(0, 0, 1, 0, 0, 0, 0, 0)),
      (30L, "en", v(0, 0, 0, 1, 0, 0, 0, 0)),
      (5L, "en", v(1, 0, 0, 0, 0, 0, 0, 0)),
      (101L, "xx", v(1, 0.05, 0, 0, 0.1, 0, 0, 0)),
      (102L, "xx", v(1, 1, 1, 1, 0, 0, 0, 0)),
      (104L, "xx", v(0, 0.45, 0, 0, 0, 1, 0, 0)),
      (105L, "xx", v(0, 0, 0.3, 0, 0, 0, 1, 0)),
      (106L, "xx", v(0, 0, 0, 0.3, 0, 0, 0, 1)))
      .toDF("doc_id", "lang", "embedding")
    BitextMine.forwardBest(dv).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[String]("tgt_lang")) ->
        ((r.getAs[Long]("tgt_id"), r.getAs[Double]("margin"),
          r.getAs[Boolean]("mutual"))))
      .toMap
  }

  test("one forward-best row per (batch query, target lang); non-batch " +
    "sources excluded") {
    assert(fwd.keySet == Set(0L, 10L, 20L, 30L).map(_ -> "xx"),
      "sources are exactly the QMod-slice en docs; langs exactly xx")
  }

  test("planted translation pair is mined mutual-best above threshold") {
    val (tgt, margin, mutual) = fwd((0L, "xx"))
    assert(tgt == 101L, "q0's best candidate is its translation")
    assert(mutual, "q0 is also 101's best query")
    assert(margin >= BitextMine.MarginThresh)
  }

  test("margin suppresses the hub raw cosine would mine") {
    // raw-cosine check from the vectors themselves: the hub's cosine to
    // q10 is 0.5, the axis partner's is 0.45/√1.2025 ≈ 0.41 — raw
    // ranking would pick the hub
    assert(0.45 / math.sqrt(1 + 0.45 * 0.45) < 0.5)
    // ...but the margin divides by the hub's own mean-top-k density
    // (y_pen = 0.5) and ranks the mutually-exceptional partner first
    val (tgt, margin, mutual) = fwd((10L, "xx"))
    assert(tgt == 104L, "margin inverts the cosine ranking for q10")
    assert(mutual && margin >= BitextMine.MarginThresh)
    assert(fwd((20L, "xx"))._1 == 105L)
    assert(fwd((30L, "xx"))._1 == 106L)
  }

  test("fixture gates agree: lang stats count exactly the mined rows") {
    val dir = "/root/testdata/sf0.001"
    val mined = BitextMine.bitextMine(spark, dir).collect()
    assert(mined.nonEmpty, "threshold must fire at sf0.001")
    val byLang = mined.groupBy(_.getAs[String]("tgt_lang"))
      .map { case (l, rs) =>
        l -> ((rs.length.toLong,
          rs.count(_.getAs[Boolean]("mutual")).toLong))
      }
    val stats = BitextMine.bitextLangStats(spark, dir).collect()
      .map(r => r.getAs[String]("tgt_lang") ->
        ((r.getAs[Long]("n_mined"), r.getAs[Long]("n_mutual"),
          r.getAs[Long]("n_best"))))
      .toMap
    assert(stats.keySet == Set("fr", "es", "de", "zh"))
    stats.foreach { case (l, (nMined, nMutual, nBest)) =>
      val (gotMined, gotMutual) = byLang.getOrElse(l, (0L, 0L))
      assert(nMined == gotMined, s"lang $l mined count")
      assert(nMutual == gotMutual, s"lang $l mutual count")
      assert(nBest >= nMined)
    }
  }

  test("margin curve is monotone in the threshold and pins lang stats") {
    val dir = "/root/testdata/sf0.001"
    val curve = BitextMine.bitextMarginCurve(spark, dir).collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[String]("tgt_lang")) ->
        ((r.getAs[Long]("n_mined"), r.getAs[Long]("n_mutual"))))
      .toMap
    val langs = Set("fr", "es", "de", "zh")
    assert(curve.keySet == BitextMine.CurveThresholds
      .flatMap(t => langs.map(t -> _)).toSet)
    // yield can only fall as the threshold rises, and mutual ≤ mined
    langs.foreach { l =>
      val byT = BitextMine.CurveThresholds.map(t => curve((t, l)))
      byT.sliding(2).foreach { case Seq((m1, u1), (m2, u2)) =>
        assert(m1 >= m2 && u1 >= u2, s"lang $l curve not monotone")
      }
      byT.foreach { case (m, u) => assert(u <= m) }
    }
    // the MarginThresh column of the curve IS the lang-stats row
    val stats = BitextMine.bitextLangStats(spark, dir).collect()
      .map(r => r.getAs[String]("tgt_lang") ->
        ((r.getAs[Long]("n_mined"), r.getAs[Long]("n_mutual")))).toMap
    langs.foreach { l =>
      assert(curve((BitextMine.MarginThresh, l)) == stats(l), s"lang $l")
    }
  }

  test("recall curve: endpoints alias the single-cell and brute regimes " +
    "exactly; the multiprobe dial rises materially above the floor") {
    val dir = "/root/testdata/sf0.001"
    val curve = BitextMine.bitextRecallCurve(spark, dir).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[String]("tgt_lang")) ->
        ((r.getAs[Long]("n_brute"), r.getAs[Long]("n_probe"),
          r.getAs[Long]("n_common"))))
      .toMap
    val langs = Set("fr", "es", "de", "zh")
    assert(curve.keySet ==
      BitextMine.MineProbes.flatMap(p => langs.map(p.toLong -> _)).toSet)
    // P = NLists IS brute: the probed relation equals the brute relation
    langs.foreach { l =>
      val (nb, np, nc) = curve((Ivf.NLists.toLong, l))
      assert(np == nb && nc == nb, s"lang $l: P=NLists must equal brute")
    }
    // P = 1 IS the single-cell regime the existing certification measures
    val ivfRec = BitextMine.bitextIvfRecall(spark, dir).collect()
      .map(r => r.getAs[String]("tgt_lang") ->
        ((r.getAs[Long]("n_ivf"), r.getAs[Long]("n_common")))).toMap
    langs.foreach { l =>
      val (_, np1, nc1) = curve((1L, l))
      assert((np1, nc1) == ivfRec(l), s"lang $l: P=1 must alias ivf regime")
    }
    // the production dial recovers materially more of brute than 1 probe
    val floor = langs.toSeq.map(l => curve((1L, l))._3).sum
    val dial = langs.toSeq.map(l =>
      curve((BitextMine.MineNProbe.toLong, l))._3).sum
    assert(dial > floor,
      s"multiprobe recall ($dial) must beat the single-probe floor ($floor)")
  }

  test("multiprobe gate counts match the curve at the production dial") {
    val dir = "/root/testdata/sf0.001"
    val mined = BitextMine.bitextMineMultiprobe(spark, dir).collect()
      .groupBy(_.getAs[String]("tgt_lang")).view.mapValues(_.length.toLong)
    val curve = BitextMine.bitextRecallCurve(spark, dir).collect()
      .filter(_.getAs[Long]("nprobe") == BitextMine.MineNProbe.toLong)
      .map(r => r.getAs[String]("tgt_lang") -> r.getAs[Long]("n_probe"))
      .toMap
    curve.foreach { case (l, np) =>
      assert(mined.getOrElse(l, 0L) == np, s"lang $l multiprobe count")
    }
  }

  test("cross-lingual decontam: queries are exactly the eval slice and " +
    "the planted translation is flagged") {
    import spark.implicits._
    val dv = Seq(
      (0L, "en", v(1, 0, 0, 0, 0, 0, 0, 0)),   // eval doc (< 20)
      (5L, "en", v(0, 1, 0, 0, 0, 0, 0, 0)),   // eval doc (< 20)
      (30L, "en", v(0, 0, 1, 0, 0, 0, 0, 0)),  // NOT eval (≥ 20)
      (101L, "xx", v(1, 0.05, 0, 0, 0.1, 0, 0, 0)), // translation of 0
      (104L, "xx", v(0, 0.45, 0, 0, 0, 1, 0, 0)),
      (105L, "xx", v(0, 0, 0.3, 0, 0, 0, 1, 0)),
      (106L, "xx", v(0, 0, 0, 0.3, 0, 0, 0, 1)))
      .toDF("doc_id", "lang", "embedding")
    val fwd = BitextMine.decontamOver(dv).collect()
    assert(fwd.map(_.getAs[Long]("src_id")).toSet == Set(0L, 5L),
      "queries are exactly the source-lang eval slice — never doc 30")
    val flagged = fwd.filter(r =>
      r.getAs[Double]("margin") >= BitextMine.MarginThresh)
    assert(flagged.exists(r => r.getAs[Long]("src_id") == 0L &&
      r.getAs[Long]("tgt_id") == 101L),
      "the planted translation of eval doc 0 must be flagged")
  }

  test("probe choice picks the minimal depth meeting the recall target") {
    val dir = "/root/testdata/sf0.001"
    val curve = BitextMine.bitextRecallCurve(spark, dir).collect()
      .map(r => (r.getAs[String]("tgt_lang"), r.getAs[Long]("nprobe")) ->
        ((r.getAs[Long]("n_brute"), r.getAs[Long]("n_common"))))
      .toMap
    val choice = BitextMine.bitextProbeChoice(spark, dir).collect()
      .map(r => r.getAs[String]("tgt_lang") ->
        r.getAs[Long]("chosen_probe")).toMap
    assert(choice.keySet == Set("fr", "es", "de", "zh"),
      "one choice per language, always (P=NLists is brute)")
    def ok(l: String, p: Long): Boolean = {
      val (nb, nc) = curve((l, p))
      nc * BitextMine.RecallTargetDen >= nb * BitextMine.RecallTargetNum
    }
    choice.foreach { case (l, p) =>
      assert(ok(l, p), s"lang $l: chosen depth $p must meet the target")
      BitextMine.MineProbes.map(_.toLong).filter(_ < p).foreach { q =>
        assert(!ok(l, q), s"lang $l: smaller depth $q also meets the " +
          "target — choice not minimal")
      }
    }
  }

  test("tuned miner: two languages with different choices mine at " +
    "different depths (the choice table is actually consumed)") {
    import spark.implicits._
    // 2 quantizer cells; the query's probe ranking is [c0, c1] (it sits
    // nearer c0), both candidates sit in cell 1 — so a language probing
    // 1 cell cannot see the query, a language probing 2 can
    val centers = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val batch = Seq((0L, "en", v(2, 1))).toDF("doc_id", "lang", "embedding")
    val cands = Seq(
      (1L, "aa", v(1.8, 1.2), 1),
      (2L, "bb", v(1.9, 1.1), 1))
      .toDF("doc_id", "lang", "embedding", "cell")
    def langsAt(choice: Seq[(String, Long)]): Set[String] =
      BitextMine.mineWaveChosen(batch, cands, centers,
          choice.toDF("lang", "nprobe"))
        .collect().map(_.getAs[String]("tgt_lang")).toSet
    assert(langsAt(Seq("aa" -> 1L, "bb" -> 2L)) == Set("bb"),
      "lang aa (depth 1) must not reach the cell-1 candidate; bb " +
        "(depth 2) must")
    assert(langsAt(Seq("aa" -> 2L, "bb" -> 2L)) == Set("aa", "bb"),
      "at equal depth 2 both languages mine")
    // a language missing from the choice table degrades to the global
    // MineNProbe default (≥ 2 cells here), not to silence
    assert(langsAt(Seq("bb" -> 1L)) == Set("aa"),
      "uncertified lang aa mines at the default depth; bb at its " +
        "chosen 1 sees nothing")
  }

  test("tuned gate consumes the choice: per-language counts equal the " +
    "curve at each language's chosen depth, and depths differ when the " +
    "choice does") {
    val dir = "/root/testdata/sf0.001"
    val choice = BitextMine.bitextProbeChoice(spark, dir).collect()
      .map(r => r.getAs[String]("tgt_lang") ->
        r.getAs[Long]("chosen_probe")).toMap
    val curve = BitextMine.bitextRecallCurve(spark, dir).collect()
      .map(r => (r.getAs[String]("tgt_lang"), r.getAs[Long]("nprobe")) ->
        r.getAs[Long]("n_probe")).toMap
    val tuned = BitextMine.bitextMineTuned(spark, dir).collect()
    assert(tuned.nonEmpty, "tuned miner must fire at sf0.001")
    tuned.foreach { r =>
      assert(r.getAs[Long]("chosen_probe") ==
        choice(r.getAs[String]("tgt_lang")),
        "every pair must state its language's certified depth")
    }
    val byLang = tuned.groupBy(_.getAs[String]("tgt_lang"))
      .view.mapValues(_.length.toLong).toMap
    choice.foreach { case (l, p) =>
      assert(byLang.getOrElse(l, 0L) == curve((l, p)),
        s"lang $l tuned count must equal the curve's n_probe at P=$p")
    }
    // recall ≥ target at every language BY CONSTRUCTION of the choice:
    // re-check against brute via the curve's n_common at the chosen depth
    val common = BitextMine.bitextRecallCurve(spark, dir).collect()
      .map(r => (r.getAs[String]("tgt_lang"), r.getAs[Long]("nprobe")) ->
        ((r.getAs[Long]("n_brute"), r.getAs[Long]("n_common")))).toMap
    choice.foreach { case (l, p) =>
      val (nb, nc) = common((l, p))
      assert(nc * BitextMine.RecallTargetDen >=
        nb * BitextMine.RecallTargetNum,
        s"lang $l: tuned recall below the certified target")
    }
  }

  test("threshold choice: minimal sweep point with full mutuality, " +
    "total per language, fallback flagged; depths differ across langs") {
    val dir = "/root/testdata/sf0.001"
    val curve = BitextMine.bitextMarginCurve(spark, dir).collect()
      .map(r => (r.getAs[String]("tgt_lang"), r.getAs[Double]("threshold")) ->
        ((r.getAs[Long]("n_mined"), r.getAs[Long]("n_mutual")))).toMap
    val choice = BitextMine.bitextThresholdChoice(spark, dir).collect()
      .map(r => r.getAs[String]("tgt_lang") ->
        ((r.getAs[Double]("chosen_threshold"),
          r.getAs[Boolean]("met_target")))).toMap
    assert(choice.keySet == Set("fr", "es", "de", "zh"),
      "one choice per language, always (fallback is total)")
    def fullyMutual(l: String, t: Double): Boolean = {
      val (m, u) = curve((l, t)); m > 0 && u == m
    }
    choice.foreach { case (l, (t, met)) =>
      if (met) {
        assert(fullyMutual(l, t), s"lang $l: chosen $t must be calibrated")
        BitextMine.CurveThresholds.filter(_ < t).foreach { q =>
          assert(!fullyMutual(l, q),
            s"lang $l: smaller threshold $q also calibrated — not minimal")
        }
      } else assert(t == BitextMine.CurveThresholds.max,
        s"lang $l: the fallback must be the strictest sweep point")
    }
    // the fixture's curves differ enough that the choice is per-language
    assert(choice.values.map(_._1).toSet.size > 1,
      "fixture languages must not all choose the same threshold, or the " +
        "per-language calibration is indistinguishable from a global one")
  }

  test("calibrated miner consumes BOTH dials: per-language rows are " +
    "exactly the tuned relation cut at that language's chosen threshold") {
    val dir = "/root/testdata/sf0.001"
    val th = BitextMine.bitextThresholdChoice(spark, dir).collect()
      .map(r => r.getAs[String]("tgt_lang") ->
        r.getAs[Double]("chosen_threshold")).toMap
    val cal = BitextMine.bitextMineCalibrated(spark, dir).collect()
    assert(cal.nonEmpty, "calibrated miner must fire at sf0.001")
    cal.foreach { r =>
      val l = r.getAs[String]("tgt_lang")
      assert(r.getAs[Double]("chosen_threshold") == th(l))
      assert(r.getAs[Double]("margin") >= th(l) - 5e-5,
        s"lang $l: a pair below its language's threshold leaked through")
    }
    // per-language count = tuned pairs (the unfiltered per-depth wave)
    // at that language's own cut — computed from the tuned gate where
    // the chosen threshold is ≥ the gate's global MarginThresh
    val tuned = BitextMine.bitextMineTuned(spark, dir).collect()
    th.foreach { case (l, t) =>
      if (t >= BitextMine.MarginThresh) {
        val want = tuned.count(r => r.getAs[String]("tgt_lang") == l &&
          r.getAs[Double]("margin") >= t)
        val got = cal.count(_.getAs[String]("tgt_lang") == l)
        assert(got == want, s"lang $l: calibrated count $got != $want")
      }
    }
  }

  test("ivf recall certification is internally consistent and non-trivial") {
    val dir = "/root/testdata/sf0.001"
    val rows = BitextMine.bitextIvfRecall(spark, dir).collect()
      .map(r => r.getAs[String]("tgt_lang") ->
        ((r.getAs[Long]("n_brute"), r.getAs[Long]("n_ivf"),
          r.getAs[Long]("n_common"))))
      .toMap
    assert(rows.keySet == Set("fr", "es", "de", "zh"))
    rows.foreach { case (l, (nb, ni, nc)) =>
      assert(nc <= math.min(nb, ni), s"lang $l: overlap exceeds a side")
      assert(nb > 0, s"lang $l: brute miner must fire")
    }
    // uniform random embeddings are ANN's worst case — the floor must
    // still be a real overlap, not zero
    assert(rows.values.map(_._3).sum > 0, "pruned miner recalls nothing")
    // the pruned miner's own mined count per lang must match its gate
    val minedIvf = BitextMine.bitextMineIvf(spark, dir).collect()
      .groupBy(_.getAs[String]("tgt_lang")).view.mapValues(_.length.toLong)
    rows.foreach { case (l, (_, ni, _)) =>
      assert(minedIvf.getOrElse(l, 0L) == ni, s"lang $l ivf count")
    }
  }
}
