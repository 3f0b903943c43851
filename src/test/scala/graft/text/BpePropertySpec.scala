package graft.text

import graft.SparkTestSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the greedy merge fold that backs THREE surfaces
  * (the trainer's per-round rewrite, the corpus-wide encode, and the
  * generated DuckDB `list_reduce` oracle): over generated symbol
  * sequences — skewed to small alphabets so merges actually fire,
  * including runs like "aaa" and pairs containing quotes — the Spark
  * `aggregate` expression must equal an independent one-pass reference
  * model. All cases run as ONE Spark job (zero-violation filter). */
class BpePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference model: greedy left-to-right single pass — merge when the
    * accumulator's last symbol is `a` and the next is `b`; the merged
    * token is NOT immediately re-merged unless it equals `a` again. */
  private def model(sym: Seq[String], a: String, b: String): Seq[String] =
    sym.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b)
        acc.init :+ (a + b)
      else acc :+ x
    }

  test("applyMerge equals the reference greedy fold on generated corpora") {
    val alphabet = Seq("a", "b", "ab", "c", "'", "x'y")
    val genCase = for {
      n <- Gen.chooseNum(0, 12)
      sym <- Gen.listOfN(n, Gen.oneOf(alphabet))
      a <- Gen.oneOf(alphabet)
      b <- Gen.oneOf(alphabet)
    } yield (sym, a, b)
    val cases = Gen.listOfN(500, genCase)
      .apply(Gen.Parameters.default, Seed(2026L)).get

    // evaluate every (sym, a, b) with the production expression; group the
    // cases by merge pair so each distinct pair is one column expression
    val violations = cases.zipWithIndex
      .groupBy { case ((_, a, b), _) => (a, b) }
      .flatMap { case ((a, b), group) =>
        val df = group.map { case ((sym, _, _), i) => (i, sym) }
          .toDF("i", "sym")
        val got = df.select($"i", Bpe.applyMerge(a, b).as("m"))
          .as[(Int, Seq[String])].collect().toMap
        group.flatMap { case ((sym, _, _), i) =>
          val want = model(sym, a, b)
          if (got(i) == want) None
          else Some(s"sym=$sym merge=($a,$b) got=${got(i)} want=$want")
        }
      }
    assert(violations.isEmpty, violations.take(5).mkString("\n"))
  }

  test("fertility partitions the same occurrence mass as the source " +
    "rollup and respects the character bound") {
    val dir = "/root/testdata/sf0.001"
    val bySrc = Bpe.bpeEncode(spark, dir).collect()
    val byLang = Bpe.bpeFertility(spark, dir).collect()
    // both rollups partition the same (word, occurrence) corpus
    assert(bySrc.map(_.getAs[Long]("n_words")).sum ==
      byLang.map(_.getAs[Long]("n_words")).sum)
    assert(bySrc.map(_.getAs[Long]("tokens_after")).sum ==
      byLang.map(_.getAs[Long]("tokens_after")).sum)
    byLang.foreach { r =>
      val fert = r.getAs[Double]("fertility")
      val cpt = r.getAs[Double]("chars_per_token")
      // tokens per word can never exceed chars per word (merges only
      // shrink) and never fall below 1; chars/token is therefore ≥ 1
      assert(fert >= 1.0, s"${r.getAs[String]("lang")}: fertility < 1")
      assert(cpt >= 1.0, s"${r.getAs[String]("lang")}: chars/token < 1")
      assert(r.getAs[Long]("tokens_after") <=
        r.getAs[Long]("chars_before"))
    }
  }
}
