package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala re-derivation of the HTML extraction chain
  * (java.util.regex only — no Spark), checked for EXACT agreement with
  * the Catalyst projection on the full fixture corpus and on seeded
  * generated pages with adversarial shapes (missing blocks, multiple
  * scripts, nested tags, attribute quotes, empty everything). A
  * divergence here means the Spark chain's semantics drifted from the
  * documented algorithm, even if both engines' regexes still agree. */
class HtmlExtractPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- the reference implementation (mirrors the documented chain) ----
  private def strip(block: String): String =
    block.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim

  private def refExtract(page: String): (String, Long, Double) = {
    val noss = page
      .replaceAll("(?s)<script>.*?</script>", " ")
      .replaceAll("(?s)<style>.*?</style>", " ")
    val blocks = HtmlExtract.BlockTags.map { t =>
      val m = java.util.regex.Pattern
        .compile(s"(?s)<$t[^>]*>.*?</$t>").matcher(noss)
      t -> (if (m.find()) m.group(0) else "")
    }
    val scored = blocks.map { case (t, b) =>
      val txt = strip(b)
      val mass = if (b.nonEmpty)
        txt.length.toDouble * txt.length / b.length else 0.0
      (t, txt, mass)
    }
    // argmax with BlockTags precedence on ties (same >= chain shape)
    val best = scored.zipWithIndex.foldLeft(Option.empty[(String, String)]) {
      case (acc, ((t, txt, m), i)) =>
        if (acc.isDefined) acc
        else if (scored.drop(i + 1).forall(_._3 <= m)) Some((t, txt))
        else None
    }.getOrElse((HtmlExtract.BlockTags.last, scored.last._2))
    val allTxt = strip(noss)
    val ratio =
      if (allTxt.nonEmpty)
        BigDecimal(1.0 - best._2.length.toDouble / allTxt.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 1.0
    (best._1, best._2.length.toLong, ratio)
  }

  private def sparkExtract(pages: Seq[(Long, String)]) =
    HtmlExtract.extractPages(pages.toDF("doc_id", "page"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap

  private def check(pages: Seq[(Long, String)]): Unit = {
    val got = sparkExtract(pages)
    pages.foreach { case (id, p) =>
      assert(got(id) == refExtract(p), s"doc $id diverged: page=$p")
    }
  }

  test("agreement on the full fixture synthetic-page corpus") {
    val pages = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("page", HtmlExtract.pageCol)
      .select("doc_id", "page").as[(Long, String)].collect().toSeq
    check(pages)
  }

  test("agreement on seeded adversarial pages") {
    val rnd = new scala.util.Random(42)
    val words = Seq("alpha", "beta", "gamma", "delta", "x1", "the", "of")
    def txt(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.length)))
      .mkString(" ")
    val shapes: Seq[Long => String] = Seq(
      // no div at all
      i => s"<html><body><nav><a href='/$i'>n</a></nav><footer>${txt(6)}</footer></body></html>",
      // two scripts, style, nested tags in div
      i => s"<html><head><style>a{b}</style><script>s1()</script>" +
        s"<script>s2($i)</script></head><body><div><p><b>${txt(12)}</b>" +
        s"</p><span>${txt(4)}</span></div><aside>${txt(2)}</aside></body></html>",
      // everything empty
      _ => "<html><body></body></html>",
      // header-heavy page, tiny div
      i => s"<html><body><header>${txt(20)}</header><div>${txt(1)}</div>" +
        s"<footer>c $i</footer></body></html>",
      // attributes with quotes and slashes
      i => s"<html><body><div class=\"a/b\" data-x=\"q$i\">${txt(9)}</div>" +
        s"<nav><a href=\"/a?b=1&c=2\">${txt(1)}</a></nav></body></html>",
      // whitespace storms
      i => s"<html><body><div>  ${txt(5)}\n\n\t ${txt(5)}  </div>" +
        s"<footer> f\t$i </footer></body></html>")
    val pages = (0 until 120).map { i =>
      (i.toLong, shapes(i % shapes.length)(i.toLong))
    }
    check(pages)
  }
}
