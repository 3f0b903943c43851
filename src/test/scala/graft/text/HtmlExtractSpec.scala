package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-boilerplate tests for the HTML main-content extractor: a
  * hand-built page with known nav/header/footer proves the text-mass
  * selection picks the content block and recovers the original text
  * byte-exactly; a parked page proves the all-boilerplate path; a
  * hostile page proves script/style text never leaks into the result. */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(page: String, text: String = "the quick brown fox " +
      "jumps over the lazy dog again and again and again") = {
    val docs = Seq((1L, "s1", text)).toDF("doc_id", "source", "text")
    HtmlExtract.extract(docs, Some(lit(page))).head()
  }

  test("planted nav/header/footer: content div wins, text recovered") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau"
    val page = "<html><body>" +
      "<header><h1>Site name</h1></header>" +
      "<nav><a href=\"/a\">a</a><a href=\"/b\">b</a><a href=\"/c\">c</a></nav>" +
      s"<div class=\"post\"><p>$text</p></div>" +
      "<aside><a href=\"/x\">see also</a></aside>" +
      "<footer><a href=\"/tos\">terms</a> copyright 2020 site</footer>" +
      "</body></html>"
    val r = one(page, text)
    assert(r.getAs[String]("main_tag") == "div")
    assert(r.getAs[Boolean]("recovered"))
    assert(r.getAs[Long]("main_len") == text.length.toLong)
    // hand-computed: all_txt = "Site name a b c <text> see also terms
    // copyright 2020 site" — boilerplate = everything but the text
    val allLen = ("Site name a b c " + text +
      " see also terms copyright 2020 site").length
    val expected = BigDecimal(1.0 - text.length.toDouble / allLen)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("boilerplate_ratio") - expected) < 1e-9)
  }

  test("parked page (empty content div): footer-shaped fallback, not recovered") {
    val page = "<html><body>" +
      "<nav><a href=\"/\">home</a></nav>" +
      "<div id=\"main\"><p></p></div>" +
      "<footer>this domain is parked free parking courtesy of registrar" +
      "</footer></body></html>"
    val r = one(page)
    assert(r.getAs[String]("main_tag") == "footer")
    assert(!r.getAs[Boolean]("recovered"))
    assert(r.getAs[Long]("main_len") > 0)
  }

  test("script and style text never leaks into the extraction") {
    val text = "visible words make up the whole of the main content here " +
      "and nothing else should survive the stripping stage at all"
    val page = "<html><head>" +
      "<style>LEAKSTYLE { color: LEAKCOLOR }</style>" +
      "<script>var LEAKVAR = \"LEAKSCRIPT\";</script></head><body>" +
      s"<div><p>$text</p></div>" +
      "<footer>short</footer></body></html>"
    val r = one(page, text)
    assert(r.getAs[String]("main_tag") == "div")
    // recovered proves main text == original, so no LEAK* token entered
    assert(r.getAs[Boolean]("recovered"))
    assert(r.getAs[Long]("main_len") == text.length.toLong)
  }

  test("whitespace is normalized, not significant") {
    val messy = "some   words\twith   odd\n\nspacing here plus enough " +
      "extra words that the block clearly dominates all boilerplate"
    val page = s"<html><body><nav><a href=\"/\">x</a></nav>" +
      s"<div><p>$messy</p></div><footer>ft</footer></body></html>"
    val r = one(page, messy)
    assert(r.getAs[String]("main_tag") == "div")
    assert(r.getAs[Boolean]("recovered"), "normalized forms must match")
  }

  test("all-empty blocks tie-break to the fixed precedence head (div)") {
    val page = "<html><body><header></header><nav></nav><div></div>" +
      "<aside></aside><footer></footer></body></html>"
    val r = one(page)
    assert(r.getAs[String]("main_tag") == "div")
    assert(r.getAs[Long]("main_len") == 0L)
  }

  test("production-sized block: 50k-char text does not overflow the mass") {
    // length() is IntegerType; an int*int square overflows 32 bits past
    // ~46,340 chars (ANSI mode throws ArithmeticException) — the mass is
    // squared in DOUBLE, so a page-sized block must extract cleanly
    val big = Array.fill(10000)("word").mkString(" ") // 49,999 chars
    val page = "<html><body><nav><a href=\"/\">x</a></nav>" +
      s"<div><p>$big</p></div><footer>ft</footer></body></html>"
    val r = one(page, big)
    assert(r.getAs[String]("main_tag") == "div")
    assert(r.getAs[Boolean]("recovered"))
    assert(r.getAs[Long]("main_len") == big.length.toLong)
  }

  test("vertical tab normalizes as whitespace (explicit ws class)") {
    // \x0B is in Java's \s but not RE2's; WsRe spells the class out so
    // both engines agree — on the Spark side, a VT-separated text must
    // extract to the same content as its space-separated twin
    val spaced = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val vt = spaced.replace(' ', '\u000B')
    def pageFor(t: String) = "<html><body><nav><a href=\"/\">x</a></nav>" +
      s"<div><p>$t</p></div><footer>ft</footer></body></html>"
    val a = one(pageFor(spaced), spaced)
    val b = one(pageFor(vt), vt)
    assert(b.getAs[Boolean]("recovered"), "VT text must round-trip")
    assert(a.getAs[String]("main_sha") == b.getAs[String]("main_sha"))
  }

  test("html_links: every page contributes its full link set") {
    val dir = "/root/testdata/sf0.001"
    val nDocs = graft.Tables(spark, dir, "documents").count()
    val links = HtmlExtract.htmlLinks(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // site-wide targets appear once per page (parked pages keep their
    // chrome — only the content div empties)
    Seq("/", "/tos", "/privacy").foreach { t =>
      assert(links(t) == ((nDocs, nDocs)), s"$t: ${links(t)}")
    }
    // per-page targets partition the corpus
    assert((0 until 10).map(i => links(s"/p/$i")._2).sum == nDocs)
    assert((0 until 7).map(i => links(s"/r/$i")._2).sum == nDocs)
    // exactly 6 href targets per page: /, /{source}, /p/k, /r/k, /tos,
    // /privacy
    assert(links.values.map(_._1).sum == 6 * nDocs)
  }

  test("crawl_quality_funnel: parked pages never pass; recovered match batch gopher") {
    val dir = "/root/testdata/sf0.001"
    val f = HtmlExtract.crawlQualityFunnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(f.forall { case (_, pages, content, quality) =>
      quality <= content && content <= pages })
    // extracted-text quality == original-text gopher pass for recovered
    // pages (extraction is lossless modulo whitespace), so corpus-wide:
    // n_quality = gopher passes among non-parked docs
    val expected = graft.text.TextQueries
      .gopherFlags(graft.Tables(spark, dir, "documents"))
      .filter(col("pass") && col("doc_id") % HtmlExtract.ParkedMod =!= 0)
      .count()
    assert(f.map(_._4).sum == expected)
  }

  test("gate shape on sf0.001: parked pages flagged, the rest recovered") {
    val df = HtmlExtract.htmlExtract(spark, "/root/testdata/sf0.001")
      .withColumn("parked", col("doc_id") % HtmlExtract.ParkedMod === 0)
    val agg = df.groupBy("parked")
      .agg(sum(when(col("recovered"), 1L).otherwise(0L)).as("rec"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(agg(false)._1 == agg(false)._2, "every real page recovered")
    assert(agg(true)._1 == 0L, "no parked page claims recovery")
    assert(agg(true)._2 > 0L, "parked population must exist")
    // parked pages never pick the (empty) content div
    assert(df.filter(col("parked") && col("main_tag") === "div").count() == 0)
  }
}
