package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rule-by-rule unit table for the URL canonicalizer, plus the
  * collision accounting the gate's dedup ratio rests on. */
class UrlCanonicalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlCanonical.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("each normalization rule, in isolation") {
    assert(canon(
      "HTTP://WWW.Site.COM/Path",        // case: scheme+host only
      "http://site.com:80/a",            // default port http
      "https://site.com:443/a",          // default port https
      "https://site.com:8443/a",         // non-default port SURVIVES
      "http://site.com/a#frag",          // fragment
      "http://site.com/a?utm_source=x",  // utm only → query gone
      "http://site.com/a?utm_source=x&p=1",  // utm first
      "http://site.com/a?p=1&utm_medium=y",  // utm last
      "http://site.com/a?p=1&utm_a=x&q=2",   // utm middle
      "http://site.com/a?utm_a=1&utm_b=2&p=3", // consecutive utm RUN
      "http://site.com/a?myutm_source=1", // non-utm param NOT corrupted
      "http://site.com/a/b/",            // trailing slash
      "http://site.com/"                 // root slash KEPT
    ) == Seq(
      "http://www.site.com/Path",
      "http://site.com/a",
      "https://site.com/a",
      "https://site.com:8443/a",
      "http://site.com/a",
      "http://site.com/a",
      "http://site.com/a?p=1",
      "http://site.com/a?p=1",
      "http://site.com/a?p=1&q=2",
      "http://site.com/a?p=3",
      "http://site.com/a?myutm_source=1",
      "http://site.com/a/b",
      "http://site.com/"))
  }

  test("idempotence: canonicalizing a canonical URL is a no-op") {
    val raw = Seq("HTTP://A.B:80/x?utm_a=1&p=2#f",
      "https://c.d:443/y/", "https://e.f:8443/z")
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
  }

  test("gate accounting: targets < raw urls, control host untouched") {
    val dir = "/root/testdata/sf0.001"
    val rows = UrlCanonical.urlCanonical(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (links, raws, targets) = rows.values
      .foldLeft((0L, 0L, 0L)) { case ((a, b, c), (x, y, z)) =>
        (a + x, b + y, c + z) }
    assert(links > raws, "repeat links must exist")
    assert(raws > targets, "canonicalization must deduplicate")
    // the already-canonical control: every raw IS its target
    val cdn = rows("cdn.example.org:8443")
    assert(cdn._2 == cdn._3)
  }
}
