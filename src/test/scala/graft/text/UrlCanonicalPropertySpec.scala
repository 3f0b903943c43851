package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the canonicalization rule chain over GENERATED
  * URLs — the unit table pins the documented rules, this pins the
  * algebra on the long tail: idempotence (canonical is a fixed point),
  * utm params are ALWAYS fully removed wherever they sit (including
  * consecutive runs — the boundary-anchored regex's hard case), and
  * non-utm parameters are NEVER lost or truncated (the `?myutm_...`
  * corruption class the r10 anchor fix closed). All cases evaluate in
  * ONE Spark job. */
class UrlCanonicalPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genParam: Gen[String] = for {
    kind <- Gen.chooseNum(0, 3)
    k <- Gen.oneOf("p", "page", "id", "myutm_x", "xutm_y", "q")
    utm <- Gen.oneOf("utm_source", "utm_a", "utm_campaign")
    v <- Gen.oneOf("", "1", "abc", "x-y")
  } yield if (kind == 0) s"$utm=$v" else s"$k=$v"

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
    host <- Gen.oneOf("Site.COM", "www.example.org", "A.B")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.chooseNum(0, 3)
    path <- Gen.listOfN(segs, Gen.oneOf("a", "B", "p7")).map { ps =>
      if (ps.isEmpty) "" else ps.mkString("/", "/", "")
    }
    slash <- Gen.oneOf("", "/")
    nq <- Gen.chooseNum(0, 4)
    params <- Gen.listOfN(nq, genParam)
    frag <- Gen.oneOf("", "#f", "#sec2")
  } yield {
    val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$scheme://$host$port$path$slash$q$frag"
  }

  test("idempotence, utm-free output, non-utm params preserved") {
    val urls = Gen.listOfN(800, genUrl)
      .apply(Gen.Parameters.default, Seed(2026L)).get
    val rows = urls.toDF("u")
      .select(col("u"),
        UrlCanonical.canonicalize(col("u")).as("c1"))
      .select(col("u"), col("c1"),
        UrlCanonical.canonicalize(col("c1")).as("c2"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, c1, c2) =>
      assert(c1 == c2, s"not idempotent: $u -> $c1 -> $c2")
      assert(!c1.contains("?utm_") && !c1.contains("&utm_"),
        s"utm parameter survived: $u -> $c1")
      // every non-utm parameter of the raw query must survive intact
      val rawQuery = u.dropWhile(_ != '?').takeWhile(_ != '#')
      val keepers = rawQuery.stripPrefix("?").split('&')
        .filter(p => p.nonEmpty && !p.startsWith("utm_"))
      keepers.foreach { p =>
        assert(c1.contains(p),
          s"non-utm param '$p' lost or truncated: $u -> $c1")
      }
    }
  }
}
