package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pre-tokenizer contract: the splitter is a PARTITION of the input
  * (concatenating the matches reproduces the text byte-for-byte — no
  * characters lost between matches), contractions/letters/digits/punct
  * land in the documented classes, and the query equals a local Java
  * regex recount on the real corpus. */
class PretokenizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def local(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(Pretokenize.Pattern).matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  test("splitter partitions hand inputs into the documented classes") {
    val toks = local("the cat's 12 cats!! don't x9")
    assert(toks == Seq("the", " cat", "'s", " 12", " cats", "!!",
      " don", "'t", " x", "9"))
    // partition property on every documents text at sf0.001
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    texts.foreach { t =>
      assert(local(t).mkString == t, "matches must reconstruct the text")
    }
  }

  test("gate query equals a local recount of the corpus") {
    val got = Pretokenize.pretokenizeCounts(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val counts = texts.flatMap(local)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = counts.toSeq
      .sortBy { case (t, n) => (-n, t) }.take(Pretokenize.TopK)
    assert(got.toSeq == want)
  }
}
