package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Redaction chain on planted text: emails/URLs/long digit runs collapse
  * to typed placeholders in order, short digit runs survive, and the
  * emitted sha matches a hand-computed digest of the expected redacted
  * string — byte-exact transformation, not just matching counts. */
class PiiRedactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sha16(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(16)

  test("planted PII redacts byte-exactly; short digit runs survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pii")
    try {
      val text = "mail me at bob.smith+x@corp.example.org or " +
        "http://t.example/a?b=1 id 1234567 pin 12345 done"
      Seq((7L, text, "en", "src0", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val r = PiiRedact.piiRedact(spark, dir.toString).head()
      assert(r.getLong(1) == 2L, "emails: planted + appended") // bob + u7@
      assert(r.getLong(2) == 2L, "urls: planted + appended")
      assert(r.getLong(3) == 1L, "digit runs: only the 7-digit one (7*7=49 is short)")
      val expected = "mail me at <EMAIL> or <URL> id <NUM> pin 12345 done" +
        " contact <EMAIL> via <URL> ref 49"
      assert(r.getString(5) == sha16(expected),
        s"redacted bytes diverge from the expected string")
      assert(r.getLong(4) ==
        (text + " contact u7@mail.example.com via https://site7.example/path ref 49")
          .length - expected.length)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
