package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

/** SqlLit's injection-safety contract, proven by round-trip: quoting a
  * hostile string and evaluating it through each engine's parser must
  * yield the original string, never an expression. The Spark side is
  * executed here; the DuckDB side is exercised by every post-training
  * oracle in the gate (trained pieces flow through SqlLit.duck). */
class SqlLitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val hostile = Seq(
    "plain",
    "it's",
    "two''quotes",
    "back\\slash",
    "a\\b",            // the Spark \b-escape trap the quoting fix closed
    "\\'",             // backslash then quote
    "end\\",
    "\\\\double",
    "1 + 1",           // must stay a string, not evaluate
    "x'); DROP TABLE t; --",
    "percent%_underscore",
    "unié中文",
    "line1\nline2",        // raw newline — the stripMargin assembly trap
    "a\n  |b",             // newline + margin marker: stripMargin bait
    "cr\rtab\tmix")

  test("spark literals round-trip hostile strings") {
    import spark.implicits._
    hostile.foreach { v =>
      val got = Seq(1).toDF("z")
        .select(expr(SqlLit.spark(v)).as("s"))
        .as[String].head()
      assert(got == v, s"round-trip broke: ${v.toList} -> ${got.toList}")
    }
  }

  test("spark literals survive stripMargin assembly") {
    import spark.implicits._
    // the real inlining shape: literal interpolated into a stripMargin
    // block — control chars must be escaped or the margin strip corrupts
    hostile.foreach { v =>
      val sql = s"""CASE WHEN 1 = 1
                   |  THEN ${SqlLit.spark(v)}
                   |  ELSE 'x' END""".stripMargin
      val got = Seq(1).toDF("z").select(expr(sql).as("s")).as[String].head()
      assert(got == v, s"stripMargin corrupted: ${v.toList} -> ${got.toList}")
    }
  }

  test("duck literals never span lines") {
    hostile.foreach { v =>
      val l = SqlLit.duck(v)
      assert(!l.exists(_ < ' '), s"control char leaked into SQL text: $l")
    }
    assert(SqlLit.duck("a\nb") == "('a' || chr(10) || 'b')")
    assert(SqlLit.duck("\n") == "(chr(10))")
  }

  test("spark literals survive inside IN-lists") {
    import spark.implicits._
    hostile.foreach { v =>
      val inList = SqlLit.spark(v)
      val got = Seq(v, "decoy").toDF("t")
        .filter(expr(s"t IN ($inList)"))
        .as[String].collect().toSeq
      assert(got == Seq(v), s"IN-list match broke for ${v.toList}: $got")
    }
  }
}
