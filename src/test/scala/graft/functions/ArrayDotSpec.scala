package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ArrayDot must be bit-identical to the interpreted HOF composition it
  * replaced (the DuckDB oracles mirror that form), across float/double
  * element types, and propagate element nulls. */
class ArrayDotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(sequence(lit(1), size(a)), lit(0.0), (acc, i) =>
      acc + element_at(a, i).cast("double") * element_at(b, i).cast("double"))

  private def nativeDot(a: Column, b: Column): Column =
    graft.sim.SimilarityQueries.dot(a, b)

  test("bit-identical to the HOF form on random float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(nativeDot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
    // exact comparison — same accumulation order must give the same bits
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("mixed float/double sides (embedding x literal plane)") {
    val plane = array((1 to 4).map(i => lit(i * 0.5)): _*)
    val out = Seq(Array(1.0f, 2.0f, 3.0f, 4.0f)).toDF("a")
      .select(nativeDot(col("a"), plane).as("d"))
      .head().getDouble(0)
    assert(out == 1.0 * 0.5 + 2.0 * 1.0 + 3.0 * 1.5 + 4.0 * 2.0)
  }

  test("length mismatch and empty input yield null, not a partial sum") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f)), // right shorter than left
      (Seq.empty[Float], Seq.empty[Float])) // empty
      .toDF("a", "b")
      .select(nativeDot(col("a"), col("b")).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
    // right longer than left is fine — iteration covers a's indices
    val ok = Seq((Seq(2.0f), Seq(3.0f, 9.0f))).toDF("a", "b")
      .select(nativeDot(col("a"), col("b")).as("d")).head().getDouble(0)
    assert(ok == 6.0)
  }

  test("null element or null array propagates to null") {
    val df = Seq(
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0), Some(2.0))))).toDF("a", "b")
      .select(nativeDot(col("a"), col("b")).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("interpreted path agrees with codegen path") {
    val rows = Seq((Array(0.1f, 0.2f, 0.3f), Array(3.0f, 2.0f, 1.0f)))
    val compiled = rows.toDF("a", "b")
      .select(nativeDot(col("a"), col("b"))).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try rows.toDF("a", "b")
        .select(nativeDot(col("a"), col("b"))).head().getDouble(0)
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    assert(compiled == interpreted)
  }
}
