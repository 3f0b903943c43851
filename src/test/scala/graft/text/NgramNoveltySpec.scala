package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replay of the per-source trigram novelty: driver-side
  * first-occurrence over all (doc, trigram) pairs, then the per-source
  * rollup — plus the conservation law that every distinct trigram is
  * introduced by exactly one source. */
class NgramNoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docGrams(): Map[Long, (String, Set[String])] =
    graft.Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val w = r.getString(2).split(" ").filter(_.nonEmpty)
        val g =
          if (w.length < 3) Set.empty[String]
          else w.sliding(3).map(_.mkString(" ")).toSet
        r.getLong(0) -> (r.getString(1), g)
      }.toMap

  test("per-source novelty equals the driver replay") {
    val dg = docGrams()
    val firstDoc = dg.toSeq
      .flatMap { case (id, (_, gs)) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val intro = firstDoc.toSeq.map { case (_, id) => dg(id)._1 }
      .groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val foot = dg.toSeq.flatMap { case (_, (s, gs)) => gs.map(s -> _) }
      .distinct.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val nDocs = dg.toSeq.groupBy(_._2._1)
      .map { case (s, xs) => s -> xs.size.toLong }
    val want = nDocs.map { case (s, n) =>
      val f = foot.getOrElse(s, 0L)
      val i = intro.getOrElse(s, 0L)
      val frac = if (f > 0)
        BigDecimal(i.toDouble / f).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      (s, n, f, i, frac)
    }.toSet
    val got = NgramNovelty.ngramNovelty(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("every distinct trigram is introduced by exactly one source") {
    val introduced = NgramNovelty.ngramNovelty(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_introduced"))
      .collect()(0).getLong(0)
    val globalDistinct = docGrams().values.flatMap(_._2).toSet.size.toLong
    assert(introduced == globalDistinct)
  }
}
