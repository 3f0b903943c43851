package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** CDC contract: chunks partition the stream exactly, boundaries are
  * content-defined (identical content → identical chunks regardless of
  * position after resync — the anti-fixed-block property), and the gate
  * relation sees the planted tail-edit audio dups deduplicate. */
class CdcChunksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rnd(seed: Int, n: Int): Array[Int] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256))
  }

  test("chunks partition the stream: lengths sum to n, deterministic") {
    val s = rnd(1, 500)
    val c1 = CdcChunks.chunksOf(s)
    val c2 = CdcChunks.chunksOf(s)
    assert(c1 == c2)
    assert(c1.map(_._2).sum == 500)
    assert(c1.forall(_._2 >= 1))
    // a sub-window stream yields the single whole-stream chunk
    val tiny = CdcChunks.chunksOf(Array(1, 2, 3))
    assert(tiny.length == 1 && tiny.head._2 == 3)
  }

  test("boundary resync: a prefix insertion leaves the shared tail's chunks identical") {
    val tail = rnd(2, 400)
    val a = rnd(3, 37) ++ tail   // 37-sample prefix, then shared content
    val b = rnd(4, 61) ++ tail   // different-length different prefix
    val ca = CdcChunks.chunksOf(a).toSet
    val cb = CdcChunks.chunksOf(b).toSet
    val shared = ca & cb
    // after the first content-defined boundary inside the shared tail,
    // every later chunk is identical — the fixed-block scheme would
    // share nothing (offsets differ by 24)
    assert(shared.size >= 3,
      s"expected resynced shared chunks, got ${shared.size}")
  }

  test("gate relations: planted audio dups produce duplicate chunks; summary consistent") {
    val sf = "/root/testdata/sf0.001"
    val top = CdcChunks.cdcTopChunks(spark, sf).collect()
    assert(top.nonEmpty, "no duplicate chunk found at gate SF")
    assert(top.forall(_.getLong(2) > 1))
    val s = CdcChunks.cdcChunks(spark, sf).collect()
    assert(s.length == 1)
    val r = s.head
    val (total, distinct, dup) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(total == distinct + dup && dup > 0)
    assert(r.getLong(3) >= r.getLong(4), "bytes_total >= bytes_distinct")
    val ratio = r.getDouble(5)
    assert(ratio > 0 && ratio <= 1.0)
  }
}
