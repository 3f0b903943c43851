package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Chunking contract: full coverage, exact overlap, provenance offsets,
  * and lossless reconstruction from the non-overlapping spans. */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val chunks =
    Chunking.chunkDocuments(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .groupBy(_._1)
      .map { case (id, rs) => id -> rs.sortBy(_._2) }

  private lazy val docs = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq
      }.toMap
  }

  test("every document yields contiguous chunk indices from 0") {
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, rs) =>
      assert(rs.map(_._2).toSeq == (0L until rs.length.toLong),
        s"doc $id chunk indices")
    }
  }

  test("window geometry: stride starts, full interior windows, clipped tail reaching the end") {
    val t = Chunking.ChunkTokens; val st = Chunking.ChunkStride
    chunks.foreach { case (id, rs) =>
      val n = docs(id).length
      rs.foreach { case (_, k, start, len, _) =>
        assert(start == k * st, s"doc $id chunk $k start")
        val expect = math.min(t.toLong, n - start)
        assert(len == expect, s"doc $id chunk $k length ($len vs $expect)")
      }
      // last window covers the document end; any later start would be
      // redundant (fully contained in the last window)
      val (_, lastK, lastStart, lastLen, _) = rs.last
      assert(lastStart + lastLen == math.max(n.toLong, 0L).max(lastLen),
        s"doc $id tail coverage")
      assert(lastStart + lastLen >= n, s"doc $id end not reached")
      if (lastK > 0) assert((lastK - 1) * st + t < n,
        s"doc $id has a redundant final chunk")
    }
  }

  test("chunk text is the exact token slice; non-overlapping spans reconstruct the document") {
    val st = Chunking.ChunkStride
    chunks.foreach { case (id, rs) =>
      val w = docs(id)
      rs.foreach { case (_, _, start, len, text) =>
        val expect = w.slice(start.toInt, (start + len).toInt).mkString(" ")
        assert(text == expect, s"doc $id slice at $start")
      }
      // taking the first `stride` tokens of each chunk (all of the last)
      // rebuilds the token stream exactly once
      val rebuilt = rs.init.flatMap { case (_, _, start, _, text) =>
        text.split(" ").filter(_.nonEmpty).take(st)
      } ++ rs.last._5.split(" ").filter(_.nonEmpty)
      assert(rebuilt.toSeq == w, s"doc $id reconstruction")
    }
  }

  test("adjacent chunks overlap by exactly tokens-minus-stride on interior windows") {
    val t = Chunking.ChunkTokens; val st = Chunking.ChunkStride
    chunks.values.foreach { rs =>
      rs.sliding(2).foreach {
        case Array((_, _, s1, l1, _), (_, _, s2, l2, _)) =>
          val overlap = (s1 + l1) - s2
          if (l2 == t) assert(overlap == t - st) // interior pair
          else assert(overlap >= 1, "clipped tail still overlaps")
        case _ => ()
      }
    }
  }
}
