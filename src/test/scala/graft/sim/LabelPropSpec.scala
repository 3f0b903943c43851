package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Frozen-label propagation on planted graphs: a clique spreads its single
  * seed label in one round, seeds never change, unreached nodes stay NULL,
  * and majority-with-min-label tie-break is exact. */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Write an embeddings fixture where same-`group` vectors are
    * near-identical (one LSH bucket, mutual kNN clique) and groups are
    * antipodal-ish (distinct buckets). Supports 2 groups. */
  private def withVectors[T](rows: Seq[(Long, Int, Int)])(f: String => T): T = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lprop")
    try {
      val data = rows.map { case (id, label, group) =>
        // group 1 is antipodal to group 0: every LSH plane's sign flips,
        // so the two groups can never share a bucket
        val base = Array.fill(64)(if (group == 0) 1.0f else -1.0f)
        base(id.toInt % 64) += 0.001f * (id + 1)
        (id, base.toSeq, label)
      }
      data.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      f(dir.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("clique adopts its seed's label; seeds keep theirs; isolates NULL") {
    // group 0: ids 0..3 (seed: 0 with label 7); group 1: id 5 alone —
    // no mutual edges, not a seed (5 % 4 != 0) → label_pred NULL
    val rows = Seq((0L, 7, 0), (1L, 9, 0), (2L, 9, 0), (3L, 9, 0), (5L, 1, 1))
    withVectors(rows) { dir =>
      val got = LabelProp.labelPropKnn(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
      assert(got(0L) == (true, Some(7)))   // seed keeps its label
      Seq(1L, 2L, 3L).foreach { id =>
        assert(got(id) == (false, Some(7)), s"node $id: ${got(id)}")
      }
      assert(got(5L) == (false, None), "isolate must stay unlabeled")
    }
  }

  test("majority wins; ties break to the smallest label") {
    // one clique of 5: seeds 0 (label 3) and 4 (label 1) — non-seeds see
    // one vote each → tie → smallest label (1) wins
    val rows = Seq((0L, 3, 0), (1L, 8, 0), (2L, 8, 0), (3L, 8, 0), (4L, 1, 0))
    withVectors(rows) { dir =>
      val got = LabelProp.labelPropKnn(spark, dir).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
      Seq(1L, 2L, 3L).foreach { id =>
        assert(got(id).contains(1), s"node $id: ${got(id)} (tie → min)")
      }
      assert(got(0L).contains(3) && got(4L).contains(1))
    }
  }

  test("confusion table counts only non-seeds and sums to them") {
    val rows = Seq((0L, 7, 0), (1L, 9, 0), (2L, 9, 0), (3L, 9, 0), (5L, 1, 1))
    withVectors(rows) { dir =>
      val cells = LabelProp.labelPropConfusion(spark, dir).collect()
        .map(r => (r.getInt(0),
          if (r.isNullAt(1)) None else Some(r.getInt(1))) -> r.getLong(2)).toMap
      assert(cells.values.sum == 4L) // 5 nodes, 1 seed
      assert(cells((9, Some(7))) == 3L)
      assert(cells((1, None)) == 1L)
    }
  }
}
