package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout assertions for the corpus materialization gate —
  * the properties the manifest relation summarizes but cannot itself
  * prove row-by-row: per-file doc_id sort order, the one-file-per-
  * source discipline, and survivor-set equivalence against the funnel
  * legs it composes. */
class CorpusManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val manifest = CorpusManifest.corpusManifest(spark, dir)
    .localCheckpoint(true) // also materializes the written artifact

  test("exactly one parquet file per source, sources complete") {
    val rows = manifest.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_files") == 1L),
      "repartition(source) must yield one file per source")
    val srcs = rows.map(_.getAs[String]("source")).toSet
    assert(srcs == CorpusManifest.survivors(spark, dir)
      .select("source").distinct().collect()
      .map(_.getString(0)).toSet)
  }

  test("rows inside every written file are sorted by doc_id") {
    manifest.count() // ensure written
    val out = CorpusManifest.outDir(dir)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(p => p.toString.endsWith(".parquet"))
      .toArray.map(_.toString)
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id")
        .collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"$f not sorted by doc_id")
    }
  }

  test("written set == survivors == docs minus tiers minus gopher-fails") {
    val out = CorpusManifest.outDir(dir)
    manifest.count()
    val back = spark.read.parquet(out).select("doc_id")
    val surv = CorpusManifest.survivors(spark, dir).select("doc_id")
    assert(back.exceptAll(surv).count() == 0)
    assert(surv.exceptAll(back).count() == 0)
    // the funnel actually bites: some docs are removed, some survive
    val total = graft.Tables(spark, dir, "documents").count()
    val n = surv.count()
    assert(n > 0 && n < total, s"degenerate funnel: $n of $total")
    // no survivor is in a removal tier
    val (ex, near) = graft.dedup.ConnectedComponents.removalTiers(spark, dir)
    assert(surv.join(ex.unionByName(near), Seq("doc_id"), "left_semi")
      .count() == 0)
  }

  test("manifest_delta: algebraic merge == one-pass recompute; both sides real") {
    val surv = CorpusManifest.survivors(spark, dir).localCheckpoint(true)
    val direct = CorpusManifest.contentManifest(surv)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val merged = CorpusManifest.manifestDelta(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(merged == direct)
    // the split is non-degenerate: both halves carry rows
    val bm = graft.dedup.SnapshotDedup.BatchMod
    assert(surv.filter(col("doc_id") % bm === 0).count() > 0)
    assert(surv.filter(col("doc_id") % bm =!= 0).count() > 0)
  }

  test("manifest_delta: a source present on one side only merges intact") {
    import spark.implicits._
    val one = Seq((3L, "only batch side", "en", "solo", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val empty = one.filter(col("doc_id") < 0)
    val mOne = CorpusManifest.contentManifest(one).collect().head
    // merging with an empty other side must reproduce the same row —
    // XOR identity 0, sums with 0, min/max skip the absent side
    val both = CorpusManifest.contentManifest(one.unionByName(empty))
      .collect().head
    assert(mOne.toSeq == both.toSeq)
  }

  test("content_xor detects a corrupted artifact") {
    val out = CorpusManifest.outDir(dir)
    val good = manifest.select("source", "content_xor").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // append one byte to one row's text and recompute the checksum: the
    // touched source's xor must flip, every other source's must not
    val one = spark.read.parquet(out).select("doc_id", "source").head()
    val docId = one.getAs[Long]("doc_id")
    val src = one.getAs[String]("source")
    val bad = spark.read.parquet(out)
      .withColumn("text", when(col("doc_id") === docId,
        concat(col("text"), lit("!"))).otherwise(col("text")))
      .withColumn("h", conv(substring(
        sha2(concat(col("doc_id"), lit("|"), col("text")), 256), 1, 15),
        16, 10).cast("long"))
      .groupBy("source").agg(expr("bit_xor(h)").as("content_xor"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bad(src) != good(src), "checksum must catch a flipped row")
    assert(good.filter(_._1 != src).forall { case (k, v) => bad(k) == v },
      "other sources' checksums unaffected")
  }
}
