package graft.tools

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks the scale-measurement tooling itself: SCALE_VALIDATION.md's
  * numbers are only as good as the corpus generator's invariants (facts
  * ×F with consistent keys, dims verbatim, per-user timelines preserved)
  * and the family lists' query names resolving. A factor-2 corpus at
  * sf0.001 keeps the spec fast. */
class ScaleToolsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val base = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scalegen-spec").toString
    ScaleGen.generate(spark, base, dir, 2)
    dir
  }

  test("every ScaleValidate family query name resolves in SparkEntry") {
    val names = ScaleValidate.Families.flatMap(_._3)
    val missing = names.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown queries in Families: $missing")
    assert(names.distinct.size == names.size, "duplicate family entries")
  }

  test("every gate query is scale-measured or explicitly exempt") {
    // The inverse completeness check (round-6 ADVICE: classifier_calibration
    // was silently unmeasured): a NEW gate query must either join a
    // Families row or be added here WITH a reason — an unlisted query
    // fails loudly instead of skipping scale validation forever.
    val measured = ScaleValidate.Families.flatMap(_._3).toSet
    val exempt: Set[String] = ScaleToolsSpec.ScaleExempt
    val unmeasured =
      SparkEntry.queries.keySet -- measured -- exempt
    assert(unmeasured.isEmpty,
      s"gate queries neither scale-measured nor exempt: ${unmeasured.toSeq.sorted}")
    val stale = exempt.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"exempt entries no longer registered: $stale")
    val both = exempt & measured
    assert(both.isEmpty, s"exempt entries that ARE measured (drop them): $both")
  }

  test("facts scale ×F with consistent keys, dims verbatim") {
    def cnt(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    Seq("orders", "lineitem").foreach { t =>
      assert(cnt(out, t) == 2 * cnt(base, t), s"$t not ×2")
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      assert(cnt(out, t) == cnt(base, t), s"dim $t changed")
    }
    // the order⋈line join stays key-consistent: every scaled lineitem
    // orderkey exists in scaled orders (and vice-versa key sets match)
    val o = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_orderkey").as("k")).distinct()
    val l = spark.read.parquet(s"$out/lineitem.parquet")
      .select(col("l_orderkey").as("k")).distinct()
    assert(l.join(o, Seq("k"), "left_anti").count() == 0,
      "lineitem orderkeys missing from orders")
    // fact growth lands on fixed dim keys: distinct custkeys unchanged
    val baseCust = spark.read.parquet(s"$base/orders.parquet")
      .select(countDistinct("o_custkey")).head().getLong(0)
    val scaledCust = spark.read.parquet(s"$out/orders.parquet")
      .select(countDistinct("o_custkey")).head().getLong(0)
    assert(scaledCust == baseCust, "custkey domain should not grow")
  }

  test("events: users ×F with per-user timelines preserved verbatim") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val b = spark.read.parquet(s"$base/events.parquet")
    val s2 = spark.read.parquet(s"$out/events.parquet")
    assert(s2.count() == 2 * b.count())
    val bu = b.select(countDistinct("user_id")).head().getLong(0)
    val su = s2.select(countDistinct("user_id")).head().getLong(0)
    assert(su == 2 * bu, s"users $su != 2 × $bu")
    // replica 1 of a user's timeline is the base timeline shifted by
    // Stride: the multiset of (ts, event_type, value) per shifted user
    // matches the base user exactly
    val baseSig = b.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type"),
        col("value")))).as("sig"))
    val replicaSig = s2.filter(col("user_id") >= ScaleGen.Stride)
      .withColumn("user_id", col("user_id") - ScaleGen.Stride)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type"),
        col("value")))).as("sig"))
    val mismatch = baseSig.as("a").join(replicaSig.as("b"), Seq("user_id"))
      .filter(col("a.sig") =!= col("b.sig"))
    assert(replicaSig.count() == bu)
    assert(mismatch.count() == 0, "replica timelines differ from base")
  }

  test("documents: replica 1 plants exact dups, others share no tokens") {
    val d = spark.read.parquet(s"$out/documents.parquet")
    val baseDocs = spark.read.parquet(s"$base/documents.parquet")
    assert(d.count() == 2 * baseDocs.count())
    // every 10th doc of replica 1 is a verbatim copy of its base doc
    val dup = d.filter(col("doc_id") >= ScaleGen.Stride &&
        (col("doc_id") - ScaleGen.Stride) % 10 === 0)
      .withColumn("doc_id", col("doc_id") - ScaleGen.Stride)
      .select(col("doc_id"), col("text").as("t2"))
    val joined = baseDocs.join(dup, Seq("doc_id"))
    assert(joined.count() > 0)
    assert(joined.filter(col("text") =!= col("t2")).count() == 0,
      "planted exact duplicates are not verbatim")
  }

  test("fixed-dup variant: per-replica structure preserved, replicas disjoint") {
    // self-contained base with KNOWN dup structure (sf0.001 carries no
    // exact-dup group, so the per-replica reproduction claim needs a
    // planted one): one exact pair, one singleton
    import spark.implicits._
    val fdBase = java.nio.file.Files
      .createTempDirectory("graft-scalegen-fd-base").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s1", 29L),
      (1L, "alpha beta gamma delta epsilon", "en", "s1", 29L),
      (2L, "totally different river storm words", "en", "s2", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$fdBase/documents.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scalegen-fd-spec").toString
    ScaleGen.generateFixedDup(spark, fdBase, dir, 3)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    assert(d.count() == 9)
    // replica 0 is verbatim
    val r0 = d.filter(col("doc_id") < ScaleGen.Stride)
      .select(col("doc_id"), col("text").as("t2"))
    assert(spark.read.parquet(s"$fdBase/documents.parquet")
      .join(r0, Seq("doc_id"))
      .filter(col("text") =!= col("t2")).count() == 0, "replica 0 mutated")
    // replicas share NO tokens: spaces are replica-private by construction
    val tok = d.select((col("doc_id") / ScaleGen.Stride).cast("int").as("k"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .select("k", "t").distinct()
    val cross = tok.as("a").join(tok.as("b"),
      col("a.t") === col("b.t") && col("a.k") < col("b.k"))
    assert(cross.count() == 0, "replica token spaces overlap")
    // the base's internal exact-dup structure reproduces inside EVERY
    // replica (equal texts stay equal under the per-token remap): one
    // size-2 group per replica, never a cross-replica group
    val groups = d
      .select((col("doc_id") / ScaleGen.Stride).cast("int").as("k"),
        sha2(col("text"), 256).as("h"))
      .groupBy("k", "h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .groupBy("k").agg(count(lit(1)).as("n_groups"), sum("c").as("dup_docs"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(groups == Map(0 -> ((1L, 2L)), 1 -> ((1L, 2L)), 2 -> ((1L, 2L))),
      s"per-replica dup structure not reproduced: $groups")
  }
}

object ScaleToolsSpec {
  /** Gate queries deliberately outside the scale matrix, each with its
    * reason — all dim-/fixture-bounded inputs that ScaleGen keeps
    * VERBATIM (only facts/events/documents grow), so a scaling row
    * would be a degenerate flat line by construction:
    *   - storm_fixture: the 271-record golden storm file (fixed file).
    *   - q10_party_union: union of customer+supplier dims (dims fixed).
    *   - fuzzy_name_pairs / fuzzy_jaro_pairs: blocked self-join over
    *     the part dim (dim fixed; the operator's scale shape is the
    *     banded-pairs law already measured on the growing document
    *     corpus). */
  val ScaleExempt: Set[String] =
    Set("storm_fixture", "q10_party_union", "fuzzy_name_pairs",
      "fuzzy_jaro_pairs")
}
