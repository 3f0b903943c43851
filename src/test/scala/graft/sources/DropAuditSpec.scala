package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The drop audit must be a total, disjoint labeling that agrees
  * row-for-row with the relations it narrates: kept == the survivor
  * set, exact/near == the removal tiers, keepers are real kept-side
  * representatives. */
class DropAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val audit = DropAudit.dropAudit(spark, dir).collect()
    .map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("verdict"),
        Option(r.getAs[java.lang.Long]("keeper_id")).map(_.toLong))))
    .toMap

  test("total and consistent with the survivor relation") {
    val n = graft.Tables(spark, dir, "documents").count()
    assert(audit.size == n, "one audit row per input doc")
    val kept = audit.collect { case (id, ("kept", _)) => id }.toSet
    val surv = CorpusManifest.survivors(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == surv, "kept verdicts are exactly the survivors")
    // the fixture plants byte-identical dups only at sf0.1 (8 there, 0
    // at sf0.001/0.01 — probed), so exact_dup is exercised by the
    // sf0.1 oracle gate; the other classes must fire here
    val classes = audit.values.map(_._1).toSet
    assert(Set("kept", "near_dup", "quality").subsetOf(classes))
  }

  test("dedup verdicts equal the removal tiers; keepers are cluster " +
    "representatives") {
    val (ex, near) = graft.dedup.ConnectedComponents.removalTiers(spark, dir)
    val exSet = ex.collect().map(_.getLong(0)).toSet
    val nearSet = near.collect().map(_.getLong(0)).toSet
    assert(audit.collect { case (id, ("exact_dup", _)) => id }.toSet == exSet)
    assert(audit.collect { case (id, ("near_dup", _)) => id }.toSet == nearSet)
    audit.foreach {
      case (id, ("exact_dup", Some(k))) =>
        assert(k < id, s"exact keeper is the min id (doc $id)")
      case (id, ("near_dup", Some(k))) =>
        assert(k < id, s"cluster label is the min member (doc $id)")
      case (id, ("exact_dup" | "near_dup", None)) =>
        fail(s"dedup drop without a keeper (doc $id)")
      case (id, (("kept" | "quality"), Some(_))) =>
        fail(s"non-dedup verdict carries a keeper (doc $id)")
      case _ => ()
    }
  }
}
