package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant and replay checks for the crawl URL↔content dedup gates:
  * mirror sets must be consistent with the cluster relation they ride,
  * cross-host mirrors must actually fire, and the recrawl changed flag
  * must equal a first-principles recompute (a target changed iff it
  * serves an edited NON-PARKED doc — edits to parked pages never reach
  * the extracted content). */
class CrawlDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("mirror sets: bounds, representatives, cluster consistency") {
    val rows = CrawlDedup.urlMirrorSets(spark, dir).collect()
    assert(rows.nonEmpty, "mirror sets must exist")
    rows.foreach { r =>
      val (nDocs, nUrls, nHosts) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_urls"), r.getAs[Long]("n_hosts"))
      assert(nUrls >= 2, "a mirror set spans >= 2 URLs by definition")
      assert(nUrls <= nDocs, "each member contributes exactly one URL")
      assert(nHosts >= 1 && nHosts <= nUrls)
      assert(r.getAs[String]("first_url") <= r.getAs[String]("last_url"))
    }
    // the cross-host path must fire (planted near-dup clusters span
    // sources, hence hosts)
    assert(rows.exists(_.getAs[Long]("n_hosts") >= 2),
      "cross-host mirror sets must exist")
    // consistency with the ridden relation: reported n_docs is the
    // cluster size of that cluster_id
    val sizes = graft.dedup.ConnectedComponents.dedupClusters(spark, dir)
      .select("cluster_id", "cluster_size").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        sizes(r.getAs[Long]("cluster_id")))
    }
  }

  test("recrawl delta: changed == target serves an edited non-parked doc") {
    val got = CrawlDedup.urlRecrawlDelta(spark, dir).collect()
      .map(r => r.getAs[String]("target") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Boolean]("changed")))).toMap
    // expected from first principles over the raw docs
    val expected = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        UrlCanonical.canonicalize(UrlCanonical.u0).as("target"))
      .groupBy("target")
      .agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % CrawlDedup.EditMod === 0 &&
          col("doc_id") % HtmlExtract.ParkedMod =!= 0, 1L).otherwise(0L))
          .as("n_edited_visible"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2) > 0L))).toMap
    assert(got.keySet == expected.keySet, "target domains must coincide")
    got.foreach { case (t, (n, changed)) =>
      assert((n, changed) == expected(t), s"target $t")
    }
    // both outcomes must fire, including the subtle one: some target
    // whose only edited members are parked stays UNCHANGED
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
    val invisibleEdit = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        UrlCanonical.canonicalize(UrlCanonical.u0).as("target"))
      .groupBy("target")
      .agg(
        sum(when(col("doc_id") % CrawlDedup.EditMod === 0, 1L)
          .otherwise(0L)).as("n_edited"),
        sum(when(col("doc_id") % CrawlDedup.EditMod === 0 &&
          col("doc_id") % HtmlExtract.ParkedMod =!= 0, 1L).otherwise(0L))
          .as("n_visible"))
      .filter(col("n_edited") > 0 && col("n_visible") === 0)
      .collect().map(_.getString(0))
    assert(invisibleEdit.nonEmpty,
      "the parked-page invisible-edit population must exist at sf0.001")
    invisibleEdit.foreach { t =>
      assert(!got(t)._2, s"edit invisible to extraction must not flag $t")
    }
  }

  test("crawl_schedule: per-host budget, changed-first order, WGL plan") {
    val df = CrawlDedup.crawlSchedule(spark, dir)
    // partial+final WindowGroupLimit: only budget rows per host cross
    // the final shuffle (the q13 top-k plan discipline)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      "rank cap must push down as partial+final WindowGroupLimit")
    val byHost = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
      .groupBy(_._1)
    byHost.foreach { case (host, rows) =>
      assert(rows.length <= CrawlDedup.HostBudget, s"$host over budget")
      assert(rows.map(_._2).sorted.sameElements(1L to rows.length),
        s"$host ranks must be dense from 1")
      // changed targets schedule strictly before unchanged ones
      val ord = rows.sortBy(_._2).map(_._3)
      assert(ord.sameElements(ord.sortBy(!_)), s"$host: changed-first")
    }
    // the budget genuinely binds somewhere (hosts have > budget targets)
    assert(byHost.values.exists(_.length == CrawlDedup.HostBudget))
  }

  test("url_fetch_once: conservation, savings fire, bounds") {
    val rows = CrawlDedup.urlFetchOnce(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (host, nUrls, nFetch, nSaved) =>
      assert(nFetch + nSaved == nUrls, s"$host conservation")
      assert(nFetch >= 0 && nSaved >= 0, host)
    }
    // mirrors exist, so the collapse must save fetches somewhere
    assert(rows.map(_._4).sum > 0, "mirror collapse must save work")
    // corpus-wide: representatives = distinct kept urls <= content
    // families; every family keeps at most one url
    val labels = graft.dedup.ConnectedComponents.dedupClusters(spark, dir)
    val nDocs = graft.Tables(spark, dir, "documents").count()
    val nFamilies = nDocs - labels.count() +
      labels.select("cluster_id").distinct().count()
    assert(rows.map(_._3).sum <= nFamilies)
  }

  test("url_mirror_hosts: unordered pairs, C(n,2) mass matches the sets") {
    val pairs = CrawlDedup.urlMirrorHosts(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    pairs.foreach { case (a, b, nPairs, nContents) =>
      assert(a <= b, "host pairs must be normalized (least, greatest)")
      assert(nContents >= 1 && nContents <= nPairs)
    }
    // total witness pairs == Σ C(n_urls, 2) over the mirror sets — the
    // two gates must describe the same pair mass
    val expected = CrawlDedup.urlMirrorSets(spark, dir).collect()
      .map(_.getAs[Long]("n_urls")).map(n => n * (n - 1) / 2).sum
    assert(pairs.map(_._3).sum == expected,
      "host-pair mass must equal the set-level C(n,2) total")
    // cross-host mirror pairs genuinely fire
    assert(pairs.exists { case (a, b, _, _) => a != b })
  }
}
