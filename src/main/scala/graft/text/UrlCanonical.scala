package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl-frontier URL canonicalization — the hygiene stage between
  * outlink extraction ([[HtmlExtract.htmlLinks]]) and frontier
  * scheduling/dedup: raw URLs differing only in case of scheme/host,
  * default port, tracking parameters, fragments, or a trailing slash
  * are the SAME fetch target, and a frontier that misses this crawls
  * everything twice. The canonical form applies the standard
  * normalizations (RFC 3986 §6 syntax-based normalization plus the
  * common tracking-param strip):
  *
  *   1. lowercase scheme and host (path stays case-sensitive);
  *   2. drop the default port (`:80` http, `:443` https — a
  *      non-default port survives);
  *   3. drop the fragment (`#…` — never sent to the server);
  *   4. drop `utm_*` tracking query parameters wherever they sit;
  *      tidy the dangling `?`/`&` that leaves behind;
  *   5. drop a trailing `/` on a non-root path.
  *
  * The fixture corpus carries no URLs, so — the `pii_redact` playbook —
  * each doc contributes three deterministic raw URLs derived from
  * `doc_id`/`source`, built so EVERY rule fires on some population
  * (mixed-case host + default port + leading/trailing utm params +
  * fragment; explicit default https port + conditional trailing slash;
  * an already-canonical control on a non-default port) and so distinct
  * raw URLs COLLIDE after canonicalization (same source and id
  * residues ⇒ same target), making the per-host dedup ratio real.
  * Pure per-row regexp projections + one target-keyed rollup — the
  * frontier shuffle ∝ distinct targets.
  */
object UrlCanonical {

  /** Three raw URLs per doc; dirt assigned by arithmetic. The STRIPPED
    * dirt varies on moduli (7, 11, 9) chosen coprime to the canonical
    * key's class modulus (source ⊗ path ⊗ kept-param ⇒ lcm 300 for u0,
    * 20 for u1), so distinct raw URLs genuinely COLLIDE onto one
    * canonical target across docs — the dedup ratio the gate reports
    * is real, not an artifact of every raw URL being unique anyway. */
  /** Slot-0 raw URL — the doc's PAGE url (mixed-case scheme+host,
    * default :80, utm first AND last, fragment); factored out because
    * [[CrawlDedup]] uses it as the per-doc fetch target. */
  def u0: Column =
    concat(lit("HTTP://WWW."), col("source"),
      lit(".Example.COM:80/Art/item"), col("doc_id") % 50,
      lit("?utm_source=feed&page="), col("doc_id") % 3,
      lit("&utm_campaign=c"), col("doc_id") % 11,
      lit("#sec"), col("doc_id") % 7)

  def rawUrls: Column = array(
    u0,
    // explicit default https port; every 4th doc: bare trailing slash
    concat(lit("https://"), col("source"), lit(".example.com:443/cat/"),
      col("doc_id") % 20,
      when(col("doc_id") % 4 === 0, lit("/"))
        .otherwise(concat(lit("/?page="), col("doc_id") % 4)),
      lit("#r"), col("doc_id") % 9),
    // already-canonical control (non-default port survives untouched)
    concat(lit("https://cdn.example.org:8443/static/"), col("doc_id") % 10))

  val SchemeHostRe = "^([a-zA-Z]+)://([^/?#]*)(.*)$"

  /** Tracking-param strip, anchored to a parameter BOUNDARY: the match
    * must start at `?` or `&` (kept via group 1), so a non-tracking
    * parameter whose name merely ends in `utm_*` (`?myutm_source=1`)
    * is never touched — an unanchored `utm_...` would corrupt it to
    * `?my`. The repeated inner group eats a whole RUN of consecutive
    * utm params (each inner match ends at the next `&`) in one
    * replacement, so `?utm_a=1&utm_b=2&p=3` → `?p=3` in a single
    * pass. Replacement is the captured delimiter (`$1` Java / `\1`
    * RE2); a dangling `?`/`&` that leaves at end-of-query is tidied by
    * the next rule. */
  val UtmRe = "([?&])(?:utm_[a-z]+=[^&#]*&?)+"

  /** Canonicalize one URL column (the shared rule chain). */
  def canonicalize(u: Column): Column = {
    val scheme = lower(regexp_extract(u, SchemeHostRe, 1))
    val host0 = lower(regexp_extract(u, SchemeHostRe, 2))
    val rest0 = regexp_extract(u, SchemeHostRe, 3)
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val noFrag = regexp_replace(rest0, "#.*$", "")
    val noUtm = regexp_replace(noFrag, UtmRe, "$1")
    val tidy = regexp_replace(noUtm, "[?&]+$", "")
    val noSlash = regexp_replace(tidy, "^(/.+)/$", "$1")
    concat(scheme, lit("://"), host, noSlash)
  }

  /** Gate: per-host frontier rollup — raw links, distinct raw URLs,
    * canonical targets: the dedup ratio canonicalization buys.
    * Two-level aggregation with a SINGLE distinct aggregate: the
    * (host, u, c) pre-combine collapses repeat links map-side AND
    * keeps the plan deterministic — two `countDistinct`s in one
    * aggregate let `RewriteDistinctAggregates` order its Expand
    * groups by a hash that flips across JVMs (observed: the
    * url_canonical plan digest was bistable), while one distinct
    * group has nothing to reorder. `u` determines `c`, so
    * count(*) over the pre-combined relation IS the distinct-URL
    * count. */
  def urlCanonical(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "documents")
      .select(explode(rawUrls).as("u"))
      .withColumn("c", canonicalize(col("u")))
      .withColumn("host", regexp_extract(col("c"), SchemeHostRe, 2))
      .groupBy("host", "u", "c")
      .agg(count(lit(1)).as("n"))
      .groupBy("host")
      .agg(sum(col("n")).as("n_links"),
        count(lit(1)).as("n_raw_urls"),
        countDistinct(col("c")).as("n_targets"))

  /** Gate: rule-by-rule evidence — every (raw, canonical) pair for a
    * bounded doc slice (doc_id < 40: review-sized, same at every SF);
    * one rule diverging between engines reds the hash. */
  def urlCanonicalPairs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), posexplode(rawUrls).as(Seq("slot", "u")))
      .select(col("doc_id"), col("slot").cast("long").as("slot"),
        col("u").as("raw_url"), canonicalize(col("u")).as("canonical"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "url_canonical" -> urlCanonical,
    "url_canonical_pairs" -> urlCanonicalPairs)

  /** The same rule chain as a DuckDB expression over column `u` —
    * shared with the [[CrawlDedup]] oracles. */
  private[text] def canonExpr: String = {
    val scheme = s"lower(regexp_extract(u, '$SchemeHostRe', 1))"
    val host0 = s"lower(regexp_extract(u, '$SchemeHostRe', 2))"
    val rest0 = s"regexp_extract(u, '$SchemeHostRe', 3)"
    val host = s"(CASE WHEN $scheme = 'http' " +
      s"THEN regexp_replace($host0, ':80$$', '') " +
      s"WHEN $scheme = 'https' " +
      s"THEN regexp_replace($host0, ':443$$', '') ELSE $host0 END)"
    val noFrag = s"regexp_replace($rest0, '#.*$$', '')"
    val noUtm = s"regexp_replace($noFrag, '$UtmRe', '\\1', 'g')"
    val tidy = s"regexp_replace($noUtm, '[?&]+$$', '')"
    val noSlash = s"regexp_replace($tidy, '^(/.+)/$$', '\\1')"
    s"$scheme || '://' || $host || $noSlash"
  }

  // NB: no line may START with "||" — this CTE is re-interpolated into
  // outer stripMargin strings (see HtmlExtract.htmlCte for the same rule)
  /** SQL twin of [[u0]] (shared with the [[CrawlDedup]] oracles). */
  private[text] val U0Sql: String =
    "'HTTP://WWW.' || source || '.Example.COM:80/Art/item' || " +
      "(doc_id % 50) || '?utm_source=feed&page=' || (doc_id % 3) || " +
      "'&utm_campaign=c' || (doc_id % 11) || '#sec' || (doc_id % 7)"

  private val rawCte =
    s"""raw AS (
      |  SELECT doc_id, 0 AS slot,
      |    $U0Sql AS u
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 1,
      |    'https://' || source || '.example.com:443/cat/' || (doc_id % 20) ||
      |      (CASE WHEN doc_id % 4 = 0 THEN '/'
      |          ELSE '/?page=' || (doc_id % 4) END) ||
      |      '#r' || (doc_id % 9)
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 2,
      |    'https://cdn.example.org:8443/static/' || (doc_id % 10)
      |  FROM documents)""".stripMargin

  def oracles: Map[String, String] = Map(
    "url_canonical" ->
      s"""WITH $rawCte,
        |c AS (SELECT u, $canonExpr AS c FROM raw)
        |SELECT regexp_extract(c, '$SchemeHostRe', 2) AS host,
        |  count(*)::BIGINT AS n_links,
        |  count(DISTINCT u)::BIGINT AS n_raw_urls,
        |  count(DISTINCT c)::BIGINT AS n_targets
        |FROM c GROUP BY 1""".stripMargin,
    "url_canonical_pairs" ->
      s"""WITH $rawCte
        |SELECT doc_id, slot::BIGINT AS slot, u AS raw_url,
        |  $canonExpr AS canonical
        |FROM raw WHERE doc_id < 40""".stripMargin)
}
