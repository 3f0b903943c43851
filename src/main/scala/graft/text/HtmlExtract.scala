package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-crawl HTML main-content extraction — the pipeline stage BEFORE
  * every text operator this engine ships: real LLM corpora start from
  * crawled HTML, and quality/dedup/tokenizer tiers all assume the
  * boilerplate (nav, header, footer, scripts, styles, asides) is
  * already gone. This family makes that stage a first-class, oracle-
  * gated operator.
  *
  * The fixture corpus is clean text by design, so — the `pii_redact`
  * playbook — the dirt is synthesized deterministically in-query: each
  * document is wrapped into a full page (title/style/script head,
  * header, link-heavy nav, content div, aside, link+copyright footer)
  * whose boilerplate derives only from `doc_id`/`source`, so both
  * engines build the byte-identical page. Extraction then proceeds
  * exactly as a production boilerplate stripper would:
  *
  *  1. remove `<script>`/`<style>` subtrees (their TEXT is not content);
  *  2. segment the page into candidate blocks (header/nav/div/aside/
  *     footer);
  *  3. score each block by text MASS — stripped-text length × text
  *     density (len_text²/len_block), the CETR/boilerpipe-family
  *     heuristic: content blocks carry much text with little markup,
  *     nav/footer blocks are markup- and link-heavy;
  *  4. the max-mass block is the main content; everything else is
  *     boilerplate, reported as `boilerplate_ratio` =
  *     1 − main_text/all_text.
  *
  * `recovered` closes the loop: extraction succeeded iff the main text
  * equals the whitespace-normalized original document. The whole chain
  * is per-row `regexp_replace`/`regexp_extract` projections — zero
  * shuffle at any scale ([[boilerplateRatio]] adds one
  * sources-bounded rollup). The oracle replays page synthesis,
  * stripping, block scoring and selection in DuckDB, so one byte of
  * divergence (a regex dialect difference, a tie-break order bug) reds
  * the hash.
  */
object HtmlExtract {

  // Page template pieces, shared verbatim by the Spark projection and
  // the DuckDB oracle (no single quotes — they are inlined into SQL
  // string literals).
  val P1 = "<html><head><title>Doc "
  val P2 = "</title><style>body{margin:0;font:14px sans}</style><script>var page="
  val P3 = ";track(\""
  val P4 = "\");</script></head><body><header><h1>"
  val P5 = " portal</h1></header><nav><a href=\"/\">home</a><a href=\"/"
  val P6 = "\">"
  val P7 = "</a><a href=\"/p/"
  val P8 = "\">archive</a></nav><div id=\"main\"><p>"
  val P9 = "</p></div><aside><a href=\"/r/"
  val P10 = "\">related</a></aside><footer><a href=\"/tos\">terms</a>" +
    "<a href=\"/privacy\">privacy</a> copyright "
  val P11 = " "
  val P12 = "</footer></body></html>"

  val ScriptRe = "(?s)<script>.*?</script>"
  val StyleRe = "(?s)<style>.*?</style>"
  val TagRe = "<[^>]*>"
  /** Whitespace class spelled out explicitly rather than `\s`: Java
    * regex (Spark) and RE2 (the DuckDB oracle) disagree on `\s` —
    * Java includes `\x0B` (vertical tab), RE2 does not — so a VT in a
    * document would normalize differently per engine. The explicit
    * class is dialect-independent (both escapes below are interpreted
    * identically by Java regex and RE2). */
  val WsRe = "[ \\t\\n\\x0B\\f\\r]+"
  /** Candidate blocks in fixed precedence order (ties in the mass
    * score resolve to the earlier tag — part of the contract). */
  val BlockTags = Seq("div", "header", "nav", "aside", "footer")
  def blockRe(tag: String): String = s"(?s)<$tag[^>]*>.*?</$tag>"

  /** Every ParkedMod-th page is "parked": an empty content div — the
    * all-boilerplate page (redirect stubs, domain-parking, cookie
    * walls) every real crawl contains. These drive the non-div
    * selection branches and the `recovered = false` path, so the gate
    * exercises the block competition instead of div winning 100% of
    * rows. */
  val ParkedMod = 13

  /** The deterministic synthetic page for one document row. */
  def pageCol: Column = concat(
    lit(P1), col("doc_id"), lit(P2), col("doc_id"), lit(P3), col("source"),
    lit(P4), col("source"), lit(P5), col("source"), lit(P6), col("source"),
    lit(P7), col("doc_id") % 10, lit(P8),
    when(col("doc_id") % ParkedMod === 0, lit("")).otherwise(col("text")),
    lit(P9), col("doc_id") % 7, lit(P10), (col("doc_id") % 25) + 2000,
    lit(P11), col("source"), lit(P12))

  /** Tag-strip + whitespace-normalize: what a block "says". */
  private def stripped(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, TagRe, " "), WsRe, " "))

  /** Strip/segment/score/select over a frame that already carries a
    * `page` column — the raw-HTML core shared by the batch gate and the
    * streaming ingest twin ([[graft.streaming.StreamHtmlExtract]]),
    * which has no original `text` to compare against. Adds `main_tag`,
    * `main_txt`, `all_txt`. */
  def scored(withPage: DataFrame): DataFrame = {
    val noss = regexp_replace(regexp_replace(col("page"), ScriptRe, " "),
      StyleRe, " ")
    var df = withPage.withColumn("noss", noss)
    for (t <- BlockTags) {
      df = df.withColumn(s"b_$t", regexp_extract(col("noss"), blockRe(t), 0))
        .withColumn(s"t_$t", stripped(col(s"b_$t")))
        // square in DOUBLE: length() is IntegerType, and int*int overflows
        // 32 bits at ~46 kchars of block text (ANSI throws; non-ANSI
        // silently diverges from DuckDB's BIGINT length) — cast the first
        // factor so the product is 64-bit like the oracle's
        .withColumn(s"m_$t", when(length(col(s"b_$t")) > 0,
          length(col(s"t_$t")).cast("double") * length(col(s"t_$t")) /
            length(col(s"b_$t"))).otherwise(lit(0.0)))
    }
    // argmax by mass with the fixed BlockTags precedence on ties
    val mainTag = BlockTags.init.zipWithIndex.foldLeft(
      null.asInstanceOf[Column]) { case (acc, (t, i)) =>
        val rest = BlockTags.drop(i + 1).map(u => col(s"m_$u"))
        val cond = col(s"m_$t") >= (if (rest.size == 1) rest.head
          else greatest(rest: _*))
        if (acc == null) when(cond, t) else acc.when(cond, t)
      }.otherwise(BlockTags.last)
    val pick = (f: String => Column) => BlockTags.init.foldRight(
      f(BlockTags.last)) { (t, acc) => when(col("main_tag") === t, f(t))
        .otherwise(acc) }
    df.withColumn("main_tag", mainTag)
      .withColumn("main_txt", pick(t => col(s"t_$t")))
      .withColumn("all_txt", stripped(col("noss")))
  }

  /** The extraction verdict columns shared by batch and stream. */
  private def verdictCols: Seq[Column] = Seq(
    col("main_tag"),
    length(col("main_txt")).cast("long").as("main_len"),
    // a fully empty page (no text anywhere) is all boilerplate
    when(length(col("all_txt")) > 0,
      round(lit(1.0) - length(col("main_txt")).cast("double") /
        length(col("all_txt")), 4)).otherwise(lit(1.0))
      .as("boilerplate_ratio"))

  /** Extraction over an arbitrary (doc_id, source, text[, page]) frame —
    * the page defaults to the synthetic wrap, the spec feeds real
    * hand-built pages through `pageOverride`. */
  def extract(docs: DataFrame, pageOverride: Option[Column] = None): DataFrame =
    scored(docs.withColumn("page", pageOverride.getOrElse(pageCol)))
      .select(col("doc_id") +: col("source") +: verdictCols :+
        (col("main_txt") === trim(regexp_replace(col("text"), WsRe, " ")))
          .as("recovered") :+
        substring(sha2(col("main_txt"), 256), 1, 16).as("main_sha"): _*)

  /** Raw-page extraction (no reference text, so no `recovered`): the
    * shape a crawl ingest actually runs — also the streaming twin's
    * projection. */
  def extractPages(pages: DataFrame): DataFrame =
    scored(pages)
      .select(col("doc_id") +: verdictCols :+
        substring(sha2(col("main_txt"), 256), 1, 16).as("main_sha"): _*)

  /** Gate: per-document extraction verdict over the synthetic crawl. */
  def htmlExtract(s: SparkSession, dir: String): DataFrame =
    extract(Tables.parallel(s, dir, "documents"))
      .drop("source")

  /** Gate: the per-source boilerplate readout a crawl operator watches —
    * recovery rate and boilerplate mass by source. Sources-bounded
    * rollup (≤ 20 groups) over the zero-shuffle extraction scan. */
  def boilerplateRatio(s: SparkSession, dir: String): DataFrame =
    extract(Tables.parallel(s, dir, "documents"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("recovered"), 1L).otherwise(0L)).as("n_recovered"),
        round(avg(col("boilerplate_ratio")), 4).as("mean_boilerplate"),
        round(max(col("boilerplate_ratio")), 4).as("max_boilerplate"))

  /** href-attribute pattern shared with the oracle (group 1 = target). */
  val HrefRe = "href=\"([^\"]*)\""

  /** Gate: outlink extraction — the crawl-frontier stage: every href
    * target across the page corpus with link and page counts. Per-row
    * `regexp_extract_all` + explode; the rollup is bounded by the link
    * TARGET domain (site nav/footer targets + per-source/per-bucket
    * paths — tens of rows here; at 100 TB targets grow with distinct
    * URLs, the standard crawl-frontier shuffle ∝ links). */
  def htmlLinks(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "documents")
      .withColumn("page", pageCol)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("page"), lit(HrefRe), lit(1)))
          .as("href"))
      .groupBy("href")
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_pages"))

  /** Gate: the crawl→quality composition — Gopher rules evaluated on
    * the EXTRACTED main text (not the fixture's clean column), per
    * source: pages, content-found pages, and extracted-text quality
    * passes. Proves the two stages compose: parked pages (no content
    * block) can never pass, recovered pages pass iff their original
    * text does. One extraction scan + sources-bounded rollup. */
  def crawlQualityFunnel(s: SparkSession, dir: String): DataFrame = {
    val ex = scored(Tables.parallel(s, dir, "documents")
      .withColumn("page", pageCol))
    val w = filter(split(col("main_txt"), " "), x => x =!= "")
    val nWords = size(w).cast("long")
    val sumLen = aggregate(transform(w, x => length(x).cast("long")),
      lit(0L), (a, x) => a + x)
    val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
    val nStop = size(filter(w,
      x => array_contains(TextQueries.stopArr, x))).cast("long")
    val pass = nWords >= 1 &&
      nWords.between(TextQueries.GopherMinWords, TextQueries.GopherMaxWords) &&
      (sumLen / nWords) >= TextQueries.GopherMinMeanLen &&
      (sumLen / nWords) <= TextQueries.GopherMaxMeanLen &&
      (nAlpha / nWords) >= TextQueries.GopherMinAlphaFrac &&
      nStop >= TextQueries.GopherMinStopHits
    ex.groupBy("source")
      .agg(count(lit(1)).as("n_pages"),
        sum(when(col("main_tag") === "div", 1L).otherwise(0L))
          .as("n_content"),
        sum(when(pass, 1L).otherwise(0L)).as("n_quality"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "html_extract" -> htmlExtract,
    "boilerplate_ratio" -> boilerplateRatio,
    "html_links" -> htmlLinks,
    "crawl_quality_funnel" -> crawlQualityFunnel)

  /** Shared extraction CTE chain (DuckDB), parameterized by the source
    * relation (must expose doc_id, source, text) and a CTE-name prefix —
    * [[CrawlDedup]]'s recrawl oracle replays the chain TWICE (base and
    * edited snapshot) in one query, so the second chain's CTE names
    * must not collide with the first's. */
  def htmlCteFrom(docsRel: String, p: String): String = {
    val blocks = BlockTags.map { t =>
      s"regexp_extract(noss, '(?s)<$t[^>]*>.*?</$t>', 0) AS b_$t"
    }.mkString(",\n|    ")
    val texts = BlockTags.map { t =>
      s"trim(regexp_replace(regexp_replace(b_$t, '<[^>]*>', ' ', 'g'), " +
        s"'$WsRe', ' ', 'g')) AS t_$t"
    }.mkString(",\n|    ")
    val masses = BlockTags.map { t =>
      s"CASE WHEN length(b_$t) > 0 THEN length(t_$t) * length(t_$t) " +
        s"* 1.0 / length(b_$t) ELSE 0.0 END AS m_$t"
    }.mkString(",\n|    ")
    val mainTag = BlockTags.init.zipWithIndex.map { case (t, i) =>
      val rest = BlockTags.drop(i + 1).map(u => s"m_$u")
      val cmp = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(", ")})"
      s"WHEN m_$t >= $cmp THEN '$t'"
    }.mkString("CASE ", " ", s" ELSE '${BlockTags.last}' END AS main_tag")
    val mainTxt = BlockTags.init.map { t =>
      s"WHEN main_tag = '$t' THEN t_$t"
    }.mkString("CASE ", " ", s" ELSE t_${BlockTags.last} END AS main_txt")
    // NB: continuation lines here must never START with "||" — this CTE
    // is re-interpolated into outer stripMargin strings, which would
    // strip a leading whitespace+| as a second margin.
    s"""${p}pg AS (SELECT doc_id, source, text,
      |    '$P1' || doc_id || '$P2' || doc_id || '$P3' || source ||
      |      '$P4' || source || '$P5' || source || '$P6' || source ||
      |      '$P7' || (doc_id % 10) || '$P8' ||
      |      (CASE WHEN doc_id % $ParkedMod = 0 THEN '' ELSE text END) ||
      |      '$P9' || (doc_id % 7) || '$P10' || (doc_id % 25 + 2000) ||
      |      '$P11' || source || '$P12' AS page
      |  FROM $docsRel),
      |${p}ns AS (SELECT doc_id, source, text,
      |    regexp_replace(regexp_replace(page,
      |      '$ScriptRe', ' ', 'g'), '$StyleRe', ' ', 'g') AS noss
      |  FROM ${p}pg),
      |${p}bl AS (SELECT doc_id, source, text, noss,
      |    $blocks
      |  FROM ${p}ns),
      |${p}tx AS (SELECT *,
      |    $texts
      |  FROM ${p}bl),
      |${p}ms AS (SELECT *,
      |    $masses
      |  FROM ${p}tx),
      |${p}mt AS (SELECT *,
      |    $mainTag
      |  FROM ${p}ms),
      |${p}ex AS (SELECT doc_id, source, main_tag,
      |    $mainTxt,
      |    trim(regexp_replace(regexp_replace(noss, '<[^>]*>', ' ', 'g'),
      |      '$WsRe', ' ', 'g')) AS all_txt,
      |    text
      |  FROM ${p}mt),
      |${p}res AS (SELECT doc_id, source, main_tag,
      |    length(main_txt)::BIGINT AS main_len,
      |    CASE WHEN length(all_txt) > 0
      |      THEN round(1.0 - length(main_txt) * 1.0 / length(all_txt), 4)
      |      ELSE 1.0 END AS boilerplate_ratio,
      |    main_txt = trim(regexp_replace(text, '$WsRe', ' ', 'g'))
      |      AS recovered,
      |    substr(sha256(main_txt), 1, 16) AS main_sha
      |  FROM ${p}ex)""".stripMargin
  }

  /** The unprefixed chain over `documents` — the form every existing
    * oracle composes (`pg`/`ex`/`res` names unchanged). */
  val htmlCte: String = htmlCteFrom("documents", "")

  val oracles: Map[String, String] = Map(
    "html_extract" ->
      s"""WITH $htmlCte
        |SELECT doc_id, main_tag, main_len, boilerplate_ratio, recovered,
        |  main_sha
        |FROM res""".stripMargin,
    "boilerplate_ratio" ->
      s"""WITH $htmlCte
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN recovered THEN 1 ELSE 0 END)::BIGINT AS n_recovered,
        |  round(avg(boilerplate_ratio), 4) AS mean_boilerplate,
        |  round(max(boilerplate_ratio), 4) AS max_boilerplate
        |FROM res GROUP BY source""".stripMargin,
    "html_links" ->
      s"""WITH $htmlCte
        |SELECT href, count(*)::BIGINT AS n_links,
        |  count(DISTINCT doc_id)::BIGINT AS n_pages
        |FROM (SELECT doc_id,
        |        unnest(regexp_extract_all(page, '$HrefRe', 1)) AS href
        |      FROM pg)
        |GROUP BY href""".stripMargin,
    "crawl_quality_funnel" -> {
      import TextQueries._
      s"""WITH $htmlCte,
        |wq AS (SELECT source, main_tag,
        |    list_filter(string_split(main_txt, ' '), x -> x <> '') AS w
        |  FROM ex),
        |q AS (SELECT source, main_tag,
        |    (CASE WHEN len(w) = 0 THEN false ELSE
        |      (len(w) BETWEEN $GopherMinWords AND $GopherMaxWords)
        |      AND list_sum(list_transform(w, x -> length(x))) * 1.0
        |          / len(w) >= $GopherMinMeanLen
        |      AND list_sum(list_transform(w, x -> length(x))) * 1.0
        |          / len(w) <= $GopherMaxMeanLen
        |      AND len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |          * 1.0 / len(w) >= $GopherMinAlphaFrac
        |      AND len(list_filter(w, x -> x IN ($stopListSql)))
        |          >= $GopherMinStopHits END) AS pass
        |  FROM wq)
        |SELECT source, count(*)::BIGINT AS n_pages,
        |  sum(CASE WHEN main_tag = 'div' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_content,
        |  sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_quality
        |FROM q GROUP BY source""".stripMargin
    })
}
