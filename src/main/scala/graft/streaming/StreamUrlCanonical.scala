package graft.streaming

import graft.text.UrlCanonical
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of the URL canonicalizer — frontier hygiene applied
  * ONLINE: outlinks arrive as (doc_id, u) records off the live crawl
  * (the [[StreamHtmlExtract]] stage's href output) and each is
  * canonicalized through the SAME rule chain as the batch gate
  * ([[UrlCanonical.canonicalize]] reused verbatim), emitting the
  * (raw_url, canonical, host) record the frontier scheduler consumes.
  * Stateless append: canonicalization is per-record regexp work, so
  * micro-batch boundaries cannot change any output and stream ≡ batch
  * is exact (`StreamUrlCanonicalSpec`). The frontier DEDUP that
  * follows (same canonical target seen twice) is a separate stateful
  * concern — in this engine it is the batch rollup (`url_canonical`)
  * plus the watermarked dedup twin discipline, not this projection. */
object StreamUrlCanonical {

  /** (doc_id, u) stream → (doc_id, raw_url, canonical, host). */
  def canonicalOverStream(urls: DataFrame): DataFrame =
    urls.select(col("doc_id"), col("u").as("raw_url"),
        UrlCanonical.canonicalize(col("u")).as("canonical"))
      .withColumn("host",
        regexp_extract(col("canonical"), UrlCanonical.SchemeHostRe, 2))

  def outputMode: OutputMode = OutputMode.Append()
}
