package graft.streaming

import graft.text.HtmlExtract
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of the HTML main-content extractor — the ingest-time
  * path a live crawl runs: raw pages arrive as (doc_id, page) records
  * and each micro-batch strips/segments/scores through the SAME
  * projection chain as the batch gate ([[HtmlExtract.scored]] reused
  * verbatim via [[HtmlExtract.extractPages]]). Stateless append mode:
  * extraction is per-record regexp work, so micro-batch boundaries
  * cannot change any verdict and stream ≡ batch is exact
  * (`StreamHtmlExtractSpec`). No watermark, no state store — O(0)
  * state at any rate. */
object StreamHtmlExtract {

  /** (doc_id, page) stream → (doc_id, main_tag, main_len,
    * boilerplate_ratio, main_sha). */
  def extractOverStream(pages: DataFrame): DataFrame =
    HtmlExtract.extractPages(pages)

  def outputMode: OutputMode = OutputMode.Append()
}
