package graft.text

/** String-literal quoting for data-derived values inlined into SQL text
  * (trained pieces, merges, vocab rows) — one definition per ENGINE,
  * because the two engines disagree on backslash semantics: Spark's SQL
  * parser interprets backslash escapes inside single-quoted literals
  * (so `\` must be doubled), while DuckDB treats backslashes literally
  * and only the quote needs doubling. Using one quoting for both (the
  * original shared `q`) silently diverges the moment a corpus token
  * contains a backslash. Both forms also neutralize quotes, so corpus
  * data can never inject expression text.
  */
object SqlLit {

  /** Literal for Spark `expr(...)` fragments. */
  def spark(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Literal for DuckDB oracle SQL. */
  def duck(v: String): String =
    "'" + v.replace("'", "''") + "'"
}
