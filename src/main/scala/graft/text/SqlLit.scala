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

  /** Literal for Spark `expr(...)` fragments. ALL control characters
    * (c < 0x20) are backslash-escaped — named escapes for \n \r \t, the
    * parser's `\uXXXX` form for the rest — matching [[duck]]'s chr()
    * handling of the full C0 range: every inlining call site assembles
    * its SQL with `stripMargin`, which would otherwise eat a data
    * newline's leading `  |` — the literal must never span lines. */
  def spark(v: String): String =
    "'" + v.flatMap {
      case '\\' => "\\\\"
      case '\'' => "\\'"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "'"

  /** Literal for DuckDB oracle SQL. Standard `''` literals have no
    * escape for control characters (a raw newline is legal but falls
    * into the same `stripMargin` trap), so values containing any are
    * emitted as a `'seg' || chr(n) || 'seg'` concatenation — an
    * expression, valid everywhere these literals are inlined
    * (IN-lists, CASE comparisons, VALUES rows). */
  def duck(v: String): String = {
    def quote(s: String) = "'" + s.replace("'", "''") + "'"
    if (!v.exists(_ < ' ')) quote(v)
    else {
      val parts = Seq.newBuilder[String]
      val buf = new StringBuilder
      v.foreach { c =>
        if (c < ' ') {
          if (buf.nonEmpty) { parts += quote(buf.toString); buf.clear() }
          parts += s"chr(${c.toInt})"
        } else buf.append(c)
      }
      if (buf.nonEmpty) parts += quote(buf.toString)
      "(" + parts.result().mkString(" || ") + ")"
    }
  }
}
