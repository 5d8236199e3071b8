package graft.reports

/** Minimal MySQL→Spark SQL dialect shim for report queries.
  *
  * The reference's report SQL is MySQL-flavored — `DATE_FORMAT(NOW(),
  * '%Y-01-01')`, `CURDATE()` (reference README.md:313,321). Spark's
  * `date_format` uses JDK patterns, not `%`-tokens (SURVEY §2.6 F6:
  * "semantic gap"). Per SURVEY §7.5 we declare Spark SQL as the
  * authored dialect and provide this token-level shim so reference
  * report SQL runs unchanged. It is a string rewrite, NOT a SQL
  * parser — it covers exactly the constructs the reference uses.
  */
object MySqlDialect {
  private val tokenMap: Seq[(String, String)] = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%i" -> "mm", "%s" -> "ss")

  /** @param paramNames declared report parameters. The reference's
    *        report SQL binds them MySQL stored-procedure style — as
    *        BARE identifiers (`WHERE p.uuid = person_uuid`, reference
    *        README.md:296); Spark's parameterized SQL needs `:name`
    *        markers, so each declared name appearing as an unqualified
    *        identifier (outside string literals, not already a marker,
    *        not a `tbl.column` reference, not an `AS alias`) is
    *        rewritten to `:name`. Limitation (string rewrite, not a
    *        resolver): a declared param SHADOWS an unqualified column
    *        of the same name — qualify such columns (`t.name`) in the
    *        report SQL, as the reference's own examples do.
    */
  def translate(sql: String, paramNames: Seq[String] = Nil): String = {
    var out = sql
    out = out.replaceAll("(?i)\\bCURDATE\\s*\\(\\s*\\)", "current_date()")
    out = out.replaceAll("(?i)\\bNOW\\s*\\(\\s*\\)", "current_timestamp()")
    // MySQL %-tokens only ever appear inside DATE_FORMAT's literal —
    // rewrite them globally inside single-quoted strings.
    out = rewriteInStringLiterals(out)
    if (paramNames.nonEmpty) out = outsideStringLiterals(out) { chunk =>
      paramNames.foldLeft(chunk) { (acc, name) =>
        // alias positions are protected by POSITIVELY matching the
        // optional `AS  <name>` prefix (any amount of whitespace —
        // a fixed-width lookbehind can't express \s+) and keeping
        // such matches verbatim; only bare occurrences become markers
        val m = java.util.regex.Pattern.compile(
          "(\\b(?i:AS)\\s+)?(?<![.:\\w])" +
            java.util.regex.Pattern.quote(name) + "(?![\\w])").matcher(acc)
        val sb = new StringBuffer
        while (m.find()) {
          val repl = if (m.group(1) != null) m.group(0) else ":" + name
          m.appendReplacement(sb,
            java.util.regex.Matcher.quoteReplacement(repl))
        }
        m.appendTail(sb)
        sb.toString
      }
    }
    out
  }

  /** Apply `f` to the segments of `sql` NOT inside single-quoted
    * string literals (literals pass through verbatim).
    */
  private def outsideStringLiterals(sql: String)(f: String => String): String = {
    val sb = new StringBuilder
    val chunk = new StringBuilder
    var inString = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inString && c == '\'') {
        sb.append(f(chunk.toString)); chunk.clear()
        chunk.append(c); inString = true
      } else if (inString && c == '\'') {
        chunk.append(c); sb.append(chunk); chunk.clear()
        inString = false
      } else chunk.append(c)
      i += 1
    }
    sb.append(if (inString) chunk.toString else f(chunk.toString))
    sb.toString
  }

  private def rewriteInStringLiterals(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inString = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { inString = !inString; sb.append(c); i += 1 }
      else if (inString && c == '%' && i + 1 < sql.length) {
        val tok = sql.substring(i, i + 2)
        tokenMap.find(_._1 == tok) match {
          case Some((_, repl)) => sb.append(repl); i += 2
          case None            => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
