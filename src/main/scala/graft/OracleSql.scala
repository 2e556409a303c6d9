package graft

import scala.util.matching.Regex

/** Post-processor for the DuckDB oracle statements.
  *
  * DuckDB 1.0 inlines a WITH-clause CTE at every reference site, so a CTE
  * referenced N times re-executes its whole upstream chain N times. The
  * heavy replay oracles (PQ codebook training, the XXH64 hash chain, bloom
  * probes, ridge sufficient statistics) reference their expensive CTEs
  * many times — round 7's suite cost 625 s in DuckDB for that reason
  * alone, which starved the driver's compare budget and zeroed the round's
  * correctness signal (VERDICT r07 §What's wrong #1).
  *
  * `AS MATERIALIZED` is DuckDB's (and PostgreSQL 12+'s) standard
  * optimization fence: evaluate the CTE once, reuse the result. It is
  * purely an evaluation-strategy hint — results are identical — so
  * applying it to EVERY non-recursive CTE is semantics-preserving and
  * turns the 625 s suite into seconds (q398 measured 112.5 s → 0.8 s).
  *
  * Exclusions, both required for validity:
  *   - self-referencing (recursive) CTEs: a recursive CTE cannot be
  *     materialized ahead of its own iteration;
  *   - named-WINDOW definitions (`WINDOW w AS (...)`) share the
  *     `name AS (` surface but are not CTEs.
  */
object OracleSql {
  private val cteDef: Regex = """\b([A-Za-z_][A-Za-z0-9_]*)(\s+AS\s*)\(""".r
  private val prevToken: Regex = """([A-Za-z_][A-Za-z0-9_]*)\s*$""".r

  /** Insert `MATERIALIZED` into every CTE definition except recursive
    * self-references and named-window definitions. */
  def materializeCtes(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var m = cteDef.findFirstMatchIn(sql)
    // Recursion is only POSSIBLE under WITH RECURSIVE (in a plain WITH a
    // CTE's own name inside its body resolves to the outer table, not to
    // itself), so the self-reference guard applies only there — and
    // there it is deliberately CONSERVATIVE: any bare-word occurrence of
    // the CTE's name in its body (FROM x, JOIN x, `FROM other, x`,
    // `x AS alias` …) skips materialization. A spuriously-skipped CTE
    // costs a re-evaluation; a spuriously-MATERIALIZED recursive CTE is
    // a DuckDB error that zeroes the query's correctness row. The
    // structural spec check stays on the stricter FROM|JOIN detector, so
    // the transform can only be more cautious than what ships.
    val recursive =
      """(?i)\bWITH\s+RECURSIVE\b""".r.findFirstIn(sql).isDefined
    while (m.isDefined) {
      val mm = m.get
      val name = mm.group(1)
      val isWindow = prevToken
        .findFirstMatchIn(sql.substring(i, i + mm.start))
        .exists(_.group(1).equalsIgnoreCase("WINDOW"))
      val skipKeyword =
        name.equalsIgnoreCase("MATERIALIZED") || name.equalsIgnoreCase("NOT")
      val bodyEnd = matchParen(sql, i + mm.end)
      val body = sql.substring(i + mm.end, bodyEnd - 1)
      val selfRef = recursive &&
        ("""(?i)(?<![A-Za-z0-9_."])""" + Regex.quote(name) +
          """(?![A-Za-z0-9_"])""").r.findFirstIn(body).isDefined
      if (isWindow || skipKeyword || selfRef)
        out.append(sql.substring(i, i + mm.end))
      else {
        out.append(sql.substring(i, i + mm.start(2)))
        out.append(" AS MATERIALIZED (")
      }
      i += mm.end
      m = cteDef.findFirstMatchIn(sql.substring(i))
    }
    out.append(sql.substring(i))
    out.toString
  }

  /** Index just past the ')' closing the '(' at `start - 1`'s match —
    * `start` is the first char inside the paren. Single-quoted string
    * literals are skipped so a paren inside a regex literal cannot
    * unbalance the scan, and `--` line comments are skipped so an
    * apostrophe or unbalanced paren in a comment cannot desync it.
    * package-private: OracleSqlSpec's structural corpus check scans CTE
    * bodies with THIS scanner (not a copy), so the spec can never fall
    * out of sync with how production scopes a body. */
  private[graft] def matchParen(sql: String, start: Int): Int = {
    var depth = 1
    var j = start
    var inStr = false
    while (j < sql.length && depth > 0) {
      sql.charAt(j) match {
        case '\'' => inStr = !inStr
        case '-' if !inStr && j + 1 < sql.length && sql.charAt(j + 1) == '-' =>
          while (j < sql.length && sql.charAt(j) != '\n') j += 1
          j -= 1 // net +1 below lands on the newline (or end)
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case _ => ()
      }
      j += 1
    }
    j
  }
}
