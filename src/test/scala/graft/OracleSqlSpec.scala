package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[OracleSql.materializeCtes]] — the DuckDB CTE-materialization hint
  * that keeps the oracle suite inside the driver's compare budget. The
  * transform must hit every plain CTE and must NOT touch recursive
  * self-references or named-WINDOW definitions (both would be DuckDB
  * errors). */
class OracleSqlSpec extends AnyFunSuite {

  test("plain CTE gains MATERIALIZED") {
    val in = "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a) " +
      "SELECT * FROM a JOIN b USING (x)"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("a AS MATERIALIZED (SELECT 1 AS x)"))
    assert(out.contains("b AS MATERIALIZED (SELECT x FROM a)"))
  }

  test("recursive self-referencing CTE is left untouched") {
    val in = """WITH RECURSIVE reach AS (SELECT u, v FROM e
      UNION SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
      base AS (SELECT 1 AS k)
      SELECT * FROM reach, base"""
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("reach AS (SELECT"))
    assert(!out.contains("reach AS MATERIALIZED"))
    assert(out.contains("base AS MATERIALIZED (SELECT 1 AS k)"))
  }

  test("comma-form recursive self-reference (FROM other, name) is left " +
      "untouched — the r9 selfRef regex only saw FROM/JOIN forms") {
    val in = """WITH RECURSIVE reach AS (SELECT u, v FROM e
      UNION SELECT r.u, e2.v FROM e e2, reach r WHERE r.v = e2.u),
      base AS (SELECT 1 AS k)
      SELECT * FROM reach, base"""
    val out = OracleSql.materializeCtes(in)
    assert(!out.contains("reach AS MATERIALIZED"), out)
    assert(out.contains("base AS MATERIALIZED (SELECT 1 AS k)"), out)
  }

  test("the recursive guard is bare-word conservative: an alias collision " +
      "inside a WITH RECURSIVE statement skips materialization (cheap) " +
      "rather than risking a circular materialized CTE") {
    val in = """WITH RECURSIVE walk AS (SELECT 1 AS n
      UNION ALL SELECT n + 1 FROM walk WHERE n < 3),
      agg AS (SELECT max(n) AS agg FROM walk)
      SELECT agg FROM agg"""
    val out = OracleSql.materializeCtes(in)
    assert(!out.contains("walk AS MATERIALIZED"), out)
    // `agg`'s body mentions its own name as a column alias — bare-word
    // match, so the conservative rule skips it inside WITH RECURSIVE
    assert(!out.contains("agg AS MATERIALIZED"), out)
  }

  test("plain WITH (no RECURSIVE) needs no self-reference guard: DuckDB " +
      "rejects a shadowing CTE at bind time with or without the hint, so " +
      "every working plain-WITH CTE is materializable") {
    val in = "WITH q AS (SELECT x FROM base q WHERE q.x > 0) " +
      "SELECT * FROM q"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("q AS MATERIALIZED"), out)
  }

  test("named WINDOW definition is not a CTE") {
    val in = "SELECT sum(x) OVER w FROM t WINDOW w AS (PARTITION BY k)"
    assert(OracleSql.materializeCtes(in) === in)
  }

  test("CTE body with nested parens and string literal balances") {
    val in = "WITH g AS (SELECT regexp_split_to_array(trim(t), '(a)') " +
      "AS arr FROM docs) SELECT * FROM g"
    val out = OracleSql.materializeCtes(in)
    assert(out.startsWith("WITH g AS MATERIALIZED (SELECT"))
    // the ')' inside the quoted regex must not close the CTE early:
    // 'docs' is part of the body, so the transform sees no self-reference
    assert(out.endsWith("FROM docs) SELECT * FROM g"))
  }

  test("column alias `x AS name` and CAST(x AS TYPE) are untouched") {
    val in = "SELECT a AS b, CAST(a AS BIGINT) FROM (SELECT 1 AS a) t"
    assert(OracleSql.materializeCtes(in) === in)
  }

  test("total oracle corpus stays under 8 MB") {
    // Per-statement caps miss broad regressions (many mid-size macro
    // expansions); the corpus total is the complementary proxy. Round-9
    // healthy value: ~2.0 MB over 442 statements after every inline
    // XXH64 macro was linearized.
    val total = SparkEntry.oracleSql.values.map(_.length.toLong).sum
    assert(total < 8L * 1024 * 1024,
      s"oracle corpus is $total bytes — a macro-expansion regression;" +
        " see XxHashOracle.hashLongSubquery / signedHashCol")
  }

  test("no oracle statement exceeds 2 MB") {
    // Round 8 shipped a 36.3 MB q380 oracle (a hashLong macro nested
    // inside itself) that cost DuckDB ~365 s / ~10 GB to parse+bind and
    // zeroed CORRECTNESS_r08. Statement size is the cheap proxy that
    // catches runaway textual macro expansion before it ships.
    val limit = 2 * 1024 * 1024
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.length < limit,
        s"$name oracle is ${sql.length} bytes (limit $limit) — " +
          "likely a nested macro expansion; linearize via chained CTEs")
    }
  }

  test("every registered oracle still parses structurally: balanced parens" +
      " and no MATERIALIZED on a self-referencing CTE") {
    val matDef = """\b([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+MATERIALIZED\s*\(""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val opens = sql.count(_ == '(')
      val closes = sql.count(_ == ')')
      assert(opens === closes, s"$name unbalanced")
      // a materialized CTE must not reference itself (DuckDB cannot
      // materialize a recursive CTE ahead of its own iteration); body
      // scoping reuses production's comment/string-aware scanner so the
      // two can never desync
      matDef.findAllMatchIn(sql).foreach { m =>
        val j = OracleSql.matchParen(sql, m.end)
        val body = sql.substring(m.end, j - 1)
        val cte = m.group(1)
        // a self-reference is a TABLE reference (FROM x / JOIN x); the
        // name reappearing as a column alias inside its own body is fine
        assert(("""(?i)\b(FROM|JOIN)\s+""" + cte + """\b""").r
          .findFirstIn(body).isEmpty,
          s"$name materialized self-referencing CTE $cte")
      }
    }
  }
}
