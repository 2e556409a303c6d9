package graft

/** Every registered query must execute at sf0.001 (oracle equivalence is
  * the driver's/oracle_check.py's job; this guards executability and the
  * queries/oracleSql key contract). */
class QueriesSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qs
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every queries entry is oracle-checked (no rows-only regressions)") {
    // Round-2 closed the last rows-only gaps (hash families replayed in
    // DuckDB); a new query shipping without an oracle is a coverage
    // regression, not a style choice — fail loudly.
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries without oracle: $unchecked")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
