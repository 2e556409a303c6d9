package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import JaroWinkler.score

  test("classic textbook pairs (DuckDB-pinned values)") {
    // Values cross-checked against DuckDB's jaro_winkler_similarity.
    assert(score("martha", "marhta") === 0.9611111111111111)
    assert(score("dixon", "dicksonx") === 0.8133333333333332)
    assert(score("abc", "abc") === 1.0)
  }

  test("empty-string convention matches DuckDB: either empty -> 0") {
    assert(score("", "") === 0.0)
    assert(score("a", "") === 0.0)
    assert(score("", "abc") === 0.0)
  }

  test("no matches -> 0; boost only above 0.7") {
    assert(score("abc", "xyz") === 0.0)
    // jaro("ab","ba") -- window max(2,2)/2-1 = 0: no cross matches at
    // distance 1, so m=0 -> 0.0 (the window rule, not intuition).
    assert(score("ab", "ba") === 0.0)
  }

  test("transposition scoring is exact") {
    // "abcdef" vs "abcdfe": m=6, t=1 -> jaro=(1+1+5/6)/3, prefix 4.
    val j = (1.0 + 1.0 + 5.0 / 6.0) / 3
    assert(score("abcdef", "abcdfe") === j + 4 * 0.1 * (1 - j))
  }

  test("codegen path agrees with interpreted eval") {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("", ""), ("abcdef", "abcdfe"), ("supplier#1", "supplier#2"))
    val df = pairs.toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    assert(got === pairs.map { case (a, b) => score(a, b) })
  }

  test("null propagates") {
    import spark.implicits._
    val df = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
    assert(df.collect().head.isNullAt(0))
  }
}
