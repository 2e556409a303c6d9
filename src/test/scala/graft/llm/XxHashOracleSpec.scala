package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class XxHashOracleSpec extends SparkSpec {

  test("familySeed replicates Spark's xxhash64 over an int, every family") {
    // The DuckDB oracle's family constants are computed by this Scala
    // formula; if it drifts from Spark's XxHash64 the MinHash oracle would
    // report a confusing signature mismatch — pin it here at the source.
    import spark.implicits._
    val sparkSide = (0 until 64).toDF("i")
      .select(col("i"), xxhash64(col("i")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (i <- 0 until 64) {
      val u = XxHashOracle.familySeed(i)
      val signed =
        if (u >= (BigInt(1) << 63)) (u - (BigInt(1) << 64)).toLong else u.toLong
      assert(signed == sparkSide(i), s"family $i")
    }
  }

  test("hashLongConst replicates Spark's xxhash64 over a long") {
    // q380's per-step XOR constants xxhash64(lit(t)) are folded to
    // literals by this formula; pin it against Spark at the source.
    import spark.implicits._
    val inputs = Seq(0L, 1L, 2L, 3L, 42L, -1L, Long.MaxValue, Long.MinValue,
      1234567890123L)
    val sparkSide = inputs.toDF("l")
      .select(col("l"), xxhash64(col("l")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (l <- inputs) {
      val u = XxHashOracle.hashLongConst(BigInt(l), BigInt(42))
      val signed =
        if (u >= (BigInt(1) << 63)) (u - (BigInt(1) << 64)).toLong else u.toLong
      assert(signed == sparkSide(l), s"long $l")
    }
  }

  /** Minimal interpreter for the HUGEINT SQL fragment grammar the oracle
    * generators emit — numbers, chain variables, `CAST(x AS T)` (no-op),
    * `xor(a, b)`, and binary `* + - << >> & |` with DuckDB/PostgreSQL
    * precedence: `*` over `+ -`, and ALL other binary operators on one
    * level below them, left-associative. Evaluating the ACTUAL emitted
    * text (BigInt mirrors HUGEINT: no intermediate exceeds 128 bits by
    * construction) is what lets sbt catch a chain edit that only the
    * external DuckDB gate would otherwise see. */
  private def evalSql(sql: String, env: Map[String, BigInt]): BigInt = {
    val toks = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit) {
        val j = i; while (i < sql.length && sql.charAt(i).isDigit) i += 1
        toks += sql.substring(j, i)
      } else if (c.isLetter || c == '_') {
        val j = i
        while (i < sql.length &&
          (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        toks += sql.substring(j, i)
      } else if ((c == '<' || c == '>') && i + 1 < sql.length &&
          sql.charAt(i + 1) == c) {
        toks += s"$c$c"; i += 2
      } else { toks += c.toString; i += 1 }
    }
    var p = 0
    def peek = if (p < toks.length) toks(p) else ""
    def next(): String = { val t = toks(p); p += 1; t }
    def expect(t: String): Unit =
      { val g = next(); assert(g == t, s"expected $t got $g") }
    def primary(): BigInt = next() match {
      case "(" => val v = expr(1); expect(")"); v
      case "xor" =>
        expect("("); val a = expr(1); expect(",")
        val b = expr(1); expect(")"); a ^ b
      case "CAST" =>
        expect("("); val v = expr(1); expect("AS"); next(); expect(")"); v
      case t if t.head.isDigit => BigInt(t)
      case id => env.getOrElse(id, fail(s"unbound variable $id"))
    }
    // precedence: 1 = & | << >> (one shared level, left-assoc, like
    // DuckDB's "any other operator"), 2 = + -, 3 = *
    def lvl(t: String): Int = t match {
      case "&" | "|" | "<<" | ">>" => 1
      case "+" | "-" => 2
      case "*" => 3
      case _ => 0
    }
    def expr(min: Int): BigInt = {
      var lhs = primary()
      while (lvl(peek) >= min) {
        val op = next()
        val rhs = expr(lvl(op) + 1)
        lhs = op match {
          case "&" => lhs & rhs
          case "|" => lhs | rhs
          case "<<" => lhs << rhs.toInt
          case ">>" => lhs >> rhs.toInt
          case "+" => lhs + rhs
          case "-" => lhs - rhs
          case "*" => lhs * rhs
        }
      }
      lhs
    }
    val v = expr(1)
    assert(p == toks.length, s"trailing tokens: ${toks.drop(p).take(8)}")
    v
  }

  private def unsigned(l: Long): BigInt =
    if (l < 0) BigInt(l) + (BigInt(1) << 64) else BigInt(l)
  private def signedOf(u: BigInt): Long =
    if (u >= (BigInt(1) << 63)) (u - (BigInt(1) << 64)).toLong else u.toLong

  private val parityCases: Seq[(Long, Long)] = for {
    h <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789012L)
    s <- Seq(42L, 0L, -7L, 9876543210L)
  } yield (h, s)

  test("hashLongSubquery's emitted step chain evaluates bit-for-bit to " +
      "Spark's XxHash64 hashLong for every (input, seed) class") {
    for ((h, s) <- parityCases) {
      var env = Map("_xh0" -> unsigned(h), "_xsd" -> unsigned(s))
      for ((colName, ex) <- XxHashOracle.hashLongSteps)
        env += colName -> evalSql(ex, env)
      val want = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(h, org.apache.spark.sql.types.LongType, s)
      assert(signedOf(env("_out")) == want, s"h=$h seed=$s")
    }
  }

  test("the inline hashLong macro evaluates bit-for-bit to Spark's " +
      "XxHash64 hashLong (same inputs as the chain)") {
    val macroText = XxHashOracle.hashLong("_hin", "_hseed")
    for ((h, s) <- parityCases) {
      val got = evalSql(macroText,
        Map("_hin" -> unsigned(h), "_hseed" -> unsigned(s)))
      val want = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(h, org.apache.spark.sql.types.LongType, s)
      assert(signedOf(got) == want, s"h=$h seed=$s")
    }
  }

  test("signedHashCol wires the chain with seed 42 and a signed fold") {
    val sql = XxHashOracle.signedHashCol("t", Seq("id"), "id", "h")
    assert(sql.contains("CAST(42 AS HUGEINT)"), sql.take(300))
    assert(sql.contains("_xh1") && sql.contains("_xh6"), sql.take(300))
    // the unsigned result folds to signed via the two's-complement CASE
    assert(sql.contains("- CAST(18446744073709551616 AS HUGEINT)"),
      sql.take(300))
  }

  test("generated oracle SQL embeds per-parameter structure") {
    val sql = XxHashOracle.minhashSql(n = 3, bands = 16, rowsPerBand = 4,
      tau = 0.5)
    assert(sql.contains("range(16)") && sql.contains(">= 0.5"), sql.take(200))
    val sql2 = XxHashOracle.minhashSql(n = 2, bands = 8, rowsPerBand = 2,
      tau = 0.25)
    assert(sql2.contains("range(8)") && sql2.contains(">= 0.25"))
    assert(sql2.contains("tk[i] || ' ' || tk[i+1]"))
  }
}
