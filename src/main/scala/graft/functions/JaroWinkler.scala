package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a codegen'd Catalyst expression — the
  * record-linkage scorer Spark lacks natively (reference analogue: the
  * fuzzy-match leg of entity cleanup; cf. q169's edit-distance pairs).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` builtin
  * (empirically bit-identical over 20k random pairs, incl. the
  * either-empty → 0.0 convention), so the DuckDB oracle can score the
  * same pairs with its own implementation:
  *  - Jaro: greedy window matching (window = max(l1,l2)/2 - 1, floor,
  *    min 0), half-transpositions, (m/l1 + m/l2 + (m-t)/m) / 3 with
  *    divisions in exactly that order;
  *  - Winkler boost only when jaro > 0.7: j + p*0.1*(1-j), common
  *    prefix p capped at 4.
  * Operates on UTF-16 code units (ASCII-safe; matches DuckDB on the
  * ASCII name spaces it is used over).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.score(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  // One static call per row (the matching loop is data-dependent —
  // inlining it into generated Java would buy nothing over the JIT'd
  // static method, and the call keeps the expression codegen-compatible
  // so the surrounding filter stays inside WholeStageCodegen).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.score($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** DuckDB-parity Jaro-Winkler score; see class doc for the pinned
    * convention. Called from generated code via the static forwarder. */
  def score(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + win)
      var j = math.max(0, i - win)
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3
    if (j0 > 0.7) {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      j0 + p * 0.1 * (1 - j0)
    } else j0
  }

  val NAME = "graft_jaro_winkler"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => JaroWinkler(exprs.head, exprs(1)), "built-in")

  def jaroWinkler(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(NAME, a, b)
  }
}
