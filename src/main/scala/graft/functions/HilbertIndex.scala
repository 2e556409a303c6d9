package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the classic iterative xy2d walk
  * (per level, high bit to low: quadrant digit d += s²·((3·rx)⊕ry),
  * then rotate/reflect the frame) as ONE native codegen'd expression.
  *
  * This replaces the earlier 12-chained-`withColumns` formulation in
  * [[graft.ops.Layout.hilbertIndex]]: that shape is logically linear in
  * `bits`, but whole-stage codegen fuses all 12 projections into one
  * generated method whose size trips the JIT/codegen limits and falls
  * back to interpreted per-level evaluation — the q212 failure class
  * (observed: 5.6 s steady-state for a map-only pass over ~600 k rows
  * at sf0.1). A single expression with an explicit `for` loop in
  * `doGenCode` keeps the generated method tiny and branch-predictable.
  * The walk is bit-identical to [[graft.ops.Layout.hilbertSqlCtes]]'s
  * DuckDB replay (same per-level rewrite, same rotation convention).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def nullSafeEval(xIn: Any, yIn: Any): Any = {
    var x = xIn.asInstanceOf[Long]
    var y = yIn.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { val t = s - 1L - y; y = s - 1L - x; x = t }
        else { val t = x; x = y; y = t }
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      s"""
        |long $x = $xc;
        |long $y = $yc;
        |long $d = 0L;
        |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
        |  long rx = (($x & $s) != 0L) ? 1L : 0L;
        |  long ry = (($y & $s) != 0L) ? 1L : 0L;
        |  $d += $s * $s * ((3L * rx) ^ ry);
        |  if (ry == 0L) {
        |    if (rx == 1L) { long t = $s - 1L - $y; $y = $s - 1L - $x; $x = t; }
        |    else { long t = $x; $x = $y; $y = t; }
        |  }
        |}
        |${ev.value} = $d;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  val NAME = "graft_hilbert_index"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => HilbertIndex(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue), "built-in")

  /** Hilbert d in [0, 4^bits) of (x, y); coords must be bigint in
    * [0, 2^bits). */
  def hilbert(x: Column, y: Column, bits: Int): Column = {
    register(SparkSession.active)
    call_function(NAME, x, y, lit(bits))
  }
}
