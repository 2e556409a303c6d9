package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling (polynomial) fingerprint over a string's bytes:
  * h = sum(b_i * BASE^(n-1-i)) mod 2^61-1 — the document-fingerprint
  * primitive (content-defined chunking, shingling, plagiarism-style
  * matching all build on it). One codegen'd pass over the UTF-8 bytes;
  * wraparound-free via the Mersenne-prime modulus in 128-bit-free long
  * arithmetic (BASE < 2^8, state < 2^61, so state*BASE fits a long after
  * the mod-split below).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // h = (h * 257 + b) mod (2^61 - 1), split to avoid long overflow:
      // h < 2^61, h*257 needs up to 70 bits -> reduce via (a<<8 + a) form.
      val hi = h >>> 53          // top 8 bits of h (h*256's overflow part)
      val lo = (h << 8) & RollingHash.M  // h*256 mod 2^61-1 (low part)
      h = (lo + hi + h) % RollingHash.M  // h*257 = h*256 + h
      h = (h + (bytes(i) & 0xFF)) % RollingHash.M
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        |byte[] $bytes = $c.getBytes();
        |long $h = 0L;
        |for (int $i = 0; $i < $bytes.length; $i++) {
        |  long hi = $h >>> 53;
        |  long lo = ($h << 8) & ${RollingHash.M}L;
        |  $h = (lo + hi + $h) % ${RollingHash.M}L;
        |  $h = ($h + ($bytes[$i] & 0xFF)) % ${RollingHash.M}L;
        |}
        |${ev.value} = $h;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** 2^61 - 1 (Mersenne prime). */
  val M: Long = (1L << 61) - 1

  val NAME = "graft_rolling_hash"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => RollingHash(exprs.head), "built-in")

  def rollingHash(c: Column): Column = {
    register(SparkSession.active)
    call_function(NAME, c)
  }
}
