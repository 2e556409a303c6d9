package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity over two float-array
  * columns, fused into one loop with whole-stage codegen.
  *
  * The composable formulation (zip_with to multiply + aggregate to sum +
  * separate norm passes) allocates an intermediate array per row and walks
  * the vectors three times; this expression walks both arrays once, keeps
  * three scalar accumulators, and emits a plain Java loop via doGenCode —
  * the preference order the engine follows: built-ins where they fit,
  * a codegen'd Expression where the hot loop matters (SURVEY §2.6).
  *
  * Accumulation order (sequential, in double) is identical to the
  * composable version and to the DuckDB oracle's double-cast cosine, so
  * results are rank-stable across engines.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType

  // Null (not NaN) on degenerate inputs: a zero-norm or empty vector would
  // yield NaN, and Spark orders NaN above every double, so one bad embedding
  // would win every descending-similarity top-k. Mismatched dimensions are a
  // data error, not a prefix match — also null. Null sims sort last under
  // desc and fail >= filters, which is the semantics every consumer wants.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double xv = (double) $a.getFloat($i);
        |    double yv = (double) $b.getFloat($i);
        |    $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
        |  }
        |  if ($nx == 0.0 || $ny == 0.0) {
        |    ${ev.isNull} = true;
        |  } else {
        |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level access for the engine's native functions. */
object GraftFunctions {
  val COSINE_SIM = "graft_cosine_sim"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      COSINE_SIM, exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")

  /** Codegen'd cosine similarity (registers on the active session). */
  def cosineSim(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(COSINE_SIM, a, b)
  }
}
