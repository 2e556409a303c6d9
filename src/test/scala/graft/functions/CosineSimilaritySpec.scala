package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.llm.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("codegen'd expression is bit-identical to the composable formulation") {
    val emb = Tables(spark, sfDir, "embeddings").limit(100)
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(
        GraftFunctions.cosineSim(col("a.embedding"), col("b.embedding")).as("fused"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("composed"))
    val diff = pairs.filter(col("fused") =!= col("composed")).count()
    assert(diff == 0)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val out = df.select(GraftFunctions.cosineSim(col("a"), col("b"))).head
    assert(out.isNullAt(0))
  }

  test("interpreted eval path matches (expression works without codegen)") {
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("degenerate inputs yield null, not NaN (zero-norm, empty, dim mismatch)") {
    // NaN would outrank every real similarity in a desc top-k; null sorts
    // last and fails >= filters — the safe default for bad embeddings.
    val df = Seq(
      (Seq(0f, 0f), Seq(1f, 2f)),        // zero-norm left
      (Seq.empty[Float], Seq.empty[Float]), // empty
      (Seq(1f, 2f), Seq(1f, 2f, 3f)))    // dimension mismatch
      .toDF("a", "b")
    val out = df.select(GraftFunctions.cosineSim(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)), s"expected all null, got ${out.toSeq}")
    // Interpreted path too.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit(xs: Array[Float]) = Literal.create(xs, ArrayType(FloatType))
    assert(CosineSimilarity(lit(Array(0f, 0f)), lit(Array(1f, 0f))).eval(null) == null)
    assert(CosineSimilarity(lit(Array(1f)), lit(Array(1f, 0f))).eval(null) == null)
  }

  test("type check rejects non-float arrays") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(GraftFunctions.cosineSim(col("a"), col("b"))).collect()
    }
  }
}
