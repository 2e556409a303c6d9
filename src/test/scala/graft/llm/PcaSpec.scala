package graft.llm

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("planted dominant axis is recovered with positive canonical sign") {
    val rnd = new scala.util.Random(3)
    // variance 100x larger along dim 2 than the noise dims.
    val rows = Seq.fill(300) {
      val t = rnd.nextGaussian() * 10
      Array.tabulate(8)(i =>
        (if (i == 2) t else rnd.nextGaussian() * 0.1).toFloat)
    }
    val got = Similarity.pcaTopComponent(rows.toDF("embedding"), "embedding")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.size === 8)
    val dominant = got.maxBy { case (_, l) => math.abs(l) }
    assert(dominant._1 === 2)
    assert(dominant._2 > 0, "canonical sign must be positive")
    // noise loadings at least 20x smaller than the dominant one
    for ((i, l) <- got if i != 2)
      assert(math.abs(l) < math.abs(dominant._2) / 20, s"dim $i")
  }

  test("agrees with a double-precision power iteration up to sign/scale") {
    val rnd = new scala.util.Random(11)
    // separated spectrum (top eigenvalue ~6x the runner-up) so the fixed
    // 3-round iteration in pcaTopComponent has actually converged.
    val sd = Array(5.0, 2.0, 0.8, 0.6, 0.4, 0.3)
    val data = Seq.fill(200)(
      Array.tabulate(6)(i => (rnd.nextGaussian() * sd(i)).toFloat))
    val got = Similarity.pcaTopComponent(data.toDF("embedding"), "embedding")
      .collect().sortBy(_.getInt(0)).map(_.getLong(1).toDouble)
    // reference: same quantization, double covariance, 60 rounds
    val q = data.map(_.map(x => math.floor(x.toDouble * 1e6)))
    val n = q.length.toDouble
    val d = 6
    val s = Array.tabulate(d)(i => q.map(_(i)).sum)
    val c = Array.tabulate(d, d)((i, j) =>
      n * q.map(r => r(i) * r(j)).sum - s(i) * s(j))
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to 60) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = w.map(_ / m)
    }
    val cos = {
      val dot = got.zip(v).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(got.map(x => x * x).sum) *
        math.sqrt(v.map(x => x * x).sum))
    }
    assert(math.abs(cos) > 0.98, s"cosine to reference was $cos")
  }
}
