package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bloom: zero false negatives, bounded false positives") {
    val keys = (0L until 200L).map(_ * 7L).toDF("k")
    val bloom = Sketches.bloomBitmap(keys, "k", mBits = 8192, k = 3)
    val probes = (0L until 3000L).toDF("x")
      .crossJoin(broadcast(bloom))
      .withColumn("pass",
        Sketches.bloomMightContain(col("bloom"), col("x"), 8192, 3))
    val member = (0L until 200L).map(_ * 7L).toSet
    val rows = probes.select("x", "pass").as[(Long, Boolean)].collect()
    // every true member passes
    assert(rows.filter(r => member(r._1)).forall(_._2))
    // false-positive rate stays near theory: (1-e^{-kn/m})^k ~ 0.4% here;
    // allow generous slack for hash variance
    val fps = rows.count(r => !member(r._1) && r._2)
    assert(fps < 100, s"implausible FP count $fps / 2800 non-members")
  }

  test("bloom: bitmap is one row of mBits/64 words and partition-invariant") {
    val keys = (0L until 500L).toDF("k")
    val a = Sketches.bloomBitmap(keys.repartition(1), "k", 4096, 2)
      .as[Seq[Long]].head()
    val b = Sketches.bloomBitmap(keys.repartition(7), "k", 4096, 2)
      .as[Seq[Long]].head()
    assert(a.size == 64 && a == b)
  }

  test("bloom: rejects non-power-of-two sizes") {
    intercept[IllegalArgumentException] {
      Sketches.bloomBitmap(Seq(1L).toDF("k"), "k", 1000, 3)
    }
  }

  test("cms: estimate >= true count, exact for all keys here, merge-safe") {
    // skewed multiset: key i appears i+1 times, across many partitions
    val rows = (0 until 100).flatMap(i => Seq.fill(i + 1)(i.toLong))
    val df = rows.toDF("k").repartition(13)
    val cms = Sketches.countMinSketch(df, "k", depth = 3, width = 1024)
    val est = (0 until 100).map(_.toLong).toDF("k")
      .crossJoin(broadcast(cms))
      .select(col("k"),
        Sketches.countMinEstimate(col("sketch"), col("k"), 3, 1024).as("est"))
      .as[(Long, Long)].collect().toMap
    (0 until 100).foreach { i =>
      assert(est(i.toLong) >= i + 1, s"CMS under-counted key $i")
    }
    // total mass per depth row equals the row count (conservation)
    val sketch = cms.as[Seq[Long]].head()
    (0 until 3).foreach { d =>
      assert(sketch.slice(d * 1024, (d + 1) * 1024).sum == rows.size)
    }
  }

  test("cms: partition-invariant sketch") {
    val df = (0L until 1000L).map(i => i % 37).toDF("k")
    val a = Sketches.countMinSketch(df.repartition(1), "k", 2, 256)
      .as[Seq[Long]].head()
    val b = Sketches.countMinSketch(df.repartition(11), "k", 2, 256)
      .as[Seq[Long]].head()
    assert(a == b)
  }

  test("kmv: exact below k, estimate within 3/sqrt(k) above, invariant") {
    // fewer distinct keys than k: n_kept IS the exact count
    val small = (0L until 500L).map(_ % 40).toDF("k")
    val (nk, _, est) = Sketches.kmvDistinct(small, "k", 256)
      .as[(Long, Long, Double)].head()
    assert(nk == 40L && est == 40.0)
    // many distinct: relative error of the k-th order statistic is
    // ~1/sqrt(k) (sigma); allow 3 sigma
    val big = (0L until 100000L).toDF("k")
    val (nk2, _, est2) = Sketches.kmvDistinct(big, "k", 256)
      .as[(Long, Long, Double)].head()
    assert(nk2 == 256L)
    assert(math.abs(est2 - 100000.0) / 100000.0 < 3.0 / math.sqrt(256),
      s"estimate $est2")
    // partition-invariant (top-k is a total order, no sampling)
    val est3 = Sketches.kmvDistinct(big.repartition(13), "k", 256)
      .as[(Long, Long, Double)].head()._3
    assert(est2 == est3)
  }

  test("kmvIntersect: known overlap estimated within 3 sigma, exact below k") {
    // A = [0, 20000), B = [10000, 30000): union 30000, inter 10000
    val rows = (0L until 30000L).map(i => (i, i < 20000L, i >= 10000L))
      .toDF("k", "ina", "inb")
    val (nk, m, estU, estI) = Sketches.kmvIntersect(rows, "k",
        col("ina"), col("inb"), 256)
      .as[(Long, Long, Double, Double)].head()
    assert(nk == 256L)
    // union estimate: ~1/sqrt(k) sigma; intersection adds binomial
    // noise on m/k (sigma ~ sqrt(p(1-p)/k) relative ~ 15%) — 3 sigma
    assert(math.abs(estU - 30000.0) / 30000.0 < 3.0 / math.sqrt(256), s"$estU")
    assert(math.abs(estI - 10000.0) / 10000.0 < 0.45, s"$estI")
    assert(m > 0)
    // tiny domain: n_kept < k makes the union exact
    val small = (0L until 50L).map(i => (i, i < 30L, i >= 20L))
      .toDF("k", "ina", "inb")
    val (nk2, m2, estU2, estI2) = Sketches.kmvIntersect(small, "k",
        col("ina"), col("inb"), 256)
      .as[(Long, Long, Double, Double)].head()
    assert(nk2 == 50L && m2 == 10L && estU2 == 50.0 && estI2 == 10.0)
  }
}
