package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FillSpec extends SparkSpec {
  import spark.implicits._

  test("forwardFill carries last known value; leading nulls stay null") {
    val df = Seq(
      ("a", 1L, None: Option[Double]), ("a", 2L, Some(5.0)),
      ("a", 3L, None), ("a", 4L, Some(7.0)), ("a", 5L, None)
    ).toDF("k", "t", "v")
    val r = Fill.forwardFill(df, Seq(col("k")), Seq(col("t")), "v", "f")
      .orderBy("t").select("f").as[Option[Double]].collect()
    assert(r.toSeq == Seq(None, Some(5.0), Some(5.0), Some(7.0), Some(7.0)))
  }

  test("interpolateLinear: interior lerp, flat edges, multi-gap") {
    // known at t=2 (v=10) and t=6 (v=2): interior gap lerps, edges flat
    val df = Seq(
      ("a", 0L, None: Option[Double]), ("a", 2L, Some(10.0)),
      ("a", 3L, None), ("a", 4L, None), ("a", 5L, None),
      ("a", 6L, Some(2.0)), ("a", 8L, None)
    ).toDF("k", "t", "v")
    val r = Fill.interpolateLinear(df, Seq(col("k")), "t", "v", "vi")
      .orderBy("t").select("vi").as[Double].collect()
    assert(r.toSeq == Seq(10.0, 10.0, 8.0, 6.0, 4.0, 2.0, 2.0))
  }

  test("interpolateLinear: all-null partition stays null, known rows kept") {
    val df = Seq(
      ("a", 1L, Some(3.0)), ("b", 1L, None: Option[Double]), ("b", 2L, None)
    ).toDF("k", "t", "v")
    val r = Fill.interpolateLinear(df, Seq(col("k")), "t", "v", "vi")
      .orderBy("k", "t").select("vi").as[Option[Double]].collect()
    assert(r.toSeq == Seq(Some(3.0), None, None))
  }

  test("interpolateLinear: equal-time neighbors fall back flat, never NaN") {
    val df = Seq(("a", 5L, Some(1.0)), ("a", 5L, None: Option[Double]),
      ("a", 5L, Some(2.0))).toDF("k", "t", "v")
    val r = Fill.interpolateLinear(df, Seq(col("k")), "t", "v", "vi")
      .select("vi").as[Double].collect()
    assert(r.length == 3 && r.forall(x => !x.isNaN))
    assert(r.forall(x => x == 1.0 || x == 2.0))
  }

  test("interpolateLinear is partition-count invariant") {
    val rows = (0L until 100L).map { t =>
      ("k", t, if (t % 7 == 0) Some(t.toDouble * 1.5) else None)
    }
    val d1 = Fill.interpolateLinear(rows.toDF("k", "t", "v").repartition(1),
      Seq(col("k")), "t", "v", "vi").orderBy("t").select("vi")
      .as[Double].collect().toSeq
    val d9 = Fill.interpolateLinear(rows.toDF("k", "t", "v").repartition(9),
      Seq(col("k")), "t", "v", "vi").orderBy("t").select("vi")
      .as[Double].collect().toSeq
    assert(d1 == d9)
  }
}
