package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls/distincts and renders typed min/max") {
    val df = Seq(
      (Some(3L), Some("b")),
      (None: Option[Long], Some("a")),
      (Some(10L), None: Option[String]),
      (Some(3L), Some("c"))
    ).toDF("k", "s")
    val got = Profile.profile(df, Seq(Profile.Spec("k"), Profile.Spec("s")))
      .orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("k", 1L, 2L, "3", "10"),   // native ordering: 3 < 10 (not lexicographic)
      ("s", 1L, 3L, "a", "c")))
  }

  test("profile is a single aggregation pass over the input") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val plan = Profile.profile(df, Seq(Profile.Spec("k"), Profile.Spec("s")))
      .queryExecution.optimizedPlan.toString()
    // One scan of the local relation feeds the whole profile: the plan
    // contains exactly one leaf relation (no self-union of per-column scans).
    val leaves = plan.linesIterator.count(_.contains("LocalRelation"))
    assert(leaves == 1, s"expected single-scan profile, got plan:\n$plan")
  }

  test("histogram: bins partition the data, max lands in last bin") {
    val vals = (0 until 101).map(_.toDouble)
    val df = vals.toDF("v")
    val got = Profile.histogram(df, col("v"), 10)
      .as[(Int, Long)].collect().toMap
    assert(got.values.sum == vals.length, "every row lands in exactly one bin")
    assert(got.keys.forall(b => b >= 0 && b <= 9))
    // width 10: bin 0 gets 0..9 (10 values); the max folds into bin 9,
    // which holds 90..100 (11 values).
    assert(got(0) == 10L && got(9) == 11L, got.toString)
    // Constant column: one bin, all rows.
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    assert(Profile.histogram(const, col("v"), 10)
      .as[(Int, Long)].collect().toSeq == Seq((0, 3L)))
  }
}
