package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AsOfJoinNativeSpec extends SparkSpec {

  private lazy val events = Tables(spark, sfDir, "events")
  private lazy val purchases = events
    .filter(col("event_type") === "purchase")
    .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
  private lazy val views = events
    .filter(col("event_type") === "view")
    .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
      col("ts").as("v_ts"))

  test("native as-of join equals the brute-force point-in-time lookup") {
    val native = AsOfNative.asofJoin(purchases, views,
        "user_id", "v_user", "ts", "v_ts")
      .select(col("p_id"), col("v_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    // Brute force: max prior v_ts per purchase via a quadratic range join —
    // correct by construction, viable only at spec scale.
    val brute = purchases.join(views,
        col("user_id") === col("v_user") && col("v_ts") <= col("ts"), "left")
      .groupBy("p_id").agg(max("v_ts").as("v_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    assert(native.size == purchases.count())
    assert(native == brute)
    // The data must exercise both matched and unmatched (null) rows.
    assert(native.valuesIterator.exists(_ == null) ||
      brute.valuesIterator.forall(_ != null))
    assert(native.valuesIterator.exists(_ != null))
  }

  test("native as-of join matches the union+window formulation") {
    val viaWindow = graft.ops.AsOf.lastRightTs(
        purchases, views.select(col("v_user").as("user_id"), col("v_ts").as("ts")),
        "user_id", "ts")
      .select(col("p_id"), col("asof_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    val native = AsOfNative.asofJoin(purchases, views,
        "user_id", "v_user", "ts", "v_ts")
      .select(col("p_id"), col("v_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    assert(native == viaWindow)
  }

  test("physical plan is the custom exec fed by exchanges and (key, ts) sorts") {
    val df = AsOfNative.asofJoin(purchases, views,
      "user_id", "v_user", "ts", "v_ts")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p) // exec nodeName prints without "Exec"
    assert(p.contains("Exchange hashpartitioning(user_id"), p)
    assert(p.contains("Exchange hashpartitioning(v_user"), p)
    assert("Sort \\[user_id.* ASC NULLS FIRST, ts.* ASC NULLS FIRST".r
      .findFirstIn(p).isDefined, p)
  }

  test("co-partitioning holds at an odd shuffle-partition count") {
    // The exec relies on EnsureRequirements placing equal keys in the same
    // zipped partition pair on both sides; run the brute-force equality at
    // a partition count different from the suite default to catch any
    // alignment assumption baked into the default config.
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "17")
    try {
      val native = AsOfNative.asofJoin(purchases, views,
          "user_id", "v_user", "ts", "v_ts")
        .select(col("p_id"), col("v_ts"))
        .collect().map(r => (r.getLong(0), r.get(1))).toMap
      val brute = purchases.join(views,
          col("user_id") === col("v_user") && col("v_ts") <= col("ts"), "left")
        .groupBy("p_id").agg(max("v_ts").as("v_ts"))
        .collect().map(r => (r.getLong(0), r.get(1))).toMap
      assert(native == brute)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("null keys and timestamps never match and never crash") {
    import spark.implicits._
    val l = Seq((1L, Some(1L), Some(10L)), (2L, None, Some(10L)),
        (3L, Some(1L), None))
      .toDF("id", "k", "t")
    val r = Seq((Some(1L), Some(9L), "x"), (None, Some(1L), "nullkey"),
        (Some(1L), None, "nullts"))
      .toDF("rk", "rt", "rv")
    val out = AsOfNative.asofJoin(l, r, "k", "rk", "t", "rt")
      .select("id", "rv")
      .collect().map(x => (x.getLong(0), x.get(1))).toMap
    // id=1 matches the one fully-non-null right row; null-key and null-ts
    // rows on either side neither match nor throw.
    assert(out == Map(1L -> "x", 2L -> null, 3L -> null))
  }

  test("optimizer rule pushes left-side filters below the as-of join") {
    val joined = AsOfNative.asofJoin(purchases, views,
      "user_id", "v_user", "ts", "v_ts")
    val filtered = joined.filter(col("user_id") < 50)
    val optimized = filtered.queryExecution.optimizedPlan
    // The Filter must sit INSIDE the join's left child, not above the join.
    optimized match {
      case j: AsOfJoinPlan =>
        val pushed = j.left.collect { case f: org.apache.spark.sql.catalyst
            .plans.logical.Filter => f }
        assert(pushed.exists(_.condition.references.map(_.name)
          .exists(_ == "user_id")), s"no pushed filter in:\n$optimized")
      case other => fail(s"expected AsOfJoinPlan at the top, got:\n$other")
    }
    // Semantics unchanged: pushing before == filtering after.
    val viaPrefilter = AsOfNative.asofJoin(
        purchases.filter(col("user_id") < 50), views,
        "user_id", "v_user", "ts", "v_ts")
      .select("p_id", "v_ts").collect().map(r => (r.getLong(0), r.get(1))).toMap
    val got = filtered.select("p_id", "v_ts")
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    assert(got == viaPrefilter && got.nonEmpty)
  }

  test("optimizer rule refuses to push right-side predicates") {
    val joined = AsOfNative.asofJoin(purchases, views,
      "user_id", "v_user", "ts", "v_ts")
    // A predicate on the attached right row must filter OUTPUT rows, not
    // the right child (that would change which row is "last at-or-before").
    val filtered = joined.filter(col("v_id") % 2 === 0)
    val optimized = filtered.queryExecution.optimizedPlan
    optimized match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        assert(f.child.isInstanceOf[AsOfJoinPlan], s"unexpected:\n$optimized")
        f.child.asInstanceOf[AsOfJoinPlan].right.foreach {
          case rf: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            assert(!rf.condition.references.map(_.name).exists(_ == "v_id"),
              s"right-side predicate was pushed:\n$optimized")
          case _ => ()
        }
      case other => fail(s"expected Filter above AsOfJoinPlan, got:\n$other")
    }
  }

  test("right payload columns ride along; unmatched rows null-extend") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "payload")
    val r = Seq((1L, 9L, "x"), (1L, 15L, "y"), (3L, 1L, "z"))
      .toDF("rk", "rt", "rpayload")
    val out = AsOfNative.asofJoin(l, r, "k", "rk", "t", "rt")
      .select("k", "t", "rpayload")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.get(2))).toSet
    assert(out == Set((1L, 10L, "x"), (1L, 20L, "y"), (2L, 5L, null)))
  }
}
