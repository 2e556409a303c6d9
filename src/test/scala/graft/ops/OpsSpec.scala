package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("P5 canonical key is invariant to column selection order") {
    val df1 = Seq((1L, "click", 42L)).toDF("event_id", "event_type", "user_id")
    val df2 = df1.select("user_id", "event_id", "event_type")
    val k1 = df1.select(Keys.canonicalKey(df1).as("k")).head.getString(0)
    val k2 = df2.select(Keys.canonicalKey(df2).as("k")).head.getString(0)
    assert(k1 == k2)
  }

  test("P5 canonical key is sensitive to any value change") {
    val a = Seq((1L, "click")).toDF("event_id", "event_type")
      .select(Keys.canonicalKey(Seq("event_id", "event_type")).as("k")).head.getString(0)
    val b = Seq((1L, "clack")).toDF("event_id", "event_type")
      .select(Keys.canonicalKey(Seq("event_id", "event_type")).as("k")).head.getString(0)
    assert(a != b)
  }

  test("D1 per-window dedup: collapse within a day, survive across days") {
    val df = Seq(
      ("2024-01-01 10:00:00", 1L, "click"),
      ("2024-01-01 14:00:00", 1L, "click"), // same-day dup -> collapsed
      ("2024-01-02 09:00:00", 1L, "click"), // next-day recurrence -> survives
      ("2024-01-01 11:00:00", 2L, "view")
    ).toDF("ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Dedup.exact(df, Seq("user_id", "event_type"),
      DedupScope.PerWindow("ts", "1 day"))
    assert(out.count() == 3)
    val global = Dedup.exact(df, Seq("user_id", "event_type"), DedupScope.Global)
    assert(global.count() == 2)
  }

  test("dedup idempotence: f(f(x)) = f(x)") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val once = Dedup.exact(df, Seq("k", "v"), DedupScope.Global)
    val twice = Dedup.exact(once, Seq("k", "v"), DedupScope.Global)
    assert(once.count() == twice.count())
  }

  test("keeperFirst keeps the minimal-order row per key") {
    val df = Seq((1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "z"))
      .toDF("k", "ord", "v")
    val out = Dedup.keeperFirst(df, Seq("k"), "ord")
      .orderBy("k").select("v").as[String].collect()
    assert(out.toSeq == Seq("a", "z"))
  }

  test("D3 checkpointFilter drops processed units") {
    val units = Seq("d1", "d2", "d3").toDF("day")
    val processed = Seq("d1", "d3").toDF("day")
    val out = Dedup.checkpointFilter(units, processed, Seq("day"))
      .as[String].collect()
    assert(out.toSeq == Seq("d2"))
  }

  test("as-of join: inclusive tie, carry-forward, null when no right row") {
    val left = Seq(
      (100L, 1L, "2024-01-01 10:00:00"),
      (101L, 1L, "2024-01-01 12:00:00"),
      (102L, 2L, "2024-01-01 10:00:00") // user 2 has no views
    ).toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (1L, "2024-01-01 09:00:00"),
      (1L, "2024-01-01 10:00:00"), // tie with left@10:00 -> inclusive
      (1L, "2024-01-01 11:00:00")
    ).toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = AsOf.lastRightTs(left, right, "user_id", "ts")
      .orderBy("event_id")
      .select(date_format(col("asof_ts"), "HH:mm").as("t"))
      .as[String].collect()
    assert(out.toSeq == Seq("10:00", "11:00", null))
  }

  test("as-of value lookup: carries the version's value, inclusive tie") {
    val facts = Seq(
      (100L, 1L, "2024-01-01 10:00:00"),
      (101L, 1L, "2024-01-01 12:00:00"),
      (102L, 1L, "2024-01-01 08:00:00"), // before any version
      (103L, 2L, "2024-01-01 10:00:00")  // key with no versions
    ).toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val versions = Seq(
      (1L, "2024-01-01 09:00:00", "bronze"),
      (1L, "2024-01-01 10:00:00", "silver"), // tie with fact@10:00 -> wins
      (1L, "2024-01-01 11:00:00", "gold")
    ).toDF("user_id", "ts", "tier")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = AsOf.lastRightValue(facts, versions, "user_id", "ts", "tier")
      .orderBy("event_id").select("asof_value").as[String].collect()
    assert(out.toSeq == Seq("silver", "gold", null, null))
    // brute-force cross-check: quadratic arg_max over vf <= ts
    val brute = facts.as("f").join(versions.as("v"),
        col("f.user_id") === col("v.user_id") && col("v.ts") <= col("f.ts"))
      .groupBy(col("f.event_id"))
      .agg(max_by(col("v.tier"), col("v.ts")).as("tier"))
    val bruteMap = brute.as[(Long, String)].collect().toMap
    assert(bruteMap == Map(100L -> "silver", 101L -> "gold"))
  }

  test("zValue interleaves bits: z(3,5) = 39, z preserves locality order") {
    val df = Seq((3L, 5L), (0L, 0L), (7L, 0L), (0L, 7L)).toDF("a", "b")
    val out = df.select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .as[Long].collect().toSeq
    // a=011, b=101 -> bits: a0@0, b0@1, a1@2, b2@5 = 1+2+4+32 = 39
    assert(out == Seq(39L, 0L, 21L, 42L)) // a fills even bits, b odd bits
  }

  test("hilbertIndex: bijection on the full grid, unit steps, locality") {
    // order-3 curve over the full 8x8 grid: d must be a permutation of
    // 0..63 and consecutive d cells must be Manhattan-adjacent (THE
    // Hilbert property Z-order lacks — Morton jumps diagonally at
    // quadrant boundaries)
    val grid = (for { x <- 0 to 7; y <- 0 to 7 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val walked = Layout.hilbertIndex(grid, "x", "y", bits = 3)
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(walked.map(_._1).toSeq == (0L to 63L), "not a bijection")
    walked.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step ($x1,$y1)->($x2,$y2)")
    }
    // origin convention of the xy2d walk: d=0 at (0,0)
    assert(walked.head == ((0L, 0L, 0L)))
  }

  test("globalRowNumber equals the single-partition ROW_NUMBER") {
    import org.apache.spark.sql.expressions.Window
    // duplicate coarse values, a tie-heavy group, and a singleton
    val df = Seq((1L, 10L), (2L, 30L), (3L, 10L), (4L, 20L), (5L, 30L),
      (6L, 10L), (7L, 25L)).toDF("id", "sz").repartition(4)
    val fast = Layout.globalRowNumber(df, "sz", "id")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("rn", row_number().over(
        Window.orderBy(col("sz").desc, col("id"))).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(fast == naive && naive.values.toSeq.sorted == (1L to 7L))
  }

  test("line dedup: duplicated boilerplate dropped except first occurrence") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nalpha one\nSHARED FOOTER"),
      (2L, "COOKIE BANNER\nbeta two\nSHARED FOOTER"),
      (3L, "COOKIE BANNER\nCOOKIE BANNER\ngamma three")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text", dropDf = 2)
      .orderBy("doc_id")
      .collect()
    // doc 1 holds the first occurrence of both boilerplate lines.
    assert(out(0).getString(1) == "COOKIE BANNER\nalpha one\nSHARED FOOTER")
    assert(out(0).getLong(2) == 3 && out(0).getLong(3) == 0)
    // doc 2 keeps only its unique line.
    assert(out(1).getString(1) == "beta two")
    assert(out(1).getLong(2) == 1 && out(1).getLong(3) == 2)
    // doc 3: both banner copies are later occurrences -> dropped.
    assert(out(2).getString(1) == "gamma three")
    assert(out(2).getLong(2) == 1 && out(2).getLong(3) == 2)
  }

  test("line dedup: short lines exempt; all-duplicate doc reassembles empty") {
    val docs = Seq(
      (1L, "--\nDUP LINE"),
      (2L, "--\nDUP LINE"),
      (3L, "DUP LINE")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text",
        dropDf = 2, minLineLen = 3)
      .orderBy("doc_id").collect()
    // "--" is under minLineLen: kept everywhere, never counted.
    assert(out(0).getString(1) == "--\nDUP LINE")
    assert(out(1).getString(1) == "--")
    // doc 3's only line is a later duplicate -> empty text, 0 kept.
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 0 &&
      out(2).getLong(3) == 1)
  }
}
