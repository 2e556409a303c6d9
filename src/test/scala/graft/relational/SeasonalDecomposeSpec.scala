package graft.relational

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Independent Scala replay of the additive decomposition (q389). */
class SeasonalDecomposeSpec extends SparkSpec {

  test("trend, seasonal and residual replay from the raw daily series") {
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long").as("cents"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val cents = daily.map(_._2)
    val want = (3 until daily.length - 3).map { i =>
      val trend = cents.slice(i - 3, i + 4).sum / 7
      val dow = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.ofEpochDay(0), daily(i)._1) % 7
      (daily(i)._1.toString, cents(i), trend, cents(i) - trend, dow)
    }
    val seas = want.groupBy(_._5).map { case (dow, g) =>
      val s = g.map(_._4).sum
      dow -> (if (s >= 0) s / g.length else -((-s) / g.length))
    }
    val got = RelQueries.entries.find(_._1 == "q389_seasonal_decompose")
      .get._2(spark, sfDir).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (r, (day, c, tr, de, dow)) =>
      assert(r.getString(0) == day)
      assert(r.getLong(1) == c && r.getLong(2) == tr && r.getLong(3) == de)
      assert(r.getLong(4) == seas(dow))
      assert(r.getLong(5) == de - seas(dow))
    }
  }
}
