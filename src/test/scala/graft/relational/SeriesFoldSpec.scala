package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** The scaled-integer series folds behind q374 (Kaplan-Meier) and q375
  * (Holt smoothing), checked through the full query entries on the sf0.001
  * testdata plus closed-form invariants. */
class SeriesFoldSpec extends SparkSpec {

  private def run(name: String) =
    RelQueries.entries.find(_._1 == name).get._2
      .apply(spark: SparkSession, sfDir)

  test("kaplan-meier: survival is non-increasing, starts below 1e9, exact step") {
    val rows = run("q374_kaplan_meier").collect()
    assert(rows.nonEmpty)
    var prev = 1000000000L
    for (r <- rows) {
      val (n, dd, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expect = prev * (n - dd) / n
      assert(s === expect, s"step at dur=${r.getInt(0)}")
      assert(s <= prev)
      prev = s
    }
  }

  test("kaplan-meier: risk set counts are non-increasing over duration") {
    val ns = run("q374_kaplan_meier").collect().map(_.getLong(1)).toSeq
    assert(ns === ns.sorted.reverse)
  }

  test("holt: first row is the exact init, later rows follow the recurrence") {
    val rows = run("q375_holt_smoothing").collect()
    assert(rows.length > 10)
    val first = rows.head
    assert(first.getLong(2) === first.getLong(1) * 1000000L)
    assert(first.getLong(3) === 0L)
    assert(first.isNullAt(4))
    var (l, b) = (first.getLong(2), first.getLong(3))
    for (r <- rows.tail) {
      val y = r.getLong(1)
      val fc = l + b
      val l1 = Math.floorDiv(y * 1000000L + 3 * (l + b), 4L)
      val b1 = Math.floorDiv(l1 - l + 3 * b, 4L)
      assert(r.getLong(2) === l1, s"level at ${r.getString(0)}")
      assert(r.getLong(3) === b1, s"trend at ${r.getString(0)}")
      assert(r.getLong(4) === fc, s"forecast at ${r.getString(0)}")
      l = l1; b = b1
    }
  }

  test("holt: constant series locks level to the constant and trend to ~0") {
    // Direct check of the arithmetic shape on a synthetic constant
    // series: with y ≡ c, level stays c·10⁶ and trend stays 0 forever.
    var (l, b) = (42L * 1000000L, 0L)
    for (_ <- 1 to 50) {
      val l1 = Math.floorDiv(42L * 1000000L + 3 * (l + b), 4L)
      val b1 = Math.floorDiv(l1 - l + 3 * b, 4L)
      l = l1; b = b1
    }
    assert(l === 42000000L && b === 0L)
  }
}
