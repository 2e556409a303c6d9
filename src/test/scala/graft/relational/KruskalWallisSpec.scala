package graft.relational

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Structural laws for the Kruskal-Wallis query (q381). */
class KruskalWallisSpec extends SparkSpec {

  private lazy val rows = RelQueries.entries
    .find(_._1 == "q381_kruskal_wallis").get._2(spark, sfDir)
    .collect()

  test("doubled ranks sum to n(n+1) across groups") {
    val n = rows.head.getAs[Long]("n")
    assert(rows.map(_.getAs[Long]("n_g")).sum == n)
    assert(rows.map(_.getAs[Long]("r2_sum")).sum == n * (n + 1))
  }

  test("h_scaled replays from the per-group sufficient statistics") {
    val n = BigInt(rows.head.getAs[Long]("n"))
    val terms = rows.map { r =>
      val r2 = BigInt(r.getAs[Long]("r2_sum"))
      r2 * r2 / BigInt(r.getAs[Long]("n_g"))
    }.sum
    val h = BigInt(3000000) * terms / (n * (n + 1)) - 3000000 * (n + 1)
    assert(rows.head.getAs[Long]("h_scaled") == h.toLong)
    // tie-uncorrected H is bounded by n - 1 (floors can dip it
    // marginally below 0 on degenerate data)
    assert(h.toLong <= 1000000L * (n.toLong - 1))
    assert(h.toLong >= -1000000L)
  }
}
