package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ops.Dist: the range-partitioned two-level scan must be bit-identical
  * to the naive single-partition window it replaces, under partition
  * counts that do and don't divide the data evenly, and its plan must
  * keep the corpus off any SinglePartition exchange. */
class DistSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(41)
  private val rows = (1 to 257).map(i =>
    (rng.nextLong().abs % 1000, i.toLong, (rng.nextInt(50) + 1).toLong))

  test("globalRowNumber equals row_number() over the same total order") {
    val df = rows.toDF("k", "id", "w")
    for (nPart <- Seq(1, 7, 32)) {
      val got = Dist.globalRowNumber(df, Seq(col("k"), col("id")), "rn", nPart)
        .select("k", "id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy("k", "id")).cast("long"))
        .select("k", "id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"nPart=$nPart")
    }
  }

  test("globalRowNumber over a DISTINCT input equals dense_rank() " +
      "(the q393 vocab / pair re-rank contract)") {
    val df = rows.map(_._1).distinct.toDF("k")
    val got = Dist.globalRowNumber(df, Seq(col("k")), "r", 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.map(_._1).distinct.sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("exclusivePrefixSum equals the unbounded-preceding-to-minus-one " +
      "window sum") {
    val df = rows.map(t => (t._2, t._3)).toDF("id", "w")
    for (nPart <- Seq(1, 7, 32)) {
      val got = Dist.exclusivePrefixSum(df, Seq(col("id")), "w", "off", nPart)
        .select("id", "off").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("off",
          coalesce(sum("w").over(Window.orderBy("id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("id", "off").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"nPart=$nPart")
    }
  }

  test("globalNtile equals ntile(k) over the same total order, including " +
      "uneven n % k remainders and n < k") {
    for (nRows <- Seq(3, 11, 257); k <- Seq(2, 5, 7)) {
      val df = rows.take(nRows).toDF("k", "id", "w")
      val got = Dist.globalNtile(df, Seq(col("w").desc, col("id")), k, "b", 7)
        .select("id", "b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("w").desc, col("id")))
            .cast("long"))
        .select("id", "b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"nRows=$nRows k=$k")
    }
  }

  test("plan: the data path range-partitions; the only SinglePartition " +
      "exchange feeds the nPart-row broadcast offset table") {
    val df = rows.toDF("k", "id", "w")
    for (planned <- Seq(
        Dist.globalRowNumber(df, Seq(col("k"), col("id")), "rn"),
        Dist.exclusivePrefixSum(df, Seq(col("id")), "w", "off"))) {
      val p = planned.queryExecution.executedPlan.toString
      assert(p.contains("Exchange rangepartitioning"), p.take(3000))
      assert(p.contains("BroadcastExchange"), p.take(3000))
      // data-side window is keyed by __pid, never unpartitioned
      assert(p.contains("__pid"), p.take(3000))
      // one SinglePartition exchange: the nPart-row offsets cumsum
      assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
        p.take(3000))
      assert(!p.contains("SortMergeJoin"), p.take(3000))
    }
  }
}
