package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** EXACT heavy hitters over an item stream at 100 TB, two passes:
  *
  *  1. a Misra-Gries candidate sketch — a merge-able, bounded summary of
  *     at most `k` (item, count) entries. The MG invariant guarantees any
  *     item with true frequency > n/k survives in the final sketch, under
  *     both single-item updates and summary merges (combine counts, then
  *     subtract the (k+1)-th largest and drop non-positives), so partial
  *     sketches combine map-side like any partial aggregate and the
  *     exchange carries at most k entries per partition — the raw item
  *     stream is never shuffled;
  *  2. an exact recount of the ≤ k candidates via a broadcast semi-join
  *     over one more scan, then the true threshold filter.
  *
  * The output is therefore EXACT — every item with freq > n/k, with its
  * exact count — while nothing larger than the k-entry sketch ever moves
  * between executors. The one-pass alternative (group-by-item count) is
  * also exact but shuffles every distinct item; this shape is the one
  * that survives a vocabulary that does not fit in a shuffle.
  */
object HeavyHitters {

  /** Misra-Gries summary aggregator: buffer = bounded count map. */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    private def shrink(b: Map[String, Long]): Map[String, Long] =
      if (b.size <= k) b
      else {
        // subtract the (k+1)-th largest count: at least one entry drops,
        // every surviving undercount stays within the MG error bound
        val cut = b.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        b.collect { case (t, c) if c - cut > 0 => t -> (c - cut) }
      }

    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      shrink(b.updated(a, b.getOrElse(a, 0L) + 1L))
    override def merge(b1: Map[String, Long],
        b2: Map[String, Long]): Map[String, Long] =
      shrink(b2.foldLeft(b1) { case (b, (t, c)) =>
        b.updated(t, b.getOrElse(t, 0L) + c)
      })
    override def finish(b: Map[String, Long]): Seq[String] =
      b.keys.toSeq.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** All items of `items(itemCol)` with exact frequency strictly greater
    * than total/k, as (item, freq) — division-free threshold
    * (freq · k > total) so the boundary replays in integer arithmetic. */
  def exact(spark: SparkSession, items: DataFrame, itemCol: String,
      k: Int): DataFrame = {
    import spark.implicits._
    // Nulls are not items: they would NPE MisraGries.finish's sort and
    // inflate `total` while never being reportable candidates.
    val nonNull = items.select(col(itemCol).cast("string").as("item"))
      .na.drop(Seq("item"))
    val ds = nonNull.as[String]
    val candidates = ds.select(new MisraGries(k).toColumn).toDF("cands")
      .select(explode(col("cands")).as("item"))
    val total = nonNull.agg(count(lit(1)).as("total"))
    nonNull
      .join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * k > col("total"))
      .select(col("item"), col("freq"))
  }
}
