package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k aggregator (SURVEY §2.6's planned custom aggregate):
  * keeps the k highest-similarity neighbors per group in a size-k heap, so
  * the per-group state is O(k) regardless of candidate count — unlike the
  * window row_number formulation, which sorts every candidate row per
  * group. At 100 TB the partial heaps merge map-side before the shuffle:
  * the exchange carries k rows per (partition, group) instead of the full
  * candidate set.
  *
  * Ties break on the lower neighbor_id (deterministic output).
  */
case class Scored(neighbor_id: Long, sim: Double)

class TopKCosine(k: Int)
    extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {

  // Under Ordering.by((-sim, id)), the priority queue's dequeue() removes
  // the greatest (-sim, id) — i.e. the current WORST kept row — so a
  // better candidate evicts it in O(log k).
  private def worstFirst: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.sim, s.neighbor_id))

  override def zero: mutable.PriorityQueue[Scored] =
    mutable.PriorityQueue.empty(worstFirst)

  override def reduce(b: mutable.PriorityQueue[Scored],
      a: Scored): mutable.PriorityQueue[Scored] = {
    b.enqueue(a)
    if (b.size > k) b.dequeue()
    b
  }

  override def merge(b1: mutable.PriorityQueue[Scored],
      b2: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
    b2.foreach { s => b1.enqueue(s); if (b1.size > k) b1.dequeue() }
    b1
  }

  override def finish(b: mutable.PriorityQueue[Scored]): Seq[Scored] =
    b.toSeq.sortBy(s => (-s.sim, s.neighbor_id))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
    Encoders.kryo[mutable.PriorityQueue[Scored]]

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
