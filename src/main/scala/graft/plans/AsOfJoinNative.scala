package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join — the §2.6 tier-(c) operator: a custom `LogicalPlan`
  * node planned by an injected `SparkStrategy` into a custom `SparkPlan`
  * that merge-scans both sides per partition.
  *
  * Semantics: for every left row, attach the LAST right row of the same key
  * with right.ts <= left.ts (nulls when none) — the point-in-time lookup
  * the reference's users run in ksqlDB/PySpark.
  *
  * Why a native operator (and not only the `ops.AsOf` union+window
  * formulation): the union pass null-pads every right row up to the left
  * schema and drags all left payload columns through the window sort. The
  * native plan declares `ClusteredDistribution`/`SortOrder` requirements —
  * so EnsureRequirements co-partitions and sorts both sides exactly like a
  * sort-merge join — and then streams each partition pair with O(1) state
  * (one buffered right row). Shuffled bytes: each side's own columns, no
  * padding; at 100 TB that is the difference between |L|+|R| rows moved
  * and |L|+|R| rows each padded to |L|+|R| columns.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; injected via
  * `spark.experimental.extraStrategies` (and GraftExtensions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Per-partition merge as-of join. Declares the same distribution/ordering
  * contract as a shuffled join, so EnsureRequirements inserts the hash
  * exchanges and (key, ts) sorts; execution is then a single forward scan
  * of each co-partitioned pair with one buffered right row of state.
  *
  * Skew note: AQE's skew-join rule only rewrites the built-in join execs,
  * so a pathologically hot key concentrates in one task here — pre-salt
  * with [[graft.ops.Skew]] in that case (the as-of semantics permit
  * salting only when the salt derives from the key alone). */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
    ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil,
      SortOrder(rightKey, Ascending) :: SortOrder(rightTs, Ascending) :: Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyDt = leftKey.dataType
    val tsDt = leftTs.dataType
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyTs = Seq(leftKey, leftTs)
    val rKeyTs = Seq(rightKey, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyDt)
        .asInstanceOf[Ordering[Any]]
      val tsOrd = TypeUtils.getInterpretedOrdering(tsDt)
        .asInstanceOf[Ordering[Any]]
      val lProj = UnsafeProjection.create(lKeyTs, lOut)
      val rProj = UnsafeProjection.create(rKeyTs, rOut)
      // Bind the result projection against NULLABLE right attributes (the
      // node's own output) — binding against right.output directly would
      // compile away the null checks for non-nullable right columns, and
      // unmatched rows would surface 0/default instead of null.
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rPeek: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        // Last right row with candKeyTs.key == current left key and
        // ts <= left ts; both copied so buffer reuse cannot corrupt them.
        private var candidate: InternalRow = _
        private var candKeyTs: InternalRow = _

        def hasNext: Boolean = lIter.hasNext

        def next(): InternalRow = {
          val lRow = lIter.next()
          val lkt = lProj(lRow)
          val lk = lkt.get(0, keyDt)
          val lt = lkt.get(1, tsDt)
          // SQL semantics: a null key or ts never matches anything. Null
          // rows sort NULLS FIRST, so discard null right rows while
          // advancing and null-extend null left rows without advancing —
          // the orderings below are not null-safe.
          if (lk == null || lt == null) {
            resultProj(joined(lRow, nullRight))
          } else {
            var advancing = true
            while (advancing && rPeek != null) {
              val rkt = rProj(rPeek)
              val rk = rkt.get(0, keyDt)
              val rt = rkt.get(1, tsDt)
              if (rk == null || rt == null) {
                rPeek = if (rIter.hasNext) rIter.next() else null
              } else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  // Right key is behind every remaining left key: skip.
                  rPeek = if (rIter.hasNext) rIter.next() else null
                } else if (c == 0 && tsOrd.compare(rt, lt) <= 0) {
                  candidate = rPeek.copy()
                  candKeyTs = rkt.copy()
                  rPeek = if (rIter.hasNext) rIter.next() else null
                } else advancing = false
              }
            }
            val matched = candidate != null &&
              keyOrd.compare(candKeyTs.get(0, keyDt), lk) == 0
            resultProj(joined(lRow, if (matched) candidate else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule — the fourth tier-(c) leg beside the plan node, the
  * strategy, and the exec: Catalyst's own predicate pushdown stops at an
  * unknown node, so without this rule a filter above the as-of join
  * shuffles the WHOLE corpus and filters after. Pushing is legal only for
  * deterministic conjuncts referencing LEFT-side attributes: the join is
  * left-preserving (exactly one output row per left row, left columns
  * unchanged), so dropping a left row before or after joining commutes.
  * Right-side predicates must NOT push — filtering the right child
  * changes WHICH row is "last at-or-before", not just which output rows
  * survive. Once below the join, the planner carries the filter through
  * the exchange into the scan (PushedFilters) — at 100 TB the difference
  * between shuffling the corpus and shuffling the selection. */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic &&
          c.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** DataFrame-level entry point. */
object AsOfNative {
  /** Left as-of join: every `left` row plus the latest `right` row (same
    * `key`, right `ts` at-or-before left `ts`), null-extended when none.
    * Right columns should be pre-renamed by the caller if names collide. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTsCol: String, rightTsCol: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    }
    // Re-alias the right side so its output attribute ids are fresh even in
    // self-join shapes (the analyzer's DeduplicateRelations does this for
    // built-in joins; a custom node must do it itself).
    val r = right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String) = p.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${p.output.map(_.name).mkString(",")}"))
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftKeyCol), attr(rp, rightKeyCol),
      attr(lp, leftTsCol), attr(rp, rightTsCol)))
  }
}
