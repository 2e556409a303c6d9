package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two integer columns so
  * rows close in BOTH dimensions land close in the one-dimensional sort
  * order. Writing files in z order makes per-file min/max ranges tight in
  * every interleaved dimension at once, so a scan filtered on EITHER
  * column prunes most files — the standard multi-dimensional clustering
  * trick (Delta/Iceberg OPTIMIZE ZORDER) for 100 TB tables where only one
  * physical sort order exists but two filter columns matter.
  *
  * Everything here is exact integer bit arithmetic (shift/and/or), so the
  * layout decision replays bit-for-bit in any engine — no sampling, no
  * range-partitioner nondeterminism.
  */
object Layout {
  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * One codegen'd projection — shuffle-free. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same interleave as DuckDB SQL text, generated from the same
    * loop so the two engines cannot drift. */
  def zSqlDuck(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${2 * i})",
      s"((($b >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Equi-depth range-file assignment: the file a value lands in is the
    * COUNT OF BOUNDARIES STRICTLY BELOW it (boundaries = exact
    * interpolated percentiles of the sort column, one broadcast row).
    * Deterministic on purpose — `repartitionByRange`'s sampled range
    * partitioner draws nondeterministic bounds, which is fine for the
    * physical exchange but makes the resulting layout unverifiable;
    * computing the bounds from the exact percentile aggregate costs one
    * extra column-pruned pass and gives a manifest any engine can replay.
    * The assignment itself is a codegen'd projection against the
    * broadcast bounds array — shuffle-free above the scan. */
  def rangeFileId(value: Column, boundaries: Column): Column =
    size(filter(boundaries, b => value > b))
}
