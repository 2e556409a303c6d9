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

  /** Hilbert-curve index of a 2-D point (the xy2d walk of the classic
    * iterative algorithm): like [[zValue]] a space-filling order that
    * keeps rows close in BOTH dimensions close in ONE sort key, but the
    * Hilbert curve never makes the long diagonal jumps Morton order
    * takes between quadrant boundaries, so per-file min/max boxes come
    * out tighter — the curve production table formats reach for when
    * Z-order clustering isn't tight enough. One native codegen'd
    * expression ([[graft.functions.HilbertIndex]]) running the whole
    * per-level walk as a tight generated loop — the earlier
    * one-projection-per-bit-level formulation fused into a single
    * oversized whole-stage-codegen method and fell back to interpreted
    * evaluation (5.6 s for a map-only pass at sf0.1; now sub-second).
    * Replayable bit-for-bit from [[hilbertSqlCtes]].
    *
    * @param bits curve order; coords must lie in [0, 2^bits)
    * @return input plus `out` — the Hilbert d in [0, 4^bits) */
  def hilbertIndex(df: org.apache.spark.sql.DataFrame, xCol: String,
      yCol: String, bits: Int, out: String = "h"):
      org.apache.spark.sql.DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    df.withColumn(out, graft.functions.HilbertIndex.hilbert(
      col(xCol).cast("long"), col(yCol).cast("long"), bits))
  }

  /** The same walk as chained DuckDB CTEs (one per bit level, mirroring
    * the engine's per-level projections — generated from the same loop
    * so the two cannot drift). `src` must provide `hx`, `hy` columns
    * plus whatever `keep` lists; the final CTE `h$bits` carries keep ++
    * (hx, hy, hd). */
  def hilbertSqlCtes(src: String, keep: Seq[String], bits: Int): String = {
    val init = s"h0 AS (SELECT ${(keep ++ Seq("hx", "hy")).mkString(", ")}, " +
      s"CAST(0 AS BIGINT) AS hd FROM $src)"
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (i, idx) =>
      val s = 1L << i
      // every reference is p.-qualified: DuckDB lateral column aliases
      // would otherwise shadow the source hx/hy mid-SELECT
      val cols = keep.map(c => s"p.$c").mkString(", ")
      s"""h${idx + 1} AS (SELECT $cols,
        CASE WHEN (p.hy & $s) > 0 THEN p.hx
             WHEN (p.hx & $s) > 0 THEN ${s - 1} - p.hy ELSE p.hy END AS hx,
        CASE WHEN (p.hy & $s) > 0 THEN p.hy
             WHEN (p.hx & $s) > 0 THEN ${s - 1} - p.hx ELSE p.hx END AS hy,
        p.hd + ${s * s} *
          xor(3 * CASE WHEN (p.hx & $s) > 0 THEN 1 ELSE 0 END,
            CASE WHEN (p.hy & $s) > 0 THEN 1 ELSE 0 END) AS hd
        FROM h$idx p)"""
    }
    (init +: steps).mkString(",\n      ")
  }

  /** Contiguous global row numbers over (coarseKey DESC, fineKey ASC)
    * WITHOUT a single-partition window — the two-level scheme every
    * 100 TB "assign sequence ids" job needs (a bare
    * `row_number() OVER (ORDER BY ...)` funnels the corpus through ONE
    * task; Spark even warns). Level 1: per-coarse-value counts
    * (value-cardinality-sized) prefix-summed by a window over that tiny
    * relation — metadata, not corpus. Level 2: a KEYED window ranks
    * `fineKey` within each coarse group, and the broadcast offset makes
    * the id global: `rn = offset(coarse) + rank_within(coarse)`. Shuffle
    * ledger: one groupBy on coarseKey + one keyed window — both
    * corpus-keyed, neither global. Caveat: a coarse value holding a
    * macroscopic corpus fraction skews its group's window — pick a key
    * with spread (or pre-salt and add a third level, the
    * [[graft.llm.Curation]] packSequences discipline).
    *
    * @return input plus `rn` — 1-based, dense, equal to
    *         ROW_NUMBER() OVER (ORDER BY coarseKey DESC, fineKey) */
  def globalRowNumber(df: org.apache.spark.sql.DataFrame, coarseKey: String,
      fineKey: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = df.groupBy(col(coarseKey)).agg(count(lit(1)).as("__n"))
    val offsets = grp.withColumn("__offset",
        coalesce(sum(col("__n")).over(Window.orderBy(col(coarseKey).desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(coarseKey), col("__offset"))
    df.join(broadcast(offsets), Seq(coarseKey))
      .withColumn("rn", col("__offset") + row_number().over(
        Window.partitionBy(coarseKey).orderBy(fineKey)))
      .drop("__offset")
  }
}
