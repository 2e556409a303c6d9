package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-decimal arithmetic helpers for oracle-parity aggregation.
  *
  * Money/quantity columns in the testdata are doubles carrying 2-decimal
  * values. Summing doubles is order-dependent — Spark (partial aggregates
  * across 32 partitions) and the DuckDB oracle accumulate in different
  * orders, so raw double sums differ in the last bits and fail a hash
  * compare. Every aggregate the oracle checks therefore goes through
  * DECIMAL: cast-to-decimal (exact for 2-dp values), aggregate exactly in
  * integer arithmetic, and cast the final scalar back to double (a single
  * deterministic IEEE-754 rounding both engines perform identically).
  *
  * This is also the right call at 100 TB: decimal partial sums cannot lose
  * precision no matter how many executors contribute partial aggregates.
  */
object Exact {
  /** Cast a 2-decimal-valued double column to an exact decimal. */
  def dec(c: Column, p: Int = 12): Column = c.cast(DecimalType(p, 2))

  /** 1 as DECIMAL(3,2) — matches `CAST(1 AS DECIMAL(3,2))` in oracle SQL. */
  val one: Column = lit(1).cast(DecimalType(3, 2))

  /** Exact decimal sum, surfaced as double. */
  def sumD(c: Column, p: Int = 12): Column = sum(dec(c, p)).cast("double")
}
