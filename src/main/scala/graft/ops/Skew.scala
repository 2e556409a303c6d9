package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (100 TB posture, SURVEY §7): AQE's skew-join handles
  * sort-merge skew at runtime; these helpers cover the cases AQE does not —
  * a skewed aggregation key, and a skewed shuffle join against a small-but-
  * unbroadcastable side.
  */
object Skew {
  /** Deterministic row salt in [0, buckets): derived from a hash of the
    * given columns (NOT rand() — retries/speculative tasks must agree). */
  def salt(buckets: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase salted count per key: partial count on (key, salt) spreads a
    * hot key over `buckets` reducers, final sum on key. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], buckets: Int,
      saltFrom: Seq[String]): DataFrame = {
    val s = salt(buckets, saltFrom.map(col))
    df.withColumn("__salt", s)
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Salted shuffle join: the big side gets a salt from its own row
    * content; the small side is replicated `buckets` times so every salted
    * partition finds its match. Equivalent to big.join(small, key) with the
    * hot key spread across `buckets` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, bigSaltFrom: Seq[String]): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(buckets, bigSaltFrom.map(col)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)))).withColumn("__salt",
      col("__salt").cast("int"))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Left outer join where NULL-keyed left rows bypass the join entirely:
    * a null key can never match, but a plain left join still shuffles
    * every null row into ONE hash partition (null skew — on fact tables
    * where the FK is often null, that single reducer is the job). Here
    * null rows split off BEFORE the exchange, null-extend by projection,
    * and union back — they never shuffle at all. Result is identical to
    * the plain left join by null-match semantics. */
  def leftJoinNullBypass(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val shared = left.columns.intersect(right.columns)
    require(shared.isEmpty,
      s"left and right must not share column names (ambiguous after the " +
        s"join/union): ${shared.mkString(", ")} — rename one side first")
    val joined = left.filter(col(leftKey).isNotNull)
      .join(right, col(leftKey) === col(rightKey), "left")
    val bypassed = left.filter(col(leftKey).isNull)
      .select(left.columns.map(col) ++
        right.schema.fields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    joined.unionByName(bypassed)
  }
}
