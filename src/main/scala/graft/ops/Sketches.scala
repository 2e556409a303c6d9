package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Probabilistic membership / frequency sketches as first-class relational
  * operators, built so an independent engine can replay them bit-for-bit.
  *
  * Both sketches hash with Spark's `xxhash64(lit(i), key)` family (seed
  * chain = XXH64 of the int family index, then of the long key — the same
  * family the MinHash operators use, replayed in DuckDB by
  * `llm.XxHashOracle`). Bit/cell counts are POWERS OF TWO on purpose:
  * `xxhash64` returns a SIGNED long and the queries reduce it with
  * `pmod(h, m)`; because 2^64 ≡ 0 (mod m) for m a power of two, the
  * signed pmod equals the unsigned remainder, so the oracle can reduce
  * its unsigned HUGEINT replay with a plain `%` and land on the same
  * cell.
  *
  * Scale posture: a bloom bitmap for 1M keys at 16 bits/key is 2 MB — the
  * build is one map-side-combined `bit_or` aggregate over distinct
  * positions, and the probe is a crossJoin(broadcast(one-row-array)) +
  * codegen'd projection: the big side never shuffles for the pre-filter.
  * That is exactly the runtime-row-level-filtering shape Spark itself
  * applies to large joins, surfaced as an explicit operator.
  */
object Sketches {

  /** Build a bloom bitmap over the distinct values of `keyCol` (a LONG
    * column) as a ONE-ROW DataFrame with a single `bloom: array<bigint>`
    * column of `mBits/64` words, little-endian bit order within a word.
    */
  def bloomBitmap(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    val words = mBits / 64
    keys.select(col(keyCol).as("k")).na.drop().distinct()
      .select(explode(sequence(lit(0), lit(k - 1))).as("i"), col("k"))
      .select(pmod(xxhash64(col("i"), col("k")), lit(mBits.toLong)).as("pos"))
      .select(floor(col("pos") / 64).as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int"))
          .as("bit"))
      .groupBy("w").agg(call_function("bit_or", col("bit")).as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("m"))
      .select(transform(sequence(lit(0L), lit(words - 1L)),
        w => coalesce(element_at(col("m"), w), lit(0L))).as("bloom"))
  }

  /** Membership probe against the bitmap built by [[bloomBitmap]]
    * (crossJoin(broadcast(bitmap)) first, then apply this column): no
    * false negatives, ~(1-e^{-kn/m})^k false-positive rate. Map-only and
    * codegen'd — safe on the fact-table side of a join at any scale. */
  def bloomMightContain(bloom: Column, key: Column, mBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val pos = pmod(xxhash64(lit(i), key), lit(mBits.toLong))
      val word = element_at(bloom, floor(pos / 64).cast("int") + 1)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Count-min sketch state: `depth * width` long counters flattened into
    * one array, fed FLAT CELL INDEXES (`i * width + pmod(hash_i(key),
    * width)`) computed as codegen'd columns before the aggregate — the
    * Aggregator itself is pure integer increments, and its partial states
    * merge map-side, so the shuffle carries one `depth*width`-long array
    * per partition regardless of row count. */
  class CountMin(cells: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](cells)
    override def reduce(b: Array[Long], idx: Long): Array[Long] = {
      require(idx >= 0 && idx < cells,
        s"CountMin cell index $idx outside [0, $cells) — depth/width " +
          "mismatch between the index columns and the aggregator")
      b(idx.toInt) += 1L; b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < cells) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Build the one-row CMS over a LONG `keyCol`: `sketch: array<bigint>`
    * of `depth * width` counters. `width` must be a power of two (oracle
    * replay property — see the object doc). */
  def countMinSketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    import df.sparkSession.implicits._
    val idx = df.select(col(keyCol).as("k")).na.drop()
      .select(explode(sequence(lit(0), lit(depth - 1))).as("i"), col("k"))
      .select((col("i").cast("long") * width +
        pmod(xxhash64(col("i"), col("k")), lit(width.toLong))).as("idx"))
      .as[Long]
    idx.select(new CountMin(depth * width).toColumn.name("sketch")).toDF()
  }

  /** Point estimate from the one-row sketch (crossJoin(broadcast) first):
    * min over the depth rows — always >= the true count. */
  def countMinEstimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { i =>
      element_at(sketch,
        (lit(i.toLong) * width +
          pmod(xxhash64(lit(i), key), lit(width.toLong))).cast("int") + 1)
    }: _*)

  /** K-minimum-values (KMV / bottom-k) distinct-count sketch — the
    * order-statistics member of the sketch family (HLL q157 keeps
    * register maxima; KMV keeps the k smallest hash values, merges by
    * union+re-truncate, and ALSO supports set intersection estimates,
    * which HLL cannot). Estimator: with U = unsigned position of the
    * k-th smallest of D uniform 64-bit hashes, E[U] ≈ k/(D+1)·2^64, so
    * D̂ = (k-1)·2^64/U (the unbiased form). Deterministic end to end:
    * hashes are xxhash64 (seed 42), the k smallest survive a
    * TakeOrderedAndProject (per-partition top-k, never a global sort),
    * and the one float is the closing division — both engines divide
    * the same exact integers. Returns ONE row:
    * (n_kept, kth_hash signed, est_distinct); n_kept < k means the
    * sketch saw fewer than k distinct keys and the exact count IS
    * n_kept. */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val hashes = df.select(xxhash64(col(keyCol)).as("h")).distinct()
    hashes.orderBy("h").limit(k)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .select(col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 64)) /
            (col("kth_hash").cast("decimal(38,0)") +
              lit("9223372036854775808").cast("decimal(38,0)"))
              .cast("double"))
          .as("est_distinct"))
  }

  /** KMV set-INTERSECTION estimate — the operation [[kmvDistinct]]'s
    * sketch family supports and HLL cannot: the bottom-k of the UNION's
    * hash space is a uniform sample of the union, so the fraction of
    * its members present in both sets estimates the Jaccard, and
    * est_inter = (m/k)·D̂_union. `inA`/`inB` are membership predicates
    * evaluated per input row; per-key flags fold with max (a key seen
    * on either side keeps both memberships). One keyed aggregate over
    * the corpus + one top-k; everything after is k rows.
    *
    * @return one row: (n_kept, n_both, est_union, est_inter) */
  def kmvIntersect(df: DataFrame, keyCol: String, inA: Column, inB: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val flags = df.filter(inA || inB)
      .select(xxhash64(col(keyCol)).as("h"),
        inA.cast("int").as("a"), inB.cast("int").as("b"))
      .groupBy("h").agg(max(col("a")).as("a"), max(col("b")).as("b"))
    val top = flags.orderBy("h").limit(k)
      .agg(count(lit(1)).as("n_kept"),
        sum(col("a") * col("b")).as("n_both"), max(col("h")).as("kth"))
    top.select(col("n_kept"), col("n_both"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 64)) /
            (col("kth").cast("decimal(38,0)") +
              lit("9223372036854775808").cast("decimal(38,0)"))
              .cast("double"))
          .as("est_union"))
      .withColumn("est_inter",
        col("n_both").cast("double") / col("n_kept") * col("est_union"))
  }
}
