package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup scope — the reference's two distinct semantics, made explicit
  * because they are easy to silently conflate (SURVEY.md §7 known-hard).
  */
sealed trait DedupScope
object DedupScope {
  /** D2: state never cleared — statbank producer keeps every seen hash
    * forever (reference producers/statbank/fetch_data_statbank.py:116-121).
    * Idempotent re-ingest across runs. */
  case object Global extends DedupScope

  /** D1: state cleared per event-time window — energinet producer clears
    * its Redis hash after each day (reference
    * producers/energinet/fetch_data_energinet.py:170-179): duplicates
    * collapse within a day, identical records on different days BOTH
    * survive. */
  final case class PerWindow(timeCol: String, duration: String = "1 day")
      extends DedupScope
}

/** Batch dedup operators (D1/D2/D3). Streaming variants live in
  * graft.streaming.Streams (dropDuplicatesWithinWatermark / dropDuplicates
  * with unbounded state).
  *
  * Scale notes: `dropDuplicates(keys)` is a hash-partitioned first-agg —
  * one shuffle on the key columns, map-side partial dedup for free. The
  * per-window variant adds the window bucket to the shuffle key so state
  * is bounded per day, exactly mirroring the reference's daily state clear.
  */
object Dedup {
  def exact(df: DataFrame, keys: Seq[String], scope: DedupScope): DataFrame =
    scope match {
      case DedupScope.Global =>
        df.dropDuplicates(keys)
      case DedupScope.PerWindow(t, d) =>
        df.withColumn("__dedup_w", window(col(t), d))
          .dropDuplicates(keys :+ "__dedup_w")
          .drop("__dedup_w")
    }

  /** Deterministic keeper: the row with the minimal `orderCol` per key
    * group survives (dropDuplicates keeps an arbitrary row — fine for
    * counts, wrong for reproducible pipelines). Single shuffle via
    * row_number. */
  def keeperFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Sub-document (line-level) exact dedup — the C4/RefinedWeb curation
    * shape: a line duplicated across the corpus (boilerplate headers,
    * cookie banners, licence blocks) is dropped from every document except
    * its first occurrence, and each document is reassembled from its
    * surviving lines in order. Whole-doc dedup (reference content-hash
    * gate, producers/energinet/fetch_data_energinet.py:68-72) applied
    * below document granularity.
    *
    * Semantics: a line with corpus frequency >= dropDf keeps only its
    * FIRST occurrence (minimal (doc_id, line_no)); lines shorter than
    * `minLineLen` chars are never counted and always kept (C4 exempts
    * short lines so dedup does not mangle punctuation-only lines).
    *
    * Scale shape: one map-side-combined groupBy on the line text (partial
    * agg collapses a hot boilerplate line to one row per partition before
    * the shuffle) + one line-keyed join back (AQE skew-join splits the hot
    * lines), then a doc_id-keyed reassembly — three shuffles, all keyed,
    * nothing corpus-broadcast, no window over an unbounded line group. At
    * 100 TB the group/join key would be a 16-byte fingerprint of the line
    * (the q110 discipline); the text key keeps the oracle replay exact.
    *
    * @return (doc_id, text, n_kept, n_dropped) — one row per input doc
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", dropDf: Long = 2, minLineLen: Int = 0): DataFrame = {
    require(dropDf >= 2, s"dropDf must be >= 2 (got $dropDf): the first occurrence always survives")
    val lines = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("line_no", "line")))
    val stats = lines.filter(length(col("line")) >= minLineLen)
      .groupBy("line").agg(
        count(lit(1)).as("__df"),
        min(struct(col("doc_id"), col("line_no"))).as("__keeper"))
    val flagged = lines.join(stats, Seq("line"), "left")
      .withColumn("__keep",
        col("__df").isNull || col("__df") < dropDf ||
          struct(col("doc_id"), col("line_no")) === col("__keeper"))
    flagged.groupBy("doc_id").agg(
      array_join(transform(
        array_sort(collect_list(
          when(col("__keep"), struct(col("line_no"), col("line"))))),
        s => s.getField("line")), sep).as("text"),
      count(when(col("__keep"), 1)).as("n_kept"),
      count(when(!col("__keep"), 1)).as("n_dropped"))
  }

  /** Incremental form of [[dedupLines]] — the daily-crawl flow (q110/q111
    * discipline applied at line granularity): a new batch's lines are
    * gated against the corpus's PERSISTED line index; any line already in
    * the index is dropped from every batch document, and the batch is
    * reassembled. Work is linear in the batch — the corpus text is never
    * re-read, only its stored distinct-line relation is joined (at 100 TB
    * the index join key is a 16-byte line fingerprint and the join is a
    * broadcast/bloom semi-gate per batch).
    *
    * @return (doc_id, text, n_kept, n_dropped) for the batch docs
    */
  def dedupLinesAgainstIndex(batch: DataFrame, indexLines: DataFrame,
      idCol: String, textCol: String, sep: String = "\n"): DataFrame = {
    val lines = batch.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("line_no", "line")))
    val idx = indexLines.select(col("line")).distinct()
      .withColumn("__hit", lit(1))
    val flagged = lines.join(idx, Seq("line"), "left")
      .withColumn("__keep", col("__hit").isNull)
    flagged.groupBy("doc_id").agg(
      array_join(transform(
        array_sort(collect_list(
          when(col("__keep"), struct(col("line_no"), col("line"))))),
        s => s.getField("line")), sep).as("text"),
      count(when(col("__keep"), 1)).as("n_kept"),
      count(when(!col("__keep"), 1)).as("n_dropped"))
  }

  /** D3: processed-window checkpoint — drop work units already recorded in
    * a processed log (reference fetch_data_energinet.py:150-154 skips whole
    * days found in Redis). A left_anti join: broadcastable when the log is
    * small, shuffle-partitioned otherwise; at 100 TB the log is partition
    * metadata, never the data itself. */
  def checkpointFilter(units: DataFrame, processed: DataFrame,
      keyCols: Seq[String]): DataFrame =
    units.join(processed, keyCols, "left_anti")
}
