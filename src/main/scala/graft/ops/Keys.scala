package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-identity operators (reference P5/P7).
  *
  * P5: the reference derives a dedup key as SHA-256 over
  * `json.dumps(record, sort_keys=True)`
  * (reference producers/energinet/fetch_data_energinet.py:68-72,
  * producers/statbank/fetch_data_statbank.py:29-31). Our canonical form is
  * `sha2(to_json(struct(columns sorted lexicographically)), 256)` — same
  * canonicalization property (column order never changes the key), not
  * byte-identical to Python's serialization (SURVEY.md §7 "known-hard").
  * Stateless, codegen'd, shuffle-free: safe in any 100 TB hot path.
  */
object Keys {
  /** P5: canonical content key over the given columns (sorted by name). */
  def canonicalKey(cols: Seq[String]): Column =
    sha2(to_json(struct(cols.sorted.map(col): _*)), 256)

  /** P5 over all columns of a frame. */
  def canonicalKey(df: DataFrame): Column = canonicalKey(df.columns.toSeq)

  /** P7: ingest-time tag (reference fetch_data_energinet.py:44 injects
    * `utcnow().isoformat()` into state records). */
  def ingestTag(df: DataFrame, colName: String = "ingested_at"): DataFrame =
    df.withColumn(colName, current_timestamp())
}
