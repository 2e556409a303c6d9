package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline audit counters via `Dataset.observe`: every filter gate
  * reports (rows in, rows kept) as metrics computed DURING the single
  * pass that materializes the result — the numbers a curation pipeline
  * must publish per stage, with no second scan. At 100 TB, re-counting
  * rejects with one extra aggregation per gate re-reads the corpus once
  * per stage; observation metrics ride the existing job as accumulators
  * and cost nothing.
  *
  * Usage: thread a [[Audit.Trail]] through the gates, run ONE action on
  * the final frame, then read `trail.counters` (blocks until the
  * observed action completes).
  */
object Audit {
  final class Trail {
    private val obs =
      scala.collection.mutable.LinkedHashMap[String, Observation]()

    /** `df.filter(pred)`, observing input and kept counts under `name`. */
    def gate(df: DataFrame, name: String, pred: Column): DataFrame = {
      require(!obs.contains(name), s"duplicate gate name $name")
      val o = Observation(s"audit_$name")
      obs += name -> o
      df.observe(o, count(lit(1)).as("in_rows"),
          count(when(pred, lit(1))).as("kept_rows"))
        .filter(pred)
    }

    /** Gate names in creation order with (in, kept) counts; call after an
      * action on the gated frame (each get blocks for its observation). */
    def counters: Seq[(String, Long, Long)] =
      obs.toSeq.map { case (n, o) =>
        (n, o.get("in_rows").asInstanceOf[Long],
          o.get("kept_rows").asInstanceOf[Long])
      }
  }
}
