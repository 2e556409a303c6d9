package graft.sources.v2

import java.time.LocalDate
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the paginated day-window REST scan — the
  * at-scale form of S1/S3 (SURVEY §2.1): one InputPartition per event-time
  * day, so each day's fetch executes ON AN EXECUTOR (the driver-side
  * `Sources.incrementalIngest` loop is the small-scale variant; this is
  * what 100 TB of backfill needs — a thousand day-windows fan out across
  * the cluster, with per-partition retry for free).
  *
  * The HTTP GET is stubbed with a deterministic in-process generator (no
  * egress in this container): `DayWindowReader.fetchDay` is the seam where
  * the real `GET API_URL?start=<day>&end=<day+1>` call goes — partition
  * boundaries, schema, pruning, and task layout are all real.
  *
  * Column pruning is pushed into the reader (SupportsPushDownRequiredColumns):
  * a query projecting one column materializes one column.
  *
  * Usage: spark.read.format("graft.sources.v2.DayWindowSource")
  *   .option("from", "2024-01-01").option("to", "2024-01-07").load()
  */
class DayWindowSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DayWindowSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new DayWindowTable(properties.get("from"), properties.get("to"))
}

object DayWindowSource {
  /** The ConsumptionIndustry shape (reference avro-schema contract). */
  val schema: StructType = StructType(Seq(
    StructField("HourUTC", StringType, nullable = false),
    StructField("MunicipalityNo", StringType, nullable = false),
    StructField("Branche", StringType, nullable = false),
    StructField("ConsumptionkWh", FloatType, nullable = false)))
}

class DayWindowTable(from: String, to: String) extends Table with SupportsRead {
  require(from != null && to != null, "options 'from' and 'to' are required")
  override def name(): String = s"daywindow[$from..$to]"
  override def schema(): StructType = DayWindowSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DayWindowScanBuilder(from, to,
      Option(options.get("daysPerTrigger")).map(_.toInt))
}

class DayWindowScanBuilder(from: String, to: String,
    daysPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var required: StructType = DayWindowSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None
  private var dayLo: String = from
  private var dayHi: String = to

  /** S2 (range-bound discovery) pushed INTO the connector: ungrouped
    * COUNT / MIN(HourUTC) / MAX(HourUTC) are answered from the day-window
    * METADATA — the day grid is `to - from + 1` days of a fixed
    * deterministic cadence, so these aggregates need zero fetches, the
    * exact analogue of the reference's two sorted `limit=1` REST probes
    * (a metadata query, not a scan). Anything else (grouping, sums over
    * measures) declines the pushdown and Spark aggregates the normal
    * scan. COUNT(col) is answerable because every source column is
    * non-nullable; DISTINCT is not. */
  private def isHourUtc(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("HourUTC"))
      case _ => false
    }

  /** An inverted day range (filters narrowed to from > to) has zero days:
    * metadata answers (nDays-derived count, grid-corner min/max) would be
    * fabricated, so decline the pushdown and let the normal scan return
    * its empty result (count 0, null min/max) through Spark's aggregate. */
  private def rangeEmpty: Boolean = dayLo > dayHi

  private def answerable(agg: Aggregation): Boolean =
    !rangeEmpty &&
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count     => !c.isDistinct
        case m: Min       => isHourUtc(m.column)
        case m: Max       => isHourUtc(m.column)
        case _            => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    answerable(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = answerable(agg)
    if (ok) pushedAgg = Some(agg)
    ok
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Day-partition pruning from HourUTC bounds: an ISO hour string's first
    * 10 chars are its day, and ISO strings sort chronologically, so range
    * predicates on HourUTC narrow the day-window list. All filters are
    * also left as residuals (we return them from pushFilters), so Spark
    * re-applies them exactly — pushdown here only skips whole partitions
    * that cannot match. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def day(v: Any): String = v.toString.take(10)
    filters.foreach {
      case GreaterThanOrEqual("HourUTC", v) => if (day(v) > dayLo) dayLo = day(v)
      case GreaterThan("HourUTC", v)        => if (day(v) > dayLo) dayLo = day(v)
      case LessThanOrEqual("HourUTC", v)    => if (day(v) < dayHi) dayHi = day(v)
      case LessThan("HourUTC", v)           => if (day(v) < dayHi) dayHi = day(v)
      case EqualTo("HourUTC", v) =>
        if (day(v) > dayLo) dayLo = day(v)
        if (day(v) < dayHi) dayHi = day(v)
      case _ => ()
    }
    pushed = filters.filter {
      case GreaterThanOrEqual("HourUTC", _) | GreaterThan("HourUTC", _) |
           LessThanOrEqual("HourUTC", _) | LessThan("HourUTC", _) |
           EqualTo("HourUTC", _) => true
      case _ => false
    }
    filters // everything stays a residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new DayWindowAggScan(dayLo, dayHi, agg)
    case None      => new DayWindowScan(dayLo, dayHi, required, daysPerTrigger)
  }
}

/** The completely-pushed-down aggregate scan: one metadata-derived row,
  * no day fetches at all. Values are computed on the DRIVER from the day
  * grid (count = nDays · 24 hours · 3 municipalities · 2 branches; the
  * extreme HourUTC strings are the grid corners) and shipped to the one
  * task as literals. */
class DayWindowAggScan(from: String, to: String,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate._

  // Belt-and-braces vs the ScanBuilder's rangeEmpty decline: an inverted
  // range (from > to) is an EMPTY window, never a negative one — count 0,
  // null min/max — matching what the normal scan path would aggregate to.
  private val nDays: Long = math.max(0L, java.time.temporal.ChronoUnit.DAYS.between(
    LocalDate.parse(from), LocalDate.parse(to)) + 1)
  private val rowCount: Long = nDays * 24 *
    DayWindowReader.municipalities.size * DayWindowReader.branches.size

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: Min, i) => StructField(s"agg_$i", StringType, nullable = true)
      case (_: Max, i) => StructField(s"agg_$i", StringType, nullable = true)
      case (_, i)      => StructField(s"agg_$i", LongType, nullable = false)
    }.toIndexedSeq)

  override def description(): String =
    s"DayWindowAggScan[$from..$to, pushed=${agg.aggregateExpressions.map(_.describe).mkString(",")}]"
  override def toBatch: Batch = this

  private val values: Array[Any] = agg.aggregateExpressions.map {
    case _: Min => if (nDays == 0) null else s"${from}T00:00"
    case _: Max => if (nDays == 0) null else s"${to}T23:00"
    case _      => rowCount // CountStar / Count over non-null columns
  }.toArray

  override def planInputPartitions(): Array[InputPartition] =
    Array(AggResultPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new AggResultReaderFactory
}

case class AggResultPartition(values: Array[Any]) extends InputPartition

class AggResultReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val vals = partition.asInstanceOf[AggResultPartition].values
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(vals.toIndexedSeq.map {
        case s: String => UTF8String.fromString(s)
        case other     => other
      })
      override def close(): Unit = ()
    }
}

class DayWindowScan(from: String, to: String, required: StructType,
    daysPerTrigger: Option[Int] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def description(): String = s"DayWindowScan[$from..$to]"
  override def toBatch: Batch = this

  /** Runtime filtering (the DSv2 form of dynamic partition pruning): when
    * this table joins a FILTERED dimension on HourUTC, Spark executes the
    * dim side first and hands its HourUTC values here; partitions for
    * days outside that set are never planned — and with the fetch running
    * on executors, never fetched. The static day-pruning in
    * `pushFilters` handles compile-time bounds; this handles bounds only
    * known at run time. Values arrive as ISO hour strings whose first 10
    * chars are the day (same invariant pushFilters uses). */
  private var runtimeDays: Option[Set[String]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("HourUTC"))

  /** The ISO-hour invariant pushFilters relies on, now VALIDATED rather
    * than assumed: only values whose first 10 chars parse as a calendar
    * day contribute to pruning. A filter carrying any non-conforming
    * value is treated like an unsupported filter (keep all partitions) —
    * pruning on a garbage "day" would still be semantically safe (such a
    * value can never join), but keep-all mirrors the unsupported-filter
    * branch instead of leaning on a convention. */
  private def asDay(v: Any): Option[String] = {
    val s = String.valueOf(v).take(10)
    try { LocalDate.parse(s); Some(s) } catch {
      case _: java.time.format.DateTimeParseException => None
    }
  }

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    filters.foreach {
      case In("HourUTC", vs) =>
        val nonNull = vs.filter(_ != null)
        if (nonNull.forall(v => asDay(v).isDefined)) {
          val days = nonNull.flatMap(asDay).toSet
          runtimeDays = Some(runtimeDays.fold(days)(_ intersect days))
        }
        // else: a value didn't look like an ISO hour — keep all partitions
      case EqualTo("HourUTC", v) if v != null =>
        asDay(v).foreach { d =>
          runtimeDays = Some(runtimeDays.fold(Set(d))(_ intersect Set(d)))
        }
      case _ => () // unsupported runtime filter: keep all partitions
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val start = LocalDate.parse(from)
    val end = LocalDate.parse(to)
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end))
      .filter(d => runtimeDays.forall(_.contains(d.toString)))
      .map(d => DayPartition(d.toString,
        required.fieldNames): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DayWindowReaderFactory

  /** S3 as a streaming source: offsets are day indexes relative to `from`,
    * so a restarted query resumes at the first unprocessed day — the
    * reference's Redis day-checkpoint (D3) as Structured Streaming
    * checkpointing. Extending `to` on restart ingests only the new days. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new DayWindowMicroBatch(from, to, required, daysPerTrigger)
}

class DayWindowMicroBatch(from: String, to: String, required: StructType,
    daysPerTrigger: Option[Int] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class DayOffset(idx: Long) extends Offset {
    override def json(): String = idx.toString
  }
  private val startDate = LocalDate.parse(from)
  private val nDays: Long =
    java.time.temporal.ChronoUnit.DAYS.between(startDate, LocalDate.parse(to)) + 1

  override def initialOffset(): Offset = DayOffset(-1L)
  override def latestOffset(): Offset = DayOffset(nDays - 1)

  /** D5 as admission control: at most daysPerTrigger day-windows per
    * micro-batch (the reference's fetch pacing, here as source-side
    * rate limiting instead of sleeps). */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[DayOffset].idx
    val pace = daysPerTrigger.map(_.toLong).getOrElse(nDays)
    DayOffset(math.min(start + pace, nDays - 1))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset = DayOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DayOffset].idx
    val e = end.asInstanceOf[DayOffset].idx
    ((s + 1) to e).map(i =>
      DayPartition(startDate.plusDays(i).toString,
        required.fieldNames): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DayWindowReaderFactory
}

case class DayPartition(day: String, cols: Array[String]) extends InputPartition

class DayWindowReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DayWindowReader(partition.asInstanceOf[DayPartition])
}

object DayWindowReader {
  val municipalities: Seq[String] = Seq("101", "155", "630")
  val branches: Seq[String] = Seq("Erhverv", "Privat")

  /** Test observability: when `recordFetches` is enabled (specs only —
    * the flag keeps the production fetch path allocation-free and the
    * set bounded), every fetched day lands here; local-mode tests share
    * the JVM with the executors, so a spec can clear + assert to prove
    * runtime filtering skipped partitions. */
  @volatile var recordFetches: Boolean = false
  val fetchedDays: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** STUB fetch — deterministic synthetic records for one day. The real
    * implementation issues the day-window HTTP request here (on the
    * executor) and parses the `records` envelope (ops.Normalize). */
  def fetchDay(day: String): Iterator[(String, String, String, Float)] = {
    if (recordFetches) fetchedDays.add(day)
    fetchDayRows(day)
  }

  private def fetchDayRows(day: String): Iterator[(String, String, String, Float)] =
    for {
      h <- (0 until 24).iterator
      m <- municipalities.iterator
      b <- branches.iterator
    } yield {
      val hour = f"${day}T$h%02d:00"
      val v = math.abs((day, h, m, b).hashCode % 1000000) / 100.0f
      (hour, m, b, v)
    }
}

class DayWindowReader(p: DayPartition) extends PartitionReader[InternalRow] {
  private val it = DayWindowReader.fetchDay(p.day)
  private var current: (String, String, String, Float) = _

  override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }

  override def get(): InternalRow = {
    val vals: Array[Any] = p.cols.map {
      case "HourUTC"        => UTF8String.fromString(current._1)
      case "MunicipalityNo" => UTF8String.fromString(current._2)
      case "Branche"        => UTF8String.fromString(current._3)
      case "ConsumptionkWh" => current._4
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = ()
}
