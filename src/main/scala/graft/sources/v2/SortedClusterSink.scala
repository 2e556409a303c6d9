package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 write that DECLARES its layout requirements through
  * `RequiresDistributionAndOrdering` — the Iceberg-style write path where
  * the SINK tells Spark "cluster my rows by this column and sort them",
  * and the planner inserts the exchange + sort on the write side (no
  * caller-side `repartition`/`sortWithinPartitions` choreography, no way
  * for a caller to forget it). This is the piece [[AvroDaySink]] leaves
  * to the caller ("sort/repartition by the day column upstream").
  *
  * The writer VERIFIES the contract at runtime: rows must arrive in
  * non-decreasing (cluster, sort) order and a cluster value must never
  * resume after it ended — if Spark (or a future refactor) stopped
  * honoring the declared distribution, every task would fail loudly
  * instead of silently producing fragmented unsorted files. Exactly one
  * file per (cluster value, task) is created, named
  * `part-<cluster>-<partition>.avro`, flat in `path` so the OCF reader
  * scans them directly.
  *
  * At 100 TB this is the layout contract that makes the downstream read
  * cheap: one clustered+sorted file set per writer wave, file-granular
  * cluster pruning, and in-file ordering for merge/as-of consumers.
  */
class SortedClusterSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SortedClusterTable(schema, properties.get("path"),
      Option(properties.get("clusterCol")).getOrElse("day"),
      Option(properties.get("sortCol")).getOrElse("event_id"))
}

class SortedClusterTable(writeSchema: StructType, path: String,
    clusterCol: String, sortCol: String) extends Table with SupportsWrite {
  require(path != null, "option 'path' is required")
  override def name(): String = s"sortedclustersink[$path]"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new SortedClusterWrite(info.schema(), path, clusterCol, sortCol)
    }
}

/** The Write itself carries the distribution/ordering requirement —
  * Spark's V2Writes/DistributionAndOrderingUtils rules read these and
  * plan the shuffle + sort. */
class SortedClusterWrite(schema: StructType, path: String,
    clusterCol: String, sortCol: String)
    extends Write with RequiresDistributionAndOrdering {
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity(clusterCol)))
  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.column(clusterCol), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column(sortCol), SortDirection.ASCENDING))
  override def toBatch: BatchWrite =
    new SortedClusterBatchWrite(schema, path, clusterCol, sortCol)
}

class SortedClusterBatchWrite(schema: StructType, path: String,
    clusterCol: String, sortCol: String) extends BatchWrite {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val avroJson = graft.ops.AvroSerDe.avroSchemaFor("SortedRecord", schema)
    val (sch, p, cc, sc, c) = (schema, path, clusterCol, sortCol, conf)
    (partitionId: Int, taskId: Long) =>
      new SortedClusterWriter(sch, avroJson, p, cc, sc, c, partitionId)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: AvroDayCommit => m }.foreach { m =>
      val fs = new Path(path).getFileSystem(conf.value)
      m.files.foreach(f => fs.delete(new Path(f), false))
    }
}

class SortedClusterWriter(schema: StructType, avroJson: String, path: String,
    clusterCol: String, sortCol: String, conf: SerializableConfiguration,
    partitionId: Int) extends DataWriter[InternalRow] {
  private val avroSchema = new org.apache.avro.Schema.Parser().parse(avroJson)
  private val cIdx = schema.fieldIndex(clusterCol)
  private val sIdx = schema.fieldIndex(sortCol)
  private val fs = new Path(path).getFileSystem(conf.value)
  private val closedClusters = scala.collection.mutable.Set[String]()
  private var curCluster: String = null
  private var lastSort = Long.MinValue
  private var cur: (Path, Path, DataFileWriter[GenericRecord]) = null
  private val done = scala.collection.mutable.ArrayBuffer[(Path, Path)]()

  private def openCluster(cluster: String): Unit = {
    val safe = cluster.replaceAll("[^A-Za-z0-9_-]", "_")
    val fin = new Path(path, f"part-$safe%s-$partitionId%05d.avro")
    val tmp = new Path(path, s".part-$safe-$partitionId.avro.tmp")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, fs.create(tmp, true))
    cur = (tmp, fin, w)
  }

  private def closeCurrent(): Unit = if (cur != null) {
    cur._3.close()
    done += ((cur._1, cur._2))
    cur = null
  }

  override def write(row: InternalRow): Unit = {
    val cluster = row.getUTF8String(cIdx).toString
    val sortV = row.getLong(sIdx)
    if (cluster != curCluster) {
      // the declared clustering makes each cluster contiguous per task;
      // a resumed cluster means Spark did not honor the distribution
      require(!closedClusters.contains(cluster),
        s"cluster '$cluster' resumed after ending — declared " +
          "distribution was not honored")
      closeCurrent()
      if (curCluster != null) closedClusters += curCluster
      curCluster = cluster
      lastSort = Long.MinValue
      openCluster(cluster)
    }
    require(sortV >= lastSort,
      s"sort order violated within cluster '$cluster': $sortV < $lastSort")
    lastSort = sortV
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val v: Any =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case StringType  => row.getUTF8String(i).toString
          case LongType    => row.getLong(i)
          case IntegerType => row.getInt(i)
          case DoubleType  => row.getDouble(i)
          case FloatType   => row.getFloat(i)
          case BooleanType => row.getBoolean(i)
          case dt => throw new IllegalArgumentException(s"unsupported: $dt")
        }
      rec.put(f.name, v)
      i += 1
    }
    cur._3.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    val files = done.map { case (tmp, fin) =>
      if (fs.exists(fin)) fs.delete(fin, false)
      if (!fs.rename(tmp, fin)) sys.error(s"cannot publish $tmp -> $fin")
      fin.toString
    }.toSeq
    AvroDayCommit(files)
  }

  override def abort(): Unit = {
    if (cur != null) { try cur._3.close() catch { case _: Exception => () } }
    (done.map(_._1) ++ Option(cur).map(_._1)).foreach(
      fs.delete(_, false): Unit)
  }

  override def close(): Unit = ()
}
