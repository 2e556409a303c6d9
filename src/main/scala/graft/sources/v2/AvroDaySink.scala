package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 WRITE-side connector — the sink leg of the connector pair
  * (DayWindowSource is the read leg): lands a DataFrame as day-partitioned
  * Avro container files, the reference HDFS sink's layout
  * (`/topics/<topic>/day=.../part-*.avro`, cluster/configuration.json:9)
  * expressed through the BatchWrite API instead of a `foreachPartition`.
  *
  * Task protocol: each DataWriter streams its rows into per-day files
  * staged under attempt-unique dot-names and renames them to their final
  * names in `commit()` — executed AFTER the driver's commit coordinator
  * has granted this attempt the partition (useCommitCoordinator default),
  * so speculative attempts never double-publish. `abort()` deletes the
  * attempt's staged files; the job-level `commit` is a no-op because every
  * surviving file is already final and attempt-unique names cannot
  * collide. At 100 TB each task holds ONE open writer per day it sees —
  * sort/repartition by the day column upstream to bound that at one.
  *
  * The STREAMING leg reuses the same writers with EPOCH-stable file
  * names (`part-e<epoch>-<partition>.avro`): a replayed micro-batch
  * rewrites exactly the files its first attempt produced (delete +
  * rename publish), so the sink is idempotent per epoch — the
  * exactly-once contract a checkpointed query expects from its sink.
  *
  * Usage:
  *   df.write.format("graft.sources.v2.AvroDaySink")
  *     .option("path", dir).option("dayCol", "day").mode("append").save()
  *   df.writeStream.format("graft.sources.v2.AvroDaySink")
  *     .option("path", dir).option("checkpointLocation", ck).start()
  */
class AvroDaySink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: the schema comes from the DataFrame
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new AvroDaySinkTable(schema, properties.get("path"),
      Option(properties.get("dayCol")).getOrElse("day"))
}

class AvroDaySinkTable(writeSchema: StructType, path: String, dayCol: String)
    extends Table with SupportsWrite {
  require(path != null, "option 'path' is required")
  override def name(): String = s"avrodaysink[$path]"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AvroDayBatchWrite(info.schema(), path, dayCol)
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new AvroDayStreamingWrite(info.schema(), path, dayCol)
      }
    }
}

class AvroDayBatchWrite(schema: StructType, path: String, dayCol: String)
    extends BatchWrite {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val avroJson = graft.ops.AvroSerDe.avroSchemaFor("SinkRecord", schema)
    new AvroDayWriterFactory(schema, avroJson, path, dayCol, conf)
  }
  // Attempt-unique final names cannot collide and are only renamed by the
  // coordinator-elected attempt: job commit has nothing left to do.
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: AvroDayCommit => m }.foreach { m =>
      val fs = new Path(path).getFileSystem(conf.value)
      m.files.foreach(f => fs.delete(new Path(f), false))
    }
}

class AvroDayStreamingWrite(schema: StructType, path: String, dayCol: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val avroJson = graft.ops.AvroSerDe.avroSchemaFor("SinkRecord", schema)
    val sch = schema
    val (p, dc, c) = (path, dayCol, conf)
    (partitionId: Int, taskId: Long, epochId: Long) =>
      // Epoch-stable names: a replayed epoch regenerates the same file
      // set and the writer replaces it atomically (exactly-once sink).
      new AvroDayWriter(sch, avroJson, p, dc, c,
        s"e$epochId-$partitionId", replaceExisting = true)
  }
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: AvroDayCommit => m }.foreach { m =>
      val fs = new Path(path).getFileSystem(conf.value)
      m.files.foreach(f => fs.delete(new Path(f), false))
    }
}

case class AvroDayCommit(files: Seq[String]) extends WriterCommitMessage

class AvroDayWriterFactory(schema: StructType, avroJson: String, path: String,
    dayCol: String, conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new AvroDayWriter(schema, avroJson, path, dayCol, conf,
      f"$partitionId%05d-$taskId%d", replaceExisting = false)
}

class AvroDayWriter(schema: StructType, avroJson: String, path: String,
    dayCol: String, conf: SerializableConfiguration, fileTag: String,
    replaceExisting: Boolean) extends DataWriter[InternalRow] {
  private val avroSchema = new org.apache.avro.Schema.Parser().parse(avroJson)
  private val dayIdx = schema.fieldIndex(dayCol)
  private val fs = new Path(path).getFileSystem(conf.value)
  // (tmpPath, finalPath, writer) per day seen by this task.
  private val open = scala.collection.mutable.LinkedHashMap[String,
    (Path, Path, DataFileWriter[GenericRecord])]()

  private def writerFor(day: String) = open.getOrElseUpdate(day, {
    val dir = new Path(path, s"day=$day")
    fs.mkdirs(dir)
    val fin = new Path(dir, s"part-$fileTag.avro")
    val tmp = new Path(dir, s".part-$fileTag.avro.tmp")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, fs.create(tmp, true))
    (tmp, fin, w)
  })

  override def write(row: InternalRow): Unit = {
    val day = row.getUTF8String(dayIdx).toString
    val (_, _, w) = writerFor(day)
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
    w.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    val files = open.values.map { case (tmp, fin, w) =>
      w.close()
      if (replaceExisting && fs.exists(fin)) fs.delete(fin, false)
      if (!fs.rename(tmp, fin))
        sys.error(s"cannot publish $tmp -> $fin")
      fin.toString
    }.toSeq
    AvroDayCommit(files)
  }

  override def abort(): Unit = open.values.foreach { case (tmp, _, w) =>
    try w.close() catch { case _: Exception => () }
    fs.delete(tmp, false): Unit
  }

  override def close(): Unit = ()
}
