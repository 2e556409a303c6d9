package graft.ops

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Avro Object Container File (OCF) sink + source (reference K2): the
  * reference's HDFS sink connector lands topics as Avro container files
  * (cluster/configuration.json:9 `format.class: ...AvroFormat`,
  * cluster/hdfs-sink-connector.json:8), rolled every `flush.size` records —
  * so a reference user replaying sunk data reads OCF files first.
  *
  * The container ships avro-core but no spark-avro connector, so both legs
  * run through the Hadoop FileSystem API task-side:
  * - write: one container file per partition (`part-NNNNN.avro`), streamed
  *   row-by-row through a DataFileWriter — no buffering of the partition.
  * - read: one container file per task via DataFileStream. The FILE is the
  *   parallel unit, matching the sink's flush.size-rolled layout; at 100 TB
  *   the roll size bounds file size, so file-granular splits stay balanced.
  *
  * Schema evolution (D6 "latest version wins") comes free from Avro
  * resolution: the reader passes its schema to DataFileStream, the writer
  * schema is read from each file's header, and added-with-default fields
  * are filled in — same contract as [[AvroSerDe.decodeEvolved]].
  */
object AvroOcf {
  /** Write `df` as Avro container files under `outDir` (overwrites). */
  def write(df: DataFrame, schemaJson: String, outDir: String): Unit = {
    val names = df.columns
    val conf = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new Path(outDir)
    val fs = dirPath.getFileSystem(conf.value)
    fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val schema = new Schema.Parser().parse(schemaJson)
        val path = new Path(dirPath, f"part-$pid%05d.avro")
        // Stream into an attempt-unique temp file and publish by rename.
        // Concurrent attempts of the same partition (speculation, a zombie
        // surviving a retry) write identical deterministic bytes, so
        // publication is idempotent rather than mutually exclusive: HDFS
        // rename refuses an existing destination, but RawLocalFileSystem
        // delegates to POSIX rename which silently replaces it — either way
        // the final file holds one attempt's complete bytes, never an
        // interleaving, and a failed attempt leaves only a dotfile the
        // .avro reader filter ignores. Check-and-skip keeps the common
        // local-FS double-publish from doing a second replace.
        val tmp = new Path(dirPath,
          f".part-$pid%05d-attempt-${tc.taskAttemptId()}%d.avro.tmp")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(tmp, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        try rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            if (schema.getField(names(i)) != null) rec.put(names(i), row.get(i))
            i += 1
          }
          w.append(rec)
        } finally w.close()
        if (fs.exists(path) || !fs.rename(tmp, path)) fs.delete(tmp, false): Unit
      }
    }
  }

  /** Read Avro container files under `dir` through `readerSchemaJson`
    * (files may have been written under older schema versions). */
  def read(spark: SparkSession, dir: String, readerSchemaJson: String,
      sparkSchema: StructType): DataFrame = {
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    val files = fs.listStatus(dirPath)
      .map(_.getPath.toString).filter(_.endsWith(".avro")).sorted.toSeq
    val names = sparkSchema.fields.map(_.name)
    val enc = RowEncoder.encoderFor(sparkSchema)
    spark.createDataset(files)(Encoders.STRING)
      .repartition(math.max(files.length, 1))
      .mapPartitions { paths =>
        val readerSchema = new Schema.Parser().parse(readerSchemaJson)
        // A consumer that stops early (limit/take/exception mid-partition)
        // never exhausts the iterator, so the open Hadoop input stream must
        // be released at task completion, not on iterator drain.
        var active: DataFileStream[GenericRecord] = null
        val tc = TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (active != null) { try active.close() catch { case _: Exception => () } }
        }
        paths.flatMap { p =>
          val path = new Path(p)
          val in = path.getFileSystem(conf.value).open(path)
          // Writer schema comes from the file header; reader schema drives
          // resolution (defaults for added fields, drops for removed ones).
          val stream = new DataFileStream[GenericRecord](in,
            new GenericDatumReader[GenericRecord](null, readerSchema))
          active = stream
          new Iterator[Row] {
            def hasNext: Boolean = {
              val h = stream.hasNext
              if (!h) {
                stream.close()
                if (active eq stream) active = null
              }
              h
            }
            def next(): Row = {
              val rec = stream.next()
              Row.fromSeq(names.toIndexedSeq.map { name =>
                val v = if (readerSchema.getField(name) == null) null
                        else rec.get(name)
                v match {
                  case u: org.apache.avro.util.Utf8 => u.toString
                  case other                        => other
                }
              })
            }
          }
        }
      }(enc)
  }
}
