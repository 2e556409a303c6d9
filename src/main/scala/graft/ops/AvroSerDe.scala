package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro record SerDe against a registered contract schema (reference
  * K1/P3/P4): the producers serialize each record with Confluent's
  * AvroSerializer against the registry schema
  * (fetch_data_energinet.py:240-253), the consumer decodes bytes back per
  * contract (consumer/consumer.py:27-33).
  *
  * The container ships avro-core (no spark-avro connector), so encode and
  * decode run as mapPartitions passes: the schema string is parsed ONCE per
  * partition (the reference's process-wide schema cache, D6,
  * fetch_data_energinet.py:202,227-238) and the Avro encoder is reused
  * across rows. Both passes are narrow (no shuffle) and stream row-by-row —
  * safe at any scale.
  *
  * Covered type surface = the contracts' (SURVEY §1): string, int, float,
  * double, long, boolean, and ["null", T] unions.
  */
object AvroSerDe {
  /** P3+K1: encode rows to Avro binary against `schemaJson`, keyed by
    * `keyCol` (the produce key = event-time field,
    * fetch_data_energinet.py:246). Output: (key string, value binary) —
    * exactly the Kafka sink frame; `.write.format("kafka")` is the
    * production leg, Parquet/files the testable one. */
  def encode(df: DataFrame, schemaJson: String, keyCol: String): DataFrame = {
    val keyIdx = df.columns.indexOf(keyCol)
    require(keyIdx >= 0, s"key column $keyCol not in ${df.columns.mkString(",")}")
    val names = df.columns
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.BINARY)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson) // per-partition cache (D6)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos = new ByteArrayOutputStream()
      val encoder = EncoderFactory.get().binaryEncoder(baos, null)
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < names.length) {
          if (schema.getField(names(i)) != null) rec.put(names(i), row.get(i))
          i += 1
        }
        baos.reset()
        val e = EncoderFactory.get().binaryEncoder(baos, encoder)
        writer.write(rec, e)
        e.flush()
        (String.valueOf(row.get(keyIdx)), baos.toByteArray)
      }
    }.toDF("key", "value")
  }

  /** P4: decode a binary Avro `value` column back to contract columns. */
  def decode(df: DataFrame, schemaJson: String, sparkSchema: StructType): DataFrame =
    decodeEvolved(df, schemaJson, schemaJson, sparkSchema)

  /** P4 + D6 "latest version wins": decode bytes written under
    * `writerSchemaJson` through `readerSchemaJson` — Avro schema resolution
    * defaults fields the writer didn't emit and skips fields the reader
    * dropped, which is exactly what happens when the registry's latest
    * version differs from the version a record was produced under
    * (fetch_data_energinet.py:220-244). Values are mapped into the Spark row
    * BY FIELD NAME (not position), so a reordered Avro schema cannot
    * silently shift values into the wrong columns. */
  def decodeEvolved(df: DataFrame, writerSchemaJson: String,
      readerSchemaJson: String, sparkSchema: StructType): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(sparkSchema)
    val names = sparkSchema.fields.map(_.name)
    df.select(col("value")).mapPartitions { rows =>
      val writerSchema = new Schema.Parser().parse(writerSchemaJson)
      val readerSchema = new Schema.Parser().parse(readerSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](writerSchema, readerSchema)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](0)
        val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
        val rec = reader.read(null, decoder)
        val out = names.map { name =>
          val v = if (readerSchema.getField(name) == null) null else rec.get(name)
          v match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case other                        => other
          }
        }
        Row.fromSeq(out.toIndexedSeq)
      }
    }
  }

  /** Confluent wire framing: magic byte 0x00 + 4-byte big-endian schema id
    * + Avro payload (the byte layout Confluent's serializer emits; the
    * reference consumer reads these frames). */
  def frame(payload: Array[Byte], schemaId: Int): Array[Byte] =
    ByteBuffer.allocate(5 + payload.length)
      .put(0x00.toByte).putInt(schemaId).put(payload).array()

  /** Strip Confluent framing; returns (schemaId, payload). */
  def deframe(framed: Array[Byte]): (Int, Array[Byte]) = {
    require(framed.length >= 5 && framed(0) == 0x00, "not a Confluent frame")
    val bb = ByteBuffer.wrap(framed)
    bb.get()
    val id = bb.getInt
    val payload = new Array[Byte](framed.length - 5)
    bb.get(payload)
    (id, payload)
  }

  /** The four contract schemas, read once from the reference repo layout's
    * equivalents encoded here as constants would be a copy; instead callers
    * pass schema JSON (tests build them from schemas.Contracts). Helper:
    * derive an Avro schema JSON from a Spark StructType for the supported
    * type surface. */
  def avroSchemaFor(name: String, schema: StructType): String = {
    def typeOf(f: StructField): String = {
      val base = f.dataType match {
        case StringType  => "\"string\""
        case FloatType   => "\"float\""
        case DoubleType  => "\"double\""
        case IntegerType => "\"int\""
        case LongType    => "\"long\""
        case BooleanType => "\"boolean\""
        case dt => throw new IllegalArgumentException(s"unsupported: $dt")
      }
      if (f.nullable) s"""["null", $base]""" else base
    }
    val fields = schema.fields.map { f =>
      val dflt = if (f.nullable) ""","default": null""" else ""
      s"""{"name": "${f.name}", "type": ${typeOf(f)}$dflt}"""
    }.mkString(",\n  ")
    s"""{"type": "record", "name": "$name", "fields": [\n  $fields\n]}"""
  }
}
