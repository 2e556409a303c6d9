package graft.sources.v2.rowlevel

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A catalog of MUTABLE parquet tables: `SupportsRowLevelOperations` with
  * group-based COPY-ON-WRITE, so `MERGE INTO`, `UPDATE`, and `DELETE FROM`
  * are real SQL against file-backed tables — the governed-storage form of
  * the reference's idempotent re-ingest contract (D2/D3,
  * fetch_data_statbank.py:116-121) that the hand-rolled operators (SCD2
  * q89, CDC diff q158, targeted deletion q187) implement relationally.
  *
  * Mechanics (the Iceberg/Delta copy-on-write shape, reduced to its
  * Spark-API skeleton):
  * - a table is a directory of parquet files; each FILE is a rewrite
  *   GROUP, plus a `_meta.json` holding the schema;
  * - every scan can expose a `__group` METADATA COLUMN (the file a row
  *   lives in);
  * - a DML statement plans through [[GraftRowLevelOperation]]: Spark
  *   first runs a runtime GROUP-FILTER subquery (distinct `__group` of
  *   rows matching the condition), hands the surviving file set to the
  *   operation's scan via `SupportsRuntimeV2Filtering`, reads ONLY those
  *   files, computes the post-DML rows, and the commit atomically swaps
  *   exactly those files for the newly written ones — untouched files
  *   are never read, rewritten, or moved (spec-pinned);
  * - plain writes support append and truncate (INSERT INTO / OVERWRITE).
  *
  * At 100 TB the group set is the unit of both pruning and rewrite — the
  * per-statement cost is O(files holding matches), not O(table), the same
  * contract as [[graft.streaming.Streams.deleteKeys]]'s bucket swap but
  * driven from SQL. Commit publishes renames from a hidden staging dir;
  * a crashed statement leaves only an ignorable staging dir behind
  * (readers never see partial state; the statement re-runs).
  *
  * Supported column types (the reference contract's surface + keys):
  * BOOLEAN, INT, BIGINT, DOUBLE, STRING, DATE.
  *
  * Usage:
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftRowCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/wh")
  *   spark.sql("CREATE TABLE graft.db.t (k BIGINT, v DOUBLE) USING graft")
  *   spark.sql("MERGE INTO graft.db.t t USING src s ON t.k = s.k ...")
  * }}}
  */
class GraftRowCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: String = _

  private def conf = new Configuration()
  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"catalog $name needs spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): Path =
    new Path((warehouse +: ident.namespace() :+ ident.name()).mkString("/"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = new Path((warehouse +: namespace).mkString("/"))
    val f = fs(ns)
    if (!f.exists(ns)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(ns).filter(s => s.isDirectory &&
        f.exists(new Path(s.getPath, GraftRowTable.MetaFile)))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table =
    loadVersioned(ident, None)

  /** Time travel: `SELECT ... FROM t VERSION AS OF <n>` pins snapshot n
    * (every commit — insert, overwrite, or DML rewrite — is a new
    * snapshot; data files of old snapshots survive until vacuum). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft table versions are integers, got '$version'")
    }
    loadVersioned(ident, Some(v))
  }

  private def loadVersioned(ident: Identifier, version: Option[Long]): Table = {
    val dir = tableDir(ident)
    val meta = new Path(dir, GraftRowTable.MetaFile)
    val f = fs(dir)
    if (!f.exists(meta)) throw new NoSuchTableException(ident)
    version.foreach { v =>
      require(f.exists(GraftRowTable.manifestPath(dir.toString, v)),
        s"table $ident has no version $v")
    }
    val in = f.open(meta)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val (schema, mode) = GraftRowTable.parseMeta(json)
    new GraftRowTable(ident.toString, dir.toString, schema, version, mode)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft row-level tables are unpartitioned (files are the groups)")
    GraftRowTable.validateSchema(schema)
    val mode = Option(properties.get("mode"))
      .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "mode")))
      .getOrElse("cow")
    require(mode == "cow" || mode == "mor",
      s"table property mode must be cow or mor, got $mode")
    val dir = tableDir(ident)
    val f = fs(dir)
    if (f.exists(new Path(dir, GraftRowTable.MetaFile)))
      throw new TableAlreadyExistsException(ident)
    f.mkdirs(dir)
    val out = f.create(new Path(dir, GraftRowTable.MetaFile), true)
    try out.write(GraftRowTable.metaJson(schema, mode)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    GraftRowTable.writeManifest(dir.toString, f, 0L, Nil) // empty snapshot 0
    new GraftRowTable(ident.toString, dir.toString, schema, None, mode)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    val f = fs(dir)
    f.exists(dir) && f.delete(dir, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = tableDir(from)
    val dst = tableDir(to)
    val f = fs(src)
    if (!f.exists(src)) throw new NoSuchTableException(from)
    if (f.exists(dst)) throw new TableAlreadyExistsException(to)
    f.rename(src, dst): Unit
  }

  // --- namespaces: directories under the warehouse root ---
  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    val f = fs(root)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).filter(_.isDirectory).map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = new Path((warehouse +: namespace).mkString("/"))
    fs(p).exists(p)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    val p = new Path((warehouse +: namespace).mkString("/"))
    fs(p).mkdirs(p): Unit
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = new Path((warehouse +: namespace).mkString("/"))
    val f = fs(p)
    f.exists(p) && f.delete(p, cascade)
  }
}

object GraftRowTable {
  val MetaFile = "_meta.json"
  val GroupCol = "__group"
  val PosCol = "__pos"
  val DeletePrefix = "delete-"

  /** Meta file: {"mode": "cow"|"mor", "schema": <StructType json>}. */
  def metaJson(schema: StructType, mode: String): String =
    s"""{"mode": "$mode", "schema": ${schema.json}}"""

  def parseMeta(json: String): (StructType, String) = {
    val m = org.json4s.jackson.JsonMethods.parse(json)
    val mode = (m \ "mode") match {
      case org.json4s.JString(s) => s
      case _ => "cow"
    }
    val schemaJson =
      org.json4s.jackson.JsonMethods.compact(m \ "schema")
    (DataType.fromJson(schemaJson).asInstanceOf[StructType], mode)
  }

  /** Manifest lines split into (data files, position-delete files). */
  def splitFiles(lines: Seq[String]): (Seq[String], Seq[String]) =
    lines.partition(!_.startsWith(DeletePrefix))

  def validateSchema(schema: StructType): Unit = schema.fields.foreach { fl =>
    fl.dataType match {
      case BooleanType | IntegerType | LongType | DoubleType | StringType |
           DateType => ()
      case other => throw new UnsupportedOperationException(
        s"column ${fl.name}: type $other not supported by graft row tables " +
          "(BOOLEAN, INT, BIGINT, DOUBLE, STRING, DATE)")
    }
  }

  // --- snapshot manifests: version N = the file list in _vN.manifest.
  // Commits write version N+1 and never delete data files (old snapshots
  // stay readable — VERSION AS OF); GraftMaintenance.vacuum reclaims.

  def manifestPath(dir: String, v: Long): Path =
    new Path(dir, f"_v$v%08d.manifest")

  def versions(dir: String, f: FileSystem): Seq[Long] =
    f.listStatus(new Path(dir)).map(_.getPath.getName)
      .collect { case n if n.startsWith("_v") && n.endsWith(".manifest") =>
        n.stripPrefix("_v").stripSuffix(".manifest").toLong }
      .sorted.toSeq

  def currentVersion(dir: String, f: FileSystem): Long = {
    val vs = versions(dir, f)
    require(vs.nonEmpty, s"$dir has no snapshot manifest — not a graft table")
    vs.max
  }

  def readManifest(dir: String, f: FileSystem, v: Long): Seq[String] = {
    val p = manifestPath(dir, v)
    require(f.exists(p), s"table at $dir has no version $v")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Single-writer commit: stage the manifest under a dot name, then
    * rename — the rename fails if the version already exists, so a
    * concurrent second writer errors instead of clobbering history. */
  def writeManifest(dir: String, f: FileSystem, v: Long,
      files: Seq[String]): Unit = {
    val tmp = new Path(dir, s".manifest-tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(files.sorted.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = manifestPath(dir, v)
    if (f.exists(dst) || !f.rename(tmp, dst)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent commit: version $v already exists at $dir")
    }
  }
}

/** Snapshot maintenance for the row-level catalog: retention vacuum and
  * (via plain SQL) compaction.
  *
  * Compaction needs no special code — `INSERT OVERWRITE t SELECT ...
  * FROM t` lands the same rows as fewer files in a NEW snapshot, prior
  * snapshots untouched. Vacuum then bounds history: keep the newest
  * `retainLast` snapshots, delete older manifests and every data file
  * referenced by no surviving snapshot. At 100 TB both are O(files
  * touched) metadata operations plus the rewritten bytes — exactly the
  * Iceberg/Delta maintenance contract. */
object GraftMaintenance {
  /** RESTORE — roll the table back to `toVersion` by committing a NEW
    * manifest with the target version's content (roll-forward restore:
    * history is preserved, time travel to the undone snapshots keeps
    * working, vacuum still governs retention — the Delta `RESTORE
    * TABLE` / Iceberg rollback-to-snapshot semantics). A pure metadata
    * operation: no data file is read, copied, or deleted, so restoring
    * a 100 TB table costs one manifest write. Returns the new current
    * version. */
  def rollback(warehouse: String, namespace: Seq[String], table: String,
      toVersion: Long): Long = {
    val dir = (warehouse +: namespace :+ table).mkString("/")
    val f = new Path(dir).getFileSystem(new Configuration())
    val vs = GraftRowTable.versions(dir, f)
    require(vs.contains(toVersion),
      s"table at $dir has no version $toVersion (have ${vs.mkString(",")})")
    val next = vs.max + 1
    GraftRowTable.writeManifest(dir, f, next,
      GraftRowTable.readManifest(dir, f, toVersion))
    next
  }

  /** Snapshot log (the DESCRIBE HISTORY audit surface): one row per
    * retained snapshot with its file and row counts. The loop is
    * snapshot-count-sized (driver metadata); each row count is a
    * distributed scan of that snapshot's files. */
  def history(spark: org.apache.spark.sql.SparkSession, warehouse: String,
      namespace: Seq[String], table: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = (warehouse +: namespace :+ table).mkString("/")
    val f = new Path(dir).getFileSystem(new Configuration())
    GraftRowTable.versions(dir, f).map { v =>
      val (data, dels) = GraftRowTable.splitFiles(
        GraftRowTable.readManifest(dir, f, v))
      val raw = if (data.isEmpty) 0L
        else spark.read.parquet(data.map(nm => s"$dir/$nm"): _*).count()
      // merge-on-read: subtract this snapshot's position deletes that
      // land in this snapshot's data files
      val deleted = if (dels.isEmpty || data.isEmpty) 0L
        else spark.read.parquet(dels.map(nm => s"$dir/$nm"): _*)
          .where(org.apache.spark.sql.functions.col("file")
            .isin(data: _*))
          .distinct().count()
      (v, (data.length + dels.length).toLong, raw - deleted)
    }.toDF("version", "n_files", "n_rows")
  }

  /** @return (manifests dropped, data files deleted) */
  def vacuum(warehouse: String, namespace: Seq[String], table: String,
      retainLast: Int): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the current snapshot")
    val dir = (warehouse +: namespace :+ table).mkString("/")
    val p = new Path(dir)
    val f = p.getFileSystem(new Configuration())
    val vs = GraftRowTable.versions(dir, f)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - retainLast))
    val referenced = keep.flatMap(v => GraftRowTable.readManifest(dir, f, v)).toSet
    val onDisk = f.listStatus(p).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
    val doomed = onDisk.filterNot(referenced)
    doomed.foreach(n => f.delete(new Path(dir, n), false))
    drop.foreach(v => f.delete(GraftRowTable.manifestPath(dir, v), false))
    (drop.length, doomed.length)
  }
}

class GraftRowTable(ident: String, dir: String, tableSchema: StructType,
    pinnedVersion: Option[Long] = None, mode: String = "cow")
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def name(): String =
    pinnedVersion.fold(ident)(v => s"$ident@v$v")
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = GraftRowTable.GroupCol
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "data file (rewrite group) holding the row"
    },
    new MetadataColumn {
      override def name(): String = GraftRowTable.PosCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row position within its data file"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, tableSchema, pinnedVersion, None)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty, "cannot write to a pinned VERSION AS OF")
    new GraftWriteBuilder(dir, info, None)
  }

  /** cow → group-rewrite ReplaceData; mor → position-delete WriteDelta. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty, "cannot run DML on a pinned VERSION AS OF")
    if (mode == "mor") () => new GraftDeltaOperation(dir, tableSchema, info.command())
    else () => new GraftRowLevelOperation(dir, tableSchema, info.command())
  }
}

/** One DML statement's shared state: the scan records which files it
  * actually planned (after runtime group filtering); the write's commit
  * replaces exactly those files. */
class GraftRowLevelOperation(dir: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  @volatile var readFiles: Seq[String] = Nil

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, tableSchema, None, Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(dir, info, Some(this))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftRowTable.GroupCol))
}

/** Merge-on-read DML (`SupportsDelta`): instead of rewriting groups,
  * DELETE/UPDATE/MERGE write POSITION DELETES — tiny (file, pos) parquet
  * files — plus new data files for inserted/updated rows; the commit
  * only APPENDS to the manifest. Reads apply the deletes per file. This
  * is the write-amplification/read-amplification trade against
  * copy-on-write (table property mode=mor vs cow): a 100 TB table with
  * point deletes pays KBs of delete files per statement instead of
  * rewriting GB-scale groups, and compaction (INSERT OVERWRITE
  * self-select) folds the deletes back down when read cost accumulates. */
class GraftDeltaOperation(dir: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, tableSchema, None, None)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new GraftDeltaBatchWrite(dir, info.schema(), info.queryId())
        override def description(): String = s"GraftDeltaWrite[$dir]"
      }
    }

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftRowTable.GroupCol),
    Expressions.column(GraftRowTable.PosCol))

  override def requiredMetadataAttributes(): Array[NamedReference] = Array(
    Expressions.column(GraftRowTable.GroupCol),
    Expressions.column(GraftRowTable.PosCol))
}

/** Delta commit: stage new data + delete files, then append them all to
  * the next manifest — no existing file is removed or rewritten. */
class GraftDeltaBatchWrite(dir: String, writeSchema: StructType,
    queryId: String) extends DeltaBatchWrite {

  private val stagingName = s".staging-w-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    GraftDeltaWriterFactory(dir, stagingName, writeSchema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(dir).getFileSystem(new Configuration())
    val staging = new Path(dir, stagingName)
    val staged = messages.flatMap { case GraftDeltaCommitMsg(d, del) =>
      d.toSeq ++ del.toSeq }
    val cur = GraftRowTable.currentVersion(dir, f)
    val curFiles = GraftRowTable.readManifest(dir, f, cur)
    staged.foreach(n => f.rename(new Path(staging, n), new Path(dir, n)))
    GraftRowTable.writeManifest(dir, f, cur + 1, curFiles ++ staged)
    if (f.exists(staging)) f.delete(staging, true): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(dir).getFileSystem(new Configuration())
    val staging = new Path(dir, stagingName)
    if (f.exists(staging)) f.delete(staging, true): Unit
  }
}

case class GraftDeltaCommitMsg(dataFile: Option[String],
    deleteFile: Option[String]) extends WriterCommitMessage

case class GraftDeltaWriterFactory(dir: String, stagingName: String,
    schemaJson: String) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(dir, stagingName,
      DataType.fromJson(schemaJson).asInstanceOf[StructType], partitionId, taskId)
}

/** Per-task delta writer: inserts go to a lazily-opened data file via
  * [[GraftDataWriter]]; deletes (and the delete half of updates) buffer
  * (file, pos) pairs and land as one position-delete parquet file. The
  * row-id columns arrive as (`__group`, `__pos`) per [[GraftDeltaOperation.rowId]]. */
class GraftDeltaWriter(dir: String, stagingName: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DeltaWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroup
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.hadoop.util.HadoopOutputFile
  import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

  private val inserts =
    new GraftDataWriter(dir, stagingName, schema, partitionId, taskId)
  private val deletes = scala.collection.mutable.ArrayBuffer[(String, Long)]()
  private val deleteFileName =
    f"${GraftRowTable.DeletePrefix}$partitionId%05d-$taskId.parquet"

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    deletes += ((id.getUTF8String(0).toString, id.getLong(1)))

  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def insert(row: InternalRow): Unit = inserts.write(row)

  override def commit(): WriterCommitMessage = {
    val dataMsg = inserts.commit().asInstanceOf[GraftCommitMsg]
    val delFile = if (deletes.isEmpty) None else {
      val mt = Types.buildMessage()
        .addField(Types.required(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named("file"))
        .addField(Types.required(PrimitiveTypeName.INT64).named("pos"))
        .named("graft_delete")
      val path = new Path(new Path(dir, stagingName), deleteFileName)
      val w = ExampleParquetWriter
        .builder(HadoopOutputFile.fromPath(path, new Configuration()))
        .withType(mt).build()
      try deletes.foreach { case (file, pos) =>
        val g = new SimpleGroup(mt)
        g.add("file", file)
        g.add("pos", pos)
        w.write(g)
      } finally w.close()
      Some(deleteFileName)
    }
    GraftDeltaCommitMsg(dataMsg.file, delFile)
  }

  override def abort(): Unit = inserts.abort()

  override def close(): Unit = inserts.close()
}

class GraftScanBuilder(dir: String, tableSchema: StructType,
    pinnedVersion: Option[Long], op: Option[GraftRowLevelOperation])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  // may include the __group metadata column when the query asks for it
  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val f = new Path(dir).getFileSystem(new Configuration())
    val v = pinnedVersion.getOrElse(GraftRowTable.currentVersion(dir, f))
    new GraftScan(dir, GraftRowTable.readManifest(dir, f, v), tableSchema,
      required, op)
  }
}

class GraftScan(dir: String, allFiles: Seq[String], tableSchema: StructType,
    required: StructType, op: Option[GraftRowLevelOperation])
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRowScan[$dir, files=${allFiles.size}]"

  /** Runtime GROUP filtering: Spark's row-level planning runs a subquery
    * for the distinct `__group` values of rows matching the DML
    * condition and hands them here — files without matches are never
    * read, so copy-on-write touches O(matching files). Unparseable
    * predicates keep all files (semantically safe). */
  private var retained: Option[Set[String]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftRowTable.GroupCol))

  override def filter(predicates: Array[V2Predicate]): Unit =
    predicates.foreach { p =>
      groupValues(p).foreach { vs =>
        retained = Some(retained.fold(vs)(_ intersect vs))
      }
    }

  private def groupValues(p: V2Predicate): Option[Set[String]] = {
    def isGroupCol(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case nr: NamedReference =>
          nr.fieldNames.sameElements(Array(GraftRowTable.GroupCol))
        case _ => false
      }
    def litStr(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value != null => Some(l.value.toString)
      case _ => None
    }
    val ch = p.children()
    p.name() match {
      case "IN" if ch.nonEmpty && isGroupCol(ch.head) =>
        val lits = ch.tail.flatMap(litStr)
        if (lits.length == ch.length - 1) Some(lits.toSet) else None
      case "=" if ch.length == 2 && isGroupCol(ch.head) =>
        litStr(ch(1)).map(Set(_))
      case _ => None
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (data, deletes) = GraftRowTable.splitFiles(allFiles)
    val files = data.filter(f => retained.forall(_.contains(f)))
    op.foreach(_.readFiles = files)
    files.map(f => GraftFilePartition(dir, f, deletes, tableSchema.json,
      required.json): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory
}

case class GraftFilePartition(dir: String, file: String,
    deleteFiles: Seq[String], tableSchemaJson: String,
    requiredJson: String) extends InputPartition

class GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    new GraftFileReader(p)
  }
}

/** Reads one parquet group file into InternalRows (example Group API —
  * the file was written by [[GraftDataWriter]] with the table schema),
  * applying the snapshot's position deletes for this file (merge-on-read)
  * and exposing the `__group`/`__pos` metadata columns. The delete set is
  * positions-only and loaded once per task; compaction folds delete
  * files back into plain data files. */
class GraftFileReader(p: GraftFilePartition) extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group

  private val required = DataType.fromJson(p.requiredJson).asInstanceOf[StructType]
  private val conf = new Configuration()

  private val deletedPos: java.util.HashSet[Long] = {
    val s = new java.util.HashSet[Long]()
    p.deleteFiles.foreach { df =>
      val r = ParquetReader.builder(new GroupReadSupport(),
        new Path(p.dir, df)).withConf(conf).build()
      try {
        var g = r.read()
        while (g != null) {
          val gt = g.getType
          if (g.getString(gt.getFieldIndex("file"), 0) == p.file)
            s.add(g.getLong(gt.getFieldIndex("pos"), 0)): Unit
          g = r.read()
        }
      } finally r.close()
    }
    s
  }

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(),
        new Path(p.dir, p.file))
      .withConf(conf).build()
  private var current: Group = _
  private var pos: Long = -1L

  override def next(): Boolean = {
    current = reader.read()
    pos += 1
    while (current != null && deletedPos.contains(pos)) {
      current = reader.read()
      pos += 1
    }
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val gt = g.getType
    val vals = required.fields.map { fl =>
      if (fl.name == GraftRowTable.GroupCol) UTF8String.fromString(p.file)
      else if (fl.name == GraftRowTable.PosCol) pos
      else {
        val idx = gt.getFieldIndex(fl.name)
        if (g.getFieldRepetitionCount(idx) == 0) null
        else fl.dataType match {
          case BooleanType => g.getBoolean(idx, 0)
          case IntegerType | DateType => g.getInteger(idx, 0)
          case LongType => g.getLong(idx, 0)
          case DoubleType => g.getDouble(idx, 0)
          case StringType => UTF8String.fromString(g.getString(idx, 0))
          case other => throw new UnsupportedOperationException(other.toString)
        }
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = reader.close()
}

class GraftWriteBuilder(dir: String, info: LogicalWriteInfo,
    op: Option[GraftRowLevelOperation])
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftBatchWrite(dir, info.schema(), info.queryId(), doTruncate, op)
    override def description(): String = s"GraftRowWrite[$dir]"
  }
}

case class GraftCommitMsg(file: Option[String]) extends WriterCommitMessage

/** Copy-on-write SNAPSHOT commit: writers land whole files in a hidden
  * staging dir; commit (driver-side) renames them in and publishes a new
  * manifest whose file list drops the replaced groups — the files the
  * row-level scan read, or everything for truncate. Replaced data files
  * are NOT deleted: prior snapshots keep referencing them (time travel
  * via VERSION AS OF) until [[GraftMaintenance.vacuum]] reclaims.
  * Readers only ever see committed manifests; a crash before the
  * manifest rename leaves a staging dir and orphan files the next
  * vacuum sweeps. */
class GraftBatchWrite(dir: String, writeSchema: StructType, queryId: String,
    truncate: Boolean, op: Option[GraftRowLevelOperation]) extends BatchWrite {

  private val stagingName = s".staging-w-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(dir, stagingName, writeSchema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(dir).getFileSystem(new Configuration())
    val staging = new Path(dir, stagingName)
    val staged = messages.collect { case GraftCommitMsg(Some(name)) => name }
    val cur = GraftRowTable.currentVersion(dir, f)
    val curFiles = GraftRowTable.readManifest(dir, f, cur)
    val doomed: Set[String] =
      if (truncate) curFiles.toSet
      else op.map(_.readFiles.toSet).getOrElse(Set.empty)
    staged.foreach(n => f.rename(new Path(staging, n), new Path(dir, n)))
    GraftRowTable.writeManifest(dir, f, cur + 1,
      curFiles.filterNot(doomed) ++ staged)
    if (f.exists(staging)) f.delete(staging, true): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(dir).getFileSystem(new Configuration())
    val staging = new Path(dir, stagingName)
    if (f.exists(staging)) f.delete(staging, true): Unit
  }
}

case class GraftWriterFactory(dir: String, stagingName: String,
    schemaJson: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(dir, stagingName,
      DataType.fromJson(schemaJson).asInstanceOf[StructType], partitionId, taskId)
}

/** Writes one parquet file per non-empty task (lazily opened, so empty
  * tasks stage nothing). Metadata columns in the incoming schema (e.g.
  * `__group` on carryover rows) are dropped — they describe the OLD
  * file, not the new one. */
class GraftDataWriter(dir: String, stagingName: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroup
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.hadoop.util.HadoopOutputFile
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

  private val dataFields = schema.fields.zipWithIndex
    .filter { case (fl, _) =>
      fl.name != GraftRowTable.GroupCol && fl.name != GraftRowTable.PosCol }
  private val fileName = f"part-$partitionId%05d-$taskId.parquet"

  private lazy val messageType: MessageType = {
    val b = Types.buildMessage()
    dataFields.foreach { case (fl, _) =>
      val t = fl.dataType match {
        case BooleanType =>
          Types.optional(PrimitiveTypeName.BOOLEAN).named(fl.name)
        case IntegerType =>
          Types.optional(PrimitiveTypeName.INT32).named(fl.name)
        case DateType =>
          Types.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.dateType()).named(fl.name)
        case LongType =>
          Types.optional(PrimitiveTypeName.INT64).named(fl.name)
        case DoubleType =>
          Types.optional(PrimitiveTypeName.DOUBLE).named(fl.name)
        case StringType =>
          Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(fl.name)
        case other => throw new UnsupportedOperationException(other.toString)
      }
      b.addField(t)
    }
    b.named("graft_row")
  }

  private var writer: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      val path = new Path(new Path(dir, stagingName), fileName)
      writer = ExampleParquetWriter
        .builder(HadoopOutputFile.fromPath(path, new Configuration()))
        .withType(messageType).build()
    }
    val g = new SimpleGroup(messageType)
    dataFields.foreach { case (fl, i) =>
      if (!row.isNullAt(i)) fl.dataType match {
        case BooleanType => g.add(fl.name, row.getBoolean(i))
        case IntegerType | DateType => g.add(fl.name, row.getInt(i))
        case LongType => g.add(fl.name, row.getLong(i))
        case DoubleType => g.add(fl.name, row.getDouble(i))
        case StringType => g.add(fl.name, row.getUTF8String(i).toString)
        case other => throw new UnsupportedOperationException(other.toString)
      }
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftCommitMsg(if (writer != null) Some(fileName) else None)
  }

  override def abort(): Unit = close()

  override def close(): Unit = if (writer != null) writer.close()
}
