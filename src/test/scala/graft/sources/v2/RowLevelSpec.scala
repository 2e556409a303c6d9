package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQL DML (MERGE INTO / UPDATE / DELETE FROM) against the
  * group-based copy-on-write catalog (graft.sources.v2.rowlevel). */
class RowLevelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.rlt",
      classOf[graft.sources.v2.rowlevel.GraftRowCatalog].getName)
    spark.conf.set("spark.sql.catalog.rlt.warehouse", dir)
    dir
  }

  /** Current-snapshot data files with on-disk mtimes. */
  private def dataFiles(table: String): Map[String, Long] = {
    val dir = s"$wh/db/$table"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    import graft.sources.v2.rowlevel.GraftRowTable
    val cur = GraftRowTable.currentVersion(dir, fs)
    GraftRowTable.readManifest(dir, fs, cur)
      .map(n => n -> new java.io.File(s"$dir/$n").lastModified()).toMap
  }

  private def onDisk(table: String): Set[String] =
    new java.io.File(s"$wh/db/$table").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet

  private def freshTable(name: String): Unit = {
    wh: Unit
    spark.sql(s"DROP TABLE IF EXISTS rlt.db.$name")
    spark.sql(s"CREATE TABLE rlt.db.$name (k BIGINT, v DOUBLE, tag STRING)")
    // two separate inserts → two separate files (groups)
    spark.sql(s"INSERT INTO rlt.db.$name " +
      "SELECT /*+ COALESCE(1) */ id AS k, CAST(id AS DOUBLE) / 2 AS v, " +
      "'low' AS tag FROM range(0, 10)")
    spark.sql(s"INSERT INTO rlt.db.$name " +
      "SELECT /*+ COALESCE(1) */ id AS k, CAST(id AS DOUBLE) / 2 AS v, " +
      "'high' AS tag FROM range(100, 110)")
  }

  test("create + insert + read back") {
    freshTable("t0")
    val rows = spark.table("rlt.db.t0").as[(Long, Double, String)]
      .collect().sortBy(_._1)
    assert(rows.length == 20)
    assert(rows.head == ((0L, 0.0, "low")) && rows.last == ((109L, 54.5, "high")))
    assert(dataFiles("t0").size == 2, "two inserts → two groups")
  }

  test("DELETE FROM rewrites only groups holding matches") {
    freshTable("t1")
    val before = dataFiles("t1")
    val lowFile = spark.table("rlt.db.t1")
      .select(col("__group")).where(col("k") < 50).distinct()
      .as[String].collect()
    assert(lowFile.length == 1, "low rows live in exactly one group")
    spark.sql("DELETE FROM rlt.db.t1 WHERE k >= 100 AND k % 2 = 0")
    val after = dataFiles("t1")
    // the low file is untouched byte-for-byte; the high file was replaced
    assert(after.contains(lowFile.head) &&
      after(lowFile.head) == before(lowFile.head),
      "group without matches was rewritten")
    val highFile = (before.keySet - lowFile.head).head
    assert(!after.contains(highFile), "group with matches must be replaced")
    // copy-on-write keeps the replaced file ON DISK for old snapshots
    assert(onDisk("t1").contains(highFile), "old snapshot's file vacuumed early")
    val ks = spark.table("rlt.db.t1").select("k").as[Long].collect().sorted
    assert(ks.toSeq == (0L until 10L) ++ Seq(101L, 103L, 105L, 107L, 109L))
  }

  test("VERSION AS OF reads pre-DML snapshots") {
    freshTable("t6")
    spark.sql("DELETE FROM rlt.db.t6 WHERE k >= 100")
    assert(spark.table("rlt.db.t6").count() == 10)
    // v0 empty, v1 first insert, v2 both inserts, v3 post-delete
    assert(spark.sql("SELECT * FROM rlt.db.t6 VERSION AS OF 2").count() == 20)
    assert(spark.sql("SELECT * FROM rlt.db.t6 VERSION AS OF 1").count() == 10)
    assert(spark.sql("SELECT * FROM rlt.db.t6 VERSION AS OF 0").count() == 0)
    val deleted = spark.sql(
      "SELECT k FROM rlt.db.t6 VERSION AS OF 2 EXCEPT SELECT k FROM rlt.db.t6")
      .as[Long].collect().sorted
    assert(deleted.toSeq == (100L until 110L))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM rlt.db.t6 VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("no version"), e.getMessage)
  }

  test("vacuum drops old snapshots and reclaims unreferenced files") {
    import graft.sources.v2.rowlevel.{GraftMaintenance, GraftRowTable}
    freshTable("t7")
    spark.sql("DELETE FROM rlt.db.t7 WHERE k >= 100") // v3 replaces high file
    val kept = dataFiles("t7").keySet
    val allOnDisk = onDisk("t7")
    assert(allOnDisk.size > kept.size, "replaced file should still be on disk")
    val (manifestsDropped, filesDeleted) =
      GraftMaintenance.vacuum(wh, Seq("db"), "t7", retainLast = 1)
    assert(manifestsDropped == 3 && filesDeleted == (allOnDisk -- kept).size)
    assert(onDisk("t7") == kept, "only current-snapshot files survive vacuum")
    // current read unaffected; time travel to vacuumed versions now fails
    assert(spark.table("rlt.db.t7").count() == 10)
    val dir = s"$wh/db/t7"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(GraftRowTable.versions(dir, fs) == Seq(3L))
  }

  test("compaction is INSERT OVERWRITE self-select: fewer files, same rows") {
    freshTable("t8")
    assert(dataFiles("t8").size == 2)
    val before = spark.table("rlt.db.t8").as[(Long, Double, String)]
      .collect().toSet
    spark.sql("INSERT OVERWRITE rlt.db.t8 " +
      "SELECT /*+ COALESCE(1) */ * FROM rlt.db.t8")
    assert(dataFiles("t8").size == 1, "compacted snapshot should be one file")
    val after = spark.table("rlt.db.t8").as[(Long, Double, String)]
      .collect().toSet
    assert(after == before, "compaction must not change table contents")
  }

  test("DELETE matching nothing leaves every file untouched") {
    freshTable("t2")
    val before = dataFiles("t2")
    spark.sql("DELETE FROM rlt.db.t2 WHERE k = 999999")
    assert(dataFiles("t2") == before)
    assert(spark.table("rlt.db.t2").count() == 20)
  }

  test("UPDATE rewrites matched groups, preserves other columns") {
    freshTable("t3")
    val before = dataFiles("t3")
    spark.sql("UPDATE rlt.db.t3 SET v = v * 10 WHERE k = 105")
    val after = dataFiles("t3")
    val untouched = before.filter { case (n, m) => after.get(n).contains(m) }
    assert(untouched.size == 1, "exactly the low group survives untouched")
    val r = spark.table("rlt.db.t3").where(col("k") === 105)
      .as[(Long, Double, String)].collect().head
    assert(r == ((105L, 525.0, "high")))
    assert(spark.table("rlt.db.t3").count() == 20)
  }

  test("MERGE INTO: update matched, insert new, delete not-matched-by-source") {
    freshTable("t4")
    Seq((5L, 99.0, "patched"), (200L, 1.0, "new"))
      .toDF("k", "v", "tag").createOrReplaceTempView("src4")
    spark.sql("""
      MERGE INTO rlt.db.t4 t USING src4 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, s.tag)
      WHEN NOT MATCHED BY SOURCE AND t.k >= 108 THEN DELETE""")
    val m = spark.table("rlt.db.t4").as[(Long, Double, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(5L) == ((99.0, "patched")))
    assert(m(200L) == ((1.0, "new")))
    assert(!m.contains(108L) && !m.contains(109L))
    assert(m(100L) == ((50.0, "high")))
    assert(m.size == 19)
  }

  test("INSERT OVERWRITE truncates and replaces") {
    freshTable("t5")
    spark.sql("INSERT OVERWRITE rlt.db.t5 " +
      "SELECT id AS k, 1.0 AS v, 'ow' AS tag FROM range(0, 3)")
    val rows = spark.table("rlt.db.t5").as[(Long, Double, String)].collect()
    assert(rows.length == 3 && rows.forall(_._3 == "ow"))
  }

  private def freshMorTable(name: String): Unit = {
    wh: Unit
    spark.sql(s"DROP TABLE IF EXISTS rlt.db.$name")
    spark.sql(s"CREATE TABLE rlt.db.$name (k BIGINT, v DOUBLE, tag STRING) " +
      "TBLPROPERTIES ('mode'='mor')")
    spark.sql(s"INSERT INTO rlt.db.$name " +
      "SELECT /*+ COALESCE(1) */ id AS k, CAST(id AS DOUBLE) / 2 AS v, " +
      "'low' AS tag FROM range(0, 10)")
    spark.sql(s"INSERT INTO rlt.db.$name " +
      "SELECT /*+ COALESCE(1) */ id AS k, CAST(id AS DOUBLE) / 2 AS v, " +
      "'high' AS tag FROM range(100, 110)")
  }

  test("merge-on-read DELETE: no data file rewritten, position deletes land") {
    freshMorTable("m1")
    val before = dataFiles("m1")
    spark.sql("DELETE FROM rlt.db.m1 WHERE k >= 100 AND k % 2 = 0")
    val after = dataFiles("m1")
    // every pre-existing data file survives BYTE-IDENTICAL in the new
    // snapshot — that is the merge-on-read contract
    assert(before.forall { case (n, m) => after.get(n).contains(m) },
      s"a data file was rewritten: before=$before after=$after")
    val delFiles = after.keySet.filter(_.startsWith("delete-"))
    assert(delFiles.nonEmpty, "expected a position-delete file")
    val ks = spark.table("rlt.db.m1").select("k").as[Long].collect().sorted
    assert(ks.toSeq == (0L until 10L) ++ Seq(101L, 103L, 105L, 107L, 109L))
  }

  test("merge-on-read UPDATE: delete + reinsert, old files untouched") {
    freshMorTable("m2")
    val before = dataFiles("m2")
    spark.sql("UPDATE rlt.db.m2 SET v = v * 10 WHERE k = 105")
    val after = dataFiles("m2")
    assert(before.forall { case (n, m) => after.get(n).contains(m) })
    val r = spark.table("rlt.db.m2").where(col("k") === 105)
      .as[(Long, Double, String)].collect()
    assert(r.toSeq == Seq((105L, 525.0, "high")))
    assert(spark.table("rlt.db.m2").count() == 20)
  }

  test("merge-on-read MERGE + time travel + compaction folds deletes") {
    freshMorTable("m3")
    Seq((5L, 99.0, "patched"), (200L, 1.0, "new"))
      .toDF("k", "v", "tag").createOrReplaceTempView("srcm3")
    spark.sql("""
      MERGE INTO rlt.db.m3 t USING srcm3 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, s.tag)
      WHEN NOT MATCHED BY SOURCE AND t.k >= 108 THEN DELETE""")
    val m = spark.table("rlt.db.m3").as[(Long, Double, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(5L) == ((99.0, "patched")) && m(200L) == ((1.0, "new")))
    assert(!m.contains(108L) && !m.contains(109L) && m.size == 19)
    // pre-MERGE snapshot still reads clean
    assert(spark.sql("SELECT * FROM rlt.db.m3 VERSION AS OF 2").count() == 20)
    // compaction folds position deletes back into plain data files
    spark.sql("INSERT OVERWRITE rlt.db.m3 " +
      "SELECT /*+ COALESCE(1) */ * FROM rlt.db.m3")
    val files = dataFiles("m3").keySet
    assert(files.size == 1 && !files.exists(_.startsWith("delete-")))
    assert(spark.table("rlt.db.m3").as[(Long, Double, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap == m)
  }

  test("rollback restores the target snapshot as a NEW version, history intact") {
    freshTable("rb")                                       // v1, v2
    spark.sql("DELETE FROM rlt.db.rb WHERE tag = 'high'")  // v3
    import graft.sources.v2.rowlevel.{GraftMaintenance, GraftRowTable}
    val files3 = dataFiles("rb").keySet
    val newV = GraftMaintenance.rollback(wh, Seq("db"), "rb", toVersion = 2)
    assert(newV == 4)
    // restored content == v2 content; the deleted state is still
    // time-travelable; no data file was touched by the restore.
    assert(spark.table("rlt.db.rb").count() == 20)
    assert(spark.sql("SELECT * FROM rlt.db.rb VERSION AS OF 3").count() == 10)
    assert(dataFiles("rb").keySet !=  files3)
    val fs = new org.apache.hadoop.fs.Path(s"$wh/db/rb")
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(GraftRowTable.versions(s"$wh/db/rb", fs).toList ==
      List(0L, 1L, 2L, 3L, 4L))
  }

  test("concurrent commit to the same version is rejected, not clobbered") {
    freshTable("cc")
    import graft.sources.v2.rowlevel.GraftRowTable
    val dir = s"$wh/db/cc"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val cur = GraftRowTable.currentVersion(dir, fs)
    val lines = GraftRowTable.readManifest(dir, fs, cur)
    GraftRowTable.writeManifest(dir, fs, cur + 1, lines)   // writer A wins
    val e = intercept[IllegalStateException] {
      GraftRowTable.writeManifest(dir, fs, cur + 1, Seq()) // writer B loses
    }
    assert(e.getMessage.contains("concurrent commit"))
    // A's manifest survived untouched.
    assert(GraftRowTable.readManifest(dir, fs, cur + 1) == lines.sorted)
  }

  test("unsupported column types are rejected at CREATE") {
    wh: Unit
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE rlt.db.bad (k BIGINT, x DECIMAL(10,2))")
    }
    assert(e.getMessage.contains("not supported"), e.getMessage)
  }
}
