package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S2: range discovery with and without overrides") {
    val ev = Tables(spark, sfDir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
    val (lo, hi) = Sources.discoverRange(ev, "day")
    assert(lo.startsWith("2024-01") && hi >= lo)
    val (lo2, hi2) = Sources.discoverRange(ev, "day",
      fromOverride = Some("2024-01-05"), toOverride = Some("2024-01-07"))
    assert((lo2, hi2) == ("2024-01-05", "2024-01-07"))
    intercept[IllegalArgumentException] {
      Sources.discoverRange(ev, "day",
        fromOverride = Some("2024-02-01"), toOverride = Some("2024-01-01"))
    }
  }

  test("S3: dayWindows is inclusive and metadata-sized") {
    val days = Sources.dayWindows(spark, "2024-01-01", "2024-01-05")
      .as[String].collect()
    assert(days.toSeq == Seq("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-04", "2024-01-05"))
  }

  test("S3+D3: incremental ingest fetches only pending days") {
    val ev = Tables(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    var fetched = List.empty[String]
    def fetchDay(day: String) = {
      fetched ::= day
      ev.filter(col("day") === day)
    }
    val processed = Seq("2024-01-01", "2024-01-02").toDF("day")
    val out = Sources.incrementalIngest(spark, "2024-01-01", "2024-01-04",
      processed, fetchDay)
    assert(fetched.sorted == List("2024-01-03", "2024-01-04"))
    val expected = ev.filter(col("day").isin("2024-01-03", "2024-01-04")).count()
    assert(out.count() == expected)
  }

  test("S7: JDBC import via embedded Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE vehicles (time VARCHAR(10), value INT)")
    st.execute("INSERT INTO vehicles VALUES ('2024M10', 345001), ('2024M11', 345678)")
    st.close(); conn.close()
    val df = Sources.jdbcTable(spark, url, "vehicles")
    val got = df.orderBy("time").as[(String, Int)].collect()
    assert(got.toSeq == Seq(("2024M10", 345001), ("2024M11", 345678)))
  }
}
