package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The state data source read path (`spark.read.format("statestore")`):
  * streaming state is not write-only — dedup keys and aggregation
  * values decode back out of a checkpoint for audits and
  * right-to-be-forgotten verification. */
class StateStoreProbeSpec extends SparkSpec {
  import spark.implicits._

  test("dedup checkpoint state decodes to exactly the distinct key set") {
    val src = Files.createTempDirectory("ssp-src").toString
    val ck = Files.createTempDirectory("ssp-ck").toString
    Seq((1L, "a"), (2L, "b"), (1L, "a"), (3L, "c")).toDF("user_id", "event_type")
      .write.mode("append").parquet(src)
    val q = spark.readStream.schema("user_id LONG, event_type STRING")
      .parquet(src)
      .dropDuplicates("user_id", "event_type")
      .writeStream.format("memory").queryName("ssp1").outputMode("append")
      .option("checkpointLocation", ck).start()
    q.processAllAvailable(); q.stop()
    val keys = spark.read.format("statestore").load(ck)
      .select(col("key.user_id"), col("key.event_type"))
      .as[(Long, String)].collect().toSet
    assert(keys == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("aggregation checkpoint state decodes keys AND running values") {
    val src = Files.createTempDirectory("ssp2-src").toString
    val ck = Files.createTempDirectory("ssp2-ck").toString
    Seq((1L, 10L), (2L, 5L), (1L, 7L)).toDF("user_id", "v")
      .write.mode("append").parquet(src)
    val out = Files.createTempDirectory("ssp2-out").toString
    def run(): Unit = {
      // memory sinks refuse checkpoint recovery; foreachBatch supports it
      val q = spark.readStream.schema("user_id LONG, v LONG")
        .parquet(src)
        .groupBy("user_id").count()
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ck).start()
      q.processAllAvailable(); q.stop()
    }
    run()
    // a second batch updates the state in place; the reader must see the
    // latest committed version
    Seq((2L, 1L)).toDF("user_id", "v").write.mode("append").parquet(src)
    run()
    val state = spark.read.format("statestore").load(ck)
      .select(col("key.user_id"), col("value.count"))
      .as[(Long, Long)].collect().toMap
    assert(state == Map(1L -> 2L, 2L -> 2L))
  }
}
