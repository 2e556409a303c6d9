package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (total + per-query seconds) for the driver.
  *
  * Robustness (round-4 lesson: single-shot timings under machine load
  * produced false 6x regressions): each query is timed
  * SPARK_GRAFT_BENCH_REPS times (default 3) and the reported number is
  * the MEDIAN; the complete per-rep sample set is persisted as a JSON
  * artifact (SPARK_GRAFT_BENCH_OUT, default BENCH_FULL.json in the cwd)
  * so per-query data survives even when the driver truncates the stdout
  * tail. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    // Optional regex over query names (local iteration only — the driver
    // never sets it, so driver benches always cover the full surface).
    val nameFilter: String => Boolean =
      sys.env.get("SPARK_GRAFT_BENCH_FILTER") match {
        case Some(pat) => val r = pat.r; n => r.findFirstIn(n).isDefined
        case None      => _ => true
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest SF: pays JIT/codegen/parquet-reader
    // startup once so the timed numbers below reflect steady-state
    // per-query cost rather than whichever query happens to run first.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.filter(kv => nameFilter(kv._1)).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    val samples: Seq[(String, Seq[Double], Boolean)] =
      SparkEntry.queries.filter(kv => nameFilter(kv._1))
        .toSeq.sortBy(_._1).map { case (name, fn) =>
        var failed = false
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          // A throwing query must not hide as a suspiciously fast number:
          // surface the name + error on stderr (stdout stays one JSON line)
          // AND mark it in the JSON so downstream comparisons cannot read
          // the near-instant elapsed time as a measurement.
          try { fn(spark, sfDir).count() } catch { case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }
        (name, times, failed)
      }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val medians = samples.map { case (n, ts, failed) =>
      (n, median(ts), failed)
    }
    val qs = medians.map { case (k, v, failed) =>
      "\"" + k + "\":" + (if (failed) "null" else v.toString)
    }.mkString("{", ",", "}")
    val total = medians.collect { case (_, v, false) => v }.sum
    val nFailed = medians.count(_._3)
    // Full artifact: every rep, so regressions vs noise are
    // distinguishable after the fact without a re-run.
    val full = samples.map { case (n, ts, failed) =>
      "\"" + n + "\":{\"times\":" + ts.mkString("[", ",", "]") +
        ",\"median\":" + median(ts) + ",\"failed\":" + failed + "}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(outPath),
      s"""{"sf":"$sfDir","reps":$reps,"total_median":$total,"failed":$nFailed,"queries":$full}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFailed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
