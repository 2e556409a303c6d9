package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (total + per-query seconds) for the driver.
  *
  * Robustness, part 1 (round-4 lesson: single-shot timings under machine
  * load produced false 6x regressions): each query is timed
  * SPARK_GRAFT_BENCH_REPS times (default 3) and the reported number is
  * the MEDIAN; the complete per-rep sample set is persisted as a JSON
  * artifact (SPARK_GRAFT_BENCH_OUT, default BENCH_FULL.json in the cwd)
  * so per-query data survives even when the driver truncates the stdout
  * tail.
  *
  * Robustness, part 2 (round-9 lesson: a loaded host blew the driver's
  * wall budget and the whole artifact was lost at SIGTERM — rc=124,
  * `parsed: null`): the run must DEGRADE, never VANISH.
  *  - The full artifact is rewritten (atomic tmp+move) after EVERY
  *    query, so a kill at any point leaves the measurements taken so far
  *    on disk.
  *  - A JVM shutdown hook emits the one-line stdout JSON from whatever
  *    completed (flagged `"total_partial":true`), so the driver parses a
  *    partial result instead of nothing.
  *  - A per-query wall budget (SPARK_GRAFT_BENCH_BUDGET seconds, default
  *    10) degrades reps to 1 when the first rep already exceeds it: on a
  *    loaded host the suite sheds up to 2/3 of its wall time instead of
  *    tripling down on the slowest queries.
  *  - `total_partial` is also set whenever any query failed, so a
  *    failure-induced drop in the total can never be read as a speedup
  *    by cross-round tooling. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "10").toDouble
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

    val names = SparkEntry.queries.keys.filter(nameFilter).toSeq.sorted
    val expected = names.size
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // (name, per-rep times, failed) in completion order; all access under
    // `lock` because the shutdown hook reads it from another thread.
    val results = scala.collection.mutable.LinkedHashMap[String, (Seq[Double], Boolean)]()
    val lock = new Object
    @volatile var emitted = false

    def snapshot(): Seq[(String, Seq[Double], Boolean)] = lock.synchronized {
      results.toSeq.map { case (n, (ts, f)) => (n, ts, f) }
    }
    // Whole body under `lock`: the shutdown hook may flush concurrently
    // with the main loop, and two writers on one tmp path would corrupt
    // it (monitors are reentrant, so the inner snapshot() is fine).
    def flushArtifact(): Unit = lock.synchronized {
      val snap = snapshot()
      val total = snap.collect { case (_, ts, false) => median(ts) }.sum
      val nFailed = snap.count(_._3)
      val full = snap.map { case (n, ts, failed) =>
        "\"" + n + "\":{\"times\":" + ts.mkString("[", ",", "]") +
          ",\"median\":" + median(ts) + ",\"failed\":" + failed + "}"
      }.mkString("{", ",", "}")
      val partial = nFailed > 0 || snap.size < expected
      val json =
        s"""{"sf":"$sfDir","reps":$reps,"total_median":$total,"failed":$nFailed,""" +
          s""""completed":${snap.size},"expected":$expected,"total_partial":$partial,""" +
          s""""queries":$full}"""
      // Atomic replace: a kill mid-write can never corrupt the artifact.
      val tmp = Paths.get(outPath + ".tmp")
      Files.writeString(tmp, json)
      Files.move(tmp, Paths.get(outPath),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    def stdoutLine(): String = {
      val snap = snapshot()
      val qs = snap.map { case (k, ts, failed) =>
        "\"" + k + "\":" + (if (failed) "null" else median(ts).toString)
      }.mkString("{", ",", "}")
      val total = snap.collect { case (_, ts, false) => median(ts) }.sum
      val nFailed = snap.count(_._3)
      val partial = nFailed > 0 || snap.size < expected
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFailed,""" +
        s""""completed":${snap.size},"expected":$expected,"total_partial":$partial,""" +
        s""""queries":$qs,"sf":"$sfDir"}"""
    }

    // The streaming queries land results in `memory`-sink temp views
    // (fresh UUID name per execution) that otherwise stay registered —
    // and their rows PINNED on the driver heap, unmanaged by the block
    // manager — for the session lifetime. Over warmup + 442×reps that
    // is hundreds of result tables of dead weight, measured as 2-3x
    // inflation on late-suite queries vs the same query solo. Drop them
    // once their consumer (count / parquet write) has run.
    def dropMemSinkViews(): Unit =
      try spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && t.name.contains("_mem_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      catch { case _: Throwable => () }

    // SIGTERM/budget-expiry path: persist + emit whatever completed.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!emitted) {
        try { flushArtifact() } catch { case _: Throwable => () }
        try { println(stdoutLine()); System.out.flush() } catch { case _: Throwable => () }
      }
    }))

    // Untimed warmup at the smallest SF: pays JIT/codegen/parquet-reader
    // startup once so the timed numbers below reflect steady-state
    // per-query cost rather than whichever query happens to run first.
    // Capped: on a loaded host an unbounded warmup could eat the whole
    // driver budget before a single timed measurement lands. Past the
    // cap the remaining queries go unwarmed — their first timed rep
    // doubles as warmup, and on a host that slow the per-query budget
    // degrades them to one rep anyway.
    val warmupBudgetSec =
      sys.env.getOrElse("SPARK_GRAFT_WARMUP_BUDGET", "900").toDouble
    val warmDir = "/root/testdata/sf0.001"
    val warmT0 = System.nanoTime()
    names.foreach { n =>
      if ((System.nanoTime() - warmT0) / 1e9 < warmupBudgetSec) {
        try SparkEntry.queries(n)(spark, warmDir).count()
        catch { case _: Throwable => () }
        dropMemSinkViews()
      }
    }

    // Rescue pool for over-budget first reps: ONE transient host spike
    // on a single-rep (budget-degraded) query otherwise becomes that
    // query's official number (a matched idle pair this round showed
    // q393 5.3 s vs 17.3 s across runs for exactly this reason). A slow
    // first rep earns one retry — report the MIN of the two — but only
    // while a global pool lasts, so a genuinely loaded host (every
    // query over budget, the round-9 SIGTERM scenario) spends the pool
    // once and then keeps the one-sample shedding behaviour.
    var rescuePoolSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RESCUE", "60").toDouble

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var failed = false
      def rep(): Double = {
        val t0 = System.nanoTime()
        // A throwing query must not hide as a suspiciously fast number:
        // surface the name + error on stderr (stdout stays one JSON line)
        // AND mark it in the JSON so downstream comparisons cannot read
        // the near-instant elapsed time as a measurement.
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        dropMemSinkViews() // outside the timed span: harness hygiene
        dt
      }
      val t1 = rep()
      // Over-budget first rep → a loaded host (or a genuinely heavy
      // query); one honest sample beats three that triple the overrun.
      val times =
        if (failed) Seq(t1)
        else if (t1 > budgetSec) {
          if (rescuePoolSec > 0) {
            val t2 = rep()
            rescuePoolSec -= t2
            if (failed) Seq(t1, t2) else Seq(math.min(t1, t2))
          } else Seq(t1)
        } else t1 +: (2 to reps).map(_ => rep())
      lock.synchronized { results.put(name, (times, failed)) }
      flushArtifact()
    }

    emitted = true
    flushArtifact()
    println(stdoutLine())
    spark.stop()
  }
}
