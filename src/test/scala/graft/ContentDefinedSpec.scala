package graft

import org.apache.spark.sql.functions._

/** Brute-force references for the sampling/chunking/projection sweep
  * (q350-q352). Hash values themselves come from Spark's xxhash64 /
  * RollingHash (pinned elsewhere against bit-level references); what
  * these tests verify independently is the OPERATOR LOGIC on top:
  * window-minimum selection, boundary chunk assembly, and the
  * sequential-fold projection arithmetic.
  */
class ContentDefinedSpec extends SparkSpec {
  import spark.implicits._

  private def docs: Seq[(Long, String)] =
    Tables(spark, sfDir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Spark's xxhash64 for a batch of strings, keyed by the string. */
  private def sparkHash(ss: Seq[String]): Map[String, Long] =
    ss.distinct.toDF("s").select(col("s"), xxhash64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("q350: minimizer selection and pair counts match a scala walk") {
    val grams = docs.map { case (id, text) =>
      val tk = text.trim.split("\\s+").toSeq
      id -> (if (tk.size >= 3) tk.sliding(3).map(_.mkString(" ")).toSeq
             else Seq.empty[String])
    }
    val h = sparkHash(grams.flatMap(_._2))
    val mins = grams.map { case (id, gs) =>
      val hs = gs.map(h)
      id -> hs.indices.filter(_ <= hs.size - 4)
        .map(p => (p until p + 4).map(hs).min).toSet
    }.filter(_._2.nonEmpty)
    val docsPerMin = mins.flatMap { case (id, ms) => ms.map(_ -> id) }
      .groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).toSet }
      .filter(_._2.size <= 50)
    val pairCounts = collection.mutable.Map[(Long, Long), Long]()
    docsPerMin.values.foreach { ds =>
      val sorted = ds.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.size)
        pairCounts((sorted(i), sorted(j))) =
          pairCounts.getOrElse((sorted(i), sorted(j)), 0L) + 1
    }
    val expected = pairCounts.filter(_._2 >= 2).toSeq
      .map { case ((a, b), n) => (a, b, n) }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q350_minimizer_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q351: chunk boundaries, identity, and savings match a scala walk") {
    val meta = Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val allToks = meta.flatMap(_._3.trim.split("\\s+"))
    val th = sparkHash(allToks)
    def flag(t: String): Boolean = {
      val m = th(t) % 16
      (if (m < 0) m + 16 else m) == 0
    }
    // chunk strings per doc via running boundary count
    val chunks = meta.flatMap { case (id, src, text) =>
      val tk = text.trim.split("\\s+").toSeq
      var cn = 0L
      tk.map { t => if (flag(t)) cn += 1; (cn, t) }
        .groupBy(_._1).toSeq
        .map { case (_, xs) => (src, xs.map(_._2).mkString(" ")) }
    }
    val fh = chunks.map(_._2).distinct.toDF("s")
      .select(col("s"),
        graft.functions.RollingHash.rollingHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = chunks.groupBy(_._1).map { case (src, cs) =>
      val fps = cs.map(c => (fh(c._2), c._2.split(" ").length.toLong))
      val total = fps.map(_._2).sum
      val dist = fps.groupBy(_._1).map(_._2.head._2).sum
      (src, cs.size.toLong, fps.map(_._1).distinct.size.toLong,
        (cs.size - fps.map(_._1).distinct.size).toLong, total, dist,
        (total - dist) * 10000 / total)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q351_cdc_chunk_dedup")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }

  test("q352: projection folds equal an identically-ordered scala fold") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val gate = emb.map(_._1).toSeq.toDF("v")
      .select(col("v"), pmod(xxhash64(col("v")), lit(8)).as("g"))
      .collect().filter(_.getLong(1) == 0).map(_.getLong(0)).toSet
    val samp = emb.filter(e => gate(e._1)).sortBy(_._1)
    val signRows = spark.range(16 * 64)
      .select(col("id"), pmod(xxhash64(col("id")), lit(2)).as("m"))
      .collect().map(r => r.getLong(0) -> (1.0 - 2.0 * r.getLong(1))).toMap
    def proj(e: Array[Double]): Array[Double] =
      Array.tabulate(16) { j =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += e(i) * signRows(j * 64L + i); i += 1 }
        acc
      }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        acc += (a(i) - b(i)) * (a(i) - b(i)); i += 1
      }
      acc
    }
    val expected = (for {
      i <- samp.indices; j <- (i + 1) until samp.size
    } yield {
      val o = d2(samp(i)._2, samp(j)._2)
      val p = d2(proj(samp(i)._2), proj(samp(j)._2)) * 4.0
      (samp(i)._1, samp(j)._1, o, p, p / o)
    }).toSeq
    val got = SparkEntry.queries("q352_jl_projection_eval")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // exact double equality: same operations in the same order
    assert(got == expected)
  }
}
