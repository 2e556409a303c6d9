package graft

import org.apache.spark.sql.Row

/** Brute-force references for the round-6 sequence/graph/encoding sweep
  * (q346-q349): the DuckDB oracle checks engine parity; these pin the
  * SEMANTICS against independent single-threaded Scala implementations
  * over the same sf0.001 inputs, so an error mirrored into the oracle SQL
  * cannot hide.
  */
class SequencePatternSpec extends SparkSpec {

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, sfDir).collect().toSeq

  test("q346: regex funnel counts match a java.util.regex walk per user") {
    // read through Tables: ts parquet encoding varies by testdata
    // generation; normalizeTs always yields session-UTC TIMESTAMP
    val ev = Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant,
        r.getLong(2), r.getString(3)))
    val chars = Map("view" -> 'v', "click" -> 'c', "purchase" -> 'p',
      "signup" -> 's').withDefaultValue('e')
    val expected = ev.groupBy(_._1).map { case (u, es) =>
      val seq = es
        .sortBy(e => (e._2.getEpochSecond, e._2.getNano, e._3))
        .map(e => chars(e._4)).mkString
      val ms = "v[ce]*p".r.findAllIn(seq).toSeq
      u -> ((seq.length.toLong, ms.size.toLong, ms.map(_.length).sum.toLong))
    }
    val got = rows("q346_event_pattern_match")
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("q347: RA scores match a rational-arithmetic brute force") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val deg = li.groupBy(_._1).map { case (ok, xs) => ok -> xs.size }
    val scores = collection.mutable.Map[(Long, Long), (Long, BigInt)]()
    li.groupBy(_._1).foreach { case (ok, xs) =>
      val dg = deg(ok)
      if (dg >= 2 && dg <= 18) {
        val ps = xs.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size if ps(i) != ps(j)) {
          val k = (ps(i), ps(j))
          val (n, s0) = scores.getOrElse(k, (0L, BigInt(0)))
          scores(k) = (n + 1, s0 + BigInt(12252240L / dg))
        }
      }
    }
    val expectedTop = scores.toSeq
      .map { case ((u, v), (n, num)) => (u, v, n, num) }
      .sortBy { case (u, v, _, num) => (-num, u, v) }.take(100)
      .map { case (u, v, n, num) =>
        (u, v, n, num.toLong.toDouble / 12252240L) }
    val got = rows("q347_linkpred_resource_alloc")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expectedTop)
  }

  test("q360: butterfly counts match a brute biclique enumeration") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val orders = byOrder.keys.toSeq.sorted
    val perPart = collection.mutable.Map[Long, Long]()
    // brute force: every order pair, C(shared,2) butterflies, attributed
    // to each shared part pair's endpoints
    for (i <- orders.indices; j <- (i + 1) until orders.size) {
      val shared = byOrder(orders(i)).intersect(byOrder(orders(j))).toSeq.sorted
      for (a <- shared.indices; b <- (a + 1) until shared.size) {
        perPart(shared(a)) = perPart.getOrElse(shared(a), 0L) + 1
        perPart(shared(b)) = perPart.getOrElse(shared(b), 0L) + 1
      }
    }
    val expected = perPart.toSeq.sorted
    val got = SparkEntry.queries("q360_butterfly_count")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q348: OOF exclusion law and smoothing bounds hold") {
    val got = rows("q348_target_encoding").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (seg, fs) =>
      val k = fs.size
      val nSeg = fs.map(_._3).sum
      // Σ_folds oof_n = (k-1)·n_seg — each row excluded from exactly one fold
      assert(fs.map(_._4).sum == (k - 1) * nSeg, s"oof_n law broken for $seg")
      val posSum = fs.map(_._5).sum
      assert(posSum % (k - 1) == 0, s"oof_pos not (k-1)-divisible for $seg")
      // m-estimate keeps enc strictly inside (0, 1) for non-degenerate priors
      fs.foreach { case (_, _, _, _, _, enc) =>
        assert(enc > 0.0 && enc < 1.0, s"enc out of (0,1) for $seg")
      }
    }
  }

  test("q354: burstiness matches an identically-ordered scala computation") {
    val ev = Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, es) =>
      val ts = es.sortBy(e => (e._2.getEpochSecond, e._2.getNano, e._3))
        .map(e => e._2.getEpochSecond * 1000000L + e._2.getNano / 1000L)
      val gaps = ts.zip(ts.drop(1)).map(p => p._2 - p._1)
      if (gaps.size < 2) None
      else {
        val n = gaps.size.toLong
        val sg = gaps.map(BigInt(_)).sum
        val sg2 = gaps.map(g => BigInt(g) * BigInt(g)).sum
        val mean = sg.toDouble / n
        val sd = math.sqrt((BigInt(n) * sg2 - sg * sg).toDouble) / n
        Some((u, n, mean, sd, (sd - mean) / (sd + mean)))
      }
    }.toSeq.sortBy(_._1)
    val got = rows("q354_event_burstiness").map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got == expected)
  }

  test("q355: eval invariants — ranks in [1,10], rr = 2520/rank") {
    val got = rows("q355_retrieval_eval").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, nRel, first, rr) =>
      assert(nRel >= 0 && nRel <= 10)
      assert(first >= 0 && first <= 10)
      if (nRel > 0) assert(first >= 1 && rr == 2520 / first)
      else assert(first == 0 && rr == 0)
    }
  }

  test("q357: fertility >= 1 and word totals match a direct count") {
    val wordTotals = Tables(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").length.toLong))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
    val got = rows("q357_token_fertility").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (lang, _, sumTok, sumWords, fert) =>
      assert(sumWords == wordTotals(lang))
      assert(sumTok >= sumWords, "BPE cannot merge across words")
      assert(fert >= 1.0)
    }
  }

  test("q361: the watermark actually dropped late rows") {
    val total = Tables(spark, sfDir, "events").count()
    val emitted = rows("q361_stream_late_drop")
    assert(emitted.nonEmpty)
    val kept = emitted.map(_.getLong(1)).sum
    // chunks 1-3 span the whole month behind a 2-day watermark: most of
    // their rows MUST be late-dropped, and closed windows must exist
    assert(kept > 0 && kept < total,
      s"expected late drops: kept=$kept of $total")
  }

  test("q362: modularity identity recomputes exactly from the rows") {
    val got = rows("q362_modularity").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    val degTotal = got.map(_._4).sum
    assert(degTotal % 2 == 0)
    val m = degTotal / 2
    assert(got.map(_._3).sum <= m)
    val qn = got.map { case (_, _, in, dg, _) => 4 * m * in - dg * dg }.sum
    val q = qn.toDouble / (4.0 * m * m)
    got.foreach { case (_, _, _, _, mod) => assert(mod == q) }
    assert(q >= -0.5 && q <= 1.0)
  }

  test("q365: nearest as-of matches a brute per-view argmin") {
    val ev = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toInstant.getEpochSecond * 1000000L
          + r.getTimestamp(2).toInstant.getNano / 1000L,
        r.getString(3)))
    val purchases = ev.filter(_._4 == "purchase")
      .groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    val expected = ev.filter(_._4 == "view").flatMap { case (id, u, ts, _) =>
      purchases.get(u).map { ps =>
        id -> ps.minBy(p => (math.abs(p - ts), p))
      }
    }.sortBy(_._1).toSeq
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
    val got = rows("q365_asof_nearest").map(r =>
      r.getLong(0) -> r.getString(1))
    assert(got == expected.map { case (id, us) =>
      id -> fmt.format(java.time.Instant.ofEpochSecond(us / 1000000L,
        us % 1000000L * 1000L))
    })
  }

  test("q366: roundtrip_ok is exactly the no-unknown-symbols predicate") {
    val got = rows("q366_bpe_roundtrip").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, nTok, nUnk, ok) =>
      assert(nUnk >= 0 && nUnk <= nTok)
      assert(ok == (nUnk == 0),
        "BPE merges are within-word concatenations: decode must be " +
          "lossless exactly when every symbol is in-vocab")
    }
  }

  test("q349: parallel-LTTB picks match a sequential reference") {
    val daily = Tables(spark, sfDir, "events").select("ts").collect()
      .map(r => r.getTimestamp(0).toInstant
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
      .groupBy(identity).map { case (d, xs) => d.toEpochDay -> xs.size.toLong }
      .toSeq.sortBy(_._1)
    val byBucket = daily.groupBy { case (x, _) => x / 5 }.toSeq.sortBy(_._1)
    val stats = byBucket.map { case (b, pts) =>
      b -> ((pts.size.toLong, pts.map(_._1).sum, pts.map(_._2).sum)) }.toMap
    val bs = byBucket.map(_._1)
    val expected = byBucket.map { case (b, pts) =>
      val pick =
        if (b == bs.head) pts.minBy(_._1)
        else if (b == bs.last) pts.maxBy(_._1)
        else {
          val (np, sxp, syp) = stats(bs(bs.indexOf(b) - 1))
          val (nn, sxn, syn) = stats(bs(bs.indexOf(b) + 1))
          pts.maxBy { case (x, y) =>
            val score = math.abs(
              (sxp * nn - sxn * np) * (y * np - syp)
                - (sxp - x * np) * (syn * np - syp * nn))
            (score, -x)
          }
        }
      (b, java.time.LocalDate.ofEpochDay(pick._1).toString, pick._2)
    }
    val got = rows("q349_lttb_downsample")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got == expected)
  }
}
