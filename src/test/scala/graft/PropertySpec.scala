package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.{Dedup, DedupScope, Keys}
import graft.llm.{NearDup, TextOps}

/** Property-based laws (SURVEY §5.3): dedup idempotence, canonical-key
  * stability under column reordering, the D1 dedup-scope law, and n-gram
  * shape invariants. Sample counts kept small — each case runs Spark jobs.
  */
object GraftProps extends Properties("graft") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(8))
  private val rowGen: Gen[(Long, String, Long)] =
    for { id <- Gen.choose(0L, 50L); s <- token; v <- Gen.choose(0L, 5L) }
      yield (id, s, v)

  property("P5: canonical key invariant under column selection order") =
    Prop.forAll(Gen.nonEmptyListOf(rowGen).map(_.take(10))) { rows =>
      val df = rows.toDF("a", "b", "c")
      val k1 = df.select(Keys.canonicalKey(Seq("a", "b", "c")).as("k"))
        .as[String].collect().toSeq
      val k2 = df.select("c", "a", "b")
        .select(Keys.canonicalKey(Seq("c", "a", "b")).as("k"))
        .as[String].collect().toSeq
      k1 == k2
    }

  property("D2: dedup is idempotent, f(f(x)) = f(x)") =
    Prop.forAll(Gen.listOf(rowGen).map(_.take(20))) { rows =>
      val df = rows.toDF("a", "b", "c")
      val once = Dedup.exact(df, Seq("a", "b"), DedupScope.Global)
      Dedup.exact(once, Seq("a", "b"), DedupScope.Global).count() == once.count()
    }

  private val dayGen = Gen.choose(1, 5).map(d => f"2024-01-$d%02d 12:00:00")
  private val tsRowGen = for { d <- dayGen; id <- Gen.choose(0L, 3L) } yield (d, id)

  property("D1 vs D2 scope law: per-window keeps at least as many rows") =
    Prop.forAll(Gen.nonEmptyListOf(tsRowGen).map(_.take(25))) { rows =>
      val df = rows.toDF("ts", "k").withColumn("ts", col("ts").cast("timestamp"))
      val perDay = Dedup.exact(df, Seq("k"), DedupScope.PerWindow("ts", "1 day")).count()
      val global = Dedup.exact(df, Seq("k"), DedupScope.Global).count()
      val distinctDayKey = df
        .select(date_format(col("ts"), "yyyy-MM-dd"), col("k")).distinct().count()
      perDay >= global && perDay == distinctDayKey
    }

  property("n-grams: count and arity invariants") =
    Prop.forAll(Gen.nonEmptyListOf(token).map(_.take(15))) { toks =>
      val text = toks.mkString(" ")
      val grams = Seq(text).toDF("t")
        .select(NearDup.wordNgrams(TextOps.tokens(col("t")), 3).as("g"))
        .as[Seq[String]].head()
      if (toks.length >= 3)
        grams.length == toks.length - 2 &&
          grams.forall(_.split(" ").length == 3)
      else grams == Seq(toks.mkString(" "))
    }

  property("P5: single-value change always changes the key") =
    Prop.forAll(rowGen, Gen.choose(100L, 200L)) { case ((a, b, c), delta) =>
      val k1 = Seq((a, b, c)).toDF("a", "b", "c")
        .select(Keys.canonicalKey(Seq("a", "b", "c")).as("k")).as[String].head()
      val k2 = Seq((a + delta, b, c)).toDF("a", "b", "c")
        .select(Keys.canonicalKey(Seq("a", "b", "c")).as("k")).as[String].head()
      k1 != k2
    }

  // Few keys + small timestamp domain force collisions, equal-ts ties, and
  // keys present on only one side — the as-of edge cases.
  private val asofLeft: Gen[List[(Long, Long)]] =
    Gen.listOf(for { k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 20L) }
      yield (k, t)).map(_.take(20))

  property("native as-of join = brute-force max prior right ts, any data") =
    Prop.forAll(asofLeft, asofLeft) { (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = r.map { case (k, t) => (k, t) }.toDF("rk", "rt")
      val native = graft.plans.AsOfNative
        .asofJoin(left, right, "k", "rk", "t", "rt")
        .select("id", "rt")
        .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
      val brute = l.zipWithIndex.map { case ((k, t), i) =>
        val prior = r.filter(p => p._1 == k && p._2 <= t).map(_._2)
        (i.toLong, if (prior.isEmpty) None else Some(prior.max: Any))
      }.toMap
      native == brute
    }

  property("tolerance as-of = brute max-prior-within-window, any data") =
    Prop.forAll(asofLeft, asofLeft) { (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "tl")
        .select(col("id"), col("k"),
          timestamp_micros(col("tl") * 1000000L).as("t"))
      val right = r.toDF("k", "rt0")
        .select(col("k"), timestamp_micros(col("rt0") * 1000000L).as("t"))
      val got = graft.ops.AsOf
        .lastRightTsWithin(left, right, "k", "t", "5 SECOND", "asof")
        .select(col("id"), unix_micros(col("asof")).as("a"))
        .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
      val brute = l.zipWithIndex.map { case ((k, t), i) =>
        val within = r.filter(p => p._1 == k && p._2 <= t && p._2 >= t - 5)
          .map(_._2)
        (i.toLong,
          if (within.isEmpty) None else Some((within.max * 1000000L): Any))
      }.toMap
      got == brute
    }

  property("binned interval join = naive range join, any bucket width") =
    Prop.forAll(
      Gen.listOf(Gen.choose(0L, 50L)).map(_.take(25)),
      Gen.listOf(for { s <- Gen.choose(0L, 45L); len <- Gen.choose(1L, 12L) }
        yield (s, s + len)).map(_.take(8)),
      Gen.oneOf(1L, 3L, 7L)) { (pts, ivs, wDays) =>
      val day = 24 * 3600L
      val points = pts.zipWithIndex.map { case (p, i) =>
        (i.toLong, new java.sql.Timestamp(p * day * 1000)) }.toDF("pid", "pt")
      val intervals = ivs.zipWithIndex.map { case ((s, e), i) =>
        (i.toLong, new java.sql.Timestamp(s * day * 1000),
          new java.sql.Timestamp(e * day * 1000)) }.toDF("iid", "ws", "we")
      val binned = graft.ops.RangeJoin
        .pointInInterval(points, "pt", intervals, "ws", "we", wDays * day)
        .select("pid", "iid")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val naive = (for {
        (p, pi) <- pts.zipWithIndex
        ((s, e), ii) <- ivs.zipWithIndex
        if p >= s && p < e
      } yield (pi.toLong, ii.toLong)).toSet
      binned == naive
    }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for { s <- Gen.choose(0L, 9L); d <- Gen.choose(0L, 9L)
      if s != d } yield (s, d)).map(_.take(20))

  property("pageRankScaled = single-threaded int64 reference, any digraph") =
    Prop.forAll(edgeGen, Gen.choose(1, 3)) { (edges, iters) =>
      edges.isEmpty || {
        val got = graft.llm.Components
          .pageRankScaled(edges.toDF("src", "dst"), iters)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val e = edges.distinct
        val vs = e.flatMap(p => Seq(p._1, p._2)).distinct
        val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        var r = vs.map(_ -> 1000000L).toMap
        for (_ <- 0 until iters) {
          val in = e.groupBy(_._2).view
            .mapValues(_.map { case (s, _) => r(s) / deg(s) }.sum).toMap
          r = vs.map(v => v -> (150000L + 85L * in.getOrElse(v, 0L) / 100L)).toMap
        }
        got == r
      }
    }

  property("quantizeInt8 = per-dim scala reference, any float vectors") =
    Prop.forAll(Gen.listOf(
      Gen.listOf(Gen.chooseNum(-5.0f, 5.0f)).map(_.take(4).padTo(4, 0.0f)))
        .map(_.take(8))) { vecs =>
      vecs.isEmpty || {
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding")
        val got = graft.llm.Similarity.quantizeInt8(df, "vec_id", "embedding")
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
        val dims = (0 until 4).map { i =>
          val col = vecs.map(v => v(i).toDouble)
          (col.min, col.max)
        }
        val expected = vecs.zipWithIndex.map { case (v, idx) =>
          idx.toLong -> v.zipWithIndex.map { case (x, i) =>
            val (mn, mx) = dims(i)
            if (mx == mn) 0
            else math.min(255.0, math.floor((x.toDouble - mn) * 255.0 / (mx - mn))).toInt
          }.toList
        }.toMap
        got == expected
      }
    }

  property("sampleExactK = single-window definition, any strata and k") =
    Prop.forAll(
      Gen.listOf(for { id <- Gen.choose(0L, 60L); s <- Gen.oneOf("x", "y", "z") }
        yield (id, s)).map(_.take(30)),
      Gen.choose(1, 6)) { (rows, k) =>
      rows.isEmpty || {
        val distinctRows = rows.distinct // ids unique per stratum not needed; dedup exact dupes
        val df = distinctRows.toDF("id", "stratum").repartition(5)
        val got = graft.llm.Curation.sampleExactK(df, "id", "stratum", k)
          .select("id", "stratum")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        val expected = distinctRows.toDF("id", "stratum")
          .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("stratum")
              .orderBy(xxhash64(col("id")), col("id"))))
          .filter(col("rk") <= k).select("id", "stratum")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        got == expected
      }
    }

  property("apportionBudget: sums to budget, every alloc within 1 of quota") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(1L, 1000L)).map(_.take(8)),
      Gen.choose(0L, 5000L)) { (weights, budget) =>
      val df = weights.zipWithIndex
        .map { case (w, i) => (s"s$i", w) }.toDF("s", "w")
      val out = graft.llm.Curation.apportionBudget(df, "s", "w", budget)
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      val tot = weights.sum.toDouble
      val quotaOk = weights.zipWithIndex.forall { case (w, i) =>
        math.abs(out(s"s$i") - budget * w / tot) < 1.0 + 1e-9
      }
      out.values.sum == budget && quotaOk
    }

  property("globalRowNumber = single-partition ROW_NUMBER, any data") =
    Prop.forAll(Gen.nonEmptyListOf(
      for { id <- Gen.choose(0L, 500L); c <- Gen.choose(0L, 6L) }
        yield (id, c)).map(_.take(25).distinctBy(_._1))) { rows =>
      val df = rows.toDF("id", "sz").repartition(4)
      val fast = graft.ops.Layout.globalRowNumber(df, "sz", "id")
        .select("id", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val naive = rows.sortBy { case (id, c) => (-c, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      fast == naive
    }

  property("hilbertIndex: bijection with unit steps, any curve order") =
    Prop.forAll(Gen.choose(1, 4)) { bits =>
      val n = 1 << bits
      val grid = (for { x <- 0 until n; y <- 0 until n }
        yield (x.toLong, y.toLong)).toDF("x", "y")
      val walked = graft.ops.Layout.hilbertIndex(grid, "x", "y", bits)
        .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      walked.map(_._1).toSeq == (0L until (n.toLong * n)) &&
        walked.sliding(2).forall {
          case Array((_, x1, y1), (_, x2, y2)) =>
            math.abs(x1 - x2) + math.abs(y1 - y2) == 1
          case _ => true
        }
    }

  property("interval union sweep = brute-force covered set, any data") =
    Prop.forAll(Gen.nonEmptyListOf(
      for { k <- Gen.choose(0L, 3L); s <- Gen.choose(0L, 40L);
            len <- Gen.choose(1L, 8L) } yield (k, s, s + len))
        .map(_.take(20))) { ivs =>
      val df = ivs.toDF("k", "st", "en")
      val got = graft.ops.Intervals.unionPerKey(df, "k", "st", "en")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val brute = ivs.groupBy(_._1).map { case (k, xs) =>
        val pts = xs.flatMap { case (_, s, e) => s until e }.toSet
        // segment count on the merged point set: starts with no
        // predecessor point (touching intervals merge, as in the sweep)
        val nSeg = pts.count(p => !pts.contains(p - 1))
        k -> (pts.size.toLong, nSeg.toLong)
      }
      got == brute
    }

  property("interval difference sweep = brute point-set difference") =
    Prop.forAll(
      Gen.nonEmptyListOf(
        for { k <- Gen.choose(0L, 3L); s <- Gen.choose(0L, 40L);
              len <- Gen.choose(1L, 8L) } yield (k, s, s + len))
        .map(_.take(15)),
      // disjoint blocked intervals: [10i, 10i+w), w < 10
      Gen.someOf(0L, 1L, 2L, 3L, 4L).flatMap(is =>
        Gen.choose(1L, 8L).map(w => is.map(i => (i * 10, i * 10 + w))))
    ) { (ivs, blks) =>
      val segs = graft.ops.Intervals.mergePerKey(
        ivs.toDF("k", "st", "en"), "k", "st", "en")
      val blocked =
        if (blks.isEmpty) Seq((-100L, -99L)) else blks.toSeq
      val got = graft.ops.Intervals.subtractBlocked(segs, Seq("k"),
          "st", "en", blocked.toDF("bst", "ben"), "bst", "ben")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val bpts = blocked.flatMap { case (s, e) => s until e }.toSet
      val brute = ivs.groupBy(_._1).flatMap { case (k, xs) =>
        val pts = xs.flatMap { case (_, s, e) => s until e }
          .toSet.diff(bpts)
        pts.filter(p => !pts.contains(p - 1)).map { st =>
          val en = Iterator.iterate(st)(_ + 1).dropWhile(pts.contains).next()
          (k, st, en)
        }
      }.toSet
      got == brute
    }

  property("rolling actives sweep = brute trailing-window distinct") =
    Prop.forAll(Gen.nonEmptyListOf(
      for { k <- Gen.choose(0L, 5L); d <- Gen.choose(0L, 30L) }
        yield (k, d)).map(_.take(30).distinct)) { act =>
      val df = act.toDF("k", "dn")
      val got = graft.ops.Intervals.rollingActiveCounts(df, "k", "dn", 7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val days = act.map(_._2).distinct
      val brute = days.map { d =>
        d -> act.filter(p => p._2 <= d && p._2 > d - 7).map(_._1)
          .distinct.size.toLong
      }.toMap
      got == brute
    }

  property("PIT value lookup = brute-force arg-max version, any data") =
    Prop.forAll(asofLeft, asofLeft) { (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      // one version per (k, t): keep the max tag so the lookup target
      // is well-defined (lastRightValue requires deduped versions)
      val vers = r.zipWithIndex.map { case ((k, t), i) => (k, t, s"v$i") }
        .groupBy(p => (p._1, p._2)).map(_._2.maxBy(_._3)).toSeq
      val right = vers.toDF("k", "t", "tag")
      val got = graft.ops.AsOf.lastRightValue(left, right, "k", "t", "tag")
        .select("id", "asof_value")
        .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
      val brute = l.zipWithIndex.map { case ((k, t), i) =>
        val past = vers.filter(p => p._1 == k && p._2 <= t)
        (i.toLong,
          if (past.isEmpty) None
          else Some(past.maxBy(_._2)._3: Any))
      }.toMap
      got == brute
    }

  property("forward as-of = brute-force min future right ts, any data") =
    Prop.forAll(asofLeft, asofLeft) { (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = r.map { case (k, t) => (k, t) }.toDF("k", "t")
      val got = graft.ops.AsOf.firstRightTs(left, right, "k", "t", "nxt")
        .select("id", "nxt")
        .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
      val brute = l.zipWithIndex.map { case ((k, t), i) =>
        val future = r.filter(p => p._1 == k && p._2 >= t).map(_._2)
        (i.toLong, if (future.isEmpty) None else Some(future.min: Any))
      }.toMap
      got == brute
    }
}
