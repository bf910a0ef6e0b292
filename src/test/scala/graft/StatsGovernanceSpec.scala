package graft

import org.apache.spark.sql.functions._

/** Independent-reference coverage for the round-13 families (link
  * prediction, exact-moments OLS, chi-square / KS, governance audits,
  * quantile normalization, PMI collocations): each test recomputes the
  * statistic driver-side from first principles (plain Scala over the
  * collected fixture — a different code path from both the engine and the
  * DuckDB oracle) and compares, or asserts a structural invariant the
  * oracle can't express (plan shape, monotonicity).
  */
class StatsGovernanceSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- link prediction ----

  test("q_link_predict: scored pairs are canonical, non-trivial, bounded") {
    val rows = q("q_link_predict").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, w) = (r.getLong(0), r.getLong(1))
      val cn = r.getLong(2)
      val aa = r.getDouble(3)
      val j = r.getDouble(4)
      assert(u < w, s"pair not canonical: $u,$w")
      assert(cn >= 1)
      assert(aa > 0.0)
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j")
    }
    // top-50 is sorted by cn desc
    val cns = rows.map(_.getLong(2))
    assert(cns.zip(cns.tail).forall { case (a, b) => a >= b })
  }

  test("q_link_recs: <=3 per node, rank contiguous, score non-increasing") {
    val rows = q("q_link_recs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (node, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.length <= 3, s"node $node has ${sorted.length} recs")
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      val aas = sorted.map(_._3)
      assert(aas.zip(aas.tail).forall { case (a, b) => a >= b },
        s"node $node aa not non-increasing: ${aas.toSeq}")
    }
  }

  // ---- exact-moments OLS ----

  test("q_ols_fit matches a driver-side BigDecimal recompute") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = li.groupBy(_._1).map { case (flag, rs) =>
      val n = BigInt(rs.length)
      val sx = rs.map(r => BigInt(r._2)).sum
      val sy = rs.map(r => BigInt(r._3)).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val syy = rs.map(r => BigInt(r._3) * r._3).sum
      val sxxc = (n * sxx - sx * sx).toDouble
      val sxyc = (n * sxy - sx * sy).toDouble
      val syyc = (n * syy - sy * sy).toDouble
      val slope = sxyc / sxxc
      val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      val r2 = sxyc * sxyc / (sxxc * syyc)
      flag -> ((slope, icept, r2))
    }
    val got = q("q_ols_fit").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (slope, icept, r2) = expected(r.getString(0))
      assert(math.abs(r.getDouble(2) - slope) < 1e-6)
      assert(math.abs(r.getDouble(3) - icept) < 1e-6)
      assert(math.abs(r.getDouble(4) - r2) < 1e-6)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q_ols_multi: coefficients satisfy the normal equations") {
    // b solves [S11 S12; S12 S22] b = [S1y; S2y] — plug back in and the
    // residuals of the 2x2 system must vanish (relative to the scale of
    // the centered moments).
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_quantity").cast("long"),
        round(col("l_discount") * 100, 0).cast("long"),
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = BigInt(li.length)
    def s(f: ((Long, Long, Long)) => BigInt) = li.map(f).sum
    val (s1, s2, sy) = (s(r => BigInt(r._1)), s(r => BigInt(r._2)), s(r => BigInt(r._3)))
    val c11 = (n * s(r => BigInt(r._1) * r._1) - s1 * s1).toDouble
    val c12 = (n * s(r => BigInt(r._1) * r._2) - s1 * s2).toDouble
    val c22 = (n * s(r => BigInt(r._2) * r._2) - s2 * s2).toDouble
    val c1y = (n * s(r => BigInt(r._1) * r._3) - s1 * sy).toDouble
    val c2y = (n * s(r => BigInt(r._2) * r._3) - s2 * sy).toDouble
    val row = q("q_ols_multi").collect().head
    val (b1, b2) = (row.getDouble(1), row.getDouble(2))
    val r1 = (c11 * b1 + c12 * b2 - c1y) / math.max(math.abs(c1y), 1.0)
    val r2 = (c12 * b1 + c22 * b2 - c2y) / math.max(math.abs(c2y), 1.0)
    assert(math.abs(r1) < 1e-5, s"normal eq 1 residual $r1")
    assert(math.abs(r2) < 1e-5, s"normal eq 2 residual $r2")
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
  }

  // ---- distribution tests ----

  test("q_chi2_independence matches a driver-side recompute; exact dof") {
    val cells = Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang")).count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val nTot = cells.map(_._2).sum
    val rTot = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val cTot = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val chi2 = cells.sortBy(_._1).map { case ((src, lg), o) =>
      val num = (BigInt(o) * nTot - BigInt(rTot(src)) * cTot(lg)).toDouble
      num * num / (BigInt(rTot(src)) * cTot(lg)).toDouble / nTot.toDouble
    }.sum
    val row = q("q_chi2_independence").collect().head
    assert(math.abs(row.getDouble(0) - chi2) < 1e-5, s"${row.getDouble(0)} vs $chi2")
    assert(row.getLong(1) == (rTot.size - 1).toLong * (cTot.size - 1))
    assert(row.getLong(2) == nTot)
  }

  test("q_ks_two_sample matches an exact driver-side D") {
    val docs = Tables.documents(spark, sf)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val a = docs.filter(_._1 == "src0").map(_._2).sorted
    val b = docs.filter(_._1 == "src1").map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    val dNum = values.map { v =>
      val f1 = a.count(_ <= v).toLong
      val f2 = b.count(_ <= v).toLong
      (f1 * b.length - f2 * a.length).abs
    }.max
    val row = q("q_ks_two_sample").collect().head
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    assert(row.getLong(2) == dNum, s"d_num ${row.getLong(2)} vs $dNum")
    val d = dNum.toDouble / (a.length.toDouble * b.length.toDouble)
    assert(math.abs(row.getDouble(3) - d) < 1e-6)
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  // ---- governance ----

  test("q_k_anonymity matches a driver-side group-size audit") {
    val qi = Tables.load(spark, sf, "customer")
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sizes = qi.groupBy(identity).map(_._2.length.toLong).toSeq
    val row = q("q_k_anonymity").collect().head
    assert(row.getLong(0) == sizes.length)
    assert(row.getLong(1) == sizes.min)
    assert(row.getLong(2) == qi.length)
    assert(row.getLong(3) == sizes.filter(_ < 5).sum)
    assert(row.getLong(4) == sizes.count(_ < 5))
  }

  test("q_anon_ladder: k never shrinks as the QI coarsens") {
    val rows = q("q_anon_ladder").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows.keySet == Set("seg", "seg_nat", "seg_nat_band"))
    assert(rows("seg") >= rows("seg_nat"))
    assert(rows("seg_nat") >= rows("seg_nat_band"))
  }

  // ---- quantile normalization ----

  test("q_quantile_norm matches the exact order-statistic mapping; no Window in the plan") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pooled = docs.sortBy(r => (r._3, r._1)) // (value, doc_id) order
    val nTot = docs.length.toLong
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val ranked = rs.sortBy(r => (r._3, r._1)).zipWithIndex
      val ns = rs.length.toLong
      ranked.toSeq.map { case (r, i) =>
        val p = ((i + 1) * nTot + ns - 1) / ns // ceil(r*N/ns)
        r._1 -> pooled((p - 1).toInt)._3
      }
    }.toMap
    val df = q("q_quantile_norm")
    // scale shape: the engine path is two range-partitioned global ranks
    // — no per-source Window operator anywhere (the q_fuzzy_snm lesson)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "quantile_norm must not plan a Window")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, v) =>
      assert(got(id) == v, s"doc $id: ${got(id)} vs $v")
    }
  }

  // ---- PMI collocations ----

  test("q_pmi_bigrams matches a driver-side tokenizer+PMI recompute") {
    val texts = Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0))
    val toks = texts.map(_.toLowerCase
      .replaceAll("[^\\p{L}\\p{N}\\s]", " ").split("\\s+")
      .filter(_.nonEmpty).toSeq)
    val bigrams = toks.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail))
    val pc = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nTot = pc.values.sum
    val xm = pc.toSeq.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val ym = pc.toSeq.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val scored = pc.filter(_._2 >= 5).map { case ((x, y), nxy) =>
      val pmi = math.log(nxy.toDouble * nTot.toDouble /
        (xm(x).toDouble * ym(y).toDouble))
      (x, y, nxy, BigDecimal(pmi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    val top = scored.sortBy(r => (-r._4, r._1, r._2)).take(20)
    val got = q("q_pmi_bigrams").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == top.length.min(20))
    got.zip(top).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-6)
    }
  }

  // ---- batch-2 stats tier ----

  test("q_anova_f matches a driver-side BigInt-moments recompute") {
    val xs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = xs.length.toDouble
    val sx = xs.map(r => BigInt(r._2)).sum.toDouble
    val sxx = xs.map(r => BigInt(r._2) * r._2).sum.toDouble
    val groups = xs.groupBy(_._1)
    val sumT = groups.toSeq.sortBy(_._1).map { case (_, rs) =>
      val sg = rs.map(r => BigInt(r._2)).sum.toDouble
      sg * sg / rs.length.toDouble
    }.sum
    val k = groups.size.toDouble
    val ssb = sumT - sx * sx / n
    val ssw = sxx - sumT
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val row = q("q_anova_f").collect().head
    assert(row.getLong(0) == groups.size && row.getLong(1) == xs.length)
    assert(math.abs(row.getDouble(2) - ssb) < 1e-4)
    assert(math.abs(row.getDouble(3) - ssw) < 1e-4)
    assert(math.abs(row.getDouble(4) - f) < 1e-5)
  }

  test("q_entropy_report: bounds and exact recompute for documents.lang") {
    val rows = q("q_entropy_report").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (nd, h, g) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 1e-9,
        s"${r.getString(0)}: H=$h outside [0, ln($nd)]")
      assert(g >= 0.0 && g < 1.0)
    }
    val counts = Tables.documents(spark, sf).groupBy(col("lang")).count()
      .collect().map(_.getLong(1))
    val tot = counts.sum.toDouble
    val h = counts.map(c => -(c / tot) * math.log(c / tot)).sum
    val lang = rows.find(_.getString(0) == "documents.lang").get
    assert(lang.getLong(1) == counts.length)
    assert(math.abs(lang.getDouble(3) - h) < 1e-6)
  }

  test("q_benford: frequencies sum to 1, expectations are Benford's law") {
    val rows = q("q_benford").collect()
    assert(rows.map(_.getLong(0)).forall(d => d >= 1 && d <= 9))
    val freqSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(freqSum - 1.0) < 1e-4, s"freq sum $freqSum")
    rows.foreach { r =>
      val exp = math.log(1.0 + 1.0 / r.getLong(0)) / math.log(10.0)
      assert(math.abs(r.getDouble(3) - exp) < 1e-6)
    }
  }

  test("q_acf: lag-0 analogue is 1; all lags in [-1, 1]; exact lag-1 recompute") {
    val daily = Tables.events(spark, sf)
      .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = daily.toSeq.flatMap { case (d, x) =>
      daily.get(d + 1).map(y => (x, y)) }
    val n = BigInt(pairs.length)
    val sx = pairs.map(p => BigInt(p._1)).sum
    val sy = pairs.map(p => BigInt(p._2)).sum
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val syy = pairs.map(p => BigInt(p._2) * p._2).sum
    val r1 = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    val rows = q("q_acf").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val lag1 = rows.find(_.getLong(0) == 1L).get
    assert(lag1.getLong(1) == pairs.length)
    assert(math.abs(lag1.getDouble(2) - r1) < 1e-6)
  }

  test("q_holt_linear matches the sequential recursion replayed in Scala") {
    val ys = Tables.events(spark, sf)
      .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2.toDouble)
    var l = ys.head; var b = 0.0
    ys.tail.foreach { y =>
      val lnew = 0.5 * y + 0.5 * (l + b)
      b = 0.5 * (lnew - l) + 0.5 * b
      l = lnew
    }
    val row = q("q_holt_linear").collect().head
    assert(row.getLong(0) == ys.length)
    assert(math.abs(row.getDouble(1) - l) < 1e-6)
    assert(math.abs(row.getDouble(2) - b) < 1e-6)
    assert(math.abs(row.getDouble(3) - (l + 7.0 * b)) < 1e-6)
  }

  test("q_closeness: harmonic sum is consistent and reach is monotone in radius") {
    val rows = q("q_closeness").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nReached, sumDist, harm12) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      // each reached node contributes dist in [1,3] and 12/dist in {12,6,4}
      assert(sumDist >= nReached && sumDist <= 3 * nReached)
      assert(harm12 >= 4 * nReached && harm12 <= 12 * nReached)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  // ---- running-total / ABC / TWAP ----

  test("Rank.withRunningTotal: exact prefix sums and grand total") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 5L), (3L, 20L), (4L, 1L), (5L, 7L))
      .toDF("k", "w")
    val (run, total) = graft.operators.Rank.withRunningTotal(
      df, "cum", "w", col("w").desc, col("k"))
    assert(total == 43L)
    val got = run.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // order: (3,20) (1,10) (5,7) (2,5) (4,1)
    assert(got == Map(3L -> 20L, 1L -> 30L, 5L -> 37L, 2L -> 42L, 4L -> 43L))
  }

  test("q_abc_classes matches a driver-side exact classification") {
    val rev = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100, 0).cast("long")).as("rev_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = rev.map(r => BigInt(r._2)).sum
    var cum = BigInt(0)
    val classes = rev.sortBy(r => (-r._2, r._1)).map { case (_, rc) =>
      cum += rc
      if (100 * cum <= 80 * total) "A"
      else if (100 * cum <= 95 * total) "B" else "C"
    }
    val expected = classes.groupBy(identity).map { case (k, v) => k -> v.length }
    val got = q("q_abc_classes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map { case (k, v) => k -> v.toInt } == expected)
    val shares = q("q_abc_classes").collect().map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-5)
  }

  test("q_twap matches a driver-side segment recompute") {
    val evs = Tables.events(spark, sf).select(
      floor(unix_timestamp(col("ts")) / 86400).cast("long"),
      col("user_id"), unix_micros(col("ts")),
      round(col("value") * 100, 0).cast("long"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val segs = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._5))
      sorted.zip(sorted.tail).map { case (a, b) =>
        (a._1, BigInt(a._4) * (b._3 - a._3), b._3 - a._3)
      }
    }
    val expected = segs.groupBy(_._1).map { case (day, ss) =>
      val swv = ss.map(_._2).sum
      val sdt = ss.map(s => BigInt(s._3)).sum
      day -> ((ss.length.toLong, sdt.toLong, swv.toDouble / sdt.toDouble))
    }
    val got = q("q_twap").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, dt, tw) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == dt)
      assert(math.abs(r.getDouble(3) - tw) < 1e-6)
    }
  }

  // ---- batch-4: graph stats + concentration ----

  test("q_degree_dist is consistent with q_triangles' node/edge census") {
    val hist = q("q_degree_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tri = q("q_triangles").collect().head
    val (nNodes, nEdges) = (tri.getLong(0), tri.getLong(1))
    assert(hist.map(_._2).sum == nNodes)
    assert(hist.map { case (d, n) => d * n }.sum == 2 * nEdges)
  }

  test("q_lcc_topk: coefficients in [0,1], triangles bounded by wedge count") {
    val rows = q("q_lcc_topk").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (deg, tv, lcc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg >= 3)
      assert(tv >= 0 && tv <= deg * (deg - 1) / 2)
      assert(lcc >= 0.0 && lcc <= 1.0)
    }
    val ls = rows.map(_.getDouble(3))
    assert(ls.zip(ls.tail).forall { case (a, b) => a >= b })
  }

  test("q_gini_revenue matches a driver-side exact recompute, in [0,1)") {
    val rev = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100, 0).cast("long")).as("rev_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = rev.sortBy(r => (r._2, r._1)).map(_._2)
    val n = BigInt(sorted.length)
    val sx = sorted.map(BigInt(_)).sum
    val srx = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (2 * srx - (n + 1) * sx).toDouble / (n * sx).toDouble
    val row = q("q_gini_revenue").collect().head
    assert(row.getLong(0) == sorted.length)
    assert(math.abs(row.getDouble(1) - gini) < 1e-6)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) < 1.0)
  }

  test("q_weighted_median matches a driver-side exact weighted order statistic") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long"),
        col("l_quantity").cast("long"),
        col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    val expected = li.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4, r._5))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { r => cum += r._3; 2 * cum >= tot }.get._2
      flag -> ((tot, med))
    }
    val got = q("q_weighted_median").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (tot, med) = expected(r.getString(0))
      assert(r.getLong(1) == tot && r.getLong(2) == med,
        s"${r.getString(0)}: (${r.getLong(1)},${r.getLong(2)}) vs ($tot,$med)")
    }
  }

  // ---- batch-5: seasonality / growth / systematic sample ----

  test("q_seasonality: totals reconcile with the raw event count") {
    val rows = q("q_seasonality").collect()
    assert(rows.length <= 7)
    assert(rows.map(_.getLong(0)).forall(d => d >= 0 && d <= 6))
    val totalEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == totalEvents)
    rows.foreach(r => assert(r.getDouble(4) > 0.0))
    // the day-count-weighted mean of the index is 1 by construction
    val wIdx = rows.map(r => r.getLong(1) * r.getDouble(4)).sum /
      rows.map(_.getLong(1)).sum
    assert(math.abs(wIdx - 1.0) < 1e-3, s"weighted idx mean $wIdx")
  }

  test("q_growth_rates: rows chain (prev_c equals the prior week's rev_c)") {
    val rows = q("q_growth_rates").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.zip(rows.tail).foreach { case (a, b) =>
      if (b._1 == a._1 + 1) assert(b._3 == a._2, s"chain broken at $b")
    }
    rows.foreach { r =>
      val g = (r._2 - r._3).toDouble / r._3.toDouble
      assert(math.abs(r._4 - g) < 1e-6)
    }
  }

  test("q_sample_systematic: ranks form the exact 1 mod 25 sequence") {
    val n = Tables.documents(spark, sf).count()
    val rows = q("q_sample_systematic").collect().map(_.getLong(2))
    assert(rows.length == ((n + 24) / 25).toInt)
    assert(rows.toSeq == rows.indices.map(i => 1L + 25L * i))
  }

  test("q_streaks matches a driver-side islands recompute") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400)
        .cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = ud.groupBy(_._1).map { case (u, ds) =>
      val days = ds.map(_._2).sorted
      var streaks = List.empty[Int]; var cur = 1
      days.zip(days.tail).foreach { case (a, b) =>
        if (b == a + 1) cur += 1 else { streaks ::= cur; cur = 1 }
      }
      streaks ::= cur
      u -> ((streaks.max.toLong, streaks.length.toLong, days.length.toLong))
    }
    val got = q("q_streaks").collect()
    assert(got.length <= 20 && got.nonEmpty)
    got.foreach { r =>
      val (mx, ni, na) = expected(r.getLong(0))
      assert(r.getLong(1) == mx && r.getLong(2) == ni && r.getLong(3) == na,
        s"user ${r.getLong(0)}")
    }
    // the cutoff really is the global top by (streak desc, islands, user)
    val sortedAll = expected.toSeq
      .sortBy { case (u, (mx, ni, _)) => (-mx, ni, u) }.take(got.length)
    assert(got.map(_.getLong(0)).toSeq == sortedAll.map(_._1))
  }

  // ---- join-delta IVM ----

  test("q_mv_join_refresh equals the direct full recompute (IVM identity)") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, sf, "lineitem").select(col("l_orderkey"),
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
        .cast("long").as("rev"))
    val full = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("rev")).as("revenue_c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = q("q_mv_join_refresh").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
  }

  // ---- round-14 event tier ----

  /** (user, epoch-second, event_id, event_type) fixture collected once
    * for the driver-side session/cohort/path recomputes.
    */
  private lazy val evFixture: Array[(Long, Long, Long, String)] =
    Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q_cohort_retention matches a driver-side recompute; offset-0 is 1.0") {
    val uw = evFixture.map(e => (e._1, e._2 / 604800)).distinct
    val first = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val sizes = first.groupBy(_._2).map { case (w, us) => w -> us.size.toLong }
    val expected = uw.map { case (u, w) => (first(u), w - first(u)) }
      .filter(_._2 <= 7)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = q("q_cohort_retention").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == expected(k), s"cell $k")
      assert(r.getLong(3) == sizes(k._1))
      if (k._2 == 0L) assert(r.getDouble(4) == 1.0, s"offset-0 cohort $k")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q_sessionize matches a driver-side gaps-and-islands recompute") {
    val sessions = evFixture.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val secs = es.sortBy(e => (e._2, e._3)).map(_._2)
      val bounds = secs.zip(0L +: secs.dropRight(1))
        .map { case (s2, prev) => s2 -> (s2 - prev > 1800) }
      // first event always starts a session
      val flags = true +: bounds.drop(1).map(_._2)
      val ids = flags.scanLeft(0L)((a, f) => if (f) a + 1 else a).drop(1)
      secs.zip(ids).groupBy(_._2).values.map { g =>
        (g.length.toLong, g.map(_._1).max - g.map(_._1).min)
      }
    }
    val row = q("q_sessionize").collect().head
    assert(row.getLong(0) == sessions.length.toLong)
    assert(row.getLong(1) == sessions.map(_._1).sum)
    assert(row.getLong(4) == sessions.map(_._2).max)
    assert(row.getLong(5) == sessions.count(_._1 == 1L).toLong)
    val meanEv = sessions.map(_._1).sum.toDouble / sessions.length
    assert(math.abs(row.getDouble(2) - meanEv) < 1e-6)
  }

  test("q_session_paths matches a driver-side trigram count; top-20 order") {
    val paths = evFixture.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val got = q("q_session_paths").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.length <= 20 && got.nonEmpty)
    got.foreach { case (p, n) => assert(paths(p) == n, s"path $p") }
    val top = paths.toSeq.sortBy { case (p, n) => (-n, p) }.take(got.length)
    assert(got.toSeq == top)
  }

  test("q_token_curriculum: Hamilton allocation sums to B; admission is the quality-top prefix") {
    val rows = q("q_token_curriculum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val tAll = rows.map(_._2).sum
    assert(rows.map(_._3).sum == tAll / 5,
      s"alloc sum ${rows.map(_._3).sum} != B ${tAll / 5}")
    rows.foreach { case (src, tk, alloc, nAdm, tokAdm) =>
      assert(tokAdm <= alloc, s"$src overspent: $tokAdm > $alloc")
      assert(tokAdm <= tk && nAdm >= 0)
    }
    // Hamilton: every allocation within 1 of the exact proportional share
    rows.foreach { case (src, tk, alloc, _, _) =>
      val exact = BigInt(tk) * (tAll / 5) / tAll
      assert((BigInt(alloc) - exact).abs <= 1, s"$src alloc $alloc vs $exact")
    }
  }

  test("q_attribution_multi conserves revenue: per-purchase credit sums to rev_c * 1e6") {
    import org.apache.spark.sql.functions._
    // independent recompute of the per-purchase identity from the fixture
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("rev_c"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("us").as("pus"), col("rev_c")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2) }
    val expectedTotal = p.map { case (u, _, pus, rev) =>
      val n = c.getOrElse(u, Array.empty[Long])
        .count(cus => cus <= pus && pus - cus <= 7L * 86400L * 1000000L)
      if (n > 0) BigInt(rev) * 1000000 else BigInt(0)
    }.sum
    val got = q("q_attribution_multi").collect()
    val gotTotal = got.map(r => BigInt(r.getLong(3))).sum
    assert(gotTotal == expectedTotal,
      s"credit total $gotTotal != attributed revenue $expectedTotal")
    assert(got.forall(_.getLong(1) >= 1))
  }

  test("q_cusum_shift matches an exact BigInt Page recursion") {
    val daily = evFixture.map(_._2 / 86400)
      .groupBy(identity).map { case (d, v) => d -> BigInt(v.size) }
      .toSeq.sortBy(_._1)
    val te = daily.map(_._2).sum
    val td = BigInt(daily.length)
    var cur = BigInt(0); var mx = BigInt(0); var mxDay = -1L
    daily.foreach { case (day, n) =>
      cur = (cur + td * n - te).max(BigInt(0))
      if (cur > mx) { mx = cur; mxDay = day }
    }
    val row = q("q_cusum_shift").collect().head
    assert(row.getLong(0) == mxDay)
    assert(row.getLong(1) == mx.toLong)
    assert(math.abs(row.getDouble(2) - mx.toDouble / td.toDouble) < 1e-6)
  }

  // ---- round-14 batch 2: rank-sum test, edit-distance join, mode ----

  test("q_mann_whitney matches an exact tied-rank driver recompute") {
    val xs = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = xs.map(_._2).sorted
    // doubled average rank per value (2·avgrank = sum of the tied
    // consecutive ranks ×2 / m — always an integer)
    val rank2 = all.zipWithIndex.groupBy(_._1).map { case (v, ps) =>
      v -> BigInt(ps.map(_._2 + 1).map(_.toLong).sum) * 2 / ps.length
    }
    val r1x2 = xs.filter(_._1 == "A").map { case (_, v) => rank2(v) }.sum
    val n1 = BigInt(xs.count(_._1 == "A"))
    val n2 = BigInt(xs.count(_._1 == "R"))
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val tTies = all.groupBy(identity).values
      .map(g => BigInt(g.length).pow(3) - BigInt(g.length)).sum
    val row = q("q_mann_whitney").collect().head
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(BigInt(row.getLong(2)) == u1x2)
    assert(BigInt(row.getLong(3)) == tTies)
    val du1 = u1x2.toDouble / 2.0
    val mu = (n1.toDouble * n2.toDouble) / 2.0
    val nd = (n1 + n2).toDouble
    val vr = ((n1.toDouble * n2.toDouble) / 12.0) *
      ((nd + 1.0) - tTies.toDouble / (nd * (nd - 1.0)))
    val z = math.floor((du1 - mu) / math.sqrt(vr) * 1e6 + 0.5) / 1e6
    assert(row.getDouble(4) == z)
  }

  test("q_fuzzy_edit distances match a driver Levenshtein DP") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val rows = q("q_fuzzy_edit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, d0) =>
      assert(a < b)
      assert(d0 == lev(a, b).toLong && d0 >= 1 && d0 <= 3,
        s"($a,$b) dist $d0 != ${lev(a, b)}")
    }
    // blocked pairs share a last token
    rows.foreach { case (a, b, _) =>
      assert(a.split(" ").last == b.split(" ").last)
    }
  }

  test("q_pca_power matches a driver power iteration on driver moments") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_quantity").cast("long"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .collect().map(r => Array(r.getLong(0),
        math.round(r.getDouble(1) * 100), math.round(r.getDouble(2) * 100),
        math.round(r.getDouble(3) * 100)))
    val n = BigInt(li.length)
    val s4 = (0 until 4).map(i => li.map(r => BigInt(r(i))).sum)
    val sp = Array.tabulate(4, 4)((i, j) =>
      li.map(r => BigInt(r(i)) * BigInt(r(j))).sum)
    def mom(i: Int, j: Int) = (n * sp(i)(j) - s4(i) * s4(j)).toDouble
    def c(i: Int, j: Int) =
      if (i == j) 1.0 else mom(i, j) / math.sqrt(mom(i, i) * mom(j, j))
    var v = Array.fill(4)(0.5); var lam = 0.0
    for (_ <- 1 to 10) {
      val w = Array.tabulate(4)(i =>
        (0 until 4).map(j => c(i, j) * v(j)).reduceLeft(_ + _))
      val nrm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
      v = w.map(_ / nrm); lam = nrm
    }
    def d6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val row = q("q_pca_power").collect().head
    assert(row.getLong(0) == li.length.toLong)
    (0 until 4).foreach { i =>
      assert(row.getDouble(1 + i) == d6(v(i)),
        s"loading $i: ${row.getDouble(1 + i)} != ${d6(v(i))}")
    }
    assert(row.getDouble(5) == d6(lam))
    // the dominant eigenvalue of a 4x4 correlation matrix is in [1, 4]
    assert(lam >= 1.0 && lam <= 4.0)
  }

  test("q_fano_burstiness matches exact BigInt variance/mean ratios") {
    val daily = evFixture.groupBy(e => (e._4, e._2 / 86400)).toSeq
      .map { case ((ty, _), es) => (ty, es.size.toLong) }
      .groupBy(_._1).map { case (ty, xs) => ty -> xs.map(_._2) }
    def r6(num: BigInt, den: BigInt): Double = {
      val n6 = num * 1000000
      ((n6 / den + (if ((n6 % den) * 2 >= den) 1 else 0)).toDouble) / 1e6
    }
    val rows = q("q_fano_burstiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = daily(r.getString(0))
      val td = BigInt(xs.size); val sx = xs.map(BigInt(_)).sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      assert(r.getLong(1) == td.toLong && r.getLong(2) == sx.toLong)
      assert(r.getDouble(3) == r6(sx, td))
      assert(r.getDouble(4) == r6(td * sxx - sx * sx, (td - 1) * sx))
    }
  }

  test("q_audience_overlap: inter/union recomputed from user-week sets") {
    val uw = evFixture.map(e => (e._1, e._2 / 604800)).distinct
      .groupBy(_._2).map { case (w, xs) => w -> xs.map(_._1).toSet }
    val rows = q("q_audience_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, nW, nN, inter) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (a, b) = (uw(w), uw(w + 1))
      assert(nW == a.size.toLong && nN == b.size.toLong)
      assert(inter == (a & b).size.toLong)
      val j = r.getDouble(4)
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - inter.toDouble / (a | b).size) < 1e-6)
    }
    assert(rows.length == uw.keys.toSeq.sorted.sliding(2)
      .count(p => p.length == 2 && p(1) == p(0) + 1))
  }

  test("q_lorenz_knee matches a driver argmax and withRankAndRunningTotal " +
    "aligns with the two-pass primitives") {
    val rev = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).toSeq.map { case (c, xs) => (c, xs.map(_._2).sum) }
    val sorted = rev.sortBy { case (c, v) => (-v, c) }
    val n = BigInt(sorted.length)
    val s0 = sorted.map(x => BigInt(x._2)).sum
    var cum = BigInt(0); var bestM = BigInt(Long.MinValue); var bk = 0L
    var bcum = BigInt(0)
    sorted.zipWithIndex.foreach { case ((_, v), i) =>
      cum += v
      val m = cum * n - BigInt(i + 1) * s0
      if (m > bestM) { bestM = m; bk = i + 1; bcum = cum }
    }
    val row = q("q_lorenz_knee").collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == s0.toLong)
    assert(row.getLong(2) == bk, s"knee ${row.getLong(2)} != $bk")
    assert(row.getLong(3) == bcum.toLong)
    // the combined one-pass primitive equals the two independent passes
    val base = Tables.load(spark, sf, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("w"))
    val (both, nb, tw) = graft.operators.Rank.withRankAndRunningTotal(
      base, "k", "cum", "w", col("w").desc, col("o_custkey"))
    val (ranked, nr) = graft.operators.Rank.withGlobalRank(
      base, "k", col("w").desc, col("o_custkey"))
    val (run, tw2) = graft.operators.Rank.withRunningTotal(
      base, "cum", "w", col("w").desc, col("o_custkey"))
    assert(nb == nr && tw == tw2)
    val gotBoth = both.select(col("o_custkey"), col("k"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotK = ranked.select(col("o_custkey"), col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val gotC = run.select(col("o_custkey"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotBoth == gotBoth.map { case (c, _, _) =>
      (c, gotK(c), gotC(c)) })
  }

  test("q_degree_assortativity matches a driver Pearson over degrees") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val capped = li.groupBy(_._1).toSeq.flatMap { case (o, xs) =>
      xs.map(_._2).distinct.sorted.take(20).map((o, _)) }
    val pairCnt = capped.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val sym = pairCnt.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val xy = sym.map { case (a, b) => (deg(a), deg(b)) }
    val nE = BigInt(xy.size)
    val sx = xy.map(p => BigInt(p._1)).sum
    val sy = xy.map(p => BigInt(p._2)).sum
    val sxy = xy.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = xy.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val syy = xy.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val r = (nE * sxy - sx * sy).toDouble /
      math.sqrt((nE * sxx - sx * sx).toDouble * (nE * syy - sy * sy).toDouble)
    val row = q("q_degree_assortativity").collect().head
    assert(row.getLong(0) == nE.toLong)
    assert(row.getDouble(1) == math.floor(r * 1e6 + 0.5) / 1e6)
  }

  test("q_ship_latency: exact order statistics on the gap grid") {
    val rows = q("q_ship_latency").collect()
    assert(rows.length == 5)
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val gaps = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"),
        floor(unix_timestamp(col("l_shipdate")) / 86400).cast("long"))
      .collect().map { r =>
        val (p, od) = o(r.getLong(0)); (p, r.getLong(1) - od) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sorted }
    rows.foreach { r =>
      val g = gaps(r.getString(0))
      val n = g.length
      assert(r.getLong(1) == n.toLong)
      def ordStat(num: Int, den: Int): Long =
        g((num * n + den - 1) / den - 1) // smallest gap with cum*den >= num*n
      assert(r.getLong(3) == ordStat(1, 2), s"${r.getString(0)} p50")
      assert(r.getLong(4) == ordStat(9, 10), s"${r.getString(0)} p90")
      assert(r.getLong(5) == g.max)
      assert(math.abs(r.getDouble(2) - g.sum.toDouble / n) < 1e-6)
    }
  }

  test("q_cramers_v: V consistent with chi2_r and bounded in [0,1]") {
    val chi = q("q_chi2_independence").collect().head
    val row = q("q_cramers_v").collect().head
    assert(row.getDouble(0) == chi.getDouble(0)) // same chi2_r
    val (n, nr, nc) = (row.getLong(1), row.getLong(2), row.getLong(3))
    val v = row.getDouble(4)
    assert(v >= 0.0 && v <= 1.0)
    // recompute from the rounded chi2 — agreement within rounding slack
    val vApprox = math.sqrt(chi.getDouble(0) / (n * (math.min(nr, nc) - 1)))
    assert(math.abs(v - vApprox) < 1e-4)
  }

  test("q_ols_grouped matches exact BigInt per-brand regression") {
    val part = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val xs = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long"),
        col("l_extendedprice")).collect()
      .map(r => (part(r.getLong(0)), BigInt(r.getLong(1)),
        BigInt(math.round(r.getDouble(2) * 100))))
      .groupBy(_._1)
    def sr6(num: BigInt, den: BigInt): Double = {
      val (s0, n0, d0) =
        (if (num < 0) -1.0 else 1.0, num.abs * 1000000, den)
      s0 * ((n0 / d0 + (if ((n0 % d0) * 2 >= d0) 1 else 0)).toDouble / 1e6)
    }
    q("q_ols_grouped").collect().foreach { r =>
      val g = xs(r.getString(0))
      val n = BigInt(g.size)
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val sxxc = n * sxx - sx * sx; val sxyc = n * sxy - sx * sy
      assert(r.getLong(1) == g.size.toLong)
      assert(r.getDouble(2) == sr6(sxyc, sxxc), s"${r.getString(0)} slope")
      assert(r.getDouble(3) == sr6(sy * sxxc - sxyc * sx, n * sxxc),
        s"${r.getString(0)} intercept")
    }
  }

  test("q_hhi matches exact BigInt share-squared sums; bounds hold") {
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rev = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), BigInt(math.round(r.getDouble(1) * 100))))
      .groupBy(_._1).map { case (c, v) => (c, v.map(_._2).sum) }
    val byNation = rev.toSeq.groupBy { case (c, _) => cust(c) }
    def r6(num: BigInt, den: BigInt): Double =
      (num * 1000000 / den +
        (if ((num * 1000000 % den) * 2 >= den) 1 else 0)).toDouble / 1e6
    q("q_hhi").collect().foreach { r =>
      val g = byNation(r.getLong(0)).map(_._2)
      val tot = g.sum; val sq = g.map(x => x * x).sum
      assert(r.getLong(1) == g.size.toLong)
      assert(r.getLong(2) == tot.toLong)
      val hhi = r.getDouble(3)
      assert(hhi == r6(sq, tot * tot))
      // 1/n <= HHI <= 1
      assert(hhi <= 1.0 && hhi >= 1.0 / g.size - 1e-6)
    }
  }

  test("q_markov_steady matches a driver chain iteration; pi sums to ~1") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pairs = evFixture.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.zip(ordered.tail)
    }
    val idx = types.zipWithIndex.toMap
    val c = Array.fill(5, 5)(0L); val r = Array.fill(5)(0L)
    pairs.foreach { case (a, b) => c(idx(a))(idx(b)) += 1; r(idx(a)) += 1 }
    def p(i: Int, j: Int): Double =
      if (r(i) > 0) c(i)(j).toDouble / r(i)
      else if (i == j) 1.0 else 0.0
    var pi = Array.fill(5)(0.2)
    for (_ <- 1 to 15)
      pi = Array.tabulate(5)(j =>
        (0 until 5).map(i => pi(i) * p(i, j)).reduceLeft(_ + _))
    def d6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val row = q("q_markov_steady").collect().head
    assert(row.getLong(0) == pairs.size.toLong)
    (0 until 5).foreach { j =>
      assert(row.getDouble(1 + j) == d6(pi(j)), s"pi ${types(j)}")
    }
    assert(math.abs(pi.sum - 1.0) < 1e-9, "stochastic iteration preserved mass")
  }

  test("q_holt_winters matches a driver zero-state triple-smoothing fold") {
    val daily = evFixture.map(_._2 / 86400)
      .groupBy(identity).toSeq.map { case (day, v) => (day, v.size.toDouble) }
      .sortBy(_._1)
    var l = 0.0; var b = 0.0; var s = Array.fill(7)(0.0)
    daily.foreach { case (_, y) =>
      val lNew = 0.5 * (y - s(0)) + 0.5 * (l + b)
      val bNew = 0.5 * ((0.5 * (y - s(0)) + 0.5 * (l + b)) - l) + 0.5 * b
      val sNew = 0.25 * (y - (0.5 * (y - s(0)) + 0.5 * (l + b))) + 0.75 * s(0)
      s = s.drop(1) :+ sNew; l = lNew; b = bNew
    }
    def d6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val row = q("q_holt_winters").collect().head
    assert(row.getLong(0) == daily.size.toLong)
    assert(row.getDouble(1) == d6(l))
    assert(row.getDouble(2) == d6(b))
    assert(row.getDouble(3) == d6(l + b + s(0)))
  }

  test("q_blocking_quality: count identities + q_fuzzy_jw cross-check") {
    val row = q("q_blocking_quality").collect().head
    val (nNames, nAll, nCand) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    val (nTrue, nFound) = (row.getLong(4), row.getLong(5))
    assert(nAll == nNames * (nNames - 1) / 2)
    assert(nCand <= nAll && nFound <= nCand && nFound <= nTrue)
    def r6(num: Long, den: Long): Double = {
      val n6 = BigInt(num) * 1000000
      (n6 / den + (if ((n6 % den) * 2 >= den) 1 else 0)).toDouble / 1e6
    }
    assert(row.getDouble(3) == r6(nAll - nCand, nAll))
    assert(row.getDouble(6) ==
      (if (nTrue > 0) r6(nFound, nTrue) else 1.0))
    // found = the pair set q_fuzzy_jw reports (shared relation)
    assert(nFound == q("q_fuzzy_jw").count())
  }

  test("q_churn_hazard matches a driver lifetime census; risk telescopes") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ten = o.groupBy(_._1).toSeq.map { case (_, xs) =>
      val ds = xs.map(_._2); (ds.max - ds.min) / 30 }
    val byT = ten.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val total = ten.size.toLong
    var atRisk = total
    val rows = q("q_churn_hazard").collect()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.sortBy(_.getLong(0)).foreach { r =>
      val t = r.getLong(0)
      assert(r.getLong(2) == byT(t))
      // at_risk telescopes: total minus everyone who churned earlier
      val expRisk = total - byT.filter(_._1 < t).values.sum
      assert(r.getLong(1) == expRisk, s"tenure $t risk")
      val h = r.getDouble(3)
      assert(h > 0.0 && h <= 1.0)
      atRisk = expRisk
    }
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q_modularity: identities hold and the label partition is LPA's") {
    val row = q("q_modularity").collect().head
    val (nc, m, eIntra) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val qr = row.getDouble(3)
    // communities match the census; intra edges can't exceed m
    assert(nc == q("q_lpa_communities").count())
    assert(eIntra >= 0 && eIntra <= m)
    assert(qr > -1.0 && qr < 1.0, s"modularity out of range: $qr")
    // LPA groups similar nodes: intra share should beat the random
    // expectation, i.e. Q > 0 on the co-purchase fixture
    assert(qr > 0.0, s"LPA partition scored non-positive Q: $qr")
  }

  test("q_seasonal_decompose: seasonal components from an exact driver fold") {
    val daily = evFixture.map(_._2 / 86400)
      .groupBy(identity).map { case (d0, v) => d0 -> v.size.toLong }
    val (lo, hi) = (daily.keys.min, daily.keys.max)
    val spine = (lo to hi).map(d0 => (d0, daily.getOrElse(d0, 0L)))
    val rows = q("q_seasonal_decompose").collect()
    def sr6(num: BigInt, den: BigInt): Double = {
      val s0 = if (num < 0) -1.0 else 1.0
      val n6 = num.abs * 1000000
      s0 * (n6 / den + (if ((n6 % den) * 2 >= den) 1 else 0)).toDouble / 1e6
    }
    val d7 = spine.indices.drop(3).dropRight(3).map { i =>
      val t7 = (i - 3 to i + 3).map(j => spine(j)._2).sum
      (((spine(i)._1 % 7) + 7) % 7, spine(i)._2 * 7 - t7)
    }
    val expect = d7.groupBy(_._1).map { case (dow, xs) =>
      dow -> ((xs.size.toLong,
        sr6(xs.map(x => BigInt(x._2)).sum, BigInt(xs.size) * 7)))
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s0) = expect(r.getLong(0))
      assert(r.getLong(1) == n && r.getDouble(2) == s0, s"dow ${r.getLong(0)}")
    }
    // additive identity: the seasonal components of a full week of
    // day-slots sum to ~0 (means of detrended units over the same spine)
    val total = d7.map(x => BigInt(x._2)).sum
    assert((total.abs: BigInt) <= BigInt(7) * d7.size,
      "detrended units should center near zero")
  }

  test("q_markov_attribution matches a driver absorbing-chain solve") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val na = types.filterNot(_ == "purchase")
    val journeys = evFixture.groupBy(_._1).toSeq.map { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4)
    }
    val idx = types.zipWithIndex.toMap
    val c = Array.fill(4, 5)(0L); val den = Array.fill(4)(0L)
    val sCnt = Array.fill(5)(0L)
    val naIdx = na.zipWithIndex.toMap
    journeys.foreach { j =>
      sCnt(idx(j.head)) += 1
      j.zipWithIndex.foreach { case (t0, i) =>
        if (t0 != "purchase") {
          den(naIdx(t0)) += 1
          if (i + 1 < j.length) c(naIdx(t0))(idx(j(i + 1))) += 1
        }
      }
    }
    def absorb(removed: Option[String]): Array[Double] = {
      // a_removed ≡ 0: the removed node IS the null state (Anderl et
      // al.) — its first-touch mass and outgoing transitions earn
      // nothing, not just transitions into it (r14 ADVICE fix)
      var a = Array.fill(4)(0.0)
      for (_ <- 1 to 30) {
        a = Array.tabulate(4) { i =>
          if (removed.contains(na(i)) || den(i) == 0) 0.0
          else {
            var num = c(i)(idx("purchase")).toDouble
            na.filterNot(removed.contains).foreach { j =>
              num = num + c(i)(idx(j)).toDouble * a(naIdx(j))
            }
            num / den(i)
          }
        }
      }
      a
    }
    val nUsers = journeys.size
    def conv(a: Array[Double]): Double =
      types.map { t0 =>
        val av = if (t0 == "purchase") 1.0 else a(naIdx(t0))
        sCnt(idx(t0)).toDouble / nUsers * av
      }.reduceLeft(_ + _)
    def d6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val cBase = conv(absorb(None))
    val rows = q("q_markov_attribution").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val k = r.getString(0)
      val cK = conv(absorb(Some(k)))
      assert(r.getDouble(1) == d6(cBase), s"$k base")
      assert(r.getDouble(2) == d6(cK), s"$k removed")
      assert(r.getDouble(3) == d6((cBase - cK) / cBase), s"$k effect")
      // removing a channel can only lose conversion mass
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("q_js_divergence: bounded, symmetric-by-construction, near-exact") {
    val row = q("q_js_divergence").collect().head
    val js = row.getDouble(1)
    // JS divergence in nats is bounded by ln 2
    assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"js out of range: $js")
    val docs = Tables.documents(spark, sf)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 100))
    val buckets = docs.map(_._2).distinct.sorted
    assert(row.getLong(0) == buckets.length.toLong)
    val n0 = docs.count(_._1 == "src0").toDouble
    val n1 = docs.count(_._1 == "src1").toDouble
    // fold in sorted bucket order, mirroring the engine's sorted fold
    val expect = buckets.foldLeft(0.0) { (acc, b) =>
      val p = docs.count(d0 => d0._1 == "src0" && d0._2 == b) / n0
      val q0 = docs.count(d0 => d0._1 == "src1" && d0._2 == b) / n1
      val m = (p + q0) / 2.0
      acc + ((if (p > 0) 0.5 * (p * math.log(p / m)) else 0.0) +
        (if (q0 > 0) 0.5 * (q0 * math.log(q0 / m)) else 0.0))
    }
    assert(js == math.floor(expect * 1e6 + 0.5) / 1e6)
  }

  test("q_sample_reservoir: exact-k per group, keys match direct mix64Eval") {
    val rows = q("q_sample_reservoir").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._1)
    val srcSizes = Tables.documents(spark, sf).groupBy(col("source"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, xs) =>
      assert(xs.length == math.min(10L, srcSizes(src)).toInt)
      assert(xs.map(_._2).sorted.toSeq == (1L to xs.length).toSeq)
      // ranks follow (zs, doc_id) order
      val sorted = xs.sortBy(_._2)
      assert(sorted.map(x => (x._4, x._3)).toSeq ==
        sorted.map(x => (x._4, x._3)).sortBy(identity).toSeq)
    }
    // every emitted key equals the direct driver hash of the doc id
    rows.foreach { case (_, _, docId, zs) =>
      assert(zs == graft.functions.TextHashFunctions
        .mix64Eval(docId, 0L, 0L, 99))
    }
    // the winners are the true per-source minima
    val all = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0),
        graft.functions.TextHashFunctions.mix64Eval(r.getLong(1), 0L, 0L, 99),
        r.getLong(1)))
    all.groupBy(_._1).foreach { case (src, xs) =>
      val want = xs.map(x => (x._2, x._3)).sorted.take(10).toSeq
      val got = bySrc(src).sortBy(_._2).map(x => (x._4, x._3)).toSeq
      assert(got == want, s"$src winners differ")
    }
  }

  test("q_share_of_parent: shares telescope exactly") {
    val rows = q("q_share_of_parent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._2).distinct.length == 25)
    rows.groupBy(_._1).foreach { case (region, xs) =>
      // within-region shares sum to ~1 (each share rounds at 1e-6)
      val s0 = xs.map(_._4).sum
      assert(math.abs(s0 - 1.0) < 1e-4, s"$region shares sum $s0")
      // one region share repeated on every member row
      assert(xs.map(_._5).distinct.length == 1)
    }
    val regShares = rows.groupBy(_._1).map(_._2.head._5)
    assert(math.abs(regShares.sum - 1.0) < 1e-4)
  }

  test("q_rank_movers: rank permutation integrity and delta arithmetic") {
    val rows = q("q_rank_movers").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // ranks are positive and distinct within each week's leaderboard
    // (the joined subset need not be contiguous — a brand may sell in
    // only one of the two weeks)
    assert(rows.map(_._3).distinct.length == rows.length)
    assert(rows.map(_._4).distinct.length == rows.length)
    assert(rows.forall(r => r._3 >= 1 && r._4 >= 1))
    rows.foreach { case (_, _, rc, rp, d0) => assert(d0 == rp - rc) }
    // sorted by |delta| desc
    val ds = rows.map(x => math.abs(x._5))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
  }

  test("q_peaks: every reported day is a verified local peak") {
    val daily = Tables.load(spark, sf, "orders")
      .select(floor(unix_timestamp(col("o_orderdate")) / 86400)
        .cast("long"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (d0, xs) => d0 -> xs.map(_._2).sum }
    val (lo, hi) = (daily.keys.min, daily.keys.max)
    def xAt(d0: Long) = daily.getOrElse(d0, 0L)
    val expect = ((lo + 7) to (hi - 1)).filter { d0 =>
      val s7 = (d0 - 7 to d0 - 1).map(xAt).sum
      xAt(d0) > xAt(d0 - 1) && xAt(d0) > xAt(d0 + 1) &&
        xAt(d0) * 28 > s7 * 5
    }
    val got = q("q_peaks").collect().map(_.getLong(0)).toSeq
    assert(got == expect, s"got ${got.length} peaks, want ${expect.length}")
  }

  test("q_lsh_recall: verified-LSH pairs are a subset of the exact set") {
    val row = q("q_lsh_recall").collect().head
    val (nE, nL, nH, nM) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // LSH verifies candidates exactly, so lsh ⊆ exact: hits = |lsh|
    assert(nH == nL, s"an LSH-verified pair is missing from exact: $row")
    assert(nM == nE - nH)
    val r = row.getDouble(4)
    assert(r >= 0.0 && r <= 1.0)
    assert(nE > 0, "fixture must contain near-dup pairs")
  }

  test("q_venn3: inclusion-exclusion identity holds exactly") {
    val r = q("q_venn3").collect().head
    val Seq(a, b, c, ab, ac, bc, abc, union) =
      (0 to 7).map(r.getLong)
    assert(union == a + b + c - ab - ac - bc + abc)
    assert(abc <= Seq(ab, ac, bc).min)
    assert(Seq(ab, ac, bc).max <= Seq(a, b, c).max)
    assert(union <= a + b + c)
  }

  test("q_rolling_band: band from a driver trailing-window recompute") {
    val daily = Tables.load(spark, sf, "orders")
      .select(floor(unix_timestamp(col("o_orderdate")) / 86400)
        .cast("long"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (d0, xs) => d0 -> xs.map(_._2).sum }
    val series = daily.toSeq.sortBy(_._1)
    val expect = series.indices.drop(28).map { i =>
      val win = series.slice(i - 28, i).map(_._2).sorted
      val p10 = win((28 * 1 + 9) / 10 - 1)
      val p90 = win((28 * 9 + 9) / 10 - 1)
      val x = series(i)._2
      (series(i)._1, x, p10, p90,
        if (x < p10) 1L else 0L, if (x > p90) 1L else 0L)
    }
    val rows = q("q_rolling_band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.toSeq == expect,
      s"first diff: ${rows.zip(expect).find(p => p._1 != p._2)}")
  }

  test("q_group_mode picks the max-count, smallest-value nation") {
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_mktsegment"), col("c_nationkey")).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
    val expect = cust.groupBy(_._1).map { case (seg, xs) =>
      val counts = xs.groupBy(_._2).map { case (n0, g) => (n0, g.size.toLong) }
      val (mn, mc) = counts.toSeq.sortBy { case (n0, c0) => (-c0, n0) }.head
      seg -> ((seg, mn, mc, xs.size.toLong))
    }
    q("q_group_mode").collect().foreach { r =>
      val (seg, mn, mc, tot) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(expect(seg) == ((seg, mn, mc, tot)))
    }
  }
}
