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
    assert(row.getDecimal(2).longValueExact() == dNum,
      s"d_num ${row.getDecimal(2)} vs $dNum")
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
}
