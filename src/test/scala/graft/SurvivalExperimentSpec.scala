package graft

import org.apache.spark.sql.functions._

/** Independent-reference coverage for the round-14 experimentation /
  * survival / robust-smoothing tier (q_ab_test, q_kaplan_meier,
  * q_rolling_median): each test recomputes the statistic driver-side from
  * first principles (plain Scala over the collected fixture — a third
  * code path next to the engine and the DuckDB oracle) and compares
  * exactly.
  */
class SurvivalExperimentSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- q_ab_test ----

  test("q_ab_test: counts, rates, and z match a driver recompute") {
    val row = q("q_ab_test").collect().head
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val conv = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.exists(e => e._2 == "purchase" && e._3 >= 100.0))
    }
    val a = conv.filter { case (u, _) => u % 2 == 0 }
    val b = conv.filter { case (u, _) => u % 2 == 1 }
    val (na, ca) = (a.size.toLong, a.count(_._2).toLong)
    val (nb, cb) = (b.size.toLong, b.count(_._2).toLong)
    assert(row.getLong(0) == na && row.getLong(1) == ca)
    assert(row.getLong(2) == nb && row.getLong(3) == cb)
    // exact half-up integer rounding of the rates
    def r6(n: Long, d: Long): Double = {
      val n6 = n * 1000000L
      (n6 / d + (if ((n6 % d) * 2 >= d) 1 else 0)) / 1000000.0
    }
    assert(row.getDouble(4) == r6(ca, na))
    assert(row.getDouble(5) == r6(cb, nb))
    val p1 = ca.toDouble / na
    val p2 = cb.toDouble / nb
    val p = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    val z = if (se == 0.0) 0.0
      else math.floor((p1 - p2) / se * 1000000.0 + 0.5) / 1000000.0
    assert(row.getDouble(6) == z, s"z ${row.getDouble(6)} != $z")
  }

  // ---- q_kaplan_meier ----

  test("q_kaplan_meier: curve matches a driver KM recompute exactly") {
    val rows = q("q_kaplan_meier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long")
          .as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gmax = o.map(_._2).max
    val perCust = o.groupBy(_._1).toSeq.map { case (_, os) =>
      val days = os.map(_._2).sorted
      val d1 = days.head
      val gap = days.find(_ > d1).map(_ - d1)
      val fu = math.min(365L, gmax - d1)
      gap match {
        case Some(g) if g <= fu => (g, 1L)
        case _ => (fu, 0L)
      }
    }
    val n = perCust.size.toLong
    val byT = perCust.groupBy(_._1).map { case (t, xs) =>
      (t, xs.map(_._2).sum, xs.size.toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = n
    var s = 1.0
    val expect = byT.flatMap { case (t, d, m) =>
      val out = if (d > 0) {
        s = s * (1.0 - d.toDouble / atRisk)
        Some((t, atRisk, d,
          math.floor(s * 1000000.0 + 0.5) / 1000000.0))
      } else None
      atRisk -= m
      out
    }
    assert(rows.toSeq == expect,
      s"first diff: ${rows.zip(expect).find(p => p._1 != p._2)}")
    // survival is non-increasing and within (0, 1]
    val ss = rows.map(_._4)
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    assert(ss.forall(v => v > 0.0 && v <= 1.0))
  }

  // ---- q_rolling_median ----

  test("q_rolling_median: matches a driver sliding-window median") {
    val rows = q("q_rolling_median").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // daily cents recomputed from the raw orders scan, not the query
    val daily = Tables.load(spark, sf, "orders")
      .select(floor(unix_timestamp(col("o_orderdate")) / 86400)
        .cast("long").as("day"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (d0, xs) => (d0, xs.map(_._2).sum) }
    assert(rows.map(r => (r._1, r._2)).toMap == daily)
    rows.foreach { case (day, _, nWin, med) =>
      val win = (day - 6 to day).flatMap(daily.get).sorted
      assert(win.size.toLong == nWin, s"day $day window size")
      val exp =
        if (win.size % 2 == 1) win(win.size / 2).toDouble
        else (win(win.size / 2 - 1) + win(win.size / 2)).toDouble / 2.0
      assert(med == exp, s"day $day median $med != $exp")
    }
  }
}
