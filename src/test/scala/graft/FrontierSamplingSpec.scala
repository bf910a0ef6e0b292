package graft

import graft.operators.Pareto
import org.apache.spark.sql.functions._

/** Round-11 late families: the distributed skyline (Pareto.skyline2d —
  * planted frontiers, a randomized brute-force cross-check, and the
  * bucket-boundary edges the local-prune + bounded-merge plan has to get
  * right), sorted-neighborhood candidate generation (the O(n·w) bound and
  * the exact rank-distance contract), bounded-pool negative sampling
  * (disjointness from observed pairs, the per-user k bound, pool
  * membership), and the temporal split (partition + cold-start algebra).
  */
class FrontierSamplingSpec extends SparkTestBase {

  import spark.implicits._

  test("skyline2d: planted frontier — only non-dominated (x, max-y) points survive") {
    // x minimized, y maximized. (10,5) dominates (20,4) and (30,5);
    // (25,9) dominates (30,5) too; duplicate x keeps only its max y.
    val pts = Seq((10L, 5L), (10L, 2L), (20L, 4L), (25L, 9L), (30L, 5L), (40L, 11L))
      .toDF("x", "y")
    val out = Pareto.skyline2d(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((10L, 5L), (25L, 9L), (40L, 11L)))
  }

  test("skyline2d: randomized brute-force cross-check (strictly increasing y over ascending x)") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val collapsed = pts.groupBy(_._1).map { case (x, xs) => (x, xs.map(_._2).max) }
    val brute = collapsed.toSeq.sortBy(_._1)
      .foldLeft(Vector.empty[(Long, Long)]) { (acc, p) =>
        if (acc.isEmpty || p._2 > acc.last._2) acc :+ p else acc
      }
    // few distinct x values → many bucket collisions AND empty buckets:
    // exercises both the in-bucket prefix max and the cross-bucket merge
    val out = Pareto.skyline2d(pts.toDF("x", "y"), "x", "y", buckets = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(out == brute)
  }

  test("skyline2d: single point, all-dominated tail, and empty input") {
    val one = Pareto.skyline2d(Seq((5L, 5L)).toDF("x", "y"), "x", "y").collect()
    assert(one.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 5L)))
    // a first point that dominates everything after it
    val dom = Pareto.skyline2d(
      Seq((1L, 100L), (2L, 99L), (3L, 1L)).toDF("x", "y"), "x", "y").collect()
    assert(dom.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 100L)))
    val empty = Pareto.skyline2d(
      Seq.empty[(Long, Long)].toDF("x", "y"), "x", "y")
    assert(empty.count() == 0L)
  }

  test("q_fuzzy_snm: candidates are EXACTLY the rank-distance<=4 in-block pairs — O(n·w) bound") {
    // the query's candidate relation is lead(1..4) over the block-sorted
    // order; rebuild it independently and bound the candidate count
    val names = SparkEntry.queries("q_fuzzy_snm")(spark, sf)
    names.collect() // smoke: runs green on the fixture
    val n = Tables.load(spark, sf, "part").select(col("p_name")).distinct()
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
      .collect().map(r => (r.getString(1), r.getString(0)))
    val expectPairs = n.groupBy(_._1).toSeq.flatMap { case (b, xs) =>
      val sorted = xs.map(_._2).sorted
      sorted.zipWithIndex.flatMap { case (a, i) =>
        sorted.slice(i + 1, i + 5).map(bb => (b, a, bb)) }.toSeq
    }.toSet
    assert(expectPairs.size <= n.length * 4, "candidate bound O(n*(w-1))")
    // the survivors the query returns are a subset of those candidates
    val got = names.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got.subsetOf(expectPairs), "every scored pair is an SNM candidate")
  }

  test("q_negative_sample: disjoint from observed, <=3 per user, pool-only items, deterministic") {
    val out = SparkEntry.queries("q_negative_sample")(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val obs = Tables.ratings(spark, sf)
      .select(col("userId"), col("movieId")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.nonEmpty)
    assert(rows.forall { case (u, i, _) => !obs.contains((u, i)) },
      "a sampled negative must never be an observed interaction")
    val perUser = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perUser.values.forall(_ <= 3), "at most k=3 negatives per user")
    val pool = obs.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (i, c) => (-c, i) }.take(50).map(_._1).toSet
    assert(rows.forall { case (_, i, _) => pool.contains(i) },
      "negatives come only from the bounded top-50 popularity pool")
    val again = SparkEntry.queries("q_negative_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq, "pure-arithmetic pick is deterministic")
  }

  test("q_split_temporal: counts partition the interactions; cold = first-seen after cutoff") {
    val out = SparkEntry.queries("q_split_temporal")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val r = Tables.ratings(spark, sf)
    val total = r.count()
    assert(out("train")._1 + out("test")._1 == total, "split partitions the rows")
    assert(out("train")._4 == 0L && out("train")._5 == 0L,
      "train rows carry no cold-start counts")
    val firstSeen = r.groupBy(col("userId")).agg(min(col("ts")).as("f"))
      .filter(col("f") >= lit("1999-01-01").cast("timestamp")).count()
    assert(out("test")._4 == firstSeen,
      "cold users = users whose FIRST interaction is at/after the cutoff")
  }

  test("q_er_clusters: every matched pair shares a cluster; clusters are >=2 and rep is the min member") {
    val pairs = SparkEntry.queries("q_fuzzy_jw")(spark, sf)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val clusters = SparkEntry.queries("q_er_clusters")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // rebuild the member->comp map via union-find over the pairs
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.Ordering[String].max(ra, rb)) = math.Ordering[String].min(ra, rb)
    }
    val members = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val expect = members.groupBy(find).map { case (c, ms) =>
      (c, ms.length.toLong, ms.max) }.toSet
    assert(clusters.toSet == expect,
      "clusters must equal the union-find closure of the matched pairs")
    assert(clusters.forall(_._2 >= 2), "only matched (non-singleton) clusters")
    clusters.foreach { case (g, _, last) => assert(g <= last) }
  }

  test("q_winsorize: rows tile the table, ~1% clipped per tail, mean inside the bounds") {
    val rows = SparkEntry.queries("q_winsorize")(spark, sf).collect()
    val total = Tables.load(spark, sf, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total, "groups tile the table")
    rows.foreach { r =>
      val (n, nLo, nHi) = (r.getAs[Long]("n"),
        r.getAs[Long]("n_lo"), r.getAs[Long]("n_hi"))
      val (lo, hi) = (r.getAs[Long]("lo_c"), r.getAs[Long]("hi_c"))
      assert(lo < hi, "p01 bound below p99 bound")
      // each tail clips ~1% (integer-cent bound rounding can shift the
      // cut by at most the tie mass at the boundary cent)
      assert(nLo <= n / 50 && nHi <= n / 50, s"tails too fat: $nLo/$nHi of $n")
      assert(nLo > 0 && nHi > 0, "a 1% cut of a continuous-ish column clips something")
      val mean = r.getAs[Double]("mean_w")
      assert(mean >= lo && mean <= hi, "winsorized mean inside the clip bounds")
      assert(r.getAs[Double]("iqr_r") > 0)
    }
  }
}
