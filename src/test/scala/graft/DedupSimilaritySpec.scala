package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Dedup + ANN behavior: planted duplicates must be found; LSH recall
  * against the brute-force truth must clear a floor.
  */
class DedupSimilaritySpec extends SparkTestBase {

  import spark.implicits._

  test("exactDedup groups identical texts under the min id") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "unrelated text here"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(docs).collect()
    assert(out.length == 2)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L, "min doc_id kept")
  }

  test("jaccard on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).first().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"tok$i").mkString(" ") + " x y z"
    val noise = (100 to 160).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, noise)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.7, nShingle = 1,
      bands = 8, rowsPerBand = 2).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"planted pair not found: ${pairs.mkString(",")}")
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("prefixJaccardJoin equals the brute-force pair set on random near-dup corpora") {
    val rnd = new scala.util.Random(3)
    // 40 docs over a tight vocab so near-dup pairs actually occur, plus
    // planted near-identical pairs at several set sizes (the prefix-
    // length boundary cases: sz where (4·sz+4)/5 rounds both ways)
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(12 + rnd.nextInt(20))(s"w${rnd.nextInt(25)}").mkString(" "))
    }
    val planted = Seq(
      (100L, (1 to 20).map(i => s"p$i").mkString(" ")),
      (101L, (1 to 19).map(i => s"p$i").mkString(" ") + " q1"),
      (102L, (1 to 5).map(i => s"r$i").mkString(" ")),
      (103L, (1 to 5).map(i => s"r$i").mkString(" ")))
    val docs = (base ++ planted).toDF("doc_id", "text")
    val got = Dedup.prefixJaccardJoin(docs, tn = 4, td = 5, nShingle = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent brute force over the same unigram sets
    val sets = (base ++ planted).map { case (id, tx) =>
      id -> tx.split("\\s+").filter(_.nonEmpty).toSet }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib && sa.nonEmpty
      inter = (sa & sb).size; uni = (sa | sb).size
      if uni > 0 && 5 * inter >= 4 * uni
    } yield (ia, ib)).toSet
    assert(got == want, s"got=$got want=$want")
    assert(want.contains((102L, 103L)) && want.contains((100L, 101L)),
      "planted pairs must be in the ground truth")
  }

  test("prefixContainmentJoin equals brute force over ordered pairs") {
    val rnd = new scala.util.Random(7)
    // random docs over a tight vocab + planted sub-document pairs:
    // 110 is strictly contained in 111 (C(110→111)=1, C(111→110)<1),
    // 112/113 near-containment at the ceil boundary (9 of 10 tokens)
    val base = (0 until 40).map { i =>
      (i.toLong,
        Seq.fill(10 + rnd.nextInt(15))(s"w${rnd.nextInt(22)}").mkString(" "))
    }
    val planted = Seq(
      (110L, (1 to 8).map(i => s"s$i").mkString(" ")),
      (111L, (1 to 8).map(i => s"s$i").mkString(" ") + " t1 t2 t3"),
      (112L, (1 to 10).map(i => s"u$i").mkString(" ")),
      (113L, (1 to 9).map(i => s"u$i").mkString(" ") + " v1"))
    val docs = (base ++ planted).toDF("doc_id", "text")
    val got = Dedup.prefixContainmentJoin(docs, tn = 9, td = 10,
        nShingle = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = (base ++ planted).map { case (id, tx) =>
      id -> tx.split("\\s+").filter(_.nonEmpty).toSet }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia != ib && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if 10 * inter >= 9 * sa.size
    } yield (ia, ib)).toSet
    assert(got == want, s"got=$got want=$want")
    assert(want.contains((110L, 111L)), "planted containment missing")
    assert(!want.contains((111L, 110L)),
      "containment must be directional: the long doc is not contained")
    assert(want.contains((113L, 112L)), "boundary 9/10 containment missing")
  }

  test("prefixJaccardProbe equals brute force over batch × corpus only") {
    val rnd = new scala.util.Random(5)
    val corpus = (0 until 30).map(i =>
      (i.toLong, Seq.fill(10 + rnd.nextInt(15))(s"w${rnd.nextInt(18)}").mkString(" ")))
    val batch = (100 until 110).map(i =>
      (i.toLong, Seq.fill(10 + rnd.nextInt(15))(s"w${rnd.nextInt(18)}").mkString(" "))) :+
      (200L, corpus.head._2) // planted exact dup of corpus doc 0
    val got = Dedup.prefixJaccardProbe(corpus.toDF("doc_id", "text"),
        batch.toDF("doc_id", "text"), tn = 4, td = 5, nShingle = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cs = corpus.map { case (id, tx) => id -> tx.split(" ").toSet }
    val bs = batch.map { case (id, tx) => id -> tx.split(" ").toSet }
    val want = (for {
      (ib, sb) <- bs; (ic, sc) <- cs
      inter = (sb & sc).size; uni = (sb | sc).size
      if uni > 0 && 5 * inter >= 4 * uni
    } yield (ib, ic)).toSet
    assert(got == want, s"got=$got want=$want")
    assert(want.contains((200L, 0L)), "planted dup must be ground truth")
  }

  test("prefixJaccardFunnel: monotone funnel, verified equals the exact join") {
    val docs = (0 until 30).map(i =>
      (i.toLong, (0 to 10).map(j => s"t${(i + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val row = Dedup.prefixJaccardFunnel(docs, 4, 5, nShingle = 1).head()
    val (nd, ap, lp, nc, ncp, nv) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(nd == 30 && ap == 30L * 29 / 2)
    assert(lp <= ap && nc <= lp && ncp <= nc && nv <= ncp,
      s"funnel must narrow: $ap >= $lp >= $nc >= $ncp >= $nv")
    val exact = Dedup.prefixJaccardJoin(docs, 4, 5, nShingle = 1).count()
    assert(nv == exact, s"funnel n_verified $nv != exact join $exact")
  }

  test("incrementalNearDup: batch vs corpus index — planted dup found, novel passes") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "spark engines shuffle data between executors during wide transformations"),
      (3L, "completely different text about gardening tulips and spring weather"))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(corpus)
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (102L, "spark engines shuffle data between executors during wide transformations"),
      (103L, "a totally novel document with no overlap whatsoever in any shingle"))
      .toDF("doc_id", "text")
    val hits = Dedup.incrementalNearDup(batch, idx, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((101L, 1L)), s"near-dup of doc 1 missed: $hits")
    assert(hits.contains((102L, 2L)), s"exact dup of doc 2 missed: $hits")
    assert(!hits.exists(_._1 == 103L), s"novel doc flagged: $hits")
  }

  test("incrementalNearDup ≡ full-corpus banding restricted to (new × corpus)") {
    val corpus = (1L to 30L).map(i =>
      (i, s"shared prefix tokens run along here with suffix variant number $i extra")).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "shared prefix tokens run along here with suffix variant number 7 extra"),
      (102L, "unrelated content entirely about something else altogether different"))
      .toDF("doc_id", "text")
    val thr = 0.6
    val inc = Dedup.incrementalNearDup(batch, Dedup.minhashIndex(corpus), thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same banding over the union, restricted to cross pairs, must agree
    val full = Dedup.minhashCandidates(corpus.unionByName(batch))
      .filter(col("jaccard") >= thr)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if (a > 100) != (b > 100) =>
        if (a > 100) (a, b) else (b, a) }.toSet
    assert(inc == full, s"incremental $inc != full-restricted $full")
  }

  test("simhash near-dups: single-token edit stays within hamming 3") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val edited = base.replace("w40", "zzz")
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 6).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("bucketPairs caps a planted hot bucket and star-attaches the overflow") {
    // one hot bucket with 10k ids + one normal bucket: the cap must bound
    // the quadratic expansion to C(cap,2) over the cap smallest ids, and
    // every id BEYOND the cap must still be demoted via one
    // (bucket_min, id) star pair — overflow ids as false uniques was the
    // round-3 ADVICE finding. The normal bucket is untouched.
    val hot = (1L to 10000L).map(i => (0, 7, i))
    val normal = Seq((1, 3, 100001L), (1, 3, 100002L), (1, 3, 100003L))
    val buckets = (hot ++ normal).toDF("band", "bucket", "id")
    val pairs = Dedup.bucketPairs(buckets, maxBucket = 16).cache()
    val hotExpanded = pairs.filter(col("id_b") <= 16L)
    assert(hotExpanded.count() == 16L * 15 / 2,
      "quadratic expansion capped to C(16,2)")
    val overflow = pairs.filter(col("id_b") > 16L && col("id_b") <= 10000L)
    assert(overflow.count() == 10000L - 16,
      "every overflow id demoted by exactly one pair")
    assert(overflow.filter(col("id_a") =!= 1L).count() == 0,
      "overflow pairs attach to the bucket's min id")
    assert(pairs.filter(col("id_a") === 100001L).count() == 2,
      "normal bucket unaffected by the cap")
    val stats = Dedup.bucketStats(buckets, maxBucket = 16).first()
    assert(stats.getLong(0) == 2 && stats.getLong(1) == 10000L)
    assert(stats.getLong(2) == 1 && stats.getLong(3) == 10000L - 16)
    pairs.unpersist()
  }

  test("dedupKeepSet demotes the non-canonical side of each pair") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L, 1.0)).toDF("id_a", "id_b", "jaccard")
    val kept = Dedup.dedupKeepSet(docs, pairs).as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("dedupKeepSetClosure collapses chains transitively; one-hop over-keeps") {
    // planted chain: 1~2, 2~3 but 1 !~ 3 — plus an untouched singleton 4
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val closure = Dedup.dedupKeepSetClosure(docs, chain).as[Long].collect().toSet
    assert(closure == Set(1L, 4L), s"closure kept $closure")
    // adversarial pair orientation for the one-hop form: chain listed as
    // (2,3),(1,2) still collapses under closure
    val flipped = Seq((2L, 3L), (1L, 2L)).toDF("id_a", "id_b")
    assert(Dedup.dedupKeepSetClosure(docs, flipped).as[Long].collect().toSet == Set(1L, 4L))
  }

  test("connectedComponents: long chain + cycle converge to min labels") {
    // path 1-2-...-40 (diameter 39 — needs pointer jumping within 20
    // rounds) and a disjoint cycle 100-101-102-100
    val path = (1L until 40L).map(i => (i, i + 1))
    val cycle = Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val pairs = (path ++ cycle).toDF("id_a", "id_b")
    // both paths: the default hits the small-graph union-find fast path;
    // localThreshold = 0 forces the distributed pointer-jumping loop
    // (which this topology's diameter-39 chain specifically exercises)
    for (thr <- Seq(200000L, 0L)) {
      val cc = Dedup.connectedComponents(pairs, localThreshold = thr).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((1L to 40L).forall(cc(_) == 1L),
        s"thr=$thr path labels ${cc.filter(_._1 <= 40)}")
      assert(Seq(100L, 101L, 102L).forall(cc(_) == 100L))
    }
  }

  test("connectedComponents matches union-find on 30 random graphs (one run)") {
    // 30 random graphs with disjoint id ranges, composed into ONE edge
    // relation (components can't cross cases), checked against a plain
    // union-find — the oracle for arbitrary topologies beyond the
    // planted chain/cycle cases.
    val rnd = new scala.util.Random(7)
    val edges = (0 until 30).flatMap { c =>
      val base = c * 1000L
      val n = 2 + rnd.nextInt(12)
      (0 until (1 + rnd.nextInt(18))).map { _ =>
        (base + rnd.nextInt(n), base + rnd.nextInt(n))
      }.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val truth = nodes.map(v => v -> find(v)).toMap
    // default threshold = the driver union-find fast path; 0 = forced
    // distributed pointer jumping — both must equal the oracle
    for (thr <- Seq(200000L, 0L)) {
      val cc = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        localThreshold = thr).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc.keySet == truth.keySet, s"thr=$thr")
      nodes.foreach(v => assert(cc(v) == truth(v),
        s"thr=$thr node $v: cc=${cc(v)} truth=${truth(v)}"))
    }
  }

  test("incrementalCC over random edge splits equals a from-scratch recompute") {
    // 12 random graphs; edges split arbitrarily into an OLD batch (full
    // CC) and a NEW batch merged via incrementalCC — labels must equal
    // connectedComponents over the union graph, for any split (incl.
    // merges of previously disjoint components and brand-new nodes)
    val rnd = new scala.util.Random(23)
    (0 until 12).foreach { c =>
      val n = 4 + rnd.nextInt(14)
      val edges = (0 until (2 + rnd.nextInt(20))).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val cut = rnd.nextInt(edges.length)
        val (old, fresh) = edges.splitAt(math.max(cut, 1))
        val incr = Dedup.incrementalCC(
          Dedup.connectedComponents(old.toDF("id_a", "id_b")),
          fresh.toDF("id_a", "id_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val full = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(incr == full, s"graph $c: incremental $incr != full $full")
      }
    }
  }

  test("dedupKeepSetBest matches the union-find argmax oracle on 20 random graphs") {
    // random topologies + random scores, keep-best checked against a
    // driver-side union-find: exactly one survivor per component (the
    // score argmax, ties → min id) plus every singleton
    val rnd = new scala.util.Random(11)
    val edges = (0 until 20).flatMap { c =>
      val base = c * 1000L
      val n = 2 + rnd.nextInt(10)
      (0 until (1 + rnd.nextInt(14))).map { _ =>
        (base + rnd.nextInt(n), base + rnd.nextInt(n))
      }.filter { case (a, b) => a != b }
    }
    val nodes = (edges.flatMap(e => Seq(e._1, e._2)) ++
      (0 until 20).map(c => c * 1000L + 500L)).distinct // planted singletons
    val scores = nodes.map(v => v -> rnd.nextInt(5).toDouble / 4.0).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = nodes.groupBy(find).values.map(comp =>
      comp.minBy(v => (-scores(v), v))).toSet
    val docs = nodes.map(v => (v, scores(v))).toDF("doc_id", "score")
    val kept = Dedup.dedupKeepSetBest(docs, edges.toDF("id_a", "id_b"), col("score"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == truth,
      s"extra=${kept -- truth} missing=${truth -- kept}")
  }

  test("q_knn_shapley: equals an independent driver recursion; group rationality holds") {
    val rows = SparkEntry.queries("q_knn_shapley")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // independent re-derivation: same cosine arithmetic (float multiply
    // widened to double, sequential fold), same rank order, the paper's
    // backward recursion s_i = s_{i+1} + (m_i - m_{i+1})·min(K,i)/(K·i)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"), col("embedding"),
        col("label").cast("long"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getLong(2)))
    val (tests, train) = e.partition(_._1 < 10)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += (a(i) * b(i)).toDouble
        nx += (a(i) * a(i)).toDouble; ny += (b(i) * b(i)).toDouble
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
    }
    val K = 5
    val want = tests.flatMap { case (qid, qv, qlab) =>
      val ranked = train.map { case (tid, tv, tlab) =>
        (tid, cos(qv, tv), if (tlab == qlab) 1L else 0L)
      }.sortBy(t => (-t._2, t._1))
      val nT = ranked.length
      val s = new Array[Double](nT)
      s(nT - 1) = ranked(nT - 1)._3.toDouble / nT
      for (i <- nT - 2 to 0 by -1) {
        val r = i + 1 // 1-based rank
        s(i) = s(i + 1) + ((ranked(i)._3 - ranked(i + 1)._3) *
          math.min(K, r)).toDouble / (K.toLong * r)
      }
      ranked.zipWithIndex.map { case ((tid, _, _), i) =>
        (qid, tid) -> s(i)
      }
    }.toMap
    rows.foreach { case (qid, tid, _, got) =>
      val exp = want((qid, tid))
      assert(math.abs(got - exp) < 1e-6, s"($qid,$tid): $got vs $exp")
    }
    // group rationality: per test point Σ s_i = (top-K match count)/K
    val byQ = rows.groupBy(_._1)
    tests.foreach { case (qid, qv, qlab) =>
      val topK = train.map { case (tid, tv, tlab) =>
        (tid, cos(qv, tv), if (tlab == qlab) 1 else 0)
      }.sortBy(t => (-t._2, t._1)).take(K)
      val v = topK.map(_._3).sum.toDouble / K
      val got = byQ(qid).map(_._4).sum
      assert(math.abs(got - v) < 1e-3, s"q$qid: sum $got vs utility $v")
    }
  }

  test("brute-force topK: self excluded, ranks contiguous, cosine sorted") {
    val e = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), 3).cache()
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val perQuery = out.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("mn"), max(col("rank")).as("mx"))
      .collect()
    perQuery.foreach { r =>
      assert(r.getLong(1) == 3 && r.getLong(2) == 1 && r.getLong(3) == 3)
    }
    val notSorted = out.as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).values.exists { rows =>
        val sorted = rows.sortBy(_._3).map(_._4)
        sorted.zip(sorted.tail).exists { case (a, b) => a < b }
      }
    assert(!notSorted)
  }

  test("KMeans-IVF beats hash-IVF recall vs brute force (sf0.001)") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(e, q, 5)
      .select(col("query_id"), col("neighbor_id"))
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      truth.join(ann.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / truth.count()
    val hashR = recall(Similarity.ivfTopK(e, q, 5, nCentroids = 16, nProbe = 4))
    val kmR = recall(Similarity.ivfKmeansTopK(e, q, 5, nCentroids = 16, nProbe = 4))
    assert(kmR >= hashR - 0.05, s"kmeans $kmR vs hash $hashR")
    assert(kmR >= 0.5, s"kmeans recall $kmR")
  }

  test("IVF cell assignment is map-only: no cross join, no corpus shuffle on id") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 5)
    val plan = Similarity.ivfTopK(e, q, 3, nCentroids = 8, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"centroid assignment must not multiply the corpus:\n$plan")
    assert("Exchange hashpartitioning\\(vec_id".r.findFirstIn(plan).isEmpty,
      s"per-row argmax must not shuffle the corpus on id:\n$plan")
  }

  test("PQ ANN with exact rerank: recall floor vs brute force (sf0.001)") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(e, q, 5)
      .select(col("query_id"), col("neighbor_id"))
    val pq = Similarity.pqTopK(e, q, 5, m = 8, nCentroids = 32, rerank = 8)
      .select(col("query_id"), col("neighbor_id"))
    val hit = truth.join(pq, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / truth.count()
    assert(recall >= 0.5, s"PQ recall $recall")
    // rank lists are well-formed: exactly k per query, ranks 1..k
    val perQ = Similarity.pqTopK(e, q, 5).groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx")).collect()
    perQ.foreach(r => assert(r.getLong(1) == 5 && r.getLong(2) == 5))
  }

  test("IVF-PQ: cell-pruned ADC scan, recall tracks flat PQ (sf0.001)") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(e, q, 5)
      .select(col("query_id"), col("neighbor_id"))
    val ivfpq = Similarity.ivfPqTopK(e, q, 5, nCells = 16, nProbe = 8,
      m = 8, nCentroids = 32, rerank = 8)
    val hit = truth.join(ivfpq.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / truth.count()
    // same floor as flat PQ: at nProbe=8/16 cells the probed cells hold
    // the true neighbors and the ADC ranking is identical to flat PQ's
    assert(recall >= 0.5, s"IVF-PQ recall $recall")
    // the composition's point: NO corpus-wide crossJoin — the ADC join
    // is an equi-join on centroid_id (BroadcastHashJoin on the tiny
    // query side), and cell/code assignment never shuffles the corpus
    val plan = ivfpq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ADC scan must be cell-pruned, not corpus-wide:\n$plan")
    assert(plan.contains("BroadcastHashJoin [centroid_id") ||
      "BroadcastHashJoin \\[.*centroid_id".r.findFirstIn(plan).isDefined,
      s"candidate join must key on centroid_id:\n$plan")
  }

  test("q_ann_recall: one exact-ratio row, recall@50 above the IVF-PQ floor") {
    // the registered measured-recall query (VERDICT r15 Next #6): its
    // single row must carry the in-query brute-force truth size and a
    // recall_r at or above the family floor the operator tests assert
    val r = graft.SparkEntry.queries("q_ann_recall")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) == 50L && row.getLong(1) == 50L)
    val (hits, expected) = (row.getLong(2), row.getLong(3))
    assert(expected == 50L * 50L,
      s"truth size $expected (50 queries x top-50 over the 500-vec corpus)")
    assert(hits >= 0L && hits <= expected)
    val recall = row.getDouble(4)
    // production floor raised to 0.8 in r17 (VERDICT Next #3): the
    // serving config is nProbe=12/16, measured 0.90/0.89/0.92 at
    // sf0.001/0.01/0.1 — see the q_ann_recall doc for the full
    // probe→recall curve on this near-isotropic fixture
    assert(recall >= 0.8, s"IVF-PQ serving recall@50 $recall below floor")
  }

  test("LSH ANN recall >= 0.6 vs brute force on sf0.001 embeddings") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(e, q, 5)
      .select(col("query_id"), col("neighbor_id"))
    val ann = Similarity.lshTopK(e, q, 5, bands = 16, bandBits = 4)
      .select(col("query_id"), col("neighbor_id"))
    val hit = truth.join(ann, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / truth.count()
    assert(recall >= 0.6, s"recall $recall")
  }

  test("fitInput bounds the codebook-fit sample and is content-deterministic") {
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val cap = 100L
    val sampled = Similarity.fitInput(e, "embedding", cap)
    val got = sampled.count()
    // the hash sample targets `cap` rows in expectation; binomial variance
    // means we assert a band, and the BOUND (never the full corpus) is the
    // 100 TB property under test
    assert(got < n && got <= cap * 2 && got >= cap / 2,
      s"sample $got of $n outside [${cap / 2}, ${cap * 2}]")
    // single partition: the pinned layout the deterministic fit requires
    assert(sampled.rdd.getNumPartitions == 1)
    // membership is a pure function of row CONTENT: a different input
    // partitioning must select the IDENTICAL vector set
    val a = sampled.collect().map(_.getSeq[Float](0)).toSeq
    val b = Similarity.fitInput(e.repartition(13), "embedding", cap)
      .collect().map(_.getSeq[Float](0)).toSeq
    assert(a == b, "hash sample must not depend on input partitioning")
    // under the cap: pass-through (still pinned), no rows dropped
    assert(Similarity.fitInput(e, "embedding", n + 1).count() == n)
  }

  test("cellStats makes a planted hot cell visible (IVF health twin of bucketStats)") {
    // hand-crafted quantizer: cell 1 at [1,0], cell 2 at [0,1]; 80% of the
    // corpus points toward cell 1 → skew = max/avg must flag it
    val cents = Array((1, Array(1f, 0f)), (2, Array(0f, 1f)))
    val corpus = ((1 to 80).map(i => (i.toLong, Seq(1f, i * 0.001f))) ++
      (81 to 100).map(i => (i.toLong, Seq(i * 0.001f, 1f))))
      .toDF("vec_id", "embedding")
    val r = Similarity.cellStats(corpus, cents).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 2L, "both cells used")
    assert(row.getLong(1) == 100L, "all vectors counted")
    assert(row.getLong(3) == 80L, s"hot cell holds 80, got ${row.getLong(3)}")
    assert(row.getDouble(5) == 1.6, s"skew max/avg 80/50 = 1.6, got ${row.getDouble(5)}")
    // balanced corpus → skew 1.0 (the healthy baseline the report is read against)
    val balanced = ((1 to 50).map(i => (i.toLong, Seq(1f, 0f))) ++
      (51 to 100).map(i => (i.toLong, Seq(0f, 1f)))).toDF("vec_id", "embedding")
    assert(Similarity.cellStats(balanced, cents).first().getDouble(5) == 1.0)
  }

  test("incrementalDedup: batch dedups against itself AND the historical index") {
    val hist = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen before"),   // cross-batch dup → demoted by the index
      (11L, "brand new"),     // survives
      (12L, "brand new"),     // in-batch dup → collapsed into 11's group
      (13L, "also seen"))     // cross-batch dup → demoted
      .toDF("doc_id", "text")
    val index = Dedup.exactDedup(hist).select(col("content_hash"))
    val out = Dedup.incrementalDedup(batch, index).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 11L && out(0).getLong(2) == 2L,
      "min-id winner of the only novel group, with its in-batch copy counted")
  }

  test("fused IvfPqEncode equals the composed HOF encode field-exactly (sf0.001)") {
    // the fused expression replaced nearestCells + pqEncode(residual) +
    // l2_norm in the serving scan; the rows-only q_cosine_ivfpq output
    // must not drift, so (cell, codes, xnorm) must match bit-for-bit
    val e = Tables.embeddings(spark, sf)
    val model = graft.queries.SimilarityQueries.ivfpqModel(spark, sf)
    val fused = e.select(col("vec_id"),
      graft.functions.VectorFunctions.ivf_pq_encode(col("embedding"),
        model.cents.sortBy(_._1).map(_._2), model.books).as("__e"))
      .select(col("vec_id"), col("__e.cell"), col("__e.codes"), col("__e.xnorm"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Int](2), r.getDouble(3)))).toMap
    val composed = e.select(col("vec_id"),
      Similarity.assignCell(model.cents, col("embedding")).as("cell"),
      Similarity.pqEncodeForTest(model.books,
        Similarity.residualForTest(model.cents, col("embedding"))).as("codes"),
      graft.functions.VectorFunctions.l2_norm(col("embedding")).as("xnorm"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Int](2), r.getDouble(3)))).toMap
    assert(fused == composed)
  }

  test("semantic dedup composition: planted paraphrase chain collapses transitively to min id") {
    // a "paraphrase cluster" in embedding space: 1≈2 and 2≈3 above the
    // 0.9 threshold, but 1–3 DIRECTLY below it — exactly the chain
    // topology one-hop star-collapse gets wrong; the closure must demote
    // both 2 and 3. Vectors live in a 2D subspace of dim 8 at angles
    // 0 / 20° / 40° (cos 20° ≈ 0.94 ≥ 0.9, cos 40° ≈ 0.77 < 0.9), plus
    // two unrelated axes.
    def rot(deg: Double): Seq[Float] = {
      val t = math.toRadians(deg)
      Seq(math.cos(t).toFloat, math.sin(t).toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    }
    val emb = Seq(
      (1L, rot(0)), (2L, rot(20)), (3L, rot(40)),
      (10L, Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)),
      (11L, Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.cosineNearDups(emb, threshold = 0.9, bands = 16, bandBits = 4)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && got.contains((2L, 3L)),
      s"chain links not surfaced: $got")
    assert(!got.contains((1L, 3L)), "1-3 must be below the threshold (chain premise)")
    val keep = Dedup.dedupKeepSetClosure(emb, pairs.select(col("id_a"), col("id_b")),
      idCol = "vec_id").collect().map(_.getLong(0)).toSet
    assert(keep == Set(1L, 10L, 11L),
      s"closure must keep only the chain min + singletons, got $keep")
  }

  test("q_corpus_clean_semantic: deterministic, demotes near-dups, keeps per-source stats") {
    val q = graft.queries.SimilarityQueries.queries("q_corpus_clean_semantic")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.nonEmpty && a.sameElements(b))
    val kept = a.map(_.getLong(1)).sum
    val total = Tables.documents(spark, sf).count()
    assert(kept < total, s"semantic dedup must demote something: $kept of $total")
    assert(kept > total / 2, "but must not demote most of the corpus")
  }

  test("dedupKeepSetBest: per component the BEST score survives, singletons keep themselves") {
    // chain 1~2~3 (component {1,2,3}) + pair 10~11 + singleton 20:
    // keep-best must keep the max-score member of each component (2 and
    // 11) and the singleton — where min-id closure would keep 1 and 10
    val docs = Seq((1L, 0.3), (2L, 0.9), (3L, 0.5),
      (10L, 0.2), (11L, 0.8), (20L, 0.1)).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupKeepSetBest(docs, pairs, col("score"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 11L, 20L), s"kept $kept")
    // score ties break to the smallest id (deterministic winner)
    val tied = Seq((1L, 0.5), (2L, 0.5)).toDF("doc_id", "score")
    val keptTied = Dedup.dedupKeepSetBest(tied,
      Seq((1L, 2L)).toDF("id_a", "id_b"), col("score"))
      .collect().map(_.getLong(0)).toSet
    assert(keptTied == Set(1L))
  }

  test("MinhashIndex save/load: reloaded index gives bit-identical incrementalNearDup") {
    import graft.operators.Artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "spark engines shuffle data between executors during wide transformations"),
      (3L, "completely different text about gardening tulips and spring weather"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (102L, "a totally novel document with no overlap whatsoever in any shingle"))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(corpus)
    Artifacts.saveMinhashIndex(idx, dir)
    val reloaded = Artifacts.loadMinhashIndex(spark, dir)
    // the persisted relations are value-equal to the in-memory ones...
    assert(reloaded.buckets.collect().toSet == idx.buckets.collect().toSet)
    assert(reloaded.content.collect().map(r =>
        (r.getLong(0), r.getSeq[String](1).toSet)).toSet ==
      idx.content.collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toSet)
    // ...and a consumer of the RELOADED index (a fresh process, in spirit)
    // reproduces the fitting process's output bit-for-bit
    def run(i: Dedup.MinhashIndex) =
      Dedup.incrementalNearDup(batch, i, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(reloaded) == run(idx) && run(reloaded).exists(_._1 == 101L))
  }

  test("fingerprint-index save/load: reloaded index gives identical incrementalDedup") {
    import graft.operators.Artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft_fpidx").toString
    val hist = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "alpha beta gamma"), (11L, "novel content here"))
      .toDF("doc_id", "text")
    val index = Dedup.exactDedup(hist).select(col("content_hash"))
    Artifacts.saveFingerprintIndex(index, dir)
    val reloaded = Artifacts.loadFingerprintIndex(spark, dir)
    def run(i: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalDedup(batch, i)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(reloaded) == run(index))
    assert(run(reloaded).map(_._2) == Set(11L), "known doc 10 dropped, novel 11 kept")
  }

  test("IvfPqModel save/load: bit-identical model, identical serving output") {
    import graft.operators.Artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val emb = Tables.embeddings(spark, sf)
    val model = Similarity.fitIvfPq(emb, nCells = 8, m = 8, nCentroids = 16)
    Artifacts.saveIvfPqModel(spark, model, dir)
    val re = Artifacts.loadIvfPqModel(spark, dir)
    assert(re.cents.map(_._1).sameElements(model.cents.map(_._1)))
    assert(re.cents.zip(model.cents).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    assert(re.books.length == model.books.length)
    assert(re.books.zip(model.books).forall { case (ba, bb) =>
      ba.zip(bb).forall { case (a, b) => a.sameElements(b) } })
    val q = emb.filter(col("vec_id") < 5)
    val a = Similarity.ivfPqApply(emb, q, k = 5, model).collect().toSeq
    val b = Similarity.ivfPqApply(emb, q, k = 5, re).collect().toSeq
    assert(a == b)
  }

  test("ivfPqApplyFromDisk: partition-pruned scan, results identical to in-memory apply") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfrest").toString
    val emb = Tables.embeddings(spark, sf)
    val nCells = 16
    val model = Similarity.fitIvfPq(emb, nCells = nCells, m = 8, nCentroids = 16)
    Similarity.writeIvfPqIndex(emb, model, s"$dir/idx")
    val q = emb.filter(col("vec_id") < 10)
    val nProbe = 2
    val fromDisk = Similarity.ivfPqApplyFromDisk(s"$dir/idx", emb, q, k = 5,
      model, nProbe = nProbe)
    val inMem = Similarity.ivfPqApply(emb, q, k = 5, model, nProbe = nProbe)
    assert(fromDisk.collect().toSeq == inMem.collect().toSeq,
      "pruned at-rest serving must equal the in-memory reference")
    // the scan must carry a centroid_id partition filter and touch fewer
    // directories than the index has cells (nProbe=2 per query; the
    // union over 10 queries stays below nCells on this fixture).
    // AQE hides scans inside materialized query stages — recurse through
    // AdaptiveSparkPlanExec/QueryStageExec (their sub-plans are not
    // `children`, so a flat collectLeaves sees none of them)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(s.plan)
    }.flatten
    val scan = scans(fromDisk.queryExecution.executedPlan).find(
      _.relation.partitionSchema.fieldNames.contains("centroid_id")).get
    assert(scan.partitionFilters.nonEmpty, "no partition filter on the IVF scan")
    val total = spark.read.parquet(s"$dir/idx")
      .select(col("centroid_id")).distinct().count()
    assert(scan.selectedPartitions.partitionCount < total,
      s"scanned ${scan.selectedPartitions.partitionCount} of $total cells — no pruning")
  }

  test("appendToIvfPqIndex: incremental at-rest index ≡ full rebuild, serving unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfapp").toString
    val emb = Tables.embeddings(spark, sf)
    val model = Similarity.fitIvfPq(emb, nCells = 16, m = 8, nCentroids = 16)
    // build from the first half, append the second half under the SAME model
    Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), model, s"$dir/idx")
    Similarity.appendToIvfPqIndex(emb.filter(col("vec_id") % 2 === 1), model, s"$dir/idx")
    val q = emb.filter(col("vec_id") < 10)
    val incremental = Similarity.ivfPqApplyFromDisk(s"$dir/idx", emb, q, k = 5, model)
      .collect().toSeq
    val reference = Similarity.ivfPqApply(emb, q, k = 5, model).collect().toSeq
    assert(incremental == reference,
      "appended index must serve identically to a full-corpus encode")
  }

  test("q_sample_balanced_cells: exactly min(5, cell size) per cell, deterministic") {
    val q = SparkEntry.queries("q_sample_balanced_cells")
    val got = q(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // expected per-cell sizes from the same model's full assignment
    val model = graft.queries.SimilarityQueries.ivfpqModel(spark, sf)
    val full = Tables.embeddings(spark, sf)
      .select(Similarity.assignCell(model.cents, col("embedding")).as("c"))
      .groupBy(col("c")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val perCell = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(perCell.keySet == full.keySet, "every non-empty cell represented")
    perCell.foreach { case (c, n) =>
      assert(n == math.min(5L, full(c)),
        s"cell $c sampled $n of ${full(c)}")
    }
    assert(got.toSeq == q(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq,
      "balanced sample must be deterministic")
  }

  test("compactIvfPqIndex: versioned publication — serving identical, appends follow the live version, crash-safe") {
    import graft.operators.Artifacts
    val root = java.nio.file.Files.createTempDirectory("graft_ivfver")
      .toString + "/idx"
    val emb = Tables.embeddings(spark, sf)
    val model = Similarity.fitIvfPq(emb, nCells = 8, m = 8, nCentroids = 8)
    val q = emb.filter(col("vec_id") < 10)
    def serve() = Similarity.ivfPqApplyFromDisk(root, emb, q, k = 5, model)
      .collect().toSeq
    // flat build + baseline serving
    Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), model, root)
    val baseline = serve()
    // compaction: flat → v=1, pointer flipped, legacy cell dirs gone,
    // serving (same root handle) identical
    Artifacts.compactIvfPqIndex(spark, root)
    assert(Artifacts.latestVersion(spark, root).exists(_.endsWith("v=1")))
    assert(!new java.io.File(root).list().exists(_.startsWith("centroid_id=")),
      "legacy flat cell dirs must be swept after the pointer flip")
    assert(serve() == baseline, "compaction must not change served results")
    // appends resolve the pointer: new vectors land INSIDE v=1 and serve
    Similarity.appendToIvfPqIndex(emb.filter(col("vec_id") % 2 === 1), model, root)
    assert(spark.read.parquet(s"$root/v=1").count() == emb.count(),
      "append must land in the live version")
    val afterAppend = serve()
    val reference = Similarity.ivfPqApply(emb, q, k = 5, model).collect().toSeq
    assert(afterAppend == reference,
      "appended versioned index must serve identically to a full encode")
    // crash mid-compaction: a torn write without a pointer flip leaves
    // the last complete version live; recovery publishes PAST the torn
    // directory (version numbers from the listing, never re-used)
    intercept[RuntimeException] {
      Artifacts.publishVersion(spark, root) { dir =>
        new java.io.File(dir).mkdirs()
        throw new RuntimeException("simulated crash mid-compaction")
      }
    }
    assert(Artifacts.latestVersion(spark, root).exists(_.endsWith("v=1")),
      "pointer must still name the last COMPLETE version")
    assert(serve() == afterAppend, "torn compaction must not affect serving")
    Artifacts.compactIvfPqIndex(spark, root)
    assert(Artifacts.latestVersion(spark, root).exists(_.endsWith("v=3")),
      "recovery must skip the torn v=2")
    assert(serve() == afterAppend, "recovered compaction serves the same rows")
  }

  test("q_ivf_layout_health: one row, fresh-build layout pins skew at 1, deterministic") {
    val q = SparkEntry.queries("q_ivf_layout_health")
    val rows = q(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (nCells, nFiles) = (r.getInt(0), r.getLong(1))
    assert(nCells > 0 && nFiles >= nCells,
      s"layout must list every cell: $r")
    // the memoized index is a fresh hash-clustered build: one file set
    // per cell → per-cell counts uniform → p99/mean skew exactly 1
    assert(r.getDouble(5) == 1.0, s"fresh-build skew must be 1.0: $r")
    assert(q(spark, sf).collect().toSeq == rows.toSeq,
      "layout health must be deterministic")
  }

  test("maintainIvfPqIndex: skewed appends trigger compaction, balanced layout, serving identical throughout") {
    import graft.operators.Artifacts
    val root = java.nio.file.Files.createTempDirectory("graft_ivfmaint")
      .toString + "/idx"
    val emb = Tables.embeddings(spark, sf)
    val model = Similarity.fitIvfPq(emb, nCells = 8, m = 8, nCentroids = 8)
    val q = emb.filter(col("vec_id") < 10)
    def serve() = Similarity.ivfPqApplyFromDisk(root, emb, q, k = 5, model)
      .collect().toSeq
    // fresh build: one file set per cell, healthy layout → no-op
    Similarity.writeIvfPqIndex(emb.filter(col("vec_id") < 200), model, root)
    val fresh = Artifacts.ivfLayoutStats(spark, root)
    assert(fresh.nCells > 0 && fresh.skew <= 3.0 && fresh.avgFilesPerCell <= 4.0,
      s"fresh build should be healthy, got $fresh")
    assert(!Artifacts.maintainIvfPqIndex(spark, root),
      "healthy layout must not trigger compaction")
    assert(Artifacts.latestVersion(spark, root).isEmpty,
      "a no-op maintenance tick must not publish a version")
    // plant SKEWED appends: many tiny batches that ALL land in the same
    // cell (vectors chosen by their coarse assignment) — file count
    // piles up on one hot cell while the rest keep their single set
    val before = serve()
    val assigned = emb.filter(col("vec_id") >= 200 && col("vec_id") < 400)
      .select(col("vec_id"),
        Similarity.assignCell(model.cents, col("embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val hotIds = assigned.groupBy(_._2).values.maxBy(_.length)
      .map(_._1).take(12).toSeq
    assert(hotIds.length == 12, "fixture must have a 12-vector hot cell")
    hotIds.foreach { id =>
      Similarity.appendToIvfPqIndex(
        emb.filter(col("vec_id") === id), model, root)
    }
    val skewed = Artifacts.ivfLayoutStats(spark, root)
    assert(skewed.skew > 3.0 || skewed.avgFilesPerCell > 4.0,
      s"planted appends should degrade the layout, got $skewed")
    val afterAppends = serve()
    // maintenance tick: compacts, layout re-balanced, serving unchanged
    assert(Artifacts.maintainIvfPqIndex(spark, root),
      "degraded layout must trigger compaction")
    val healed = Artifacts.ivfLayoutStats(spark, root)
    assert(healed.skew <= 3.0 && healed.avgFilesPerCell <= 4.0,
      s"compaction must re-balance the layout, got $healed")
    assert(Artifacts.latestVersion(spark, root).exists(_.endsWith("v=1")),
      "trigger must publish through the versioned compaction")
    assert(serve() == afterAppends,
      "maintenance must not change served results")
    assert(!Artifacts.maintainIvfPqIndex(spark, root),
      "healed layout must not re-trigger")
    // rows all survived the round-trip
    assert(spark.read.parquet(s"$root/v=1").count() == 200 + 12)
    assert(before.nonEmpty && afterAppends.nonEmpty)
  }

  test("publishVersion: readers follow _LATEST; a crashed write never corrupts the live artifact") {
    import graft.operators.Artifacts
    val root = java.nio.file.Files.createTempDirectory("graft_ver").toString + "/idx"
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    assert(Artifacts.latestVersion(spark, root).isEmpty)
    val v1 = Artifacts.publishVersion(spark, root)(dir =>
      Artifacts.saveMinhashIndex(graft.operators.Dedup.minhashIndex(corpus), dir))
    assert(Artifacts.latestVersion(spark, root).contains(v1) && v1.endsWith("v=1"))
    val v2 = Artifacts.publishVersion(spark, root)(dir =>
      Artifacts.saveMinhashIndex(graft.operators.Dedup.minhashIndex(corpus), dir))
    assert(Artifacts.latestVersion(spark, root).contains(v2) && v2.endsWith("v=2"))
    // simulate a crash MID-WRITE of v3: the write throws before the
    // pointer flip — readers must still resolve the complete v2
    intercept[RuntimeException] {
      Artifacts.publishVersion(spark, root) { dir =>
        new java.io.File(dir).mkdirs() // partial garbage on disk
        throw new RuntimeException("simulated crash mid-write")
      }
    }
    assert(Artifacts.latestVersion(spark, root).contains(v2),
      "pointer must still name the last COMPLETE version")
    // and the resolved artifact is fully loadable
    val idx = Artifacts.loadMinhashIndex(spark,
      Artifacts.latestVersion(spark, root).get)
    assert(idx.content.count() == 1L)
  }

  test("pruneVersions: old versions deleted, the live pointer target always survives") {
    import graft.operators.Artifacts
    val root = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/idx"
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    (1 to 4).foreach { _ =>
      Artifacts.publishVersion(spark, root)(dir =>
        Artifacts.saveMinhashIndex(graft.operators.Dedup.minhashIndex(corpus), dir))
    }
    Artifacts.pruneVersions(spark, root, keep = 2)
    val left = new java.io.File(root).list().filter(_.startsWith("v=")).sorted.toSeq
    assert(left == Seq("v=3", "v=4"), s"left $left")
    assert(Artifacts.latestVersion(spark, root).exists(_.endsWith("v=4")))
    // a stale pointer's target survives even an aggressive sweep
    // (rewrite the pointer through the Hadoop FS — a raw java.nio write
    // would desync the local FS's .crc sidecar)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_LATEST")
    fs.delete(ptr, false)
    val out = fs.create(ptr, true)
    try out.write("v=3".getBytes("UTF-8")) finally out.close()
    Artifacts.pruneVersions(spark, root, keep = 1)
    val left2 = new java.io.File(root).list().filter(_.startsWith("v=")).sorted.toSeq
    assert(left2.contains("v=3"), s"live version deleted: $left2")
  }

  test("loadOrFit: cold call fits once + persists; warm call loads without refitting") {
    import graft.operators.Artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft_lof").toString + "/ivfpq"
    val emb = Tables.embeddings(spark, sf)
    var fits = 0
    def fit() = { fits += 1; Similarity.fitIvfPq(emb, nCells = 4, m = 8, nCentroids = 8) }
    val cold = Artifacts.loadOrFitIvfPq(spark, dir)(fit())
    assert(fits == 1, "cold call must fit exactly once")
    val warm = Artifacts.loadOrFitIvfPq(spark, dir)(fit())
    assert(fits == 1, "warm call must NOT refit")
    assert(warm.cents.zip(cold.cents).forall { case ((i, a), (j, b)) =>
      i == j && a.sameElements(b) }, "warm load must equal the fitted model")
  }

  test("torn IvfPq save (pointerless partial v= dir) reads as absent → refit, not crash") {
    import graft.operators.Artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_torn")
      .toString + "/m"
    // remnant of a save that crashed mid-write: a partial v=1 payload,
    // no _LATEST pointer (publishVersion flips it only after the write)
    new java.io.File(s"$dir/v=1").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/v=1/part-00000.parquet"),
      Array[Byte](80, 65, 82, 49)) // bare "PAR1" magic — unreadable
    val emb = Tables.embeddings(spark, sf)
    var fits = 0
    def fit() = { fits += 1; Similarity.fitIvfPq(emb, nCells = 4, m = 8, nCentroids = 8) }
    val m1 = Artifacts.loadOrFitIvfPq(spark, dir)(fit())
    assert(fits == 1, "torn version must read as absent → exactly one fit")
    assert(Artifacts.latestVersion(spark, dir).exists(_.endsWith("v=2")),
      "publish must skip PAST the torn v=1, never write into it")
    val m2 = Artifacts.loadOrFitIvfPq(spark, dir)(fit())
    assert(fits == 1, "published version serves the warm call — no refit")
    assert(m2.cents.zip(m1.cents).forall { case ((i, a), (j, b)) =>
      i == j && a.sameElements(b) }, "reloaded model equals the fitted one")
  }

  test("band-partitioned bucket index: a per-band filter prunes the at-rest scan") {
    // the streaming gate's per-band anti-joins rely on this pruning —
    // and the load-time type normalization (cast on the partition
    // column) must not defeat it (SimplifyCasts removes the no-op cast)
    import graft.operators.Artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft_mhprune").toString
    val corpus = (1L to 30L).map(i =>
      (i, s"document number $i with plenty of shared tokens plus suffix $i"))
      .toDF("doc_id", "text")
    Artifacts.saveMinhashIndex(Dedup.minhashIndex(corpus), dir)
    val one = Artifacts.loadMinhashIndex(spark, dir).buckets
      .filter(col("band") === 2)
    one.collect()
    val scan = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "no partition filter on band")
    val scanned = scan.selectedPartitions.partitionCount
    assert(scanned == 1, s"scanned $scanned band directories, wanted 1 of 8")
  }

  test("compactMinhashIndex: re-caps hot buckets and dedups content after appends") {
    import graft.operators.Artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft_mhcompact").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "spark engines shuffle data between executors during wide transformations"))
      .toDF("doc_id", "text")
    Artifacts.saveMinhashIndex(Dedup.minhashIndex(corpus), dir)
    // simulate streaming appends: duplicate bucket rows + a planted hot
    // bucket + a duplicated content row
    (3L to 40L).map(i => (0, 999L, i)).toDF("band", "bucket", "id")
      .write.mode("append").partitionBy("band").parquet(s"$dir/buckets")
    corpus.filter(col("doc_id") === 1)
      .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .write.mode("append").parquet(s"$dir/content")
    Artifacts.compactMinhashIndex(spark, dir, maxBucket = 16)
    val after = Artifacts.loadMinhashIndex(spark, dir)
    val maxPerBucket = after.buckets.groupBy(col("band"), col("bucket"))
      .count().agg(max(col("count"))).first().getLong(0)
    assert(maxPerBucket <= 16L, s"bucket cap not re-enforced: $maxPerBucket")
    // hot bucket keeps the SMALLEST ids (the deterministic demotion rule)
    val hot = after.buckets.filter(col("band") === 0 && col("bucket") === 999)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(hot == (3L to 18L).toSeq, s"hot bucket kept $hot")
    assert(after.content.groupBy(col("id")).count()
      .filter(col("count") > 1).count() == 0, "content rows must be unique per id")
    // the compacted index still finds a planted near-dup
    val hit = Dedup.incrementalNearDup(
      Seq((101L, "the quick brown fox jumps over the lazy dog near the river bank now"))
        .toDF("doc_id", "text"), after, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hit.contains((101L, 1L)), s"post-compaction near-dup missed: $hit")
    // compaction published a VERSION (crash-safe path), not an in-place
    // overwrite: the flat legacy layout is gone, the pointer names v=1
    import graft.operators.Artifacts
    assert(Artifacts.latestVersion(spark, dir).exists(_.endsWith("v=1")))
    assert(!new java.io.File(s"$dir/buckets").exists(),
      "legacy flat layout must be swept after the versioned publish")
  }

  test("crash mid-compaction: a partial v=n+1 with no pointer flip never corrupts serving") {
    import graft.operators.Artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft_mhcrash").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "spark engines shuffle data between executors during wide transformations"))
      .toDF("doc_id", "text")
    Artifacts.saveMinhashIndex(Dedup.minhashIndex(corpus), dir)
    // cycle 1: compact → v=1 live
    Artifacts.compactMinhashIndex(spark, dir)
    assert(Artifacts.latestVersion(spark, dir).exists(_.endsWith("v=1")))
    val served1 = Artifacts.loadMinhashIndex(spark, dir)
    val truth = served1.content.collect().map(_.getLong(0)).toSet
    assert(truth == Set(1L, 2L))
    // simulate a crash MID-compaction: v=2 exists but is partial garbage
    // (no buckets/content, no pointer flip)
    val partial = new java.io.File(s"$dir/v=2")
    partial.mkdirs()
    java.nio.file.Files.write(partial.toPath.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    // cycle 2 still serves the last COMPLETE version through the pointer
    assert(Artifacts.latestVersion(spark, dir).exists(_.endsWith("v=1")),
      "pointer must ignore the torn v=2")
    val served2 = Artifacts.loadMinhashIndex(spark, dir)
    assert(served2.content.collect().map(_.getLong(0)).toSet == truth)
    // and the incremental gate still catches a near-dup of indexed doc 1
    // (the restart path VERDICT r6 Missing #1 names — a compaction crash
    // must not break the closed loop's next cycle)
    val hits = Dedup.incrementalNearDup(
      Seq((101L, "the quick brown fox jumps over the lazy dog near the river bank now"))
        .toDF("doc_id", "text"), served2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((101L, 1L)),
      "near-dup must still be gated after the torn compaction")
    // the NEXT compaction skips past the torn directory (listing max+1)
    // instead of writing into it, and repairs the history
    Artifacts.compactMinhashIndex(spark, dir)
    assert(Artifacts.latestVersion(spark, dir).exists(_.endsWith("v=3")),
      "recovery publish must not re-use the torn v=2")
    assert(Artifacts.loadMinhashIndex(spark, dir)
      .content.collect().map(_.getLong(0)).toSet == truth)
  }

  test("pruneVersions race: a publish between listing and delete never loses the live target") {
    import graft.operators.Artifacts
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    def publish(root: String): Unit = {
      Artifacts.publishVersion(spark, root)(dir =>
        Artifacts.saveMinhashIndex(graft.operators.Dedup.minhashIndex(corpus), dir))
      ()
    }
    // property sweep: every keep in 0..3, with a racing publish injected
    // into the list→pointer-read window — the live pointer target must
    // survive and stay loadable in every interleaving
    (0 to 3).foreach { keep =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_prrace$keep").toString + "/idx"
      (1 to 3).foreach(_ => publish(root))
      Artifacts.pruneVersionsImpl(spark, root, keep, () => publish(root))
      val live = Artifacts.latestVersion(spark, root)
      assert(live.exists(_.endsWith("v=4")), s"keep=$keep live $live")
      assert(new java.io.File(live.get).isDirectory,
        s"keep=$keep pointer target deleted")
      assert(Artifacts.loadMinhashIndex(spark, live.get).content.count() == 1L,
        s"keep=$keep live version unreadable")
      // retention math: the racing v=4 is live; of the three listed
      // older versions, the newest (keep-1) survive → max(keep, 1) total
      val left = new java.io.File(root).list().count(_.startsWith("v="))
      assert(left == math.max(keep, 1), s"keep=$keep left $left")
    }
    // keep=0 (now legal per the scaladoc contract): only the live version
    val root0 = java.nio.file.Files.createTempDirectory("graft_pr0").toString + "/idx"
    (1 to 3).foreach(_ => publish(root0))
    Artifacts.pruneVersions(spark, root0, keep = 0)
    val left0 = new java.io.File(root0).list().filter(_.startsWith("v=")).toSeq
    assert(left0 == Seq("v=3"), s"keep=0 left $left0")
  }

  test("lloydSteps: planted blobs converge from mixed init; counts and inertia behave") {
    // three tight blobs around (0,0), (10,0), (0,10); init = 3 lowest
    // ids, which all sit in blob A — rounds must pull the centroids
    // apart onto the true blobs (the assign/update math, not the init,
    // does the clustering)
    val pts = (0 until 30).map { i =>
      val (cx, cy) = (i % 3) match {
        case 0 => (0.0, 0.0); case 1 => (10.0, 0.0); case 2 => (0.0, 10.0)
      }
      // deterministic jitter in [-0.4, 0.4]
      (i.toLong, Array(cx + ((i * 7) % 9 - 4) / 10.0f,
        cy + ((i * 11) % 9 - 4) / 10.0f).map(_.toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val out = Similarity.lloydSteps(df, k = 3, rounds = 6).collect()
    assert(out.length == 3)
    val sizes = out.map(r => r.getLong(1)).sorted
    assert(sizes.toSeq == Seq(10L, 10L, 10L), sizes.toSeq)
    // centroids land on the blob centers (within jitter)
    val cents = out.map(_.getSeq[Double](3))
    for ((cx, cy) <- Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0)))
      assert(cents.exists(c =>
        math.abs(c(0) - cx) < 0.5 && math.abs(c(1) - cy) < 0.5),
        s"no centroid near ($cx,$cy): ${cents.map(_.toSeq).toSeq}")
    // per-cluster inertia ≤ members · max jitter dist²
    assert(out.forall(_.getDouble(2) <= 10 * 2 * 0.4 * 0.4 + 1e-6))
  }

  test("lloydSteps: a starved centroid carries its previous value; k>n tolerated") {
    // two coincident far points + k=3 with all init centroids near the
    // origin cluster: one centroid never wins a point and must keep its
    // init value rather than NaN out
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0.1f, 0f)), (2L, Array(0f, 0.1f)),
      (3L, Array(50f, 50f)), (4L, Array(50f, 50f)))
    val out = Similarity.lloydSteps(pts.toDF("vec_id", "embedding"),
      k = 3, rounds = 3).collect()
    assert(out.map(_.getLong(1)).sum == 5L)
    assert(out.forall(r => !r.getSeq[Double](3).exists(_.isNaN)))
    // k beyond the point count: every point its own cluster, no crash
    val tiny = Similarity.lloydSteps(
      pts.take(2).toDF("vec_id", "embedding"), k = 5, rounds = 2).collect()
    assert(tiny.map(_.getLong(1)).sum == 2L)
  }

  test("q_ivf_cell_health: deterministic single-row report over the serving assignment") {
    val h1 = graft.queries.SimilarityQueries.queries("q_ivf_cell_health")(spark, sf).collect()
    val h2 = graft.queries.SimilarityQueries.queries("q_ivf_cell_health")(spark, sf).collect()
    assert(h1.length == 1 && h1.sameElements(h2))
    val row = h1.head
    // every corpus vector lands in exactly one cell
    assert(row.getLong(1) == Tables.embeddings(spark, sf).count())
    assert(row.getLong(0) <= 16L, "at most nCells cells")
    assert(row.getDouble(5) >= 1.0, "skew = max/avg >= 1 by construction")
  }
}
