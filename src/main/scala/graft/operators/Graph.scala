package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Iterative graph analytics over edge relations (the power-iteration
  * family, complementing [[Dedup.connectedComponents]]' pointer-jumping).
  *
  * Scale shape: each iteration is ONE shuffle — `edges ⋈ ranks` on `src`
  * (the rank relation is |nodes| rows, joined on its key) followed by a
  * `groupBy(dst)` with map-side partial sums. Nothing unbounded is ever
  * collected to the driver (the fast path below is gated on a measured
  * edge count); the rank relation never exceeds one row per node. A
  * fixed iteration count keeps the lineage bounded; a convergence-driven
  * variant at scale would persist + checkpoint every ~10 rounds exactly
  * like the CC loop (Dedup.scala).
  *
  * Determinism: ranks are pure arithmetic over the edge multiset; the
  * only partitioning-sensitive step is the double sum, whose last-ulp
  * addition-order wobble is absorbed by the caller rounding final ranks
  * (the repo-wide 6dp cross-engine contract; SCALING.md).
  */
object Graph {

  private lazy val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** PageRank with `iterations` fixed power-iteration rounds at the
    * given damping. `edges` must be `(src, dst)`; every node that should
    * receive teleport mass must appear as a `src` at least once (a
    * symmetric edge set satisfies this trivially and has no dangling
    * nodes — callers with genuinely directed graphs should pre-attach
    * their dangling-mass convention). Contributions to a `dst` that is
    * never a `src` are dropped (that sink is outside the node set).
    * Returns `(node, rank)` un-rounded; callers own the presentation
    * rounding.
    *
    * SMALL-GRAPH FAST PATH (the [[Dedup.connectedComponents]] pattern):
    * below `localThreshold` edges the distributed loop's cost is pure
    * job-scheduling floor — iterations × (broadcast + join + agg + join)
    * stage launches on near-empty partitions (~0.8 s/round at sf0.1) —
    * so the identical recurrence runs as a driver array loop over the
    * collected edge list instead (the collect is bounded by the count
    * guard, read from already-checkpointed blocks). At real scale the
    * guard fails and the distributed loop below runs unchanged — the
    * 100 TB path is untouched; GraphLayoutSpec asserts both paths agree
    * on the same graphs.
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               damping: Double = 0.85,
               maxBroadcastNodes: Long = 1000000L,
               localThreshold: Long = 2000000L): DataFrame = {
    // EAGER checkpoint FIRST (the Dedup.connectedComponents discipline):
    // the edge relation is read once by the guard count and twice by the
    // distributed build below, which would otherwise re-run the caller's
    // edge-mining lineage each time; checkpointed leaves also keep the
    // printed round plans O(iterations) regardless of caller depth.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val m = e.count() // reads the materialized blocks, not the lineage
    require(m > 0, "pageRank over an empty edge set")
    if (m <= localThreshold) return localPageRank(e, iterations, damping)

    // Distributed path. Round-cost structure: the out-degree is FOLDED
    // into the edge relation once (no per-round degree join), and the
    // edge relation is pre-partitioned on `src` with the partitioning
    // PRESERVED through the checkpoint (LogicalRDD keeps
    // outputPartitioning — the CC loop's `repartition(nbr)` trick), so
    // each round moves only rank-sized relations, never the edges.
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val eDeg = e.join(outDeg, Seq("src"))
      .repartition(col("src")).localCheckpoint(true)
    val nodes = eDeg.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val teleport = (1.0 - damping) / n
    // |nodes| is MEASURED (the count above), so the rank-side join
    // strategy is a guarded decision, not an assumption (the repo's
    // maxBroadcastGrams norm): under the limit the per-round rank
    // relation broadcasts (no exchange at all — edges stay put in their
    // checkpointed partitions); above it, a shuffle-hash join of the
    // rank relation against the co-partitioned edges (no per-round sort
    // of the edge side, which SMJ would pay every round).
    val useBroadcast = n <= maxBroadcastNodes
    logger.info(s"pageRank: $m edges, $n nodes -> distributed, " +
      (if (useBroadcast) "broadcast rank join"
       else s"shuffle-hash rank join (over maxBroadcastNodes=$maxBroadcastNodes)"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val rankSide = if (useBroadcast) broadcast(ranks)
                     else ranks.hint("shuffle_hash")
      val contribs = eDeg
        .join(rankSide, eDeg("src") === rankSide("node"))
        .select(col("dst").as("node"),
          (col("rank") / col("out_deg")).as("contrib"))
      val inSum = contribs.groupBy(col("node"))
        .agg(sum(col("contrib")).as("in_sum"))
      ranks = nodes.join(inSum, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("in_sum"), lit(0.0)))
            .as("rank"))
    }
    ranks
  }

  /** The identical recurrence as a driver array loop — see the fast-path
    * note on [[pageRank]]. Node ids stay whatever type the caller used
    * (keys in a hash index); first-seen order assigns indices, so the
    * result is a pure function of the collected edge list.
    */
  private def localPageRank(e: DataFrame, iterations: Int,
                            damping: Double): DataFrame = {
    val spark = e.sparkSession
    val rows = e.collect() // bounded by the caller's localThreshold guard
    val idx = new java.util.HashMap[Any, Integer]()
    val order = scala.collection.mutable.ArrayBuffer.empty[Any]
    rows.foreach { r =>
      val s = r.get(0)
      if (!idx.containsKey(s)) { idx.put(s, idx.size()); order += s }
    }
    val n = idx.size()
    val m = rows.length
    val srcIx = new Array[Int](m)
    val dstIx = new Array[Int](m) // -1: dst never a src → contribution drops
    val outDeg = new Array[Long](n)
    var i = 0
    while (i < m) {
      val s = idx.get(rows(i).get(0))
      srcIx(i) = s
      outDeg(s) += 1
      val d = idx.get(rows(i).get(1))
      dstIx(i) = if (d == null) -1 else d.intValue()
      i += 1
    }
    val teleport = (1.0 - damping) / n
    var rank = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iterations) {
      val acc = new Array[Double](n)
      var j = 0
      while (j < m) {
        val t = dstIx(j)
        if (t >= 0) acc(t) += rank(srcIx(j)) / outDeg(srcIx(j))
        j += 1
      }
      rank = acc.map(a => teleport + damping * a)
    }
    val out = order.zipWithIndex.map { case (node, k) => Row(node, rank(k)) }
    val schema = StructType(Seq(
      e.schema.fields(0).copy(name = "node"),
      StructField("rank", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }
}
