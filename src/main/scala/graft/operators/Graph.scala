package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations (the power-iteration
  * family, complementing [[Dedup.connectedComponents]]' pointer-jumping).
  *
  * Scale shape: each iteration is ONE shuffle — `edges ⋈ ranks` on `src`
  * (the rank relation is |nodes| rows, joined on its key) followed by a
  * `groupBy(dst)` with map-side partial sums. Nothing is ever collected
  * to the driver except the single `|nodes|` scalar; the rank relation
  * never exceeds one row per node. A fixed iteration count keeps the
  * lineage bounded (5 levels), so no checkpointing is needed; a
  * convergence-driven variant at scale would `persist` + checkpoint
  * every ~10 rounds exactly like the CC loop (Dedup.scala).
  *
  * Determinism: ranks are pure arithmetic over the edge multiset; the
  * only partitioning-sensitive step is the double `sum`, whose
  * last-ulp addition-order wobble is absorbed by the caller rounding
  * final ranks (the repo-wide 6dp cross-engine contract; SCALING.md).
  */
object Graph {

  /** PageRank with `iterations` fixed power-iteration rounds at the
    * given damping. `edges` must be `(src, dst)`; every node that should
    * receive teleport mass must appear as a `src` at least once (a
    * symmetric edge set satisfies this trivially and has no dangling
    * nodes — callers with genuinely directed graphs should pre-attach
    * their dangling-mass convention). Returns `(node, rank)` un-rounded;
    * callers own the presentation rounding.
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node")).distinct()
    val n = nodes.count() // one scalar aggregate, never a materialization
    require(n > 0, "pageRank over an empty edge set")
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(outDeg, Seq("src"))
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
}
