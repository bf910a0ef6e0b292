package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier): the points not dominated by
  * any other — here "minimize `x`, maximize `y`" (a point loses if some
  * other point has strictly smaller x and y at least as large).
  *
  * The textbook single-machine answer is a sort + running max; the naive
  * Spark translation is `Window.orderBy(x)` with NO partition — one task
  * holding the whole relation (the same trap [[Rank]] exists to avoid).
  * The distributed form used here is the classic local-prune + bounded
  * merge (Börzsönyi et al., "The Skyline Operator", ICDE 2001, §5's
  * divide-and-conquer specialized to 2-D, where a range partition makes
  * the merge a prefix max):
  *
  *   1. collapse x-ties: `groupBy(x).agg(max(y))` — one shuffle; after
  *      this the frontier is exactly the strictly-increasing-y envelope
  *      over ascending x.
  *   2. range-bucket x into `buckets` equal-width cells (one min/max
  *      aggregate, broadcast back as literals).
  *   3. LOCAL prefix max per bucket: a window PARTITIONED by bucket —
  *      every task sorts only its slice.
  *   4. cross-bucket prefix: per-bucket maxima (`buckets` rows — bounded
  *      driver state, like Rank's per-partition counts) scanLeft'd into
  *      "max y of every strictly-earlier bucket", broadcast-joined back.
  *
  * A point survives iff y beats BOTH the in-bucket prefix max and the
  * earlier-bucket max — together those cover exactly the points with
  * strictly smaller x, so the result is the exact skyline with no
  * single-partition stage and O(buckets) driver state. Equal-width
  * bucketing can skew (a hot cell degrades toward one sorted partition,
  * never breaks), which is the same tradeoff the histogram family makes.
  */
object Pareto {

  /** Exact skyline of (`xCol` minimized, `yCol` maximized) over the
    * distinct-x collapse of `df`. Output: (`xCol`, `yCol`) ascending x,
    * y cast to long for a cross-engine-stable schema.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets $buckets")
    // integral x only: the bucket arithmetic and the bounded driver
    // collects read x as long, so x is cast up front (lossless for any
    // integral width; an Int x no longer ClassCastExceptions at the
    // maxima collect). A fractional x would need a caller-side
    // discretization decision — refuse rather than silently truncate.
    require(Seq("ByteType", "ShortType", "IntegerType", "LongType")
        .contains(df.schema(xCol).dataType.toString),
      s"skyline2d needs an integral $xCol (got ${df.schema(xCol).dataType})")
    // pin the collapse: three consumers read it (the min/max head, the
    // bucket-maxima collect, the returned plan) — unpinned, each would
    // re-run the caller's full lineage + the collapse shuffle (the
    // Guarded/Rank lineage discipline)
    val pts = df.groupBy(col(xCol).cast("long").as(xCol))
      .agg(max(col(yCol)).cast("long").as(yCol))
      .localCheckpoint(true)
    val mm = pts.agg(min(col(xCol)), max(col(xCol))).head()
    if (mm.isNullAt(0)) return pts.limit(0) // empty input
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (hi - lo) / buckets + 1L)
    val bucketed = pts.withColumn("__b", ((col(xCol) - lit(lo)) / lit(width))
      .cast("long"))
    val wLocal = Window.partitionBy(col("__b")).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__lmx", max(col(yCol)).over(wLocal))
    // bounded: one row per non-empty bucket
    val bmax = bucketed.groupBy(col("__b"))
      .agg(max(col(yCol)).as("__bmx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // running max over bucket order; prev(i) = max y of buckets before i
    val prev = bmax.map(_._2).scanLeft(Long.MinValue)(math.max).init
    val spark = df.sparkSession
    import spark.implicits._
    val prevDf = bmax.map(_._1).zip(prev).toSeq.toDF("__b", "__pmx")
    local.join(broadcast(prevDf), Seq("__b"))
      .filter(col(yCol) > greatest(coalesce(col("__lmx"), lit(Long.MinValue)),
        col("__pmx")))
      .select(col(xCol), col(yCol))
      .orderBy(col(xCol))
  }
}
