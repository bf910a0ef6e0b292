package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global ranking over a total order WITHOUT a single-partition
  * window.
  *
  * `Window.orderBy(...)` with no `partitionBy` executes as ONE task
  * holding the whole relation (Spark's "No Partition Defined for Window
  * operation" path) — a non-starter at corpus scale. The scale-safe
  * equivalent implemented here is the classic range-sort + offset plan:
  *
  *   1. `orderBy(order)` — a range-partitioned global sort: every
  *      partition holds a contiguous, balanced slice of the total order.
  *   2. ONE bounded job collects per-partition row counts (nPartitions
  *      longs — driver state is O(partitions), never O(rows)).
  *   3. A second pass attaches `rank = offset(partition) + local index`
  *      per partition. Both jobs run over the SAME materialized RDD, so
  *      the shuffle (and its sampled range boundaries) is computed once
  *      and reused — ranks cannot disagree between the passes.
  *
  * This is the `zipWithIndex` idiom with the per-partition counts kept,
  * so the caller also gets the exact total row count without an extra
  * scan. Genuine per-partition imperative logic — one of the few places
  * the RDD API is the right tool.
  */
object Rank {

  /** Shared core of the three public forms: range-sort `df` by `order`,
    * collect per-partition (row count, weight sum) in ONE bounded job —
    * driver state O(partitions) — then append rank and/or running-total
    * columns per partition from the broadcast offset prefix sums.
    *
    * Both passes run over ONE pinned RDD, in Spark's INTERNAL row
    * format (`queryExecution.toRdd` via the graftbridge shim): the r17
    * profile showed the old `df.rdd` + `Row.fromSeq` +
    * `createDataFrame(Row)` form paying external-Row conversion
    * (per-field boxing both ways) on every row of every pass AND on
    * every downstream consumption — several µs/row, ×2-3 passes, the
    * bulk of q_weighted_median's 2 s. The stats pass now only calls
    * `getLong(ordinal)` on the reused UnsafeRow; the emit pass appends
    * the long(s) through a JoinedRow + UnsafeProjection (the same
    * mechanism Spark operators use internally). Arithmetic, partition
    * boundaries and output values are bit-identical to the old form.
    */
  private def withOffsetCols(df: DataFrame, rankCol: Option[String],
      runCol: Option[String], weightCol: Option[String],
      order: Seq[Column]): (DataFrame, Long, Long) = {
    weightCol.foreach { wc =>
      require(df.schema(wc).dataType == LongType,
        s"running-total weight '$wc' must be LongType, " +
          s"got ${df.schema(wc).dataType}")
    }
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val wIdx = weightCol.map(sorted.schema.fieldIndex).getOrElse(-1)
    val rdd = Bridge.toInternalRdd(sorted)
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L; var s = 0L
      it.foreach { r =>
        c += 1
        if (wIdx >= 0 && !r.isNullAt(wIdx)) s += r.getLong(wIdx)
      }
      Iterator((pid, c, s))
    }.collect().sortBy(_._1)
    val cOff = stats.map(_._2).scanLeft(0L)(_ + _)
    val sOff = stats.map(_._3).scanLeft(0L)(_ + _)
    val (totalN, totalW) =
      if (stats.isEmpty) (0L, 0L) else (cOff.last, sOff.last)
    val newFields =
      rankCol.map(StructField(_, LongType, nullable = false)).toSeq ++
        runCol.map(StructField(_, LongType, nullable = false))
    val schema = StructType(sorted.schema.fields ++ newFields)
    val emitRank = rankCol.isDefined
    val emitRun = runCol.isDefined
    val nExtra = newFields.size
    val bcC = spark.sparkContext.broadcast(cOff)
    val bcS = spark.sparkContext.broadcast(sOff)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(schema)
      val joined = new JoinedRow
      val extra = new SpecificInternalRow(Seq.fill(nExtra)(LongType))
      var k = bcC.value(pid)
      var acc = bcS.value(pid)
      it.map { r =>
        var j = 0
        if (emitRank) { k += 1; extra.setLong(0, k); j = 1 }
        if (emitRun) {
          if (wIdx >= 0 && !r.isNullAt(wIdx)) acc += r.getLong(wIdx)
          extra.setLong(j, acc)
        }
        proj(joined(r, extra)): InternalRow
      }
    }
    (Bridge.internalCreateDataFrame(spark, out, schema), totalN, totalW)
  }

  /** `df` + a 1-based dense global rank column over the total order
    * `order` (make it total — include a unique tiebreak key — or the
    * rank of tied rows is decided by sort stability, not content).
    * Returns the ranked frame and the exact total row count.
    */
  def withGlobalRank(df: DataFrame, rankCol: String,
      order: Column*): (DataFrame, Long) = {
    val (out, total, _) =
      withOffsetCols(df, Some(rankCol), None, None, order)
    (out, total)
  }

  /** `df` + an exact inclusive running total of `weightCol` (LongType —
    * asserted on the schema; a NULL weight contributes 0, documented so
    * the contract is explicit rather than an NPE inside the partition
    * fold) over the total order `order` — the scale-safe prefix sum:
    * the same two-pass range-sort plan as [[withGlobalRank]] but
    * collecting per-partition WEIGHT sums (driver state O(partitions)).
    * Returns the frame and the grand total. Long arithmetic throughout
    * — exact while the grand total fits 2^63 (integer cents to ~9e16
    * dollars); the DECIMAL twin of the same plan is the drop-in past
    * that.
    */
  def withRunningTotal(df: DataFrame, runCol: String, weightCol: String,
      order: Column*): (DataFrame, Long) = {
    val (out, _, totalW) =
      withOffsetCols(df, None, Some(runCol), Some(weightCol), order)
    (out, totalW)
  }

  /** [[withGlobalRank]] + [[withRunningTotal]] in ONE range-sorted pass:
    * per-partition (row count, weight sum) collected together, both
    * offset arrays broadcast, one emit job. For consumers that need the
    * Lorenz pair (k, cum) — knee detection, exact-share cuts — this
    * halves the sort work and guarantees rank/total row alignment by
    * construction. Same LongType-weight / NULL=0 contract as
    * [[withRunningTotal]]. Returns (frame, total rows, grand total).
    */
  def withRankAndRunningTotal(df: DataFrame, rankCol: String,
      runCol: String, weightCol: String,
      order: Column*): (DataFrame, Long, Long) =
    withOffsetCols(df, Some(rankCol), Some(runCol), Some(weightCol), order)

  /** Quantile normalization: map each row's `valueCol` within its
    * `groupCol` distribution onto the POOLED distribution — the row at
    * within-group rank r (of n_g) becomes the pooled order statistic at
    * position ceil(r·N/n_g). Exact integer arithmetic with a full
    * (value, id) tiebreak; NO per-group window anywhere (the q_fuzzy_snm
    * parallelism-cap lesson): within-group ranks come from ONE
    * range-partitioned global sort on (group, value, id) minus a bounded
    * ≤|groups| broadcast of per-group start offsets, and the pooled
    * lookup is a second range-sorted rank joined on position. The r·N
    * position product is LONG — exact to ~3e9 rows; past that the
    * DECIMAL(38,0) twin of the same arithmetic is the drop-in.
    *
    * Output: (idCol, groupCol, valueCol, normCol).
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, normCol: String): DataFrame = {
    val base = df.select(col(idCol), col(groupCol), col(valueCol))
    val (ranked0, nTotal) = withGlobalRank(
      base, "__grank", col(groupCol), col(valueCol), col(idCol))
    // pin: consumed twice (per-group offsets + the position join)
    val ranked = ranked0.localCheckpoint(true)
    val offs = ranked.groupBy(col(groupCol))
      .agg((min(col("__grank")) - 1L).as("__off"),
        count(lit(1)).as("__n_g"))
    val withP = ranked.join(broadcast(offs), Seq(groupCol))
      .withColumn("__r", col("__grank") - col("__off"))
      .withColumn("__p", expr(s"(__r * ${nTotal}L + __n_g - 1) div __n_g"))
    val (pooled, _) = withGlobalRank(
      base.select(col(valueCol).as("__pv"), col(idCol).as("__pid")),
      "__prank", col("__pv"), col("__pid"))
    withP.join(pooled.select(col("__prank"), col("__pv")),
        col("__p") === col("__prank"))
      .select(col(idCol), col(groupCol), col(valueCol),
        col("__pv").as(normCol))
  }

  /** Exact `ntile(k)` over a total order, scale-safe: global rank via
    * [[withGlobalRank]], then SQL-standard ntile arithmetic (each tile
    * gets floor(n/k) rows; the first n mod k tiles get one extra) as a
    * plain column expression from the broadcast total. Output column is
    * BIGINT (cross-engine stable; Spark's own `ntile` yields INT).
    */
  def exactNtile(df: DataFrame, k: Int, tileCol: String,
      order: Column*): DataFrame = {
    require(k >= 1, s"k $k")
    val (ranked, total) = withGlobalRank(df, "__rank", order: _*)
    val base = total / k
    val rem = total % k
    val r = col("__rank")
    // base == 0 (fewer rows than tiles): every row is its own tile.
    val tile =
      if (base == 0L) r
      else when(r <= lit(rem * (base + 1L)), (r - 1L) / lit(base + 1L) + 1L)
        .otherwise(lit(rem) + (r - lit(rem * (base + 1L)) - 1L) / lit(base) + 1L)
    ranked.withColumn(tileCol, tile.cast(LongType)).drop("__rank")
  }
}
