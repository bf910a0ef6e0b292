package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Sorted-neighborhood candidate generation (Hernández/Stolfo SNM) that
  * scales out past the block-key cardinality.
  *
  * The textbook Spark form — `lead(1..w-1) over
  * Window.partitionBy(block).orderBy(key)` — is correct but its
  * parallelism is capped at |distinct block| FOREVER: with a 92-value
  * block vocabulary, 92 tasks each sort 1/92nd of the corpus while the
  * rest of a 1000-executor cluster idles, and per-task data grows
  * linearly with the corpus. The scale-safe equivalent implemented here
  * is the classic range-sort + boundary-handoff plan (the same family
  * as [[Rank.withGlobalRank]]):
  *
  *   1. `repartitionByRange(block, key)` + `sortWithinPartitions` — a
  *      range-partitioned GLOBAL sort on the composite key. Because the
  *      range boundaries are sampled over (block, key) TUPLES, a hot
  *      block splits across as many tasks as its share of the data —
  *      partition count tracks input size (spark.sql.shuffle.partitions
  *      / AQE), not block cardinality.
  *   2. ONE bounded job collects each partition's first `w-1` rows —
  *      driver state is O(partitions · w), never O(rows).
  *   3. The driver assembles each partition's CARRY: the first `w-1`
  *      rows of everything AFTER it in global order (walking successor
  *      partitions' heads until w-1 rows accumulate — a successor whose
  *      head is shorter than w-1 is wholly consumed, so the walk
  *      continues into the next one; runt partitions cannot starve the
  *      handoff).
  *   4. A second pass over the SAME materialized sort slides a w-deep
  *      ring buffer over (local rows ++ carry), emitting (prev, next)
  *      for every buffered row that is LOCAL and shares `next`'s block.
  *      Carry rows pair only as successors — their own anchored pairs
  *      belong to (and are emitted by) the partition that owns them —
  *      so no pair is emitted twice. Both jobs run over one RDD, so the
  *      range-sort shuffle is computed once and reused.
  *
  * Within a block the global (block, key) order restricted to the block
  * IS the block's key order, and blocks are contiguous under the
  * composite sort — so the emitted pair set is exactly the windowed
  * form's: each row with its ≤ w-1 in-block successors. Per-task memory
  * is O(w); the sliding pass is map-only.
  *
  * Caller contract: `key` must be a total order within each block
  * (dedupe first, or append a unique tiebreak into the key) — with ties
  * the neighbor set depends on sort stability, not content (the
  * [[Rank.withGlobalRank]] caveat).
  */
object SortedNeighborhood {

  /** Ordered candidate pairs (block, a, b): `b` is one of `a`'s `w-1`
    * successors in the block's `keyCol` order. String-typed block/key
    * (the ER use case); `numPartitions` defaults to the session's
    * shuffle parallelism so the sort scales with input size.
    */
  def pairs(df: DataFrame, blockCol: String, keyCol: String, w: Int,
      numPartitions: Option[Int] = None): DataFrame = {
    require(w >= 2, s"window w must be >= 2 (got $w)")
    val spark = df.sparkSession
    val sorted = globalSort(df, blockCol, keyCol, numPartitions)
    // Pin the lineage (the Rank discipline): the heads job and the
    // sliding job must read the SAME range-sort shuffle, or the sampled
    // range boundaries could disagree between passes.
    val rdd = sorted.rdd
    val heads = rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator((pid, it.take(w - 1)
        .map(r => (r.getString(0), r.getString(1))).toArray))
    }.collect().sortBy(_._1).map(_._2)
    val nP = heads.length
    val carries: Array[Array[(String, String)]] = Array.tabulate(nP) { p =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var q = p + 1
      var open = true // successor partition q fully consumed so far
      while (q < nP && open && buf.length < w - 1) {
        buf ++= heads(q)
        // a full head (w-1 rows) means partition q has MORE rows than we
        // collected — anything past its head is farther than w-1 away
        if (heads(q).length >= w - 1) open = false
        q += 1
      }
      buf.take(w - 1).toArray
    }
    val bc = spark.sparkContext.broadcast(carries)
    val schema = StructType(Seq(
      StructField("block", StringType, nullable = true),
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true)))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      // ring of the previous w-1 rows: (block, key, isLocal)
      val ring = scala.collection.mutable.ArrayDeque
        .empty[(String, String, Boolean)]
      val local = it.map(r => (r.getString(0), r.getString(1), true))
      val carry = bc.value(pid).iterator.map { case (b, k) => (b, k, false) }
      (local ++ carry).flatMap { case (bIn, kIn, isLocalIn) =>
        val emitted = ring.iterator.collect {
          case (bPrev, kPrev, true) if bPrev == bIn => Row(bPrev, kPrev, kIn)
        }.toList
        ring.append((bIn, kIn, isLocalIn))
        if (ring.length > w - 1) ring.removeHead()
        emitted
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** The range-partitioned global sort both passes read — exposed
    * `private[graft]` so ScalePostureSpec can assert the exchange is
    * RANGE partitioning on (block, key), not hash-on-block.
    */
  private[graft] def globalSort(df: DataFrame, blockCol: String,
      keyCol: String, numPartitions: Option[Int]): DataFrame = {
    val sel = df.select(col(blockCol).cast("string").as("block"),
      col(keyCol).cast("string").as("key"))
    val ranged = numPartitions match {
      case Some(n) => sel.repartitionByRange(n, col("block"), col("key"))
      case None => sel.repartitionByRange(col("block"), col("key"))
    }
    ranged.sortWithinPartitions(col("block"), col("key"))
  }
}
