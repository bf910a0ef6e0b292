package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys.
  *
  * AQE's runtime skew-join split handles most cases automatically (left
  * on everywhere in this engine); these are the EXPLICIT forms for the
  * cases AQE can't see — a skewed AGGREGATE (one group ≫ the rest melts
  * one task's hash map) and a skewed join where the planner must not
  * rely on runtime stats.
  *
  * Salt discipline: the salt is a deterministic function of row CONTENT
  * (`xxhash64` of caller-chosen spread columns), never `rand()` /
  * partition id / monotonic id — lost-partition recomputation must land
  * every row in the same salt bucket it had before the failure (same
  * invariant as Split's content-hash ordering; SCALING.md "determinism
  * under re-evaluation").
  */
object Skew {

  /** Two-phase salted sum/count: phase 1 aggregates (key, salt) —
    * spreading a hot key over `buckets` parallel partial states — and
    * phase 2 merges the ≤`buckets` partials per key. Both phases get
    * map-side partial aggregation for free, so the extra shuffle carries
    * only |keys|×buckets rows.
    *
    * @param spread columns whose hash spreads rows across salts (any
    *               columns with per-row variety; NOT the group key)
    */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String,
      spread: Seq[String], buckets: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(spread.map(col): _*), lit(buckets))
    df.withColumn("__salt", salt)
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as(s"sum_$valueCol"), sum(col("__c")).as("n"))
  }

  /** Salted equi-join for a skewed BIG side against a small-but-not-
    * broadcastable dimension: big rows are salted by content hash, the
    * dimension is replicated ×`buckets` (explode), and the join key
    * becomes (key, salt) — a hot key's rows land in `buckets` different
    * reducers instead of one.
    */
  def saltedJoin(
      big: DataFrame, dim: DataFrame, key: String,
      spread: Seq[String], buckets: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(spread.map(col): _*), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
