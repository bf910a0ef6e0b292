package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation forms: results must be IDENTICAL to the
  * unsalted plans (salting redistributes work, never changes semantics),
  * including on deliberately skewed fixtures.
  */
class SkewSpec extends SparkTestBase {

  import spark.implicits._

  // hot key: 90% of rows share key 1
  lazy val skewed = (
    (1 to 900).map(i => (1L, i.toLong, i * 0.5)) ++
      (1 to 100).map(i => (1L + i % 7, i.toLong, i * 0.25))
    ).toDF("k", "id", "v")

  test("saltedSumCount equals the direct groupBy aggregate") {
    val salted = Skew.saltedSumCount(skewed, "k", "v", spread = Seq("id"), buckets = 8)
      .select(col("k"), round(col("sum_v"), 9).as("s"), col("n"))
    val direct = skewed.groupBy(col("k"))
      .agg(round(sum(col("v")), 9).as("s"), count(lit(1)).as("n"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("saltedJoin equals the direct join on a skewed fact side") {
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (8L, "unmatched"))
      .toDF("k", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", spread = Seq("id"), buckets = 8)
      .select(col("k"), col("id"), col("label"))
    val direct = skewed.join(dim, Seq("k")).select(col("k"), col("id"), col("label"))
    assert(salted.count() == direct.count())
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }
}
