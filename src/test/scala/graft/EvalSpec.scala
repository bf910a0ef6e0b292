package graft

import graft.operators.{Eval, Popularity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metric semantics vs the reference formulas (als.py:10-20,
  * popularity_model.py:9-33), including the not-found → 0 branch and the
  * [0,1] range properties.
  */
class EvalSpec extends AnyFunSuite {

  test("referenceMapScore replicates als.py:10-20 exactly") {
    // top_k = [1,2,3], labels = [2, 99]:
    //   2 found at 0-based rank 1 -> (1 + 1/2) / 3 = 0.5
    //   99 not found -> 0
    // mean = 0.25
    assert(Eval.referenceMapScore(Seq(1, 2, 3), Seq(2, 99)) === 0.25)
    // first-position hit: (1 + 1/1) / 3 = 2/3; mean over 1 label
    assert(math.abs(Eval.referenceMapScore(Seq(1, 2, 3), Seq(1)) - 2.0 / 3) < 1e-12)
    // duplicate occurrences: first position wins (list semantics of
    // Python's list.index in the reference)
    assert(math.abs(Eval.referenceMapScore(Seq(5, 5, 7), Seq(5)) - (1.0 + 1.0) / 3) < 1e-12)
    assert(Eval.referenceMapScore(Seq(1, 2, 3), Nil) === 0.0)
  }

  test("hitRatioScore replicates popularity_model.py:15-21") {
    assert(Eval.hitRatioScore(Seq(1, 2, 3), Seq(2, 4)) === 0.5)
    assert(Eval.hitRatioScore(Seq(1, 2, 3), Nil) === 0.0)
    assert(Eval.hitRatioScore(Nil, Seq(1)) === 0.0)
  }

  test("metric range properties (seeded random sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val topK = List.fill(rnd.nextInt(20))(rnd.nextInt(50))
      val labels = List.fill(rnd.nextInt(20))(rnd.nextInt(50))
      val m = Eval.referenceMapScore(topK, labels)
      val h = Eval.hitRatioScore(topK, labels)
      // reference mAP can exceed 1 only if k < 2 (quirk of the formula);
      // for topK of size >= 2 it stays in [0, 1]
      assert(h >= 0.0 && h <= 1.0)
      if (topK.size >= 2) assert(m >= 0.0 && m <= 1.0)
    }
  }

  test("distributed referenceMapGlobal matches the scalar formula") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    val topK = Seq(10, 20, 30).zipWithIndex
      .toDF("movieId", "rank0")
      .select(col("movieId"), (col("rank0") + 1).cast("long").as("rank"))
    val labels = Seq(20, 99, 10).toDF("movieId")
    val got = Eval.referenceMapGlobal(labels, topK, 3).first().getDouble(0)
    // label 20 at rank 2 -> (1+1/2)/3; 99 absent -> 0; 10 at rank 1 -> (1+1)/3
    val want = (0.5 + 0.0 + 2.0 / 3) / 3
    assert(math.abs(got - want) < 1e-6)
  }

  test("standardMapAtK on a hand-computed fixture") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    // user 1: recs [5(r1), 6(r2), 7(r3)], labels {6, 7}:
    //   hits at ranks 2,3 -> AP = (1/2 + 2/3) / min(2, 3) = 0.583333
    // user 2: labels {9} never recommended -> AP = 0
    // MAP = 0.291667
    val recs = Seq((1L, 5, 1L), (1L, 6, 2L), (1L, 7, 3L), (2L, 5, 1L))
      .toDF("userId", "movieId", "rank")
    val labels = Seq((1L, 6), (1L, 7), (2L, 9)).toDF("userId", "movieId")
    val got = Eval.standardMapAtK(labels, recs, 3).first().getDouble(0)
    assert(math.abs(got - 0.291667) < 1e-6)
  }

  test("weighted score formula matches popularity_model.py:9-13") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    val df = Seq((100.0, 4.0, 25.0, 3.0)).toDF("v", "r", "per", "avg")
    val got = df.select(Popularity.weightedScore(
      col("v"), col("r"), col("per"), col("avg"))).first().getDouble(0)
    val want = 100.0 / 125 * 4.0 + 25.0 / 125 * 3.0
    assert(math.abs(got - want) < 1e-12)
  }

  test("rmse expression") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    val df = Seq((1.0, 2.0), (3.0, 3.0)).toDF("rating", "prediction")
    val got = Eval.rmse(df).first().getDouble(0)
    assert(math.abs(got - math.sqrt(0.5)) < 1e-6)
  }

  test("q_eval_mrr: exact 1/2520-unit reciprocals vs a driver recompute") {
    val spark0 = SparkTestBase.spark
    val row = SparkEntry.queries("q_eval_mrr")(spark0, SparkTestBase.sf)
      .collect().head
    // independent recompute: first-hit ranks from the same deterministic
    // split/recs definitions, MRR folded exactly in BigInt 1/2520 units
    val ratings = Tables.ratings(spark0, SparkTestBase.sf)
      .select(col("userId"), col("movieId"), col("rating")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val train = ratings.filter(t => t._2 % 10 < 6)
    val valL = ratings.filter(t => t._2 % 10 == 6 || t._2 % 10 == 7)
    val recs = train.groupBy(t => (t._1, t._2))
      .map { case ((u, m), xs) => (u, m, xs.map(_._3).sum / xs.size) }
      .groupBy(_._1).flatMap { case (_, xs) =>
        xs.toSeq.sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
          .map { case ((u, m, _), i) => (u, m, i + 1L) }
      }.toSet
    val labels = valL.map(t => (t._1, t._2)).toSet
    val users = labels.map(_._1)
    val firstHit = recs.filter(r => labels.contains((r._1, r._2)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val units = users.toSeq.map(u =>
      firstHit.get(u).map(r => BigInt(2520 / r)).getOrElse(BigInt(0))).sum
    val den = BigInt(2520) * users.size
    val mrr = (units * 1000000 / den +
      (if ((units * 1000000 % den) * 2 >= den) 1 else 0)).toDouble / 1e6
    assert(row.getLong(0) == users.size.toLong)
    assert(row.getLong(1) == firstHit.size.toLong)
    assert(row.getDouble(2) == mrr)
  }
}
