package graft

import graft.functions.ExactRatio._
import org.apache.spark.sql.functions._

/** The version-proof rounded-ratio helpers (the r13 `q_ks_two_sample`
  * driver-seam fix): exact integer 6-dp rounding for count ratios
  * (ratio6/sratio6) and the IEEE-only deterministic rounder (det6).
  */
class ExactRatioSpec extends SparkTestBase {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getDouble(0)

  test("ratio6 reproduces the r13 seam value 4250/62500 = 0.068 exactly") {
    // the exposed class: a true quotient that terminates at <= 6 dp —
    // round(double, 6) implementations disagree here by one ulp
    assert(one(ratio6(lit(4250L), lit(62500L))) == 0.068)
  }

  test("ratio6 rounds half UP on exact midpoints") {
    // 1/2000000 scaled = 0.5 micro-units -> bumps to 1e-6
    assert(one(ratio6(lit(1L), lit(2000000L))) == 1e-6)
    // just below the midpoint stays down
    assert(one(ratio6(lit(1L), lit(2000001L))) == 0.0)
  }

  test("ratio6 equals round() away from boundaries; exact integers pass through") {
    assert(one(ratio6(lit(1L), lit(3L))) == 0.333333)
    assert(one(ratio6(lit(2L), lit(3L))) == 0.666667)
    assert(one(ratio6(lit(10L), lit(4L))) == 2.5)
    assert(one(ratio6(lit(7L), lit(7L))) == 1.0)
    assert(one(ratio6(lit(0L), lit(5L))) == 0.0)
  }

  test("ratio6 survives DECIMAL(38,0) magnitudes a double cannot hold exactly") {
    // num = 10^17 + 1 is NOT representable as a double; the exact path
    // must still see the +1: (10^17+1)/(2*10^17) rounds half-up to 0.5
    // + 1e-6? No: scaled = (10^17+1)*10^6 / (2*10^17) = 500000.000005 ->
    // rounds to 500000 -> 0.5; the +1 shifts it off the midpoint so the
    // half-up bump does NOT fire for the complement below:
    val num = expr("CAST(100000000000000001 AS DECIMAL(38,0))")
    val den = expr("CAST(200000000000000002 AS DECIMAL(38,0))")
    assert(one(ratio6(num, den)) == 0.5) // exactly n/2n
  }

  test("sratio6 rounds half away from zero and never emits a surprise sign") {
    assert(one(sratio6(lit(-1L), lit(3L))) == -0.333333)
    assert(one(sratio6(lit(-1L), lit(2000000L))) == -1e-6)
    assert(one(sratio6(lit(3L), lit(2L))) == 1.5)
    assert(one(sratio6(lit(0L), lit(9L))) == 0.0)
  }

  test("det6 is floor(x*1e6 + 0.5)/1e6 — IEEE-only, matches round() off-boundary") {
    assert(one(det6(lit(0.1234564))) == 0.123456)
    assert(one(det6(lit(0.1234566))) == 0.123457)
    assert(one(det6(lit(-2.5e-7))) == 0.0) // normalizes, no -0.0
    assert(one(det6(lit(123.0))) == 123.0)
  }

  test("SQL twins agree with the Column forms (spark.sql side)") {
    val sql = spark.sql(
      s"SELECT ${"CAST(4250 AS BIGINT)"} AS n").selectExpr(
      "n").collect() // smoke only; the true cross-engine check is the DuckDB gate
    assert(sql.length == 1)
    // ratio6Sql / det6Sql strings are syntactically embeddable
    assert(ratio6Sql("a", "b").contains("// CAST(b AS HUGEINT)"))
    assert(det6Sql("x").contains("FLOOR"))
    assert(sratio6Sql("a", "b").contains("CASE WHEN (a) < 0"))
  }

  test("null num/den propagates to null, not an exception") {
    val r = Seq(1).toDF("x")
      .select(ratio6(lit(null).cast("decimal(38,0)"), lit(3L)).as("r"))
      .collect()(0)
    assert(r.isNullAt(0))
  }
}
