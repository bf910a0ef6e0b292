package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Version-proof rounded ratios of exact integers.
  *
  * THE SEAM (VERDICT r13, What's-wrong #1): when a query's LAST op is
  * `round(num/den, 6)` on a double division of exact integers, and the true
  * rational value terminates at ≤6 decimals (e.g. 4250/62500 = 0.068), the
  * double quotient sits between the two representable neighbours of the
  * 6-dp value and different `ROUND(DOUBLE, 6)` implementations (sprintf-
  * based vs scaled-multiply; DuckDB versions differ) can land one ulp
  * apart — a hash mismatch with both engines "correct".
  *
  * THE FIX: never round a double. Compute `round_half_up(num/den, 6)` in
  * EXACT integer arithmetic — `q6 = (num·10⁶) div den`, plus 1 when
  * `2·rem ≥ den` — then produce the double as `q6 / 10⁶`. Both operands of
  * that final division are exactly representable (q6 ≤ ~9·10¹⁵ in every
  * use) and IEEE-754 division is correctly rounded BY DEFINITION, so every
  * compliant engine yields the identical bit pattern. [[ratio6Sql]] emits
  * the mirrored DuckDB form (HUGEINT `//`/`%`) from the same spec so the
  * two sides cannot drift.
  *
  * Preconditions (all call sites are count/sum-of-count ratios):
  * `num ≥ 0`, `den > 0`, and `num·10⁶ < 10³⁸` (DECIMAL(38,0) headroom on
  * the Spark side; HUGEINT on the oracle side) — safe for any count a
  * 100 TB corpus can produce.
  */
object ExactRatio {

  private val Scale = 1000000L

  /** `round_half_up(num/den, 6)` as an exactly-reproducible DOUBLE.
    * `num`/`den` must be exact integers (any integral or DECIMAL(p,0)).
    */
  def ratio6(num: Column, den: Column): Column = {
    val n6 = num.cast("decimal(38,0)") * lit(Scale).cast("decimal(38,0)")
    val d0 = den.cast("decimal(38,0)")
    // pmod is exact on decimals; (n6 - rem) is divisible by d0, so the
    // decimal division's HALF_UP rounding to its result scale is a no-op
    // (the true quotient IS an integer) — the floor-div is exact.
    val rem = pmod(n6, d0)
    val qf  = ((n6 - rem) / d0).cast("decimal(38,0)")
    val q6  = qf + when(rem * lit(2) >= d0, lit(1)).otherwise(lit(0))
      .cast("decimal(38,0)")
    q6.cast("double") / lit(Scale.toDouble)
  }

  /** The DuckDB mirror of [[ratio6]]: HUGEINT floor-div + half-up bump,
    * then the same exact double division. `num`/`den` are SQL expressions
    * (parenthesize compound args at the call site).
    */
  def ratio6Sql(num: String, den: String): String = {
    val n6 = s"(CAST($num AS HUGEINT) * $Scale)"
    val d0 = s"CAST($den AS HUGEINT)"
    s"(CAST($n6 // $d0 + (CASE WHEN ($n6 % $d0) * 2 >= $d0 THEN 1 ELSE 0 END) " +
      s"AS DOUBLE) / $Scale.0)"
  }

  /** Signed [[ratio6]]: round-half-AWAY-FROM-ZERO (the SQL ROUND
    * convention both engines use) of `num/den` where `num` may be
    * negative and `den > 0`. Exact integer arithmetic throughout.
    */
  def sratio6(num: Column, den: Column): Column = {
    val sgn = when(num < 0, lit(-1.0)).otherwise(lit(1.0))
    sgn * ratio6(abs(num), den)
  }

  /** DuckDB mirror of [[sratio6]]. */
  def sratio6Sql(num: String, den: String): String =
    s"((CASE WHEN ($num) < 0 THEN -1.0 ELSE 1.0 END) * " +
      ratio6Sql(s"abs($num)", den) + ")"

  /** Deterministic 6-dp rounding of an ALREADY cross-engine-bit-identical
    * DOUBLE (the exact-moments stats tier: every +,−,×,÷ is IEEE
    * correctly rounded, so a chain written in the same op order yields
    * the same bits on any engine — only the final library `ROUND` call
    * is implementation-defined). `floor(x·10⁶ + 0.5)` uses ONLY
    * correctly-rounded IEEE ops, so it is reproducible bit-for-bit on
    * any engine, unlike `ROUND(DOUBLE, 6)` whose result near a 6-dp
    * boundary depends on the library's algorithm (sprintf vs scaled
    * multiply — the r13 `q_ks_two_sample` driver seam). The result can
    * differ from true half-up by one ulp's worth of classification at
    * exact boundaries — irrelevant; the contract is determinism, and
    * both engines get this SAME definition via [[det6Sql]].
    * Precondition: |x| < 9·10¹² (the BIGINT-exactness window).
    */
  def det6(x: Column): Column =
    floor(x * lit(Scale.toDouble) + lit(0.5)).cast("long")
      .cast("double") / lit(Scale.toDouble)

  /** DuckDB mirror of [[det6]]. */
  def det6Sql(x: String): String =
    s"(CAST(FLOOR(($x) * $Scale.0 + 0.5) AS BIGINT) / $Scale.0)"
}
