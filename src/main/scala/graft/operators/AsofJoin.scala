package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the latest right row with the
  * same key and `rightTime <= leftTime` (backward), or the earliest with
  * `rightTime >= leftTime` (forward).
  *
  * Spark has no native as-of join; the preference ladder (compose >
  * custom Expression > custom SparkPlan) lands on COMPOSE here, because
  * the union+window form is already shuffle-optimal:
  *
  *   tag and union both sides → one shuffle on (key) → per-key
  *   time-ordered window carrying `last(right value, ignoreNulls)` →
  *   keep left rows.
  *
  * That is exactly the merge a hand-written `AsofJoinExec` would do
  * (co-partition by key, in-order sweep), with state = one value column
  * per attached field. Cost: ONE shuffle of |L|+|R| rows, no row
  * multiplication — unlike the naive join+filter+row_number form, which
  * explodes each left row by its key's full right history before pruning.
  *
  * Ties (equal timestamps): the right row sorts first, so equality
  * matches (`<=` semantics, like DuckDB/pandas ASOF backward); equal-time
  * right rows resolve to the largest tiebreak column value.
  */
object AsofJoin {

  /** @param left        left relation
    * @param right       right relation
    * @param key         equi-join key column name (same name both sides)
    * @param leftTime    left event-time column (numeric or timestamp)
    * @param rightTime   right event-time column
    * @param attach      right columns to attach (renamed as given)
    * @param rightTiebreak column resolving equal-time right rows
    */
  def asofBackward(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      attach: Map[String, String], rightTiebreak: String): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, attach, rightTiebreak,
      forward = false)

  /** As-of FORWARD join: attach the EARLIEST right row with
    * `rightTime >= leftTime` (equality matches). Same union+window shape
    * run over the reversed time order; equal-time right rows resolve to
    * the SMALLEST tiebreak value (mirror of backward's largest).
    */
  def asofForward(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      attach: Map[String, String], rightTiebreak: String): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, attach, rightTiebreak,
      forward = true)

  private def asofImpl(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      attach: Map[String, String], rightTiebreak: String,
      forward: Boolean): DataFrame = {

    val leftCols = left.columns
    val attachSrc = attach.keys.toSeq
    val attachDst = attach.values.toSeq

    // right side: (key, t, tag=0, tiebreak, attached..., nulls for left cols)
    val rTagged = right.select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__tag"),
        col(rightTiebreak).as("__tb")) ++
        attachSrc.zip(attachDst).map { case (s, d) => col(s).as(s"__a_$d") } ++
        leftCols.filter(_ != key).map(c => lit(null).as(s"__l_$c")): _*)

    // left side: (key, t, tag=1, null tiebreak, null attached, left cols)
    val lTagged = left.select(
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__tag"),
        lit(null).cast("long").as("__tb")) ++
        attachDst.map(d => lit(null).as(s"__a_$d")) ++
        leftCols.filter(_ != key).map(c => col(c).as(s"__l_$c")): _*)

    val unioned = rTagged.unionByName(lTagged, allowMissingColumns = false)
    // backward: time asc, right-before-left on ties (<= semantics), then
    // tiebreak asc so duplicate-time right rows resolve to the LARGEST
    // tiebreak (last seen wins in the running `last`).
    // forward: the same sweep over time DESC — "last right seen" is then
    // the earliest right at-or-after; tiebreak desc → smallest wins.
    val w = (if (forward)
      Window.partitionBy(col(key))
        .orderBy(col("__t").desc, col("__tag"), col("__tb").desc)
    else
      Window.partitionBy(col(key))
        .orderBy(col("__t"), col("__tag"), col("__tb")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withLast = attachDst.foldLeft(unioned) { (df, d) =>
      df.withColumn(s"__last_$d", last(col(s"__a_$d"), ignoreNulls = true).over(w))
    }

    withLast.filter(col("__tag") === 1)
      .select(
        Seq(col(key), col("__t").as(leftTime)) ++
          leftCols.filter(c => c != key && c != leftTime).map(c => col(s"__l_$c").as(c)) ++
          attachDst.map(d => col(s"__last_$d").as(d)): _*)
  }
}
