package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document COMPRESSION RATIO (deflated bytes / raw bytes) — the
  * classic cheap redundancy detector for corpus curation: templated spam,
  * keyboard mash with long runs, and boilerplate-heavy docs compress far
  * below natural prose (~0.4-0.7 for English), while random-looking text
  * sits near (or above) 1.0. Complements `q_repetition`'s top-token share
  * (which only sees TOKEN-level repetition; deflate sees phrase- and
  * structure-level redundancy in one pass).
  *
  * Deflate (java.util.zip, raw stream, fixed DEFAULT_COMPRESSION level)
  * is a deterministic function of the input bytes for a fixed zlib
  * implementation — the JDK bundles its own, so results are stable across
  * runs and partitionings (spec-asserted). Not SQL-expressible → the
  * consuming query is rows-only with scalatest coverage.
  *
  * Codegen'd via the [[TextStats]] pattern: a static eval entry point
  * called from generated code, so the expression stays inside
  * whole-stage codegen (no UDF boundary, no serialization).
  */
object CompressStats {

  /** deflate(bytes).length / bytes.length; empty text → 1.0 (neutral). */
  def ratioEval(u: UTF8String): Double = {
    val bytes = u.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  case class CompressRatioExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      ratioEval(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.CompressStats.ratioEval($a);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def compress_ratio(text: Column): Column =
    Bridge.column(CompressRatioExpr(Bridge.expression(text)))
}
