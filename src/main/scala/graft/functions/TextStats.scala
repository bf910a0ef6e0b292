package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics in ONE pass over the string:
  * `struct(n_chars, n_tokens, n_punct, n_upper, n_stop, sum_token_len)`.
  *
  * The composed form (`size(split(...))`, `size(filter(toks, ...))`,
  * `regexp_extract_all` × 2, `aggregate(toks, ...)`) re-tokenizes inside
  * every higher-order-function lambda — HOF argument expressions are
  * re-evaluated per element and are opaque to whole-stage-codegen
  * subexpression elimination. A single struct-returning expression is
  * CSE'd across its field accesses, so the scan happens once per row.
  *
  * Tokenizer semantics mirror `Dedup.tokens` (lowercase; non-letter/digit
  * → space; split on whitespace runs) and the punctuation/upper classes
  * mirror Java regex `\p{Punct}` (ASCII) and `[A-Z]`, so results are
  * bit-identical to the composed form on which the DuckDB oracle was
  * validated.
  */
object TextStats {

  val stopwords: Set[String] =
    graft.operators.TextAnalysis.enStopwords.toSet

  case class TextStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_chars", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_punct", LongType, nullable = false),
      StructField("n_upper", LongType, nullable = false),
      StructField("n_stop", LongType, nullable = false),
      StructField("sum_token_len", LongType, nullable = false)))

    override def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String].toString
      var punct = 0L; var upper = 0L
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        // Java \p{Punct}: !"#$%&'()*+,-./ : ;<=>?@ [\]^_` {|}~
        if ((c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
          (c >= 91 && c <= 96) || (c >= 123 && c <= 126)) punct += 1
        if (c >= 'A' && c <= 'Z') upper += 1
        i += 1
      }
      var nTok = 0L; var nStop = 0L; var sumLen = 0L
      val sb = new java.lang.StringBuilder
      def flush(): Unit = if (sb.length > 0) {
        nTok += 1; sumLen += sb.length
        if (stopwords.contains(sb.toString)) nStop += 1
        sb.setLength(0)
      }
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isLetter(c) || Character.isDigit(c))
          sb.append(Character.toLowerCase(c))
        else flush() // whitespace AND stripped punctuation both delimit
        i += 1
      }
      flush()
      InternalRow(s.length.toLong, nTok, punct, upper, nStop, sumLen)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
          s"graft.functions.TextStats.statsEval($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def statsEval(s: UTF8String): InternalRow =
    TextStatsExpr(null).nullSafeEval(s).asInstanceOf[InternalRow]

  def text_stats(text: Column): Column =
    Bridge.column(TextStatsExpr(Bridge.expression(text)))

  /** Per-language function-word hit counts in one tokenization pass:
    * element i of the result is the hit count for language i of
    * `TextAnalysis.langStopwords` in code-ascending order (de, en, es,
    * fr). Same fusion rationale as [[TextStatsExpr]] — the composed form
    * tokenized once per language lambda.
    */
  case class LangHitsExpr(child: Expression) extends UnaryExpression {
    @transient private lazy val langs: Array[(String, Set[String])] =
      graft.operators.TextAnalysis.langStopwords.toSeq.sortBy(_._1)
        .map { case (l, ws) => (l, ws.toSet) }.toArray
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String].toString
      val hits = new Array[Long](langs.length)
      val sb = new java.lang.StringBuilder
      def flush(): Unit = if (sb.length > 0) {
        val t = sb.toString
        var j = 0
        while (j < langs.length) { if (langs(j)._2.contains(t)) hits(j) += 1; j += 1 }
        sb.setLength(0)
      }
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isLetter(c) || Character.isDigit(c))
          sb.append(Character.toLowerCase(c))
        else flush()
        i += 1
      }
      flush()
      new GenericArrayData(hits)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
          s"graft.functions.TextStats.langHitsEval($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def langHitsEval(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    LangHitsExpr(null).nullSafeEval(s)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]

  def lang_hits(text: Column): Column =
    Bridge.column(LangHitsExpr(Bridge.expression(text)))
}
