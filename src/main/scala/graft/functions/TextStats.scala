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
  * mirror Java regex `\p{Punct}` (ASCII) and `[A-Z]`. Iteration is by
  * Unicode CODE POINT, not UTF-16 unit: `n_chars`/token lengths count code
  * points (matching Spark `length()` and DuckDB `length()` on
  * supplementary-plane text), and case folding is per code point.
  *
  * All shared state (stopword set, language tables) lives in static vals
  * on this object so the codegen entry points ([[statsEval]],
  * [[langHitsEval]]) do zero per-row setup.
  */
object TextStats {

  val stopwords: Set[String] =
    graft.operators.TextAnalysis.enStopwords.toSet

  /** (langCode, functionWordSet) in code-ascending order — shared by the
    * interpreted and codegen paths of [[LangHitsExpr]].
    */
  val langs: Array[(String, Set[String])] =
    graft.operators.TextAnalysis.langStopwords.toSeq.sortBy(_._1)
      .map { case (l, ws) => (l, ws.toSet) }.toArray

  private val statsSchema = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_upper", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false)))

  /** Single-pass stats core — static, allocation-light, shared by the
    * interpreted `eval` and the generated code.
    */
  def statsEval(u: UTF8String): InternalRow = {
    val s = u.toString
    var nChars = 0L; var punct = 0L; var upper = 0L
    var nTok = 0L; var nStop = 0L; var sumLen = 0L
    var tokLen = 0L
    val sb = new java.lang.StringBuilder
    def flush(): Unit = if (tokLen > 0) {
      nTok += 1; sumLen += tokLen
      if (stopwords.contains(sb.toString)) nStop += 1
      sb.setLength(0); tokLen = 0
    }
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      // Java \p{Punct}: !"#$%&'()*+,-./ : ;<=>?@ [\]^_` {|}~ (ASCII-only)
      if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
        (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) punct += 1
      if (cp >= 'A' && cp <= 'Z') upper += 1
      if (Character.isLetter(cp) || Character.isDigit(cp)) {
        sb.appendCodePoint(Character.toLowerCase(cp)); tokLen += 1
      } else flush() // whitespace AND stripped punctuation both delimit
      i += Character.charCount(cp)
    }
    flush()
    InternalRow(nChars, nTok, punct, upper, nStop, sumLen)
  }

  case class TextStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = statsSchema
    override def nullSafeEval(a: Any): Any =
      statsEval(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
          s"graft.functions.TextStats.statsEval($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def text_stats(text: Column): Column =
    Bridge.column(TextStatsExpr(Bridge.expression(text)))

  /** Per-language function-word hit counts in one tokenization pass:
    * element i of the result is the hit count for language i of
    * [[langs]] (code-ascending: de, en, es, fr). Same fusion rationale as
    * [[TextStatsExpr]] — the composed form tokenized once per language
    * lambda.
    */
  def langHitsEval(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = u.toString
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
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp) || Character.isDigit(cp))
        sb.appendCodePoint(Character.toLowerCase(cp))
      else flush()
      i += Character.charCount(cp)
    }
    flush()
    new GenericArrayData(hits)
  }

  case class LangHitsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(a: Any): Any =
      langHitsEval(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
          s"graft.functions.TextStats.langHitsEval($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def lang_hits(text: Column): Column =
    Bridge.column(LangHitsExpr(Bridge.expression(text)))
}
