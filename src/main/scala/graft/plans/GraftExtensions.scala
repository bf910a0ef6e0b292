package graft.plans

import graft.functions.TextHashFunctions.SimHash64
import graft.functions.VectorFunctions.{CosineSimilarity, DotProduct, L2Norm}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: algebraic rewrites for the vector expressions.
  *
  *  - `cosine_similarity(a, a)` → `CASE WHEN a IS NULL THEN NULL
  *    WHEN l2_norm(a) = 0 THEN 0.0 ELSE 1.0 END` — one array pass
  *    instead of the fused three-accumulator loop, and constant-foldable
  *    when `a` is a literal. (Not simply `1.0`: zero vectors yield 0 and
  *    nulls propagate — same semantics as the evaluated expression.)
  *  - `dot_product(a, a)` → `pow(l2_norm(a), 2)` — one accumulator.
  *
  * Only fires on deterministic children (a nondeterministic `a` evaluated
  * twice is not the same value twice).
  */
object VectorAlgebraRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
      If(IsNull(a), Literal(null, DoubleType),
        If(EqualTo(L2Norm(a), Literal(0.0)), Literal(0.0), Literal(1.0)))
    case DotProduct(a, b) if a.deterministic && a.semanticEquals(b) =>
      Pow(L2Norm(a), Literal(2.0))
  }
}

/** Session extensions: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) registers the engine's SQL
  * functions and the algebra rule on every session — the standard
  * library-integration point (SparkSessionExtensions), no session-level
  * mutation needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) = new ExpressionInfo("graft", name)
    e.injectFunction((FunctionIdentifier("cosine_similarity"), info("cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("dot_product"), info("dot_product"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("l2_norm"), info("l2_norm"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    e.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("quantize_int8"), info("quantize_int8"),
      (es: Seq[Expression]) => graft.functions.VectorFunctions.QuantizeInt8(es.head)))
    e.injectFunction((FunctionIdentifier("cosine_similarity_int8"), info("cosine_similarity_int8"),
      (es: Seq[Expression]) => graft.functions.VectorFunctions.Int8CosineSimilarity(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("shingle_set"), info("shingle_set"),
      (es: Seq[Expression]) => graft.functions.TextHashFunctions.ShingleSet(es.head,
        graft.functions.VectorFunctions.litInt(es(1), "n"))))
    e.injectFunction((FunctionIdentifier("rolling_fingerprints"), info("rolling_fingerprints"),
      (es: Seq[Expression]) => graft.functions.TextHashFunctions.RollingFingerprints(es.head,
        graft.functions.VectorFunctions.litInt(es(1), "n"),
        graft.functions.VectorFunctions.litInt(es(2), "keepMod"))))
    e.injectFunction((FunctionIdentifier("text_stats"), info("text_stats"),
      (es: Seq[Expression]) => graft.functions.TextStats.TextStatsExpr(es.head)))
    e.injectOptimizerRule(_ => VectorAlgebraRule)
  }
}

object GraftExtensions {
  /** Install the algebra rule on an already-built session (the
    * extensions path only works at session build time).
    */
  def installRule(spark: org.apache.spark.sql.SparkSession): Unit = {
    val sc = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!sc.experimental.extraOptimizations.contains(VectorAlgebraRule))
      sc.experimental.extraOptimizations =
        sc.experimental.extraOptimizations :+ VectorAlgebraRule
  }
}
