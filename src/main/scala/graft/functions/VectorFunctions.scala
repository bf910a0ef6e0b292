package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over `ARRAY<FLOAT>`
  * columns (similarity search / near-dup detection on the `embeddings`
  * table).
  *
  * Why custom expressions and not `functions.aggregate`/`zip_with`: the
  * built-in higher-order functions allocate per-element lambda frames and
  * box floats; a fused loop with `doGenCode` stays inside whole-stage
  * codegen with zero allocation per row — at 100 TB × 64-dim vectors the
  * dot product is the innermost loop of the whole workload. (Preference
  * order per the build contract: compose built-ins < custom Expression —
  * this is the case where built-ins genuinely lose.)
  */
object VectorFunctions {

  /** cosine(a, b) ∈ [-1, 1]; 0.0 when either norm is 0. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i); val yi = y.getFloat(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  float $xi = $a.getFloat($i); float $yi = $b.getFloat($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / Math.sqrt($nx * $ny);
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** dot(a, b) as double. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += x.getFloat(i) * y.getFloat(i); i += 1 }
      dot
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) $dot += $a.getFloat($i) * $b.getFloat($i);
           |${ev.value} = $dot;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** ||a||₂ as double. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0
      while (i < x.numElements()) { val v = x.getFloat(i); s += v * v; i += 1 }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  float $v = $a.getFloat($i); $s += $v * $v;
           |}
           |${ev.value} = Math.sqrt($s);
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Signed random-projection signature (SimHash for cosine space): bit j of
    * the result is `sign(dot(v, h_j))` where hyperplane `h_j` has Rademacher
    * (±1) entries derived from a mixed integer hash of (seed, j, i) — no
    * stored hyperplane matrix, no driver state, deterministic everywhere.
    * Vectors with small cosine distance agree on most bits, so equal
    * band-slices of the signature make LSH buckets for ANN / near-dup.
    */
  case class RandomProjectionSignature(child: Expression, seed: Int, bits: Int)
      extends UnaryExpression {
    require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
    override def dataType: DataType = LongType
    // finalizer-free avalanche mix (splitmix64-style), public-domain constant
    @inline private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var sig = 0L
      var j = 0
      while (j < bits) {
        var acc = 0.0; var i = 0
        while (i < x.numElements()) {
          val r = mix(seed.toLong * 0x100000001L + j.toLong * 0x10001L + i)
          val sign = if ((r & 1L) == 0L) 1.0f else -1.0f
          acc += x.getFloat(i) * sign
          i += 1
        }
        if (acc >= 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val acc = ctx.freshName("acc"); val sig = ctx.freshName("sig"); val z = ctx.freshName("z")
        s"""
           |long $sig = 0L;
           |for (int $j = 0; $j < $bits; $j++) {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $a.numElements(); $i++) {
           |    long $z = ${seed}L * 0x100000001L + ((long) $j) * 0x10001L + $i + 0x9e3779b97f4a7c15L;
           |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
           |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
           |    $z = $z ^ ($z >>> 31);
           |    $acc += $a.getFloat($i) * ((($z & 1L) == 0L) ? 1.0f : -1.0f);
           |  }
           |  if ($acc >= 0) $sig |= (1L << $j);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** INT8 quantization of a float vector in ONE pass:
    * `struct(scale, q)` with `scale = 127 / max|v|` (1.0 for the zero
    * vector) and `q_i = trunc(v_i * scale)` ∈ [-127, 127].
    *
    * TRUNCATION, not rounding: `Math.round` (half-up) and SQL `round`
    * (half-away-from-zero) disagree on negative halves, while `trunc`
    * is identical everywhere — determinism beats the half-ulp of extra
    * precision for a storage/transport format.
    *
    * Why fused: the composed HOF form re-evaluates the `max|v|` aggregate
    * inside the per-element lambda after CollapseProject inlines it —
    * O(d²) per row (same pitfall as ShingleSet).
    *
    * Cosine is scale-invariant, so int8 ANN probes can run
    * [[Int8CosineSimilarity]] directly on `q` (4× narrower shuffles /
    * cache lines than float32); dot products divide by `scale_a*scale_b`.
    */
  case class QuantizeInt8(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("scale", DoubleType, nullable = false),
      StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false)))
    override def nullSafeEval(a: Any): Any =
      quantizeEval(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
          s"graft.functions.VectorFunctions.quantizeEval($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** static entry point for generated code */
  def quantizeEval(x: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = x.numElements()
    var mx = 0.0; var i = 0
    while (i < n) { val v = math.abs(x.getFloat(i).toDouble); if (v > mx) mx = v; i += 1 }
    val scale = if (mx == 0.0) 1.0 else 127.0 / mx
    val q = new Array[Int](n)
    i = 0
    while (i < n) { q(i) = (x.getFloat(i).toDouble * scale).toInt; i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(scale,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q))
  }

  /** cosine over INT arrays (quantized vectors) — same contract as
    * [[CosineSimilarity]].
    */
  case class Int8CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0L; var nx = 0L; var ny = 0L; var i = 0
      while (i < n) {
        val xi = x.getInt(i).toLong; val yi = y.getInt(i).toLong
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      if (nx == 0L || ny == 0L) 0.0
      else dot / math.sqrt(nx.toDouble * ny.toDouble)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |long $dot = 0L, $nx = 0L, $ny = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $xi = $a.getInt($i); long $yi = $b.getInt($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = ($nx == 0L || $ny == 0L) ? 0.0
           |  : $dot / Math.sqrt((double) $nx * (double) $ny);
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // Column-API wrappers
  /** Fused IVF-PQ corpus-side encoding: ONE pass per vector computing
    * `struct(cell, codes, xnorm)` — the coarse-cell argmax, the residual
    * PQ codes, and the L2 norm the serving scan needs.
    *
    * Why fused: the composed form (`nearestCells` + `pqEncode(residual)`
    * + `l2_norm` as three projections) hits the Catalyst HOF
    * re-evaluation trap in the ANN hot path — `pqEncode`'s per-subspace
    * `slice(v, ...)` references its argument once per subspace, and that
    * argument is the whole `residual` expression, which itself re-runs
    * the `nearestCells` argmax; measured m+1 × the 16×64-dim cosine loop
    * per corpus row (q_cosine_ivfpq apply: 7.7 s at sf0.1, ~all encode).
    * Struct-field access of ONE expression is CSE'd, so this evaluates
    * exactly once per row, allocation-free, inside codegen.
    *
    * Float semantics mirror the composed form bit-for-bit (required: the
    * rows-only q_cosine_ivfpq output must not drift): cosine/norm
    * accumulate float products into doubles ([[CosineSimilarity]] /
    * [[L2Norm]]); the residual and the per-element code distances stay
    * FLOAT before the double accumulation (`zip_with` lambda typing);
    * ties break toward the lower cell/code id (the struct-sort order).
    * Parity is asserted field-exact in DedupSimilaritySpec.
    */
  case class IvfPqEncode(child: Expression,
      cents: Array[Array[Float]], books: Array[Array[Array[Float]]])
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
      StructField("xnorm", DoubleType, nullable = false)))
    override def nullSafeEval(a: Any): Any =
      ivfPqEncodeEval(a.asInstanceOf[ArrayData], cents, books)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("ivfCents", cents, "float[][]")
      val bRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
          s"graft.functions.VectorFunctions.ivfPqEncodeEval($a, $cRef, $bRef);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** static entry point for generated code */
  def ivfPqEncodeEval(v: ArrayData,
      cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    // xnorm — L2Norm semantics (double sum of float squares)
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i); s += x * x; i += 1 }
    val xnorm = math.sqrt(s)
    // cell — CosineSimilarity semantics per centroid, argmax with
    // lower-cid tiebreak (strict < on negated cos keeps the first)
    var bestCell = 1
    var bestNeg = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val m = math.min(n, cv.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var j = 0
      while (j < m) {
        val xi = v.getFloat(j); val yi = cv(j)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; j += 1
      }
      val neg = -(if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny))
      if (neg < bestNeg) { bestNeg = neg; bestCell = c + 1 }
      c += 1
    }
    // residual codes — per subspace, argmin L2² vs the book, float
    // element math (residual and diff stay Float before the double sum),
    // lower-code tiebreak
    val cent = cents(bestCell - 1)
    val mSub = books.length
    val codes = new Array[Int](mSub)
    var sub = 0
    while (sub < mSub) {
      val book = books(sub)
      val dsub = book(0).length
      var bestK = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < book.length) {
        val bk = book(k)
        var dist = 0.0
        var j = 0
        while (j < dsub) {
          val idx = sub * dsub + j
          val rv: Float =
            (if (idx < n) v.getFloat(idx) else 0f) - (if (idx < cent.length) cent(idx) else 0f)
          val d: Float = rv - bk(j)
          dist += d * d
          j += 1
        }
        if (dist < bestD) { bestD = dist; bestK = k }
        k += 1
      }
      codes(sub) = bestK
      sub += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCell, ArrayData.toArrayData(codes), xnorm))
  }

  def ivf_pq_encode(vec: Column, cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Column =
    Bridge.column(IvfPqEncode(Bridge.expression(vec), cents, books))

  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def l2_norm(a: Column): Column = Bridge.column(L2Norm(Bridge.expression(a)))
  def rp_signature(a: Column, seed: Int, bits: Int = 64): Column =
    Bridge.column(RandomProjectionSignature(Bridge.expression(a), seed, bits))
  def quantize_int8(a: Column): Column =
    Bridge.column(QuantizeInt8(Bridge.expression(a)))
  def cosine_similarity_int8(a: Column, b: Column): Column =
    Bridge.column(Int8CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** SQL registration: `SELECT cosine_similarity(e1, e2) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, "cosine_similarity", es => CosineSimilarity(es.head, es(1)))
    Bridge.registerFunction(spark, "dot_product", es => DotProduct(es.head, es(1)))
    Bridge.registerFunction(spark, "l2_norm", es => L2Norm(es.head))
    Bridge.registerFunction(spark, "quantize_int8", es => QuantizeInt8(es.head))
    Bridge.registerFunction(spark, "cosine_similarity_int8",
      es => Int8CosineSimilarity(es.head, es(1)))
    Bridge.registerFunction(spark, "rp_signature", es =>
      RandomProjectionSignature(es.head,
        litInt(es(1), "seed"), litInt(es(2), "bits")))
  }

  /** SQL-literal int argument (e.g. `rp_signature(v, 42, 64)`). */
  private[graft] def litInt(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }
}
