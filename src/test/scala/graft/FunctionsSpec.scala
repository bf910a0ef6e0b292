package graft

import graft.functions.{TextHashFunctions, VectorFunctions}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Custom Catalyst expressions: correctness on known values, codegen ⇄
  * interpreted agreement, determinism, and locality properties.
  */
class FunctionsSpec extends SparkTestBase {

  import spark.implicits._

  test("cosine_similarity on known vectors (codegen path)") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f), 0.0) // zero-norm guard
    ).toDF("a", "b", "want")
    val bad = df.select(abs(cosine_similarity(col("a"), col("b")) - col("want")).as("err"))
      .filter(col("err") > 1e-6).count()
    assert(bad == 0)
  }

  test("codegen and interpreted eval agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val a = Array(0.3f, -1.2f, 0.7f)
    val b = Array(-0.4f, 0.9f, 2.0f)
    // codegen path (whole-stage generated from the DataFrame select)
    val fromDf = Seq((a, b)).toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b"))).first().getDouble(0)
    // interpreted path (direct eval of the expression tree)
    val interp = VectorFunctions.CosineSimilarity(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(FloatType))).eval(null).asInstanceOf[Double]
    assert(math.abs(fromDf - interp) < 1e-12)
    // SQL registration path
    VectorFunctions.register(spark)
    Seq((a, b)).toDF("a", "b").createOrReplaceTempView("vv")
    val viaSql = spark.sql("SELECT cosine_similarity(a, b) FROM vv").first().getDouble(0)
    assert(math.abs(fromDf - viaSql) < 1e-12)
  }

  test("jaro_winkler: textbook values, edges, codegen ≡ interpreted ≡ SQL") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    // textbook triples (the published Winkler examples, also DuckDB's values)
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("DWAYNE", "DUANE", 0.84),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("CRATE", "TRACE", 0.7333333333333334), // jaro ≤ 0.7 boundary: no boost
      // ODD half-transposition counts — these catch the real-division
      // bug (strcmp95/DuckDB FLOOR the transposition count; halfTrans=3
      // here, so t must be 1, not 1.5; values are DuckDB's)
      ("cecbac", "cbac", 0.825),
      ("abcde", "baced", 0.8666666666666667),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("", "", 0.0), ("ab", "cd", 0.0))
    cases.foreach { case (a, b, want) =>
      val got = TextHashFunctions.jaroWinkler(a, b)
      assert(math.abs(got - want) < 1e-12, s"$a/$b: $got vs $want")
      // symmetry
      assert(TextHashFunctions.jaroWinkler(b, a) == got)
    }
    // codegen (DataFrame) ≡ interpreted (direct eval) ≡ SQL registration
    val fromDf = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .select(TextHashFunctions.jaro_winkler(col("a"), col("b")))
      .first().getDouble(0)
    val interp = TextHashFunctions.JaroWinkler(
      Literal(UTF8String.fromString("MARTHA"), org.apache.spark.sql.types.StringType),
      Literal(UTF8String.fromString("MARHTA"), org.apache.spark.sql.types.StringType))
      .eval(null).asInstanceOf[Double]
    assert(fromDf == interp)
    TextHashFunctions.register(spark)
    Seq(("MARTHA", "MARHTA")).toDF("a", "b").createOrReplaceTempView("jwv")
    assert(spark.sql("SELECT jaro_winkler(a, b) FROM jwv")
      .first().getDouble(0) == fromDf)
    // null propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(TextHashFunctions.jaro_winkler(col("a"), col("b"))).first()
    assert(n.isNullAt(0))
  }

  test("dot_product and l2_norm") {
    val df = Seq((Array(3.0f, 4.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(
      dot_product(col("a"), col("b")).as("d"),
      l2_norm(col("a")).as("n")).first()
    assert(math.abs(r.getDouble(0) - 11.0) < 1e-6)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-6)
  }

  test("rp_signature: deterministic; near vectors share more bits than far") {
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val near = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01f else v }
    val far = Array.tabulate(64)(i => math.cos(i * 3.1).toFloat)
    val df = Seq((base, near, far)).toDF("base", "near", "far")
    val r = df.select(
      rp_signature(col("base"), 42).as("sb"),
      rp_signature(col("near"), 42).as("sn"),
      rp_signature(col("far"), 42).as("sf"),
      rp_signature(col("base"), 42).as("sb2")).first()
    assert(r.getLong(0) == r.getLong(3), "deterministic")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(r.getLong(0), r.getLong(1)) < ham(r.getLong(0), r.getLong(2)),
      "locality: near vector differs in fewer bits than far vector")
  }

  test("simhash64: identical token sets identical, near sets near") {
    val df = Seq(
      ("the quick brown fox jumps", "the quick brown fox jumps", "completely different words entirely here")
    ).toDF("a", "b", "c")
    import graft.operators.Dedup
    val r = df.select(
      TextHashFunctions.simhash64(Dedup.tokens(col("a"))).as("sa"),
      TextHashFunctions.simhash64(Dedup.tokens(col("b"))).as("sb"),
      TextHashFunctions.simhash64(Dedup.tokens(col("c"))).as("sc")).first()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("int8 quantization: zero-vector guard, bounded values, cosine preserved") {
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
      .select(quantize_int8(col("v")).as("qz")).first()
    assert(z.getStruct(0).getDouble(0) == 1.0)
    assert(z.getStruct(0).getSeq[Int](1) == Seq(0, 0))

    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // bounded: |q_i| <= 127 for every vector
    val overflow = e.select(quantize_int8(col("embedding")).as("qz"))
      .select(explode(col("qz.q")).as("qi")).filter(abs(col("qi")) > 127).count()
    assert(overflow == 0)
    // cosine preservation: int8 cosine within 0.01 of float cosine on pairs
    val a = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("ia"), col("embedding").as("va"),
        quantize_int8(col("embedding")).getField("q").as("qa"))
    val b = e.filter(col("vec_id") >= 20 && col("vec_id") < 40)
      .select(col("vec_id").as("ib"), col("embedding").as("vb"),
        quantize_int8(col("embedding")).getField("q").as("qb"))
    val err = a.crossJoin(b)
      .select(abs(cosine_similarity(col("va"), col("vb")) -
        cosine_similarity_int8(col("qa"), col("qb"))).as("e"))
      .agg(max(col("e"))).first().getDouble(0)
    assert(err < 0.01, s"max cosine drift $err")
  }

  test("rolling fingerprints: deterministic, mostly survive a local edit") {
    import graft.operators.TextAnalysis
    val df = Seq((
      "The quick brown fox jumps over the lazy dog again and again tonight",
      "The quick brown fox jumps over the crazy dog again and again tonight"
    )).toDF("a", "b")
    val r = df.select(
      TextAnalysis.rollingFingerprints(col("a"), 8, 4).as("fa"),
      TextAnalysis.rollingFingerprints(col("b"), 8, 4).as("fb"))
      .select(size(array_intersect(col("fa"), col("fb"))).as("common"),
        size(col("fa")).as("na")).first()
    assert(r.getInt(1) > 0, "non-empty fingerprint set")
    assert(r.getInt(0) >= r.getInt(1) / 2,
      s"one-word edit kept only ${r.getInt(0)}/${r.getInt(1)} fingerprints")
  }

  test("hll_sketch estimate within 5% of exact count-distinct") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.select(countDistinct(col("l_partkey"))).first().getLong(0)
    val est = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey")))).first().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est vs exact $exact")
  }

  test("mix64: codegen column equals the static eval; inputs and seed both steer") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(200)((rnd.nextLong(), math.abs(rnd.nextLong()) % 64,
      math.abs(rnd.nextLong()) % 16))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        graft.functions.TextHashFunctions.mix64(
          col("a"), col("b"), col("c"), seed = 42).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
    got.foreach { case ((a, b, c), z) =>
      assert(z == graft.functions.TextHashFunctions.mix64Eval(a, b, c, 42),
        s"codegen != static at ($a,$b,$c)")
    }
    // distinct (b, c) coordinates at a fixed a must spread: no collisions
    // across this sample (64·16 cells, 200 draws of a pure 64-bit hash)
    val zs = got.map(_._2)
    assert(zs.distinct.length == zs.length, "unexpected mix collision")
    // the seed steers: same inputs, different seed, different outputs
    val (a0, b0, c0) = rows.head
    assert(graft.functions.TextHashFunctions.mix64Eval(a0, b0, c0, 42) !=
      graft.functions.TextHashFunctions.mix64Eval(a0, b0, c0, 7))
  }

  test("char_trigrams: exact normalization + sliding-window semantics") {
    import graft.functions.TextHashFunctions.char_trigrams
    val df = Seq(
      "abcd",                 // plain: abc, bcd
      "A  B,,c!",             // runs collapse to one space: "a b c" + trailing " "
      "ab",                   // too short after norm
      "!!!",                  // norm = " " only
      "",                     // empty
      "Hello").toDF("t")
    val out = df.select(char_trigrams(col("t")).as("g")).collect()
      .map(_.getSeq[String](0))
    assert(out(0) == Seq("abc", "bcd"))
    // "A  B,,c!" -> "a b c " : trigrams over the 6-char normalized string
    assert(out(1) == Seq("a b", " b ", "b c", " c "))
    assert(out(2).isEmpty && out(3).isEmpty && out(4).isEmpty)
    assert(out(5) == Seq("hel", "ell", "llo"))
    // multiplicity preserved (cross-entropy weighs repeats): "aaaa" has
    // trigram "aaa" twice
    val rep = Seq("aaaa").toDF("t")
      .select(char_trigrams(col("t")).as("g")).first().getSeq[String](0)
    assert(rep == Seq("aaa", "aaa"))
  }

  test("KLL quantile sketch: median/quartiles within rank tolerance of exact") {
    // the mergeable-percentile scale path (exact percentile() needs a
    // global sort; KLL merges partial sketches). KLL compaction is
    // randomized → scalatest tolerance check, NOT a registered query
    // (would break the bit-identical CPUS sweep).
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_extendedprice").as("x"))
    li.createOrReplaceTempView("kll_in")
    val sk = spark.sql(
      """SELECT kll_sketch_get_quantile_double(kll_sketch_agg_double(x), 0.25) AS q1,
        |       kll_sketch_get_quantile_double(kll_sketch_agg_double(x), 0.5)  AS q2,
        |       kll_sketch_get_quantile_double(kll_sketch_agg_double(x), 0.75) AS q3
        |FROM kll_in""".stripMargin).first()
    val ex = li.agg(
      expr("percentile(x, 0.25)"), expr("percentile(x, 0.5)"),
      expr("percentile(x, 0.75)")).first()
    // KLL default k guarantees ~1.7% rank error; values at those ranks
    // are within a small value band on this smooth distribution
    for (i <- 0 until 3) {
      val (a, e) = (sk.getDouble(i), ex.getDouble(i))
      assert(math.abs(a - e) / e < 0.05, s"quantile $i: sketch $a exact $e")
    }
  }

  test("approx_top_k two-phase API: accumulate partials, combine, estimate") {
    // the partial-sketch travel pattern: per-partition ACCUMULATE states,
    // one COMBINE, one ESTIMATE — how heavy-hitters merge across a
    // 1000-executor fleet without raw-row recombination
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.operators.Dedup.tokens(col("text"))).as("term"),
        pmod(xxhash64(col("term")), lit(4)).as("shard"))
    df.createOrReplaceTempView("atk_in")
    val combined = spark.sql(
      """SELECT approx_top_k_estimate(approx_top_k_combine(st), 5) AS tk FROM (
        |  SELECT approx_top_k_accumulate(term) AS st
        |  FROM atk_in GROUP BY shard
        |)""".stripMargin)
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .orderBy(col("count").desc, col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = df.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(combined.toSeq == exact.toSeq,
      s"two-phase ${combined.toSeq} vs exact ${exact.toSeq}")
  }

  test("map-only lmScore agrees with the join-based q_lm_score") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (lm, total) = TextAnalysis.trainTrigramLm(docs)
    val mapSide = docs.select(col("doc_id"),
      TextAnalysis.lmScore(lm, total)(col("text")).as("s"))
      .filter(col("s").isNotNull)
    val joinSide = SparkEntry.queries("q_lm_score")(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("avg_logp").as("s2"))
    val j = mapSide.join(joinSide, Seq("doc_id")).cache()
    assert(j.count() == joinSide.count(), "every scored doc matches up")
    // fold order differs (map-side sequential vs shuffled partial avg) →
    // tolerance, not bit equality
    assert(j.filter(abs(col("s") - col("s2")) > 1e-6).count() == 0)
    j.unpersist()
  }

  test("shingle_set matches the composed HOF formulation") {
    import graft.operators.Dedup
    val composed = {
      val toks = Dedup.tokens(col("t"))
      filter(
        array_distinct(transform(
          sequence(lit(0), greatest(size(toks) - 3, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(3))))),
        s => length(s) > 0)
    }
    val df = Seq(
      "The quick brown fox jumps over the lazy dog",
      "one two", "", "!!! ...", "a b c d a b c d").toDF("t")
    val rows = df.select(
      sort_array(Dedup.shingles(col("t"), 3)).as("fused"),
      sort_array(composed).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"fused=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
    }
  }
}
