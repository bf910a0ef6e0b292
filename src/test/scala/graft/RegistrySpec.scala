package graft

import graft.operators.{AsofJoin, Dedup}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Registry integrity + operator edge cases.
  *
  * The query registry is built by merging module maps with `++`, which
  * silently OVERWRITES duplicate keys — a name collision would silently
  * drop a query from the verified surface. Asserted impossible here.
  */
class RegistrySpec extends SparkTestBase {

  import spark.implicits._

  private val modules = Seq(
    "CoreQueries" -> (graft.queries.CoreQueries.queries.keySet,
      graft.queries.CoreQueries.oracleSql.keySet),
    "RelationalQueries" -> (graft.queries.RelationalQueries.queries.keySet,
      graft.queries.RelationalQueries.oracleSql.keySet),
    "PipelineQueries" -> (graft.queries.PipelineQueries.queries.keySet,
      graft.queries.PipelineQueries.oracleSql.keySet),
    "TextQueries" -> (graft.queries.TextQueries.queries.keySet,
      graft.queries.TextQueries.oracleSql.keySet),
    "EventQueries" -> (graft.queries.EventQueries.queries.keySet,
      graft.queries.EventQueries.oracleSql.keySet),
    "SimilarityQueries" -> (graft.queries.SimilarityQueries.queries.keySet,
      graft.queries.SimilarityQueries.oracleSql.keySet),
    "AnalyticsQueries" -> (graft.queries.AnalyticsQueries.queries.keySet,
      graft.queries.AnalyticsQueries.oracleSql.keySet))

  test("no query-name collisions across modules (++ merge would drop one)") {
    val all = modules.flatMap(_._2._1.toSeq)
    val dupes = all.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(SparkEntry.queries.size == all.size)
  }

  test("no duplicate keys WITHIN a module's Map literal (source scan — the literal dedups silently)") {
    // a duplicate key inside one Map(...) never reaches the runtime set
    // (Scala keeps the last entry), so the cross-module check above
    // can't see it — the earlier query silently vanishes from the
    // verified surface. Caught here by scanning the source: a key may
    // appear at most twice per module file (once in `queries`, once in
    // `oracleSql`), and at most once as a query closure.
    val srcDir = new java.io.File("src/main/scala/graft/queries")
    assume(srcDir.isDirectory, s"source dir not visible from test cwd")
    for (f <- srcDir.listFiles.toSeq.sortBy(_.getName)
         if f.getName.endsWith(".scala")) {
      val text = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.mkString finally src.close()
      }
      val closureKeys = "\"(q_\\w+)\" -> \\(\\(".r
        .findAllMatchIn(text).map(_.group(1)).toSeq
      val dupClosures = closureKeys.groupBy(identity)
        .collect { case (k, v) if v.size > 1 => k }
      assert(dupClosures.isEmpty,
        s"${f.getName}: duplicate query closures for $dupClosures")
      val entryKeys = "\"(q_\\w+)\" ->".r
        .findAllMatchIn(text).map(_.group(1)).toSeq
      val dupEntries = entryKeys.groupBy(identity)
        .collect { case (k, v) if v.size > 2 => k }
      assert(dupEntries.isEmpty,
        s"${f.getName}: key appears more than query+oracle times: $dupEntries")
    }
  }

  test("README surface ledger matches the registry and the test sources") {
    // the README's headline counts drifted twice (r16 VERDICT Wrong #3:
    // claimed 306 oracled / 18 exempt vs actual 305/19, 17 suites / 310
    // tests vs 20/420) — a ledger must be derived or asserted, so this
    // test pins the canonical "## Surface ledger" line to the live
    // registry and the test sources themselves
    val f = new java.io.File("README.md")
    assume(f.isFile, "README not visible from test cwd")
    val readme = {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.mkString finally src.close()
    }
    val pat = ("""(\d+) queries = (\d+) DuckDB-oracled \+ """ +
      """(\d+) rows-only exempt; (\d+) test suites / (\d+) tests""").r
    val m = pat.findFirstMatchIn(readme)
    assert(m.isDefined, "README surface-ledger line missing or malformed")
    val g = m.get
    val nq = SparkEntry.queries.size
    val ne = SparkEntry.oracleExempt.size
    assert(g.group(1).toInt == nq, s"README says ${g.group(1)} queries, registry has $nq")
    assert(g.group(2).toInt == nq - ne,
      s"README says ${g.group(2)} oracled, registry has ${nq - ne}")
    assert(g.group(3).toInt == ne, s"README says ${g.group(3)} exempt, registry has $ne")
    val specDir = new java.io.File("src/test/scala/graft")
    assume(specDir.isDirectory, "test source dir not visible from test cwd")
    val specs = specDir.listFiles.toSeq.filter(_.getName.endsWith("Spec.scala"))
    assert(g.group(4).toInt == specs.size,
      s"README says ${g.group(4)} suites, source has ${specs.size}")
    val nTests = specs.map { p =>
      val src = scala.io.Source.fromFile(p, "UTF-8")
      try "test\\(\"".r.findAllIn(src.mkString).length finally src.close()
    }.sum
    assert(g.group(5).toInt == nTests,
      s"README says ${g.group(5)} tests, source registers $nTests")
  }

  test("every oracle key has a query; every oracle lives with its query's module") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
    for ((name, (qs, os)) <- modules)
      assert((os -- qs).isEmpty, s"$name has orphan oracle keys: ${os -- qs}")
  }

  test("no-oracle queries are EXACTLY the declared exemptions, each with a reason") {
    // "no_oracle" in CORRECTNESS must stay a design decision, not an
    // omission: a query ships with an oracle (static OR model-literal
    // dynamic) or an explicit reason.
    val dynamic = SparkEntry.dynamicOracleSql(spark, sf).keySet
    assert((dynamic -- SparkEntry.queries.keySet).isEmpty,
      s"dynamic oracles without a query: ${dynamic -- SparkEntry.queries.keySet}")
    assert((dynamic & SparkEntry.oracleSql.keySet).isEmpty,
      s"dynamic oracle shadows a static one: ${dynamic & SparkEntry.oracleSql.keySet}")
    val noOracle =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- dynamic
    val exempt = SparkEntry.oracleExempt.keySet
    assert((noOracle -- exempt).isEmpty,
      s"queries without oracle AND without exemption reason: ${noOracle -- exempt}")
    assert((exempt -- noOracle).isEmpty,
      s"stale exemptions (query now oracled or gone): ${exempt -- noOracle}")
    assert(SparkEntry.oracleExempt.values.forall(_.trim.nonEmpty))
  }

  test("every declared query's output is harness-sortable (no array/map/struct columns)") {
    // the driver's oracle harness sorts+hashes outputs via pandas, which
    // cannot sort container values — the r5 q_embed_centroids red row.
    // The repo convention is to SERIALIZE containers (concat_ws /
    // array_to_string); this asserts no future query ships a raw one.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"queries emitting unsortable container columns: ${offenders.mkString("; ")}")
  }

  test("no declared query's output schema contains DecimalType (driver repr seam)") {
    // The driver renders Spark parquet decimal(38,0) and DuckDB
    // DECIMAL/HUGEINT differently (float64 "4250.0" vs integer "4250"),
    // so a decimal OUTPUT column hash-mismatches even when values are
    // identical — the r12 q_gopher_gate and r14 q_ks/q_mann_whitney red
    // rows, the ONLY red rows on the whole surface, were exactly the
    // only queries emitting decimals. Decimal arithmetic INSIDE a query
    // is fine (exact integer moments); the final select must cast to
    // BIGINT/DOUBLE/STRING. tools/check.py enforces the same contract
    // value-side (hard FAIL on any decimal.Decimal).
    import org.apache.spark.sql.types.DecimalType
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"queries emitting DECIMAL output columns: ${offenders.mkString("; ")}")
  }

  test("asof joins tolerate an empty right side (all-null attach)") {
    val left = Seq((1L, 100L, "p")).toDF("user_id", "us", "name")
    val right = Seq.empty[(Long, Long, Long)].toDF("user_id", "us", "click_id")
    for (f <- Seq(AsofJoin.asofBackward _, AsofJoin.asofForward _)) {
      val out = f(left, right, "user_id", "us", "us",
        Map("click_id" -> "c"), "click_id")
      assert(out.count() == 1 && out.first().isNullAt(out.columns.indexOf("c")))
    }
  }

  test("interval join with no in-window partner emits nothing") {
    val a = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("user_id", "event_id", "ts")
    val b = Seq((1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00")))
      .toDF("user_id", "event_id", "ts")
    assert(EventStreams.intervalJoin(a, b, "10 minutes").count() == 0)
  }

  test("an identical-doc cluster of 5 yields exactly C(5,2) minhash pairs") {
    val docs = (0 until 5).map(i => (i.toLong, "spark shuffles partition data across the cluster"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.99,
      nShingle = 3, bands = 8, rowsPerBand = 4)
    assert(pairs.count() == 10, "all 10 unordered pairs, each exactly once")
    assert(pairs.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("hashSample is append-stable: a row's verdict ignores other rows") {
    val small = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("userId", "movieId")
    val big = (small.as[(Long, Long)].collect().toSeq ++
      (100 to 200).map(i => (i.toLong, i.toLong * 7))).toDF("userId", "movieId")
    val keys = Seq(col("userId"), col("movieId"))
    val keptSmall = graft.operators.Split.hashSample(small, keys, 0.5)
      .as[(Long, Long)].collect().toSet
    val keptBigOverlap = graft.operators.Split.hashSample(big, keys, 0.5)
      .as[(Long, Long)].collect().toSet
      .intersect(small.as[(Long, Long)].collect().toSet)
    assert(keptSmall == keptBigOverlap)
  }
}
