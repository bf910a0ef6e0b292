package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-at-scan table loaders for the contract testdata
  * (`/root/testdata/sf*`, see TESTDATA.md) plus the derived `ratings`
  * view that maps the star schema onto the reference's MovieLens shape
  * (`ratings(userId, movieId, rating, ts)` — reference data model at
  * `ml-latest-small_readme:77-85`, loaded reference-side at `als.py:24-26`).
  *
  * Design notes (100 TB posture):
  *  - Parquet scans with explicit column pruning happen automatically via
  *    Catalyst; loaders never force materialization.
  *  - `ratings` is a lazy logical view (join + projection), NOT a
  *    materialized table — at scale the join is pipelined into whichever
  *    query consumes it, letting AQE choose broadcast vs shuffle join.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** `events.ts` has shipped in two fixture generations: NANOSECOND
    * parquet (which Spark's vectorized reader rejects outright,
    * [PARQUET_TYPE_ILLEGAL] — so we keep `nanosAsLong` on and it scans as
    * raw Long nanos) and plain µs TIMESTAMP (pandas-written, no UTC
    * adjustment → Spark reads TIMESTAMP_NTZ). The loader branches on the
    * SCANNED schema instead of asserting a precision, so both
    * generations — and a future tz-adjusted µs one — load through the
    * same contract: `ts` is always session-zoned TimestampType at µs
    * precision on the way out. All entrypoints pin the session to UTC,
    * so the NTZ→LTZ cast is epoch-preserving and matches what DuckDB's
    * `date_part('epoch', ts)` sees on the same file.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // ns fixture scanned as raw nanos
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // µs fixture, no tz flag
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet physical type $other")
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Derived MovieLens-shaped ratings table (FIXTURES.md §2):
    * `orders ⋈ lineitem ON o_orderkey = l_orderkey` →
    * `(o_custkey AS userId, l_partkey AS movieId, rating ∈ {0.5,…,5.0}, ts)`.
    *
    * rating is derived deterministically from `l_quantity` so the same
    * expression is reproducible in ANSI SQL for the DuckDB oracle:
    * `(CAST(FLOOR(l_quantity) AS BIGINT) % 10) * 0.5 + 0.5`
    * — exact multiples of 0.5, no float-hash risk (SURVEY §7.4).
    *
    * At scale: equi-join on the orderkey; Catalyst/AQE picks sort-merge
    * (both sides large) with the projection pruned to 4+2 columns at scan.
    */
  def ratings(spark: SparkSession, sfDir: String): DataFrame =
    ratingsFrom(orders(spark, sfDir), lineitem(spark, sfDir))

  /** The ratings derivation over ARBITRARY orders/lineitem relations —
    * same code path whether the inputs are flat parquet scans (above) or
    * orderkey-bucketed tables, where the join plans with ZERO exchanges
    * (SCALING.md; proven in ScalePostureSpec). At 100 TB the bucketed
    * layout makes this view shuffle-free to materialize.
    */
  def ratingsFrom(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val o = orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(
        col("o_custkey").as("userId"),
        col("l_partkey").as("movieId"),
        ((floor(col("l_quantity")).cast(LongType) % 10).cast(DoubleType) * 0.5 + 0.5)
          .as("rating"),
        col("o_orderdate").as("ts"))
  }

  /** The same derivation as ANSI SQL, prepended to oracle queries that
    * consume `ratings` (kept in one place so Spark and DuckDB can never
    * drift).
    */
  val ratingsSql: String =
    // rating must be DOUBLE, not DECIMAL: DuckDB types a bare `0.5` as
    // DECIMAL(1,1), which propagates DECIMAL through every consumer's
    // SUM/ROUND — the forbidden output class (SURVEY §7.4 round-15
    // output-type contract). Multiples of 0.5 are dyadic, so the DOUBLE
    // values are bit-identical to the decimal ones.
    """ratings AS (
      |  SELECT o_custkey AS userId, l_partkey AS movieId,
      |         CAST((CAST(FLOOR(l_quantity) AS BIGINT) % 10) AS DOUBLE)
      |           * CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE) AS rating,
      |         o_orderdate AS ts
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |)""".stripMargin

  /** Typed row for the ratings view (Dataset[T] surface — compile-time
    * field checks where the dynamic DataFrame isn't wanted).
    */
  case class Rating(userId: Long, movieId: Long, rating: Double,
      ts: java.sql.Timestamp)

  def ratingsDs(spark: SparkSession, sfDir: String)
      : org.apache.spark.sql.Dataset[Rating] = {
    import spark.implicits._
    ratings(spark, sfDir).as[Rating]
  }

  /** Reference-parity CSV ingest (SURVEY §2.1 S1/S2/S4, §1.3): headered or
    * headerless CSV + positional rename + explicit schema — replaces the
    * reference's string-read-then-cast pipeline (`als.py:24-26`) with
    * typed-at-scan.
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** MovieLens ratings DDL (reference canonical schema, `split_script.py:17`). */
  val movieLensRatingsSchema: StructType = StructType(Seq(
    StructField("userId", IntegerType),
    StructField("movieId", IntegerType),
    StructField("rating", DoubleType),
    StructField("timestamp", IntegerType)))
}
