package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Save/load for the engine's BUILD artifacts — the pieces an incremental
  * pipeline persists between runs so a restart never re-fits or re-bands
  * the historical corpus:
  *
  *  - [[Dedup.MinhashIndex]] (two parquet relations, the near-dup index);
  *  - the exact-dedup fingerprint index (one parquet relation);
  *  - [[Similarity.IvfPqModel]] (a few KB of centroids + codebooks);
  *  - BPE merge tables (a few string pairs);
  *  - [[TextAnalysis.QualityLrModel]] (intercept + weights).
  *
  * The in-process memo TrieMaps (queries.TextQueries / SimilarityQueries)
  * die with the session — this module is the cross-process form the
  * incremental operators' scaladocs promise ("built ONCE, persisted as
  * parquet"; Dedup.scala). All persistence is plain parquet written with
  * the session's writer, so the artifacts live next to the data they
  * describe on any Hadoop-compatible filesystem; the driver-side models
  * round-trip through 1-to-few-row DataFrames rather than a JSON library
  * (no new dependency, identical float bits via parquet's IEEE doubles).
  *
  * Determinism contract: save→load is BIT-identical for every artifact
  * (asserted in DedupSimilaritySpec / CurationSpec), so a consumer of a
  * reloaded model produces the same plans and the same results as the
  * fitting process did.
  */
object Artifacts {

  // ---- MinhashIndex (near-dup corpus index) ----

  /** Persist a [[Dedup.MinhashIndex]] as `dir/buckets` + `dir/content`.
    * Bucket rows land PARTITIONED BY `band` (one directory per band,
    * rows clustered on the (band, bucket) probe key within it): the
    * streaming gate's per-band anti-joins
    * ([[graft.streaming.EventStreams.incrementalNearIntake]] runs one
    * per band) each prune to 1/bands of the files instead of scanning
    * the whole index `bands` times — the same at-rest pruning story as
    * the IVF-PQ cell layout. Appends from
    * [[graft.streaming.EventStreams.maintainedNearIntake]] use the SAME
    * `partitionBy("band")` layout (a mixed layout would break partition
    * discovery); the next [[compactMinhashIndex]] re-clusters within
    * bands and re-enforces the cap.
    */
  def saveMinhashIndex(index: Dedup.MinhashIndex, dir: String): Unit = {
    index.buckets.select(col("id"), col("band"), col("bucket"))
      .repartition(col("band"), col("bucket"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$dir/buckets")
    index.content.write.mode("overwrite").parquet(s"$dir/content")
  }

  /** Load pair of [[saveMinhashIndex]]. Column order and the partition
    * column's type are NORMALIZED back to the in-memory contract
    * (id, band int, bucket) — partitioned reads append the partition
    * column last, and appended un-partitioned files must union cleanly.
    */
  def loadMinhashIndex(spark: SparkSession, dir: String): Dedup.MinhashIndex =
    Dedup.MinhashIndex(
      spark.read.parquet(s"$dir/buckets")
        .select(col("id"), col("band").cast("int").as("band"), col("bucket")),
      spark.read.parquet(s"$dir/content"))

  /** Periodic COMPACTION of a persisted [[Dedup.MinhashIndex]] that has
    * taken streaming appends
    * ([[graft.streaming.EventStreams.maintainedNearIntake]] appends
    * batch-sized row sets without re-enforcing the per-(band, bucket)
    * cap): re-caps every bucket at `maxBucket` ids (smallest-id-first,
    * the same deterministic rule as [[Dedup.minhashIndex]]) and dedups
    * content rows per id. Materializes via eager localCheckpoint BEFORE
    * overwriting — the read and the overwrite of the same path must not
    * overlap. Run on the maintenance cadence, not per batch.
    */
  def compactMinhashIndex(spark: SparkSession, dir: String,
      maxBucket: Int = 256): Unit = {
    val idx = loadMinhashIndex(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("id"))
    val buckets = idx.buckets.dropDuplicates("band", "bucket", "id")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucket).drop("__rn")
      .localCheckpoint(true)
    val content = idx.content
      .groupBy(col("id")).agg(first(col("sh")).as("sh"))
      .localCheckpoint(true)
    saveMinhashIndex(Dedup.MinhashIndex(buckets, content), dir)
  }

  // ---- exact-dedup fingerprint index ----

  /** Persist the exact-dedup fingerprint index (`content_hash` plus any
    * carried columns, e.g. keep_id). Pairs with [[Dedup.incrementalDedup]]:
    * each completed ingest appends its survivors' hashes (mode=append)
    * and the next batch anti-joins the union.
    */
  def saveFingerprintIndex(index: DataFrame, dir: String,
      mode: String = "overwrite"): Unit =
    index.write.mode(mode).parquet(dir)

  def loadFingerprintIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  // ---- IvfPqModel (ANN build artifact) ----

  /** Persist an [[Similarity.IvfPqModel]] as one tiny parquet relation of
    * (kind, subspace, cid, vec) rows: kind='cent' rows carry the coarse
    * centroids (subspace = -1), kind='book' rows one codebook centroid
    * per (subspace, cid). Float32 vectors round-trip exactly.
    */
  def saveIvfPqModel(spark: SparkSession, model: Similarity.IvfPqModel,
      dir: String): Unit = {
    import spark.implicits._
    val centRows = model.cents.toSeq.map { case (cid, cv) =>
      ("cent", -1, cid, cv.toSeq)
    }
    val bookRows = for {
      (book, s) <- model.books.toSeq.zipWithIndex
      (cv, cid) <- book.toSeq.zipWithIndex
    } yield ("book", s, cid, cv.toSeq)
    (centRows ++ bookRows).toDF("kind", "subspace", "cid", "vec")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def loadIvfPqModel(spark: SparkSession, dir: String): Similarity.IvfPqModel = {
    val rows = spark.read.parquet(dir).collect()
    val cents = rows.filter(_.getString(0) == "cent")
      .map(r => (r.getInt(2), r.getSeq[Float](3).toArray))
      .sortBy(_._1)
    val books = rows.filter(_.getString(0) == "book")
      .groupBy(_.getInt(1)).toArray.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getInt(2)).map(_.getSeq[Float](3).toArray)
      }
    require(cents.nonEmpty && books.nonEmpty, s"no IVF-PQ model rows under $dir")
    Similarity.IvfPqModel(cents, books)
  }

  // ---- BPE merge table (tokenizer artifact) ----

  /** Persist an ordered BPE merge list as (round, left, right) rows —
    * the artifact a BPE tokenizer IS. Order is the merge ROUND, restored
    * on load (parquet row order is not a contract).
    */
  def saveBpeMerges(spark: SparkSession, merges: Seq[(String, String)],
      dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("round", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def loadBpeMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(dir).orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  // ---- versioned publication (crash-safe maintenance) ----

  /** In-place `overwrite` (what [[saveMinhashIndex]]/[[compactMinhashIndex]]
    * do) is NOT atomic: a crash mid-write leaves a broken directory. For
    * maintenance jobs that must never corrupt the live artifact, publish
    * VERSIONS instead: each call writes into a fresh `root/v=<n+1>`
    * directory and only then flips the 1-line `root/_LATEST` pointer
    * file (the poor-man's transaction log — the pointer write is a
    * single small file create+rename, and a crash before it leaves the
    * pointer at the last COMPLETE version). Readers resolve the pointer
    * via [[latestVersion]]; old versions stay until a retention sweep
    * deletes them.
    */
  def publishVersion(spark: SparkSession, root: String)
      (write: String => Unit): String = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    val next = 1 + (latestVersion(spark, root) match {
      case Some(dir) => dir.substring(dir.lastIndexOf("v=") + 2).toLong
      case None => 0L
    })
    val target = s"$root/v=$next"
    write(target)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/._LATEST.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v=$next".getBytes("UTF-8")) finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_LATEST")
    if (fs.exists(ptr)) fs.delete(ptr, false)
    fs.rename(tmp, ptr)
    target
  }

  /** The directory `root/_LATEST` points at, if any complete version has
    * been published.
    */
  def latestVersion(spark: SparkSession, root: String): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_LATEST")
    val fs = ptr.getFileSystem(conf)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val v = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        if (v.isEmpty) None else Some(s"$root/$v")
      } finally in.close()
    }
  }

  /** Retention sweep for [[publishVersion]] roots: delete all but the
    * newest `keep` version directories, NEVER touching the one `_LATEST`
    * points at (even if an operator passes keep=0 while a stale pointer
    * names an old version). Run on the maintenance cadence after a
    * publish.
    */
  def pruneVersions(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, s"keep $keep — must retain at least the live version")
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) return
    val live = latestVersion(spark, root).map(_.split('/').last)
    val versions = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName)
      .sortBy(n => n.substring(2).toLong)
    versions.dropRight(keep)
      .filterNot(live.contains)
      .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(s"$root/$n"), true))
  }

  // ---- load-or-fit compositions ----

  /** Hadoop-FS existence probe (portable across local/HDFS/object
    * stores — a java.io check would only see the local filesystem).
    */
  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The call a production pipeline makes: reuse the persisted artifact
    * if present, else run `fit` once and persist it. The by-name `fit`
    * is only forced on a miss, so a warm restart costs one FS probe +
    * one tiny read — never a re-fit (spec-asserted via a fit counter).
    */
  def loadOrFitIvfPq(spark: SparkSession, dir: String)
      (fit: => Similarity.IvfPqModel): Similarity.IvfPqModel =
    if (exists(spark, dir)) loadIvfPqModel(spark, dir)
    else { val m = fit; saveIvfPqModel(spark, m, dir); m }

  def loadOrFitBpeMerges(spark: SparkSession, dir: String)
      (fit: => Seq[(String, String)]): Seq[(String, String)] =
    if (exists(spark, dir)) loadBpeMerges(spark, dir)
    else { val m = fit; saveBpeMerges(spark, m, dir); m }

  def loadOrFitQualityLr(spark: SparkSession, dir: String)
      (fit: => TextAnalysis.QualityLrModel): TextAnalysis.QualityLrModel =
    if (exists(spark, dir)) loadQualityLr(spark, dir)
    else { val m = fit; saveQualityLr(spark, m, dir); m }

  def loadOrBuildMinhashIndex(spark: SparkSession, dir: String)
      (build: => Dedup.MinhashIndex): Dedup.MinhashIndex =
    if (exists(spark, dir)) loadMinhashIndex(spark, dir)
    else { val idx = build; saveMinhashIndex(idx, dir); loadMinhashIndex(spark, dir) }

  // ---- QualityLrModel (trained quality gate) ----

  /** Persist a [[TextAnalysis.QualityLrModel]] as one (intercept, weights)
    * row. IEEE doubles round-trip exactly through parquet, so the served
    * sigmoid scores are bit-identical across the save/load boundary.
    */
  def saveQualityLr(spark: SparkSession, model: TextAnalysis.QualityLrModel,
      dir: String): Unit = {
    import spark.implicits._
    Seq((model.intercept, model.weights.toSeq))
      .toDF("intercept", "weights")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def loadQualityLr(spark: SparkSession, dir: String): TextAnalysis.QualityLrModel = {
    val r = spark.read.parquet(dir).head()
    TextAnalysis.QualityLrModel(r.getDouble(0), r.getSeq[Double](1).toArray)
  }
}
