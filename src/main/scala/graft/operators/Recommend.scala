package graft.operators

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ALS collaborative filtering + per-user top-k (SURVEY §2.9 M1–M6,
  * §2.4 A6, §2.6 O5).
  *
  * Same estimator surface and hyperparameters as the reference
  * (`als.py:36-46`), minus the py4j reflection it needed to read back the
  * best CV params (`als.py:74-79`) — the JVM API exposes them typed.
  */
object Recommend {

  /** Reference hyperparameters (`als.py:36-46`). */
  case class AlsConfig(
      rank: Int = 100,
      maxIter: Int = 3,
      regParam: Double = 0.15,
      nonnegative: Boolean = true,
      implicitPrefs: Boolean = false,
      coldStartStrategy: String = "drop",
      seed: Long = 1234L,
      userCol: String = "userId",
      itemCol: String = "movieId",
      ratingCol: String = "rating")

  def estimator(cfg: AlsConfig = AlsConfig()): ALS =
    new ALS()
      .setRank(cfg.rank)
      .setMaxIter(cfg.maxIter)
      .setRegParam(cfg.regParam)
      .setNonnegative(cfg.nonnegative)
      .setImplicitPrefs(cfg.implicitPrefs)
      .setColdStartStrategy(cfg.coldStartStrategy)
      .setSeed(cfg.seed)
      .setUserCol(cfg.userCol)
      .setItemCol(cfg.itemCol)
      .setRatingCol(cfg.ratingCol)

  /** M2: fit (reference `als.py:87`). */
  def train(ratings: DataFrame, cfg: AlsConfig = AlsConfig()): ALSModel =
    estimator(cfg).fit(ratings)

  /** M3: predictions on held-out rows (reference `als.py:93`). */
  def predict(model: ALSModel, holdout: DataFrame): DataFrame =
    model.transform(holdout)

  /** M4: per-user top-k, exploded to flat (userId, movieId, rank) rows —
    * unlike the reference's `ARRAY<STRUCT>` + `getField` juggling
    * (`als.py:96,120`), downstream joins get plain columns.
    */
  def recommendTopK(model: ALSModel, k: Int): DataFrame =
    model.recommendForAllUsers(k)
      .select(col("userId"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("userId"),
        col("rec.movieId").as("movieId"),
        (col("pos") + 1).cast("long").as("rank"),
        col("rec.rating").as("score"))

  /** M4 (item side): per-item top-k users, flat rows — the
    * `recommendForAllItems` twin of [[recommendTopK]] (audience targeting /
    * item-cold-start triage; not used by the reference but part of the
    * same MLlib surface).
    */
  def recommendUsersTopK(model: ALSModel, k: Int): DataFrame =
    model.recommendForAllItems(k)
      .select(col("movieId"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("movieId"),
        col("rec.userId").as("userId"),
        (col("pos") + 1).cast("long").as("rank"),
        col("rec.rating").as("score"))

  /** M4 (subset): recommendations for a user subset only — at scale the
    * subset is the probe side; MLlib joins it against the factor matrix
    * before the blocked top-k, so cost tracks |subset|, not |all users|.
    */
  def recommendForUsers(model: ALSModel, users: DataFrame, k: Int): DataFrame =
    model.recommendForUserSubset(users, k)
      .select(col("userId"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("userId"),
        col("rec.movieId").as("movieId"),
        (col("pos") + 1).cast("long").as("rank"),
        col("rec.rating").as("score"))

  /** A6/O5 DataFrame-native per-key top-k for arbitrary scored relations
    * (the non-ALS path): ranking window + filter. At scale this is one
    * shuffle on `key`; no global sort, no driver collect (contrast
    * `popularity_model.py:59`).
    */
  def topKPerKey(scored: DataFrame, key: String, order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** M5: RMSE via the MLlib evaluator (expression form in [[Eval.rmse]]). */
  def rmseEvaluator(): RegressionEvaluator =
    new RegressionEvaluator()
      .setMetricName("rmse").setLabelCol("rating").setPredictionCol("prediction")

  /** M6: hyperparameter grid + k-fold CV (reference `als.py:53-80`:
    * rank ∈ {10,50,100,150}, regParam ∈ {.01,.05,.1,.15}, 5 folds).
    * Returns the fitted CV model; best params are typed:
    * `bestAls(cv).getRank` — no `_java_obj.parent()` reflection.
    */
  def crossValidate(
      ratings: DataFrame,
      ranks: Seq[Int] = Seq(10, 50, 100, 150),
      regParams: Seq[Double] = Seq(0.01, 0.05, 0.1, 0.15),
      numFolds: Int = 5,
      cfg: AlsConfig = AlsConfig()): CrossValidatorModel = {
    val als = estimator(cfg)
    val grid = new ParamGridBuilder()
      .addGrid(als.rank, ranks)
      .addGrid(als.regParam, regParams)
      .build()
    new CrossValidator()
      .setEstimator(als)
      .setEvaluator(rmseEvaluator())
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setSeed(cfg.seed)
      .fit(ratings)
  }

  /** Typed access to the winning ALS config (replaces `als.py:74-79`). */
  def bestAls(cv: CrossValidatorModel): ALSModel =
    cv.bestModel.asInstanceOf[ALSModel]
}
