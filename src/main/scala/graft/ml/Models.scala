package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's model surface (SURVEY.md §2.9 M1–M4) on MLlib:
  *
  *  - M1: fixed-order feature assembly with 0.0 null default
  *    (database_and_model_tools.py:214-218, :226);
  *  - M2: standard scaling (withMean+withStd — sklearn parity semantics
  *    live in [[Scaler]]; the MLlib stage is the pipeline-integrated form);
  *  - M3: gradient-boosted regression (reference: LightGBM gbdt regressor —
  *    same algorithm family; capability parity, not tree-for-tree);
  *  - M4: gradient-boosted binary classifiers (reference: 2 LightGBM
  *    classifiers over status_encoded pairs).
  *
  * Training distributes via MLlib's GBT; scoring is `model.transform`, a
  * plain narrow DataFrame plan.
  */
object Models {

  /** M1: assemble `featureCols` (null→0.0) into a `features` vector. */
  def assembler(featureCols: Seq[String]): VectorAssembler =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features_raw")
      .setHandleInvalid("keep")

  /** Reference M1 contract: invalid feature values default to 0.0. NaN is
    * replaced too (nanvl) — one NaN surviving into StandardScaler.fit
    * would NaN that dimension's mean and poison every row. */
  private def withZeroDefaults(df: DataFrame, featureCols: Seq[String]): DataFrame =
    featureCols.foldLeft(df)((d, c) =>
      d.withColumn(c, nanvl(coalesce(col(c).cast("double"), lit(0.0)), lit(0.0))))

  /** M3: regression pipeline assemble → scale → GBT. */
  def fitRegressor(train: DataFrame, featureCols: Seq[String],
      labelCol: String, maxIter: Int = 20, seed: Long = 42L): PipelineModel = {
    val stages = Array(
      assembler(featureCols),
      new StandardScaler().setInputCol("features_raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new GBTRegressor().setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxIter(maxIter).setMaxDepth(4).setSeed(seed))
    new Pipeline().setStages(stages)
      .fit(withZeroDefaults(train, featureCols))
  }

  /** M4: binary classification pipeline for a label pair (e.g.
    * fault-vs-idle on status_encoded). */
  def fitBinaryClassifier(train: DataFrame, featureCols: Seq[String],
      labelCol: String, maxIter: Int = 20, seed: Long = 42L): PipelineModel = {
    val stages = Array(
      assembler(featureCols),
      new StandardScaler().setInputCol("features_raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new GBTClassifier().setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxIter(maxIter).setMaxDepth(4).setSeed(seed))
    new Pipeline().setStages(stages)
      .fit(withZeroDefaults(train, featureCols))
  }

  /** Score: appends `prediction` (and probability for classifiers). */
  def score(model: PipelineModel, df: DataFrame, featureCols: Seq[String]): DataFrame =
    model.transform(withZeroDefaults(df, featureCols))
}
