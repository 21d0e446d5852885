package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Scaler.ColStats

/** Versioned model store + maintenance, the reference's MODEL_PATHS
  * registry and ModelMaintenance flow (database_and_model_tools.py:140-209)
  * re-expressed on MLlib persistence:
  *
  *  - each intent ("regression", "classification_fault_idle", ...) owns a
  *    versioned model path and a versioned scaler path, like the
  *    `*_v18.pkl` pairs under the reference's models/ dir;
  *  - models persist via MLlib's native `PipelineModel.write` (metadata
  *    JSON + stage data as parquet — distributed-filesystem-friendly,
  *    unlike a driver-local pickle);
  *  - scaler stats persist as a tiny (feature, mean, scale) parquet — the
  *    Spark-native form of the reference's separate scaler pickle;
  *  - `fixModelFeatures`/`fixScalerFeatures` mirror fix_model_features /
  *    fix_scaler_features (database_and_model_tools.py:166-209): load the
  *    artifact, rewrite its RECORDED feature names through the ingest
  *    rename map (fallback lowercase), save it back in place. On MLlib
  *    the recorded names live on the fitted VectorAssembler stage's
  *    inputCols param; a model without an assembler stage is "skipped"
  *    (returns true) exactly like the reference's missing
  *    feature_names_in_ branch; a missing path returns false.
  *
  * Scale note: save/load move only model metadata (KBs–MBs); no data-path
  * cost. Scoring a loaded model is `model.transform` — the same narrow
  * plan as a freshly fit one.
  */
object ModelRegistry {

  /** Reference artifact version (models/{...}_v18.pkl). */
  val version: Int = 18

  /** The reference's four intents (database_and_model_tools.py:140-158). */
  val intents: Seq[String] = Seq(
    "regression", "classification_fault_idle",
    "classification_active_maint", "anomaly")

  def modelPath(root: String, intent: String): String =
    s"$root/${intent}_model_v$version"

  def scalerPath(root: String, intent: String): String =
    s"$root/${intent}_scaler_v$version"

  def saveModel(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): PipelineModel = PipelineModel.load(path)

  /** Persist fitted scaler stats, ordered by feature for determinism. */
  def saveScaler(spark: SparkSession, stats: Map[String, ColStats],
      path: String): Unit = {
    import spark.implicits._
    stats.toSeq.map { case (c, s) => (c, s.mean, s.scale) }
      .sortBy(_._1)
      .toDF("feature", "mean", "scale")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadScaler(spark: SparkSession, path: String): Map[String, ColStats] =
    spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> ColStats(r.getDouble(1), r.getDouble(2)))
      .toMap

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** fix_model_features: rewrite the assembler's recorded input columns
    * through `mapping` (fallback lowercase) and re-save in place. */
  def fixModelFeatures(spark: SparkSession, path: String,
      mapping: Map[String, String]): Boolean = {
    if (!exists(spark, path)) return false
    val model = loadModel(path)
    model.stages.collectFirst { case a: VectorAssembler => a } match {
      case Some(asm) =>
        val renamed = asm.getInputCols.map(c =>
          mapping.getOrElse(c, c.toLowerCase))
        asm.setInputCols(renamed)
        saveModel(model, path)
      case None => // no recorded feature names — skipped, still a success
    }
    true
  }

  /** fix_scaler_features: rename the stats' feature keys and re-save. */
  def fixScalerFeatures(spark: SparkSession, path: String,
      mapping: Map[String, String]): Boolean = {
    if (!exists(spark, path)) return false
    // loadScaler collects eagerly, so overwriting the same path is safe
    val fixed = loadScaler(spark, path).map { case (c, s) =>
      mapping.getOrElse(c, c.toLowerCase) -> s
    }
    saveScaler(spark, fixed, path)
    true
  }

  /** fix_all_models (database_and_model_tools.py:159-165): one result row
    * per artifact, keyed `<intent>_model` / `<intent>_scaler`. */
  def fixAllModels(spark: SparkSession, root: String,
      mapping: Map[String, String]): Map[String, Boolean] =
    intents.flatMap { intent =>
      Seq(
        s"${intent}_model" ->
          fixModelFeatures(spark, modelPath(root, intent), mapping),
        s"${intent}_scaler" ->
          fixScalerFeatures(spark, scalerPath(root, intent), mapping))
    }.toMap
}
