package graft.ml

import java.nio.file.Files

import graft.SparkSpec
import graft.telemetry.TelemetrySchema
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class ModelRegistrySpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-models").toString

  test("save/load round-trip scores identically to the in-memory model") {
    val rng = new Random(7)
    val df = (1 to 400).map { _ =>
      val x1 = rng.nextDouble() * 10
      val x2 = rng.nextDouble() * 5
      (x1, x2, 2.0 * x1 - x2 + rng.nextGaussian() * 0.1)
    }.toDF("x1", "x2", "y")
    val model = Models.fitRegressor(df, Seq("x1", "x2"), "y", maxIter = 3)
    val path = ModelRegistry.modelPath(tmpRoot(), "regression")
    ModelRegistry.saveModel(model, path)
    val reloaded = ModelRegistry.loadModel(path)

    val orig = Models.score(model, df, Seq("x1", "x2"))
      .select("x1", "x2", "prediction").collect().toSeq
    val back = Models.score(reloaded, df, Seq("x1", "x2"))
      .select("x1", "x2", "prediction").collect().toSeq
    assert(orig == back, "reloaded model must score bit-identically")
  }

  test("scaler stats round-trip exactly and fix renames feature keys") {
    val root = tmpRoot()
    val path = ModelRegistry.scalerPath(root, "regression")
    val stats = Map(
      "FuelConsumption" -> Scaler.ColStats(10.5, 2.25),
      "VibrationLevel" -> Scaler.ColStats(3.0, 1.0),
      "CustomSensor" -> Scaler.ColStats(-1.5, 0.125))
    ModelRegistry.saveScaler(spark, stats, path)
    assert(ModelRegistry.loadScaler(spark, path) == stats)

    assert(ModelRegistry.fixScalerFeatures(
      spark, path, TelemetrySchema.columnMapping))
    val fixed = ModelRegistry.loadScaler(spark, path)
    // mapped names go through the mapping; unmapped fall back to lowercase
    assert(fixed == Map(
      "fuelconsumption" -> Scaler.ColStats(10.5, 2.25),
      "vibrationlevel" -> Scaler.ColStats(3.0, 1.0),
      "customsensor" -> Scaler.ColStats(-1.5, 0.125)))
  }

  test("fixModelFeatures rewrites recorded camelCase names and the fixed model scores renamed frames") {
    val rng = new Random(11)
    // train with the reference's pre-rename camelCase column names
    val camel = (1 to 300).map { _ =>
      val t = 60 + rng.nextDouble() * 40
      val v = rng.nextDouble() * 6
      (t, v, 0.5 * t + 3.0 * v + rng.nextGaussian() * 0.1)
    }.toDF("EngineTemperature", "VibrationLevel", "y")
    val cols = Seq("EngineTemperature", "VibrationLevel")
    val model = Models.fitRegressor(camel, cols, "y", maxIter = 3)

    val root = tmpRoot()
    val path = ModelRegistry.modelPath(root, "regression")
    ModelRegistry.saveModel(model, path)
    assert(ModelRegistry.fixModelFeatures(
      spark, path, TelemetrySchema.columnMapping))

    val fixed = ModelRegistry.loadModel(path)
    val asm = fixed.stages.collectFirst {
      case a: org.apache.spark.ml.feature.VectorAssembler => a
    }.get
    assert(asm.getInputCols.toSeq ==
      Seq("enginetemperature", "vibrationlevel"))

    // the fixed model now scores canonical lowercase frames, and the tree
    // ensemble is untouched: predictions match the original model's
    val canon = camel.toDF("enginetemperature", "vibrationlevel", "y")
    val predsFixed = Models.score(fixed, canon,
        Seq("enginetemperature", "vibrationlevel"))
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    val predsOrig = Models.score(model, camel, cols)
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(predsFixed == predsOrig)
  }

  test("fixAllModels reports per-artifact status; missing paths are false") {
    val root = tmpRoot()
    // materialize only one intent's pair — the rest must report false,
    // mirroring the reference's missing-file branch
    val df = (1 to 200).map(i =>
      (i.toDouble, (i % 7).toDouble, i * 0.5)).toDF("a", "b", "y")
    ModelRegistry.saveModel(
      Models.fitRegressor(df, Seq("a", "b"), "y", maxIter = 2),
      ModelRegistry.modelPath(root, "regression"))
    ModelRegistry.saveScaler(spark,
      Map("a" -> Scaler.ColStats(0.0, 1.0)),
      ModelRegistry.scalerPath(root, "regression"))

    val results = ModelRegistry.fixAllModels(
      spark, root, TelemetrySchema.columnMapping)
    assert(results("regression_model"))
    assert(results("regression_scaler"))
    assert(!results("anomaly_model"))
    assert(!results("anomaly_scaler"))
    assert(results.size == ModelRegistry.intents.size * 2)
  }
}
