"""M2 — RandomForest training/evaluation with MLlib.

≈ `assets/ml_assets.py:176-331`: RandomForest classifier/regressor,
0.8/0.2 split seeded 42, n_estimators=100, max_depth=10, accuracy +
feature importances. scikit-learn on a collected frame becomes
distributed `pyspark.ml` on DataFrames.
"""

from __future__ import annotations

from pyspark.ml.classification import RandomForestClassificationModel, RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator, RegressionEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.ml.regression import RandomForestRegressionModel, RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession, functions as F


def train_forest_classifier(
    df: DataFrame,
    feature_array_col: str = "embedding",
    label_col: str = "label",
    num_trees: int = 100,
    max_depth: int = 10,
    seed: int = 42,
    with_metrics: bool = True,
) -> tuple[RandomForestClassificationModel, dict]:
    """Train on an ``array<float>`` feature column; returns (model, metrics).

    Mirrors the reference hyperparameters (`ml_assets.py:212-230`):
    n_estimators=100, max_depth=10, random_state=42, test_size=0.2.

    ``with_metrics=False`` skips the held-out evaluation (two evaluator
    passes + two counts — four extra Spark jobs) and returns ``{}``;
    callers that only consume the MODEL (``ml_forest_predictions`` scores
    the full frame itself) should pass it (r14, guide §1.2: don't compute
    what you throw away). Training is unaffected — same split, same seed,
    same trees either way.
    """
    data = df.select(
        array_to_vector(F.col(feature_array_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    train, test = data.randomSplit([0.8, 0.2], seed=seed)
    rf = RandomForestClassifier(
        numTrees=num_trees, maxDepth=max_depth, seed=seed, labelCol="label", featuresCol="features"
    )
    model = rf.fit(train)
    if not with_metrics:
        return model, {}
    pred = model.transform(test)
    evaluator = MulticlassClassificationEvaluator(labelCol="label", predictionCol="prediction")
    metrics = {
        "accuracy": evaluator.evaluate(pred, {evaluator.metricName: "accuracy"}),
        "f1": evaluator.evaluate(pred, {evaluator.metricName: "f1"}),
        "n_train": train.count(),
        "n_test": test.count(),
        "feature_importances_top10": sorted(
            enumerate(model.featureImportances.toArray().tolist()),
            key=lambda kv: -kv[1],
        )[:10],
    }
    return model, metrics


def train_forest_regressor(
    df: DataFrame,
    feature_array_col: str = "embedding",
    target_col: str = "label",
    num_trees: int = 100,
    max_depth: int = 10,
    seed: int = 42,
) -> tuple[RandomForestRegressionModel, dict]:
    """M2 regressor twin — MSE/RMSE metrics (`ml_assets.py:259-331`:
    RandomForestRegressor, same split/hyperparameters as the classifier)."""
    data = df.select(
        array_to_vector(F.col(feature_array_col).cast("array<double>")).alias("features"),
        F.col(target_col).cast("double").alias("label"),
    )
    train, test = data.randomSplit([0.8, 0.2], seed=seed)
    rf = RandomForestRegressor(
        numTrees=num_trees, maxDepth=max_depth, seed=seed, labelCol="label", featuresCol="features"
    )
    model = rf.fit(train)
    pred = model.transform(test)
    evaluator = RegressionEvaluator(labelCol="label", predictionCol="prediction")
    mse = evaluator.evaluate(pred, {evaluator.metricName: "mse"})
    metrics = {
        "mse": mse,
        "rmse": evaluator.evaluate(pred, {evaluator.metricName: "rmse"}),
        "r2": evaluator.evaluate(pred, {evaluator.metricName: "r2"}),
        "n_train": train.count(),
        "n_test": test.count(),
    }
    return model, metrics


def save_model_with_metadata(
    model, path: str, metrics: dict, spark: SparkSession, model_name: str = "model"
) -> DataFrame:
    """S15 — model artifact sink: persist the MLlib model + append a metadata
    row (`assets/ml_assets.py:309-318`: joblib dump + metadata record).
    Returns the metadata DataFrame (caller appends it to a registry table)."""
    model.write().overwrite().save(path)
    meta = [
        {
            "model_name": model_name,
            "model_path": path,
            "metric_name": k,
            "metric_value": float(v),
        }
        for k, v in metrics.items()
        if isinstance(v, (int, float))
    ]
    return spark.createDataFrame(
        meta, "model_name string, model_path string, metric_name string, metric_value double"
    )
