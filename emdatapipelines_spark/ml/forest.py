"""M2 — RandomForest training/evaluation with MLlib.

≈ `assets/ml_assets.py:176-331`: RandomForest classifier/regressor,
0.8/0.2 split seeded 42, n_estimators=100, max_depth=10, accuracy +
feature importances. scikit-learn on a collected frame becomes
distributed `pyspark.ml` on DataFrames.
"""

from __future__ import annotations

from pyspark.ml.classification import RandomForestClassificationModel, RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, functions as F


def train_forest_classifier(
    df: DataFrame,
    feature_array_col: str = "embedding",
    label_col: str = "label",
    num_trees: int = 100,
    max_depth: int = 10,
    seed: int = 42,
) -> tuple[RandomForestClassificationModel, dict]:
    """Train on an ``array<float>`` feature column; returns (model, metrics).

    Mirrors the reference hyperparameters (`ml_assets.py:212-230`):
    n_estimators=100, max_depth=10, random_state=42, test_size=0.2.
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
