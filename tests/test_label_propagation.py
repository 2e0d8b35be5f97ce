"""label_propagation_min: synchronized min-label rounds on an undirected
edge list (operators/graph.py)."""

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.graph import label_propagation_min


def test_two_components_get_min_labels(spark):
    edges = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    out = {r["node"]: r["community"] for r in label_propagation_min(edges).collect()}
    assert out == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_bounded_rounds_chain(spark):
    # chain a-b-c-d-e: after 2 rounds, e has only seen labels within 2 hops
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], "src string, dst string"
    )
    out = {r["node"]: r["community"] for r in
           label_propagation_min(edges, iterations=2).collect()}
    assert out["e"] == "c"  # min label within 2 hops of e
    assert out["a"] == "a"


def test_direction_ignored_and_self_loops_dropped(spark):
    edges = spark.createDataFrame(
        [("z", "a"), ("q", "q")], "src string, dst string"
    )
    out = {r["node"]: r["community"] for r in label_propagation_min(edges).collect()}
    assert out["z"] == "a" and out["a"] == "a"
    assert out["q"] == "q"


def test_kcore_peels_pendant_chain(spark):
    from emdatapipelines_spark.operators.graph import kcore_peel

    # triangle c-d-e plus pendant chain a-b-c: 2-core = the triangle
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "c")],
        "src string, dst string",
    )
    out = {r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert out == {"c": 2, "d": 2, "e": 2}


def test_kcore_empty_when_tree(spark):
    from emdatapipelines_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("b", "d")], "src string, dst string"
    )
    assert kcore_peel(edges, k=2, rounds=3).count() == 0
