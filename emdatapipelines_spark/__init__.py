"""emdatapipelines_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference system ``asevans48/EMDataPipelines`` (a Dagster + pandas +
Kafka/Flink + StarRocks + dbt stack), re-expressed Spark-first:

- DataFrame/SQL declarative plans optimized by Catalyst (replaces StarRocks FE
  planning and imperative pandas chains).
- Partitioned Parquet tables (replaces StarRocks OLAP tables).
- Structured Streaming (replaces Kafka topics + Flink SQL jobs).
- A model registry (replaces the dbt DAG).
- Column-expression function library (replaces dbt Jinja macros).
- First-class data-quality operators (replaces data_quality_ops + dbt tests).
- MLlib pipelines (replaces scikit-learn assets).
- LLM-data extensions: dedup, similarity search, text analysis, multimodal
  plumbing — designed for 100 TB scale.

No code is copied from the reference; docstrings cite reference files only to
document behavioral parity.
"""

__version__ = "0.1.0"
