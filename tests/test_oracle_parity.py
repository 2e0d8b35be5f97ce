"""Every oracle-paired query must hash-match DuckDB at sf0.001 (fast) —
the local twin of the driver's t2 correctness gate."""

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import compare, duckdb_con

import emdatapipelines_spark.queries as q


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_SMALL)
    yield c
    c.close()


@pytest.fixture(autouse=True)
def _release_pins(spark):
    """Release engine-pinned intermediates (cachectl ledger) after each
    query — 287 queries in one JVM otherwise accumulate checkpoint/persist
    blocks (r11 VERDICT #1)."""
    yield
    from emdatapipelines_spark.cachectl import release_tracked

    release_tracked()


@pytest.mark.parametrize("name", sorted(q.ORACLES.keys()))
def test_oracle_parity(spark, con, name):
    df = q.QUERIES[name](spark, SF_SMALL)
    compare(df, con, q.ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(q.QUERIES) - set(q.ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = q.QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.columns) > 0
