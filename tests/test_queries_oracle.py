"""Every driver-contract query vs its DuckDB oracle (SURVEY.md §5.3).

Mirrors the driver's gate: row-count + column names + order-insensitive
exact value comparison, at sf0.001 for speed (the driver re-runs at sf0.01;
scripts/check_oracle.py runs any sf on demand).
"""

import pytest

from sitecheck_spark.queries import QUERIES
from sitecheck_spark.testing import compare, duck_connection

from conftest import SF_DIR

_SLOW = {"q_crawl_fetch_log"}  # exercised end-to-end in test_crawl_golden


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in _SLOW])
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    df = spec["fn"](spark, SF_DIR)
    if spec["sql"] is None:
        assert df.count() >= 0  # rows-only contract: runs and has a schema
        return
    res = compare(df, duck.sql(spec["sql"]))
    assert res["match"], f"{name}: {res['detail']}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "wave", "status"} <= set(df.columns)
    # registry completeness: every oracle key has a query
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 35
