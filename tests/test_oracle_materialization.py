"""mat_ctes (plans/ivfpq.py) is text surgery over finished SQL — pin
that it is SEMANTICS-PRESERVING on real registered oracles (identical
row multisets with and without materialization) and that its WINDOW
guard refuses the one shape it would corrupt.  DuckDB-only, no Spark."""

from __future__ import annotations

import duckdb
import pytest

from star_schema_etl_airflow_spark.plans.ivfpq import (
    IVFPQ_ORACLE,
    mat_ctes,
)
from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
    _semdedup_oracle,
)

SF_DIR = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("sql", [IVFPQ_ORACLE, _semdedup_oracle()],
                         ids=["ivfpq_topk", "semdedup"])
def test_materialized_oracle_is_row_identical_to_plain(sql):
    con = _con()
    plain = sorted(map(tuple, con.execute(sql).fetchall()))
    mat = sorted(map(tuple, con.execute(mat_ctes(sql)).fetchall()))
    assert mat == plain
    assert len(plain) > 0


def test_mat_ctes_actually_materializes():
    assert "AS MATERIALIZED (" in mat_ctes(IVFPQ_ORACLE)
    # and the raw building-block string stays untouched (the oracle
    # surgeries depend on it)
    assert "AS MATERIALIZED" not in IVFPQ_ORACLE


def test_window_clause_is_refused():
    sql = """
WITH t AS (
  SELECT 1 AS x
)
SELECT x, SUM(x) OVER w FROM t
WINDOW
  w AS (PARTITION BY x)
"""
    with pytest.raises(ValueError, match="WINDOW"):
        mat_ctes(sql)
