"""SQL surface: template substitution, named-parameter binding, path
registry convention, SQL-file round trip."""

from __future__ import annotations

import pytest

from star_schema_etl_airflow_spark.sources.sql_exec import (
    register_views,
    run_sql,
    run_sql_file,
    sql_path,
    substitute_params,
)

SF_DIR = "/root/testdata/sf0.001"


def test_substitute_params():
    assert substitute_params("SELECT * FROM {{t}} WHERE {{ c }} > 0",
                             {"t": "orders", "c": "amount"}) == \
        "SELECT * FROM orders WHERE amount > 0"


def test_substitute_missing_param_raises():
    with pytest.raises(KeyError, match="undefined param"):
        substitute_params("SELECT {{nope}}", {})


def test_sql_path_convention(tmp_path):
    assert sql_path("/r", "core", "sales", "dim", "dim_customers") == \
        "/r/sql/core/sales/dim/dim_customers.sql"


def test_run_sql_with_named_args(spark):
    register_views(spark, SF_DIR)
    df = run_sql(
        spark,
        "SELECT count(*) AS n FROM {{t}} WHERE o_totalprice > :min_price",
        params={"t": "orders"},
        args={"min_price": 100000.0},
    )
    direct = spark.table("orders").filter("o_totalprice > 100000.0").count()
    assert df.first().n == direct


def test_run_sql_file(spark, tmp_path):
    register_views(spark, SF_DIR)
    p = tmp_path / "q.sql"
    p.write_text("SELECT count(*) AS n FROM {{t}}")
    assert run_sql_file(spark, str(p), params={"t": "nation"}).first().n == 25
