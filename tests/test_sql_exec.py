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
    # the reference's layer dispatch (utils/sql_utils.py:7-41): core
    # nests by table_type, raw/datamart by domain
    assert sql_path("/r", "core", "dim_customers", table_type="dim") == \
        "/r/sql/core/dim/dim_customers.sql"
    assert sql_path("/r", "datamart", "sales_summary", domain="sales") == \
        "/r/sql/datamart/sales/sales_summary.sql"
    assert sql_path("/r", "raw", "orders") == "/r/sql/raw/orders.sql"
    with pytest.raises(ValueError, match="Unknown layer"):
        sql_path("/r", "nope", "x")


def test_committed_sql_tree_resolves():
    """The committed reference-parity script tree resolves through the
    S5 path registry (every reference transform has a drop-in file)."""
    import os

    from star_schema_etl_airflow_spark.sources.sql_exec import SQL_ROOT

    for layer, name, kw in [
        ("core", "dim_customers", {"table_type": "dim"}),
        ("core", "dim_products", {"table_type": "dim"}),
        ("core", "dim_dates", {"table_type": "dim"}),
        ("core", "fact_orders", {"table_type": "fact"}),
        ("datamart", "sales_summary", {"domain": "sales"}),
        ("datamart", "customer_analytics", {"domain": "sales"}),
    ]:
        assert os.path.exists(sql_path(SQL_ROOT, layer, name, **kw)), name


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


def test_sqlfile_single_date_refresh_matches_dataframe_twin(spark):
    """dstart = dend reproduces the reference's single-partition refresh:
    the file's output for one date equals the DataFrame twin filtered to
    that date."""
    from star_schema_etl_airflow_spark.plans.datamart import sales_summary
    from star_schema_etl_airflow_spark.plans.sqlfiles import (
        sqlfile_sales_summary,
    )
    from star_schema_etl_airflow_spark.sources.sql_exec import (
        SQL_ROOT,
        register_views,
        run_sql_file,
        sql_path,
    )

    register_views(spark, SF_DIR)
    # a date guaranteed to carry orders in every fixture: take one
    day = (
        spark.table("orders")
        .selectExpr("CAST(o_orderdate AS DATE) AS d")
        .groupBy("d").count().orderBy("count", ascending=False)
        .first().d.isoformat()
    )
    got = run_sql_file(
        spark,
        sql_path(SQL_ROOT, "datamart", "sales_summary", domain="sales"),
        params={"dstart": day, "dend": day},
    )
    want = sales_summary(spark, SF_DIR).filter(f"sale_date = DATE'{day}'")
    assert got.count() > 0
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.select(*got.columns).collect()))


def test_sqlfile_fact_orders_plan_is_hash_joined(spark):
    """The PIT predicates ride an equality key, so the SQL-file fact
    assembly must plan hash joins (broadcast for the dim sides) — never
    a nested-loop/cartesian from the range conditions."""
    from star_schema_etl_airflow_spark.plans.sqlfiles import (
        sqlfile_fact_orders,
    )

    plan = sqlfile_fact_orders(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
