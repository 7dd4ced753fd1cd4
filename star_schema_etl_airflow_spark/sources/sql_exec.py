"""SQL execution surface (operators S3, S4, S5): parameterized SQL files
run through ``spark.sql`` against registered fixture/warehouse views.

Reference parity:
- S3 ``BigQueryExecuteOperator`` (utils/operators.py:93-159): read a SQL
  file, substitute params, execute, optionally sink — here the sink is
  the caller's choice (the returned DataFrame feeds ``sources.io``).
- S4 ``{{key}}`` substitution (utils/sql_utils.py:43-61): supported
  as-is for path/identifier splicing, but VALUES go through Spark's
  native named-parameter binding (``spark.sql(query, args=...)``) —
  injection-safe and type-preserving, which plain string replace is not.
- S5 path registry (utils/sql_utils.py:7-41): the same
  ``sql/<layer>/<domain>/<table_type>/<name>.sql`` convention rooted at a
  configurable directory.

Scale note: a SQL string compiles to the same Catalyst plan as the
DataFrame API — this surface adds zero execution overhead; it exists so
reference users can keep their SQL-file workflow.
"""

from __future__ import annotations

import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from star_schema_etl_airflow_spark.sources.fixtures import TABLES, load_table

_TEMPLATE_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def substitute_params(sql: str, params: dict[str, str] | None) -> str:
    """S4: ``{{key}}`` → value (identifier/path splicing only; values
    should use ``run_sql(..., args=...)`` named parameters instead)."""
    params = params or {}

    def repl(m: re.Match) -> str:
        key = m.group(1)
        if key not in params:
            raise KeyError(f"SQL template references undefined param {{{{{key}}}}}")
        return str(params[key])

    return _TEMPLATE_RE.sub(repl, sql)


def sql_path(
    root: str,
    layer: str,
    name: str,
    *,
    domain: str | None = None,
    table_type: str | None = None,
) -> str:
    """S5: layer-dispatched sql file path (utils/sql_utils.py:7-41):
    raw/datamart nest by ``domain``, core nests by ``table_type``
    (dim/fact) — e.g. ``sql/core/dim/dim_customers.sql``,
    ``sql/datamart/sales/sales_summary.sql``."""
    base = os.path.join(root, "sql")
    layer = layer.lower()
    if layer in ("raw", "datamart"):
        mid = [domain] if domain else []
    elif layer == "core":
        mid = [table_type] if table_type else []
    else:
        raise ValueError(f"Unknown layer: {layer}")
    return os.path.join(base, layer, *mid, f"{name}.sql")


# Repo root holding the committed reference-parity script tree
# (sql/core/{dim,fact}/*.sql, sql/datamart/sales/*.sql).  The default
# assumes the in-repo editable layout (package dir sits next to sql/);
# an installed copy (site-packages) won't carry the tree — point
# SPARK_GRAFT_SQL_ROOT at a checkout in that case.
SQL_ROOT = os.environ.get(
    "SPARK_GRAFT_SQL_ROOT",
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view for the SQL surface."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(
    spark: SparkSession,
    sql: str,
    *,
    params: dict[str, str] | None = None,
    args: dict[str, Any] | None = None,
) -> DataFrame:
    """S3: execute SQL with template substitution ({{key}}, identifiers)
    and native named-parameter binding (:key, values)."""
    text = substitute_params(sql, params)
    return spark.sql(text, args=args) if args else spark.sql(text)


def run_sql_file(
    spark: SparkSession,
    path: str,
    *,
    params: dict[str, str] | None = None,
    args: dict[str, Any] | None = None,
) -> DataFrame:
    with open(path) as f:
        return run_sql(spark, f.read(), params=params, args=args)
