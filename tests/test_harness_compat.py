"""Differential-harness compatibility: every registered query must emit
only scalar output columns.

The driver's canonicalizer round-trips results through pandas and sorts
rows by every column; array/map/struct cells raise
``TypeError: unhashable type`` there (observed round 3 on
``events_user_sequences``), turning a *correct* query into a red
CORRECTNESS row.  The rule: complex types stay internal, the registered
output projects them through ``array_join``/``to_json`` — this test
pins that for all current and future registrations.
"""

from __future__ import annotations

import os

import pytest

from star_schema_etl_airflow_spark import registry

SF_DIR = "/root/testdata/sf0.001"

# Queries allowed to emit complex-typed columns because a stringified
# twin exists and is the one registered for the oracle check.  Empty by
# design — add entries only with a documented reason.
COMPLEX_OUTPUT_WHITELIST: dict[str, set[str]] = {}


def _complex_fields(schema):
    from pyspark.sql import types as T

    return {
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    }


@pytest.mark.parametrize(
    "spec", registry.specs(), ids=lambda s: s.name
)
def test_query_output_is_scalar_typed(spark, spec):
    schema = spec.fn(spark, SF_DIR).schema
    offending = _complex_fields(schema) - COMPLEX_OUTPUT_WHITELIST.get(
        spec.name, set()
    )
    assert not offending, (
        f"{spec.name} emits complex-typed column(s) {sorted(offending)}; "
        "the driver canonicalizer cannot hash these — project through "
        "array_join/to_json (and mirror in the oracle SQL)"
    )


# --- driver dtype parity (round-5 verdict task 2) ---------------------------
#
# The driver's value hash is representation-sensitive: a Spark DECIMAL
# materializing as pandas Decimal objects vs a DuckDB DOUBLE, or a Spark
# int64 vs DuckDB's HUGEINT-widened float64, red-flags a value-exact
# query (bm25_topk / dsir_select, round 5).  ``tools/check_correctness``
# now fails on this class for every registered query in the per-round
# sweep; this pin keeps one cheap representative of each drift class in
# the always-on pytest surface.

DTYPE_PIN_QUERIES = [
    "ivm_counting_returnflags",  # decimal edge → double (both engines)
    "pq_adc_topk",               # SUM(BIGINT): HUGEINT widening cast back
    "q11_important_stock",       # decimal threshold query, double edge
    "unimax_allocation",         # int water-level vs HUGEINT-derived col
    "a4_minmax_by_priority",     # date columns (must NOT flag: canonical)
]


@pytest.mark.parametrize("name", DTYPE_PIN_QUERIES)
def test_driver_dtype_parity(spark, name):
    import duckdb

    sys_path = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys

    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from tools.check_correctness import TABLES, dtype_drift

    spec = {s.name: s for s in registry.specs()}[name]
    assert spec.oracle, f"{name} has no oracle"
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        sdf = spec.fn(spark, SF_DIR).toPandas()
        odf = con.execute(spec.oracle).df()
    finally:
        con.close()
    drift = dtype_drift(sdf, odf)
    assert not drift, (
        f"{name}: Spark vs DuckDB pandas representation drift {drift} — "
        "the driver's value hash will reject this even if values match; "
        "cast to a common edge type on BOTH sides"
    )
