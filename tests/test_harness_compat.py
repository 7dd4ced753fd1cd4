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
