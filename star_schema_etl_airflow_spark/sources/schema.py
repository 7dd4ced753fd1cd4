"""Config-driven schema registry: YAML/dict table configs → StructType.

Mirrors the reference's registry surface (utils/sql_utils.py:63-100 loads
config/{domain}_config.yaml; utils/operators.py:61-62 converts the per-table
``schema:`` list to BigQuery SchemaFields).  Here the same YAML becomes a
Spark ``StructType`` handed to ``spark.read.schema(...)`` — declared schemas
only, no inference (SURVEY.md §1.3).

Type mapping (§1.2): STRING→string, INTEGER/INT64→long, FLOAT/FLOAT64→double,
DATE→date, TIMESTAMP→timestamp, BOOL/BOOLEAN→boolean.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

TYPE_MAP: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "BOOL": T.BooleanType(),
    "BOOLEAN": T.BooleanType(),
}


def build_struct_type(columns: list[dict[str, str]]) -> T.StructType:
    """[{name, type, mode?}, ...] → StructType (mode REQUIRED → not null)."""
    fields = []
    for col in columns:
        try:
            dtype = TYPE_MAP[col["type"].upper()]
        except KeyError:
            raise ValueError(
                f"unsupported column type {col['type']!r} for {col.get('name')!r}; "
                f"known: {sorted(TYPE_MAP)}"
            ) from None
        nullable = col.get("mode", "NULLABLE").upper() != "REQUIRED"
        fields.append(T.StructField(col["name"], dtype, nullable))
    return T.StructType(fields)


def load_config(path: str) -> dict[str, Any]:
    """Load a domain config YAML (shape of config/sales_config.yaml)."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict) or "tables" not in cfg:
        raise ValueError(f"config {path!r} has no 'tables' mapping")
    return cfg


def table_config(cfg: dict[str, Any], table: str) -> dict[str, Any]:
    try:
        return cfg["tables"][table]
    except KeyError:
        raise KeyError(
            f"table {table!r} not in config; have {sorted(cfg['tables'])}"
        ) from None


def table_schema(cfg: dict[str, Any], table: str) -> T.StructType:
    tc = table_config(cfg, table)
    if "schema" not in tc:
        raise ValueError(f"table {table!r} declares no schema (derived table?)")
    return build_struct_type(tc["schema"])


def tables_of_type(cfg: dict[str, Any], type_: str) -> list[str]:
    """Config-driven fan-out (dags/*:58-59,73: one task per table of a type).

    Raw tables carry no ``type:`` key in the reference config — they are the
    ones with a ``source:`` — so ``type_='raw'`` selects those.
    """
    out = []
    for name, tc in cfg["tables"].items():
        if type_ == "raw":
            if "source" in tc and "type" not in tc:
                out.append(name)
        elif tc.get("type") == type_:
            out.append(name)
    return out


def schema_drift(
    declared: T.StructType, observed: T.StructType
) -> dict[str, list[str]]:
    """Drift report between the registry's declared schema and what a
    source actually delivered: ``added`` (new upstream columns), ``missing``
    (declared but absent), ``type_changed`` ("col: declared→observed").

    The operational companion to the load dispositions (S1): BigQuery's
    ``ignore_unknown_values`` silently drops unknown columns — at scale
    silent drops hide upstream contract breaks, so the drift report is
    computed explicitly and the caller decides (alert / evolve / fail).
    """
    dec = {f.name: f.dataType for f in declared.fields}
    obs = {f.name: f.dataType for f in observed.fields}
    return {
        "added": sorted(set(obs) - set(dec)),
        "missing": sorted(set(dec) - set(obs)),
        "type_changed": sorted(
            f"{n}: {dec[n].simpleString()}→{obs[n].simpleString()}"
            for n in set(dec) & set(obs)
            if dec[n] != obs[n]
        ),
    }


def enforce_schema(
    declared: T.StructType,
    observed: T.StructType,
    *,
    allow_added: bool = False,
) -> None:
    """Fail-fast contract check: raise with the full drift report unless
    the observed schema matches (``allow_added=True`` tolerates new
    upstream columns — the forward-compatible evolution mode)."""
    drift = schema_drift(declared, observed)
    problems = dict(drift)
    if allow_added:
        problems.pop("added")
    if any(v for v in problems.values()):
        raise ValueError(f"schema drift detected: {drift}")


def dependencies(cfg: dict[str, Any], table: str) -> list[str]:
    """Bare table names of the declared dependencies (strips the
    'layer.domain.' prefix of e.g. 'core.dim.dim_customers')."""
    deps = table_config(cfg, table).get("dependencies", [])
    return [d.split(".")[-1] for d in deps]
