"""Config-driven pipeline runner (orchestration operators O1-O6).

The reference splits orchestration across three staggered Airflow DAGs with
cross-DAG sensors (ingest 00:00 → core 02:00 → datamart 04:00,
dags/*:48-66); here the same semantics collapse into one in-process runner:

- O3 config fan-out: stages are registered per table from the YAML registry
- O4 dependency order: topological sort of declared dependencies (the
  dims-before-facts barrier falls out of fact_orders' deps)
- O2 layer barrier: a dependency edge IS the barrier (no polling)
- O5 callbacks: ``on_stage_complete(name, result)`` hook
- O6 run-date threading: every stage receives the same ``run_date``;
  re-running a date is idempotent because every sink is an upsert or a
  partition overwrite

Scheduling itself (cron) stays external, as in the reference (SURVEY §2.10).
Scale note: stages run sequentially in dependency order within one
SparkSession — each stage is itself fully distributed; independent stages
could be submitted concurrently from threads sharing the session (Spark's
scheduler interleaves jobs), an escape hatch for wide configs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any

StageFn = Callable[..., Any]  # fn(spark, run_date, results: dict[str, Any])


@dataclass
class Stage:
    name: str
    fn: StageFn
    deps: tuple[str, ...] = ()
    layer: str | None = None  # raw | core | datamart (informational)


@dataclass
class Pipeline:
    stages: dict[str, Stage] = field(default_factory=dict)

    def add_stage(
        self,
        name: str,
        fn: StageFn,
        deps: Iterable[str] = (),
        layer: str | None = None,
    ) -> "Pipeline":
        if name in self.stages:
            raise ValueError(f"duplicate stage {name!r}")
        self.stages[name] = Stage(name, fn, tuple(deps), layer)
        return self

    def topological_order(self) -> list[str]:
        """Dims-before-facts (and every other declared edge), deterministic
        tie-break by name.  Raises CycleError on cyclic configs."""
        ts = TopologicalSorter()
        for s in self.stages.values():
            missing = [d for d in s.deps if d not in self.stages]
            if missing:
                raise ValueError(f"stage {s.name!r} depends on unknown {missing}")
            ts.add(s.name, *s.deps)
        ts.prepare()
        order: list[str] = []
        while ts.is_active():
            ready = sorted(ts.get_ready())
            order.extend(ready)
            ts.done(*ready)
        return order

    def run(
        self,
        spark,
        run_date: str,
        on_stage_complete: Callable[[str, Any], None] | None = None,
    ) -> dict[str, Any]:
        """Execute all stages for one run date; returns {stage: result}."""
        results: dict[str, Any] = {}
        for name in self.topological_order():
            result = self.stages[name].fn(spark, run_date, results)
            results[name] = result
            if on_stage_complete:
                on_stage_complete(name, result)
        return results


def run_audited(
    pipeline: Pipeline,
    spark,
    run_date: str,
    audit_path: str | None = None,
    retries: int = 0,
    retry_delay_s: float = 0.0,
    resume: bool = False,
):
    """Execute with a per-stage audit trail — the run-history surface the
    reference gets from Airflow's task-metadata DB (task duration, state).

    Returns ``(results, audit_df)``; the audit rows (run_date, stage,
    layer, status, attempts, duration_s, logged_at) append to a parquet
    audit table when ``audit_path`` is given.  On stage failure the audit
    — including the failed stage's row — is flushed BEFORE the exception
    propagates, so a crashed run is visible in the history, not just
    absent from it.

    ``retries``/``retry_delay_s`` mirror the reference's per-task policy
    (1 retry, 5-minute delay — dags/ingest_raw_sales.py:27-28).

    ``resume=True`` re-runs a failed date Airflow-style: stages already
    recorded ``ok`` for this ``run_date`` in the audit table are skipped
    (status ``skipped``, result ``None``).  Like Airflow tasks, stages
    must communicate through their SINKS, not return values, for resume
    to be sound — every stage in the sales domain writes a table, so a
    skipped upstream's output is simply read from storage by downstream.
    """
    import time as _time

    from pyspark.sql import functions as F

    rows: list[tuple] = []
    results: dict[str, Any] = {}

    done: set[str] = set()
    if resume and audit_path:
        try:
            prior = spark.read.parquet(audit_path)
            done = {
                r["stage"]
                for r in prior.filter(
                    (F.col("run_date") == run_date)
                    & (F.col("status") == "ok")
                ).select("stage").distinct().collect()
            }
        except Exception:
            done = set()

    def _flush():
        audit = spark.createDataFrame(
            rows,
            "run_date string, stage string, layer string, "
            "status string, attempts int, duration_s double",
        ).withColumn("logged_at", F.current_timestamp())
        if audit_path:
            from star_schema_etl_airflow_spark.sources.io import write_append

            write_append(audit, audit_path)
        return audit

    for name in pipeline.topological_order():
        stage = pipeline.stages[name]
        if name in done:
            results[name] = None
            rows.append((run_date, name, stage.layer, "skipped", 0, 0.0))
            continue
        t0 = _time.perf_counter()
        attempt = 0
        while True:
            attempt += 1
            try:
                results[name] = stage.fn(spark, run_date, results)
                break
            except Exception:
                if attempt > retries:
                    rows.append(
                        (run_date, name, stage.layer, "failed", attempt,
                         round(_time.perf_counter() - t0, 3))
                    )
                    _flush()
                    raise
                if retry_delay_s:
                    _time.sleep(retry_delay_s)
        rows.append(
            (run_date, name, stage.layer, "ok", attempt,
             round(_time.perf_counter() - t0, 3))
        )
    return results, _flush()


def from_config(
    cfg: Mapping[str, Any],
    builders: Mapping[str, StageFn],
    layer_of: Mapping[str, str] | None = None,
) -> Pipeline:
    """Build a pipeline from a domain config (shape of
    config/sales_config.yaml) + a {table: builder fn} map.

    Dependencies come from the config's ``dependencies`` lists (bare table
    names); tables without declared deps get none (raw layer).
    """
    from star_schema_etl_airflow_spark.sources.schema import dependencies

    p = Pipeline()
    for name, fn in builders.items():
        deps = [d for d in dependencies(cfg, name) if d in builders]
        layer = (layer_of or {}).get(name)
        p.add_stage(name, fn, deps=deps, layer=layer)
    return p


def run_backfill(
    pipeline: Pipeline,
    spark,
    dates: Iterable[str],
    audit_path: str | None = None,
    **audit_kwargs,
):
    """Backfill a date range: run the full pipeline once per date, in
    order (Airflow catchup semantics; the reference pins catchup=False
    but its daily partition refreshes are exactly re-runnable, which is
    what makes this sound).  Returns {date: results}.  Stages communicate
    through sinks, so each date's run is independent and idempotent —
    re-running any subset of dates converges to the same tables."""
    out = {}
    for d in dates:
        out[d], _ = run_audited(
            pipeline, spark, d, audit_path, **audit_kwargs
        )
    return out
