"""Incremental high-watermark ingestion: load only rows newer than the
cursor recorded by the previous run.

The reference's incremental pattern is calendar-based (one dated folder
per day, S2/S8); this is the complementary *cursor*-based pattern for
sources without date partitioning (CDC tails, event streams landed as
files, transactional extracts): remember ``max(cursor_col)`` after each
load, read ``cursor > last`` next time.

Scale design: the cursor predicate is pushed into the parquet scan
(min/max row-group stats skip old files entirely — pair with
``io.write_sorted_parquet`` on the cursor column for O(1)-file reads);
the watermark itself is a single tiny scalar aggregate.  The cursor store
is a JSON file here — on a cluster it becomes a metastore table or
workflow state, same two functions.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_watermark(store_path: str, source_name: str):
    """Last recorded cursor value for ``source_name`` (None on first run)."""
    if not os.path.exists(store_path):
        return None
    with open(store_path) as f:
        return json.load(f).get(source_name)


def write_watermark(store_path: str, source_name: str, value) -> None:
    state = {}
    if os.path.exists(store_path):
        with open(store_path) as f:
            state = json.load(f)
    state[source_name] = value
    tmp = store_path + ".tmp"
    with open(tmp, "w") as f:
        # cursor values must round-trip JSON: ints/strings natively;
        # timestamps serialize as ISO strings (Spark casts the literal
        # back against the timestamp column in the filter)
        json.dump(state, f, default=str)
    os.replace(tmp, store_path)  # atomic: a crashed run never corrupts state


def incremental_load(
    df: DataFrame,
    cursor_col: str,
    store_path: str,
    source_name: str,
) -> tuple[DataFrame, object]:
    """Slice ``df`` to rows past the stored watermark and compute the new
    one.  Returns ``(slice, new_watermark)`` — the caller advances the
    cursor with :func:`write_watermark` only AFTER its sink commit, so a
    failed run re-reads the same slice (at-least-once, which the
    partition-overwrite / MERGE sinks make effectively exactly-once).
    """
    last = read_watermark(store_path, source_name)
    sliced = df if last is None else df.filter(F.col(cursor_col) > F.lit(last))
    row = sliced.agg(F.max(cursor_col).alias("m")).collect()[0]
    new_wm = row["m"] if row["m"] is not None else last
    return sliced, new_wm
