"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on by default in the session factory) handles
most skew at runtime by splitting oversized partitions, but it only
applies to sort-merge joins and after a shuffle has already materialized
the skew.  Explicit salting is the planned-ahead alternative for joins
where one side has pathological hot keys (a handful of keys owning a
double-digit percentage of rows — the "null key" / "default user"
pattern in event data):

- the BIG side gets a random-ish but *deterministic* salt in [0, n):
  ``hash(monotonic row id) % n`` would be nondeterministic across runs,
  so we salt by a hash of the row's other columns;
- the SMALL side is exploded n× (one copy per salt value);
- the join key becomes (key, salt) — each hot key now spreads over n
  shuffle partitions.

Cost model: the small side is replicated n×, so pick n ≈ (rows of the
hottest key) / (target partition rows); n=8-32 is typical.  For
broadcast-able small sides, prefer ``F.broadcast`` (no salting needed —
broadcast joins don't shuffle the big side at all); salting matters when
BOTH sides are too big to broadcast AND keys are hot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with the shuffle spread over
    ``n_salts`` sub-keys per join key."""
    keys = [on] if isinstance(on, str) else list(on)

    # deterministic salt from the big row's full content (stable reruns)
    salt_src = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in big.columns])
    big_s = big.withColumn(SALT_COL, F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))

    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = big_s.join(small_s, on=[*keys, SALT_COL], how=how)
    return out.drop(SALT_COL)
