"""Skew-handling utilities: salted joins for hot keys.

AQE's skew-join splitting handles sort-merge skew automatically (on in
``session.py``), but broadcast-ineligible joins against a *known* hot
key set still benefit from explicit salting: the hot keys' rows are
split across N salt buckets on the large side, and the small side is
replicated N× for those keys — turning one monster partition into N
even ones.

``salted_join`` is semantics-preserving: output equals the plain join,
row for row (tested), with the salt columns dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated ``num_salts``× — even partitions regardless of key skew.

    The large side gets a deterministic-per-row salt (hash of all
    columns, not ``rand()`` — keeps the operator reproducible); the
    small side explodes to every salt value.

    Only join types where an UNMATCHED small-side row emits nothing are
    semantics-preserving under replication (inner/left/left_semi/
    left_anti); right/full outer would emit every unmatched small row
    once per salt and are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not semantics-preserving under "
            f"small-side replication; allowed: inner, left, left_semi, left_anti"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(num_salts))
    salted_large = large.withColumn("_salt", salt)
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = salted_large.join(replicated_small, [key, "_salt"], how)
    return joined.drop("_salt")
