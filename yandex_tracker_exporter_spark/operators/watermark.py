"""Incremental watermark computation (reference A2/F5).

The reference takes the ``updated_at`` of the *last* issue in
``Updated ASC`` order (``etl.py:54-64,147-168``) — order-dependent; here
it is ``max()`` (order-independent, one partial-aggregated scan) as
SURVEY §2.4 A2 prescribes. F5's up-to-date short-circuit compares the
candidate to the stored state before any write (``etl.py:218-223``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compute_watermark(df: DataFrame, ts_col: str = "updated_at") -> dt.datetime | None:
    """Candidate new watermark = max event/update time in the batch (A2)."""
    row = df.agg(F.max(ts_col).alias("wm")).first()
    return row["wm"] if row else None


def is_up_to_date(
    candidate: dt.datetime | None, stored: dt.datetime | None
) -> bool:
    """F5 short-circuit: nothing newer than the stored watermark."""
    if candidate is None:
        return True
    if stored is None:
        return False
    return candidate <= stored
