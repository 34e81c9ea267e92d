"""Engine configuration (semantic defaults mirrored from the reference).

The reference drives these from env via pydantic-settings
(``tracker_exporter/config.py``); here they are a plain dataclass so the
engine is embeddable and testable. Only settings that change *query
semantics* live here — deployment knobs (spark conf) live in
``session.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    #: Statuses that mean "closed" (reference ``config.py:201,216-226``);
    #: drives the ``is_closed`` flag and the closed_at refinement.
    closed_statuses: tuple[str, ...] = (
        "closed",
        "rejected",
        "resolved",
        "cancelled",
        "released",
    )
    #: Business calendar: workdays Mon(0)..Fri(4) (``config.py:193``),
    #: business hours 09:00-22:00 (``config.py:194-195``).
    workdays: tuple[int, ...] = (0, 1, 2, 3, 4)
    business_hour_start: int = 9
    business_hour_end: int = 22
    #: Display timezone (``config.py:114``); storage is always UTC.
    timezone: str = "Europe/Moscow"
    #: Date fields scrubbed for ClickHouse epoch-0 compat (``config.py:202-214``).
    not_nullable_fields: tuple[str, ...] = (
        "created_at",
        "resolved_at",
        "closed_at",
        "updated_at",
        "released_at",
        "deadline",
        "start_date",
        "end_date",
        "start_time",
        "end_time",
        "moved_at",
    )
    #: Incremental-search defaults: sliding window (``config.py:84``) and
    #: stateful initial backfill (``config.py:187``), human-time strings.
    search_range: str = "2h"
    stateful_initial_range: str = "1w"
    #: ISO holiday dates (YYYY-MM-DD). The reference hardcodes
    #: ``holidays.RU()`` (``helpers.py:60``); here it is data — a broadcast
    #: dimension — so the calendar scales and is testable.
    holiday_dates: tuple[str, ...] = ()
    #: Changelog event types kept by the metric pipeline (``base.py:23-25``).
    workflow_event_type: str = "IssueWorkflow"
    moved_event_type: str = "IssueMoved"
    #: Max changed-value length before truncation sentinel (``helpers.py:270-273``).
    changelog_value_max_len: int = 100
    changelog_value_sentinel: str = "text too long, see history in UI"


DEFAULT_CONFIG = EngineConfig()
