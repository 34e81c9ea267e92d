"""Polymorphic changelog value normalization (reference P9).

``extract_changelog_field`` (``helpers.py:261-298``) duck-types over
Python values: list → comma-join (recursive), str → try-parse-datetime
else truncate >100 chars, dict → json.dumps, None → "", numbers → str,
API Reference object → first of key/email/name/id.

In the typed engine the polymorphic value arrives as a **JSON-encoded
string** (see FIXTURES.md §2) and the dispatch becomes a first-character
``when`` chain over built-in JSON/string expressions — no Python, no
UDF. An object with any of key/email/name/id is treated as an API
reference (extracted); other objects keep their JSON text (≡ the
reference's ``json.dumps`` branch, as the value already *is* its dump).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.functions.datetimes import parse_tracker_datetime

TEXT_TOO_LONG_SENTINEL = "text too long, see history in UI"
MAX_TEXT_LEN = 100


def _normalize_scalar_string(c: Column) -> Column:
    """The str branch: try datetime reformat, else length-guard."""
    parsed = parse_tracker_datetime(c)
    reformatted = F.date_format(parsed, "yyyy-MM-dd'T'HH:mm:ss.SSS")
    return (
        F.when(parsed.isNotNull(), reformatted)
        .when(F.length(c) > MAX_TEXT_LEN, F.lit(TEXT_TOO_LONG_SENTINEL))
        .otherwise(c)
    )


def _extract_object(c: Column) -> Column:
    """Reference-object extraction: key > lower(email) > name > id; other
    objects pass through as JSON text."""
    key = F.get_json_object(c, "$.key")
    email = F.lower(F.get_json_object(c, "$.email"))
    name = F.get_json_object(c, "$.name")
    id_ = F.get_json_object(c, "$.id")
    extracted = F.coalesce(key, email, name, id_)
    return F.when(extracted.isNotNull(), extracted).otherwise(c)


def extract_changelog_value(col: Column | str, _depth: int = 2) -> Column:
    """Flatten a JSON-encoded polymorphic changelog value to a string.

    ``_depth`` bounds list recursion (the reference recurses unboundedly;
    real payloads nest ≤2 — deeper elements fall back to raw JSON text).
    """
    c = F.col(col) if isinstance(col, str) else col
    first = F.substring(F.ltrim(c), 1, 1)

    scalar_string = _normalize_scalar_string(F.get_json_object(c, "$"))

    if _depth > 0:
        # list branch: explode-free recursive transform + comma-join.
        # from_json to array<string> keeps each element's raw JSON text.
        elements = F.from_json(c, "array<string>")
        joined = F.array_join(
            F.transform(elements, lambda x: extract_changelog_value(x, _depth - 1)),
            ", ",
        )
    else:
        joined = c

    return (
        F.when(c.isNull() | (c == "null"), F.lit(""))
        .when(first == "[", joined)
        .when(first == "{", _extract_object(c))
        .when(first == '"', scalar_string)
        # bare literal (number or unquoted string): same scalar treatment —
        # numbers survive it unchanged (datetime parse fails, length ≤ 100)
        .otherwise(_normalize_scalar_string(c))
    )
