"""Watermark state store (S8).

The reference persists a key→timestamp JSON map to local file / S3 /
Redis (``state/managers.py:77-115,171-220``, backends
``state/backends.py``). The engine keeps the same contract — a tiny
key→ISO-timestamp JSON document — written atomically (tmp + rename) so a
crashed run never leaves a torn state file (the reference's
commit-after-write ordering, ST7, lives in ``etl.py:229-259``; callers
here do the same: write data, then ``set`` + ``flush``).

Only the local-filesystem backend is implemented; the interface is the
pluggable surface (U2) — an object-store or Redis backend slots in by
overriding ``_read``/``_write``.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile


class FileStateStore:
    """JSON file state store with the reference's get/set/delete/flush API."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._cache: dict[str, str] | None = None

    def _read(self) -> dict[str, str]:
        if self._cache is None:
            if os.path.exists(self.path):
                with open(self.path, encoding="utf-8") as fh:
                    self._cache = json.load(fh)
            else:
                self._cache = {}
        return self._cache

    def _write(self, data: dict[str, str]) -> None:
        directory = os.path.dirname(self.path) or "."
        os.makedirs(directory, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                json.dump(data, fh)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def get(self, key: str) -> dt.datetime | None:
        value = self._read().get(key)
        if value is None:
            return None
        return dt.datetime.fromisoformat(value)

    def set(self, key: str, value: dt.datetime) -> None:
        self._read()[key] = value.isoformat()

    def delete(self, key: str) -> None:
        self._read().pop(key, None)

    def flush(self) -> None:
        if self._cache is not None:
            self._write(self._cache)
