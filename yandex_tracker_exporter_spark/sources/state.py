"""Watermark state stores (S8): local JSON / Hadoop-FS (S3) / Redis.

The reference persists a key→timestamp JSON map to local file / S3 /
Redis (``state/managers.py:77-115,171-220``, backends
``state/backends.py:69-249``, factory ``state/factory.py:21-50``). The
engine keeps the same contract — a tiny key→ISO-timestamp document —
with three backends behind one API (get/set/delete/flush, U2's
pluggable surface):

- :class:`FileStateStore`       — local JSON, atomic tmp+rename write.
- :class:`HadoopFileStateStore` — the object-store backend. One
  implementation serves ``file://``, ``hdfs://`` AND ``s3a://`` by
  going through the Hadoop FileSystem API of the running Spark session
  (the reference needs a separate boto3 backend for S3; here S3
  credentials/endpoint ride the standard ``spark.hadoop.fs.s3a.*``
  conf — the natural Spark deployment story for the reference's
  stateless-container mode).
- :class:`RedisStateStore`      — key-value backend, namespaced keys,
  immediately durable writes (the reference's Redis ``flush`` raises
  NotImplementedError; ours is a documented no-op because every ``set``
  is already committed).

Commit-after-write ordering (ST7) is the caller's contract: write data,
then ``set`` + ``flush`` (``etl.py:229-259``).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile


def _state_serializer(path: str):
    """(dumps, loads) pair chosen by file extension — the reference's
    serializer layer (``state/serializers.py``: JSON implemented, YAML
    declared in the abstract surface). ``.yaml``/``.yml`` paths use
    PyYAML safe load/dump when available; everything else is JSON."""
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore[import-untyped]
        except ImportError as exc:  # pragma: no cover - env without pyyaml
            raise ImportError(
                "YAML state files need the 'pyyaml' package; use a .json "
                "path or install pyyaml"
            ) from exc
        return (
            lambda data: yaml.safe_dump(data, default_flow_style=False),
            yaml.safe_load,
        )
    return json.dumps, json.loads


class FileStateStore:
    """File state store with the reference's get/set/delete/flush API.
    JSON by default; a ``.yaml``/``.yml`` path switches the serializer
    (same key→ISO-timestamp document either way)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._cache: dict[str, str] | None = None
        self._dumps, self._loads = _state_serializer(path)

    def _read(self) -> dict[str, str]:
        if self._cache is None:
            if os.path.exists(self.path):
                with open(self.path, encoding="utf-8") as fh:
                    self._cache = self._loads(fh.read()) or {}
            else:
                self._cache = {}
        return self._cache

    def _write(self, data: dict[str, str]) -> None:
        directory = os.path.dirname(self.path) or "."
        os.makedirs(directory, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                fh.write(self._dumps(data))
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


class HadoopFileStateStore(FileStateStore):
    """State JSON on any Hadoop-resolvable filesystem (``s3a://``,
    ``hdfs://``, ``file://`` …) — the reference's S3 backend
    (``state/backends.py:144-249``) re-expressed through the Spark
    session's Hadoop FS so no extra SDK or credentials plumbing is
    needed. Writes go to a temp sibling and rename into place (atomic
    on HDFS; object stores emulate rename — still never a torn file,
    because the JSON is written in one ``create`` call)."""

    def __init__(self, spark, path: str) -> None:
        super().__init__(path)
        self._spark = spark

    def _fs(self):
        jvm = self._spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path
        fs = hpath(self.path).getFileSystem(self._spark._jsc.hadoopConfiguration())
        return fs, hpath, jvm

    def _read(self) -> dict[str, str]:
        if self._cache is None:
            fs, hpath, jvm = self._fs()
            # crash recovery: a missing live file with a .bak present means
            # a previous _write died between rename-aside and
            # rename-into-place; restore the backup so the watermark is
            # never silently reset to epoch (which would reprocess the
            # whole history).
            p, bak = hpath(self.path), hpath(self.path + ".bak")
            if not fs.exists(p) and fs.exists(bak):
                if not fs.rename(bak, p):
                    raise IOError(
                        f"state store: could not restore {self.path} from backup"
                    )
            if fs.exists(p):
                stream = fs.open(p)
                sink = jvm.java.io.ByteArrayOutputStream()
                jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, 4096, True)
                self._cache = self._loads(sink.toString("UTF-8")) or {}
            else:
                self._cache = {}
        return self._cache

    def _write(self, data: dict[str, str]) -> None:
        # tmp + rename-aside + rename-into-place: at every instant either
        # the live file or the .bak copy exists (the round-2
        # delete-then-rename had a window with NO state file at all —
        # weaker than the local store's os.replace and the reference's
        # atomic S3 put). Hadoop FileSystem.rename has no overwrite
        # flag portable across backends, hence the explicit aside step.
        fs, hpath, _ = self._fs()
        tmp, bak = self.path + ".tmp", self.path + ".bak"
        out = fs.create(hpath(tmp), True)
        out.write(bytearray(self._dumps(data).encode("utf-8")))
        out.close()
        live = hpath(self.path)
        if fs.exists(hpath(bak)):
            fs.delete(hpath(bak), False)
        if fs.exists(live) and not fs.rename(live, hpath(bak)):
            raise IOError(f"state store: rename {self.path} -> {bak} failed")
        if not fs.rename(hpath(tmp), live):
            if fs.exists(hpath(bak)):
                fs.rename(hpath(bak), live)  # restore the previous state
            raise IOError(f"state store: rename {tmp} -> {self.path} failed")
        if fs.exists(hpath(bak)):
            fs.delete(hpath(bak), False)


class RedisStateStore:
    """Redis watermark store (reference ``state/managers.py:171-220``).

    Keys are namespaced ``{namespace}:{key}``; values are ISO-8601
    strings, the same wire format as the JSON stores, so backends are
    interchangeable. Every ``set``/``delete`` is immediately durable —
    ``flush`` is therefore a no-op (the reference raises
    NotImplementedError there). ``client`` is injectable for tests; by
    default it is built lazily from the optional ``redis`` package.
    """

    def __init__(
        self,
        url: str | None = None,
        client=None,
        namespace: str = "tracker_exporter_default",
    ) -> None:
        if client is None:
            try:
                import redis  # type: ignore[import-not-found]
            except ImportError as exc:  # pragma: no cover - env without redis
                raise ImportError(
                    "RedisStateStore needs the 'redis' package (or an "
                    "injected client)"
                ) from exc
            client = redis.Redis.from_url(url, decode_responses=True)
        self._client = client
        self.namespace = namespace

    def _rkey(self, key: str) -> str:
        return f"{self.namespace}:{key}"

    def get(self, key: str) -> dt.datetime | None:
        value = self._client.get(self._rkey(key))
        if value is None:
            return None
        if isinstance(value, bytes):
            value = value.decode("utf-8")
        return dt.datetime.fromisoformat(value)

    def set(self, key: str, value: dt.datetime) -> None:
        self._client.set(self._rkey(key), value.isoformat())

    def delete(self, key: str) -> None:
        self._client.delete(self._rkey(key))

    def flush(self) -> None:
        """No-op: Redis writes are committed per call."""


def state_store_factory(
    strategy: str,
    path: str | None = None,
    spark=None,
    url: str | None = None,
    client=None,
    namespace: str = "tracker_exporter_default",
):
    """Build a state store (reference ``state/factory.py:21-50``).

    - ``"local"``          → :class:`FileStateStore` (needs ``path``)
    - ``"hadoop"``/``"s3"`` → :class:`HadoopFileStateStore` (needs
      ``spark`` + ``path``; ``s3a://…`` paths hit object storage)
    - ``"redis"``          → :class:`RedisStateStore` (``url`` or
      injected ``client``)
    """
    if strategy == "local":
        if path is None:
            raise ValueError("local state store needs a path")
        return FileStateStore(path)
    if strategy in ("hadoop", "s3"):
        if spark is None or path is None:
            raise ValueError("hadoop/s3 state store needs spark and path")
        return HadoopFileStateStore(spark, path)
    if strategy == "redis":
        return RedisStateStore(url=url, client=client, namespace=namespace)
    raise ValueError(
        f"unknown state store strategy {strategy!r}; allowed: local, hadoop, s3, redis"
    )
