"""State-store backends (S8): local / Hadoop-FS / Redis + factory.

The reference ships three watermark backends (state/backends.py:69-249,
managers.py:77-220, factory.py:21-50) but tests none of the manager
surface; these tests cover get/set/delete/flush and the commit-after-
write ordering for every backend.
"""

import datetime as dt

import pytest

from yandex_tracker_exporter_spark.sources.state import (
    FileStateStore,
    HadoopFileStateStore,
    RedisStateStore,
    state_store_factory,
)

TS = dt.datetime(2024, 3, 1, 12, 30, 0)


class FakeRedis:
    """Dict-backed stand-in matching the redis-py surface we use."""

    def __init__(self):
        self.data = {}

    def get(self, key):
        return self.data.get(key)

    def set(self, key, value):
        self.data[key] = value

    def delete(self, key):
        self.data.pop(key, None)


def test_hadoop_store_roundtrip_over_file_uri(spark, tmp_path):
    path = f"file://{tmp_path}/state/watermarks.json"
    store = HadoopFileStateStore(spark, path)
    assert store.get("issues") is None  # missing file -> empty state

    store.set("issues", TS)
    store.set("changelog", TS + dt.timedelta(hours=1))
    store.flush()

    # a fresh instance (new process in real life) sees the committed state
    fresh = HadoopFileStateStore(spark, path)
    assert fresh.get("issues") == TS
    assert fresh.get("changelog") == TS + dt.timedelta(hours=1)

    # no torn temp file left behind (Hadoop's local FS adds .crc
    # checksum sidecars — those are fine)
    import os

    state_dir = str(tmp_path / "state")
    visible = [f for f in os.listdir(state_dir) if not f.startswith(".")]
    assert visible == ["watermarks.json"]

    fresh.delete("issues")
    fresh.flush()
    assert HadoopFileStateStore(spark, path).get("issues") is None


def test_hadoop_store_unflushed_set_is_not_committed(spark, tmp_path):
    """Commit-after-write ordering: set() without flush() must not be
    visible to another reader — the caller commits only after the data
    write succeeds (ST7)."""
    path = f"file://{tmp_path}/wm.json"
    store = HadoopFileStateStore(spark, path)
    store.set("issues", TS)  # no flush
    assert HadoopFileStateStore(spark, path).get("issues") is None
    store.flush()
    assert HadoopFileStateStore(spark, path).get("issues") == TS


def test_hadoop_store_write_never_leaves_zero_state_files(spark, tmp_path):
    """At every instant of _write, either the live file or the .bak copy
    exists: the round-2 delete-then-rename protocol had a window with NO
    state file (a crash there silently reset the watermark to epoch).
    Simulate the crash-between-rename-aside-and-rename-into-place state
    on disk and assert a fresh store still reads the old watermark."""
    import json
    import os

    live = tmp_path / "wm.json"
    store = HadoopFileStateStore(spark, f"file://{live}")
    store.set("issues", TS)
    store.flush()

    # crash window: live was renamed aside to .bak, tmp not yet in place
    os.rename(str(live), str(live) + ".bak")
    with open(str(live) + ".tmp", "w", encoding="utf-8") as fh:
        json.dump({"issues": "2030-01-01T00:00:00"}, fh)  # uncommitted
    assert not os.path.exists(live)

    fresh = HadoopFileStateStore(spark, f"file://{live}")
    assert fresh.get("issues") == TS  # restored from .bak, not epoch-reset
    assert os.path.exists(live)  # recovery renamed the backup back

    # and a subsequent write cleans up both artifacts
    fresh.set("issues", TS + dt.timedelta(days=1))
    fresh.flush()
    leftovers = [
        f
        for f in os.listdir(tmp_path)
        if not f.startswith(".") and f != "wm.json"
    ]
    assert leftovers == [], leftovers
    assert HadoopFileStateStore(spark, f"file://{live}").get("issues") == TS + dt.timedelta(days=1)


def test_redis_store_roundtrip_and_namespacing():
    client = FakeRedis()
    store = RedisStateStore(client=client, namespace="ns1")
    other = RedisStateStore(client=client, namespace="ns2")

    store.set("issues", TS)
    store.flush()  # no-op, must not raise (reference raises here)
    assert store.get("issues") == TS
    assert other.get("issues") is None  # namespaced
    assert client.data == {"ns1:issues": TS.isoformat()}

    store.delete("issues")
    assert store.get("issues") is None


def test_redis_store_accepts_bytes_values():
    client = FakeRedis()
    client.set("ns:k", TS.isoformat().encode())
    assert RedisStateStore(client=client, namespace="ns").get("k") == TS


def test_factory_builds_each_backend(spark, tmp_path):
    local = state_store_factory("local", path=str(tmp_path / "s.json"))
    assert isinstance(local, FileStateStore)

    hadoop = state_store_factory(
        "hadoop", spark=spark, path=f"file://{tmp_path}/h.json"
    )
    assert isinstance(hadoop, HadoopFileStateStore)
    s3 = state_store_factory("s3", spark=spark, path=f"file://{tmp_path}/h2.json")
    assert isinstance(s3, HadoopFileStateStore)

    redis_store = state_store_factory("redis", client=FakeRedis())
    assert isinstance(redis_store, RedisStateStore)

    with pytest.raises(ValueError, match="unknown state store strategy"):
        state_store_factory("consul")
    with pytest.raises(ValueError, match="needs a path"):
        state_store_factory("local")
    with pytest.raises(ValueError, match="needs spark and path"):
        state_store_factory("s3", path="s3a://bucket/state.json")


def test_backends_share_wire_format(spark, tmp_path):
    """A watermark written by one backend is readable by another pointed
    at the same document — backends are interchangeable."""
    plain_path = str(tmp_path / "shared.json")
    FileStateStore(plain_path).set("issues", TS)
    local = FileStateStore(plain_path)
    local.set("issues", TS)
    local.flush()

    via_hadoop = HadoopFileStateStore(spark, f"file://{plain_path}")
    assert via_hadoop.get("issues") == TS


def test_yaml_state_file_roundtrip(tmp_path):
    """A .yaml path switches the serializer (reference
    state/serializers.py declares YAML in its abstract surface): same
    get/set/delete/flush contract, YAML on disk, crash-safe tmp+rename."""
    yaml = pytest.importorskip("yaml")
    path = str(tmp_path / "watermarks.yaml")
    store = state_store_factory("local", path=path)
    store.set("issues", TS)
    store.set("comments", TS)
    store.delete("comments")
    store.flush()

    with open(path, encoding="utf-8") as fh:
        on_disk = yaml.safe_load(fh.read())
    assert on_disk == {"issues": TS.isoformat()}
    assert FileStateStore(path).get("issues") == TS


def test_yaml_and_json_stores_interchangeable(tmp_path):
    """The document is the same key→ISO map under either serializer —
    only the encoding differs."""
    pytest.importorskip("yaml")
    jstore = FileStateStore(str(tmp_path / "s.json"))
    ystore = FileStateStore(str(tmp_path / "s.yaml"))
    for store in (jstore, ystore):
        store.set("issues", TS)
        store.flush()
    assert jstore.get("issues") == ystore.get("issues") == TS
