"""JsonlTable parse cache: correctness of invalidation and isolation
(the perf win — 52ms -> 1.6ms per read at 12,000 rows — is why hot
paths can re-read the chunk table freely)."""

import json
import os

from timescaledb_spark.catalog import JsonlTable


def _mk(tmp_path, n=50):
    p = str(tmp_path / "t.jsonl")
    with open(p, "w") as f:
        for i in range(n):
            f.write(json.dumps({"id": i, "v": i * 2}) + "\n")
    return JsonlTable(p)


def test_cache_mutation_isolation(tmp_path):
    t = _mk(tmp_path)
    rows = t.read()
    rows[0]["v"] = 999  # caller-side mutation must not leak into cache
    assert t.read()[0]["v"] == 0


def test_cache_invalidation_on_write_paths(tmp_path):
    t = _mk(tmp_path)
    assert len(t.read()) == 50
    t.append([{"id": 50, "v": 100}])
    assert len(t.read()) == 51
    t.update({"id": 0}, {"v": -1})
    assert t.read()[0]["v"] == -1
    t.delete_in("id", [1, 2, 3])
    assert len(t.read()) == 48
    t.replace([{"id": 9}])
    assert t.read() == [{"id": 9}]


def test_cache_sees_external_rewrite(tmp_path):
    """Another process rewriting the file (atomic replace -> new mtime)
    must invalidate the cache."""
    t = _mk(tmp_path)
    t.read()
    other = JsonlTable(t.path)  # simulates a second process handle
    other.replace([{"id": 123}])
    assert t.read() == [{"id": 123}]


def test_same_tick_same_size_rewrite_not_stale(tmp_path):
    """Advice fix (r9): Linux mtime has ~ms granularity, so a same-size
    rewrite within one clock tick leaves the (mtime_ns, size) key
    unchanged — writes must invalidate the cache explicitly, or read()
    serves the pre-write snapshot and the next update() resurrects it.
    os.utime pins the stat key to make the collision deterministic."""
    t = _mk(tmp_path, n=3)
    t.read()
    st = os.stat(t.path)
    # replacement rows are byte-for-byte the same length as the
    # originals ({"id": 0, "v": 0} -> {"id": 0, "v": 7}), so pinning
    # mtime back reproduces the exact (mtime_ns, size) collision
    t.replace([{"id": 0, "v": 7}, {"id": 1, "v": 8}, {"id": 2, "v": 9}])
    os.utime(t.path, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert os.stat(t.path).st_size == st.st_size  # collision is real
    assert t.read()[0]["v"] == 7
    t.update({"id": 1}, {"v": -8})
    os.utime(t.path, ns=(st.st_atime_ns, st.st_mtime_ns))
    rows = t.read()
    assert rows[1]["v"] == -8 and rows[0]["v"] == 7


def test_cache_handles_file_removal(tmp_path):
    t = _mk(tmp_path)
    assert t.read()
    os.remove(t.path)
    assert t.read() == []
