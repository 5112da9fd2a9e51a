#!/usr/bin/env python
"""Interactive profiling shell for the optimization round.

Starts a bench-identical Spark session plus a DuckDB connection with the
testdata views, and drops into a REPL with helpers:

    t(fn)              -- wall-time a DataFrame-returning callable's collect()
    tq("q_name")       -- wall-time a registered gate at SF_DIR (bench methodology)
    noop(df)           -- time df via the noop sink (guide §1.4)
    ver("q_name")      -- verify a gate against its DuckDB oracle at ORACLE_SF
    plan(df, path)     -- write df.explain('formatted') to a file
    planq("q_name", p) -- same for a registered gate

Usage: python -i scripts/prof_shell.py
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_ORACLE_SF (sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ORACLE_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", ORACLE_SF)

from pyspark.sql import functions as F  # noqa: E402,F401

from timescaledb_spark.queries import oracle_sql, queries  # noqa: E402
from timescaledb_spark.session import build_spark  # noqa: E402
from timescaledb_spark.sources import load_table  # noqa: E402,F401

spark = build_spark(
    app_name="ts_prof",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
)


def jobs(desc_filter=None, since=0):
    """Per-job wall times from the UI REST API: (jobId, sec, stages, desc)."""
    import urllib.request
    from datetime import datetime as _dt

    app = json.loads(
        urllib.request.urlopen(
            "http://localhost:4050/api/v1/applications"
        ).read()
    )[0]["id"]
    js = json.loads(
        urllib.request.urlopen(
            f"http://localhost:4050/api/v1/applications/{app}/jobs"
        ).read()
    )
    out = []
    for j in js:
        if j["jobId"] < since:
            continue
        fmt = "%Y-%m-%dT%H:%M:%S.%f"
        try:
            dur = (
                _dt.strptime(j["completionTime"][:-3], fmt)
                - _dt.strptime(j["submissionTime"][:-3], fmt)
            ).total_seconds()
        except Exception:
            dur = None
        d = j.get("description", "") or j.get("name", "")
        if desc_filter and desc_filter not in d:
            continue
        out.append((j["jobId"], dur, len(j["stageIds"]), d[:110]))
    out.sort()
    for r in out:
        print(r)
    return out


def lastjob():
    import urllib.request

    app = json.loads(
        urllib.request.urlopen(
            "http://localhost:4050/api/v1/applications"
        ).read()
    )[0]["id"]
    js = json.loads(
        urllib.request.urlopen(
            f"http://localhost:4050/api/v1/applications/{app}/jobs"
        ).read()
    )
    return max(j["jobId"] for j in js) if js else -1


import json  # noqa: E402
QS = queries()
OS = oracle_sql()

_duck = None


def duck():
    global _duck
    if _duck is None:
        import duckdb

        _duck = duckdb.connect()
        _duck.execute("SET TimeZone='UTC'")
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            p = f"{ORACLE_SF}/{t}.parquet"
            if os.path.exists(p):
                _duck.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
    return _duck


def t(fn, n=1, label=None):
    """Time fn() -> DataFrame, collect() it (bench methodology)."""
    outs = []
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn()
        df.collect()
        outs.append(round(time.perf_counter() - t0, 3))
    print(f"{label or getattr(fn, '__name__', 'fn')}: {outs}")
    return outs


def tq(name, n=1, sf_dir=None):
    return t(lambda: QS[name](spark, sf_dir or SF_DIR), n=n, label=name)


def noop(df, label="noop"):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 3)
    print(f"{label}: {dt}s")
    return dt


def ver(name, sf_dir=None):
    from oracle import canon_rows, duck_rows, spark_rows

    df = QS[name](spark, sf_dir or ORACLE_SF)
    scols, srows = spark_rows(df)
    sql = OS.get(name)
    sql = sql() if callable(sql) else sql
    dcols, drows = duck_rows(duck(), sql)
    ok_schema = sorted(scols) == sorted(dcols)
    ok_rows = len(srows) == len(drows)
    ok_hash = canon_rows(scols, srows) == canon_rows(dcols, drows)
    print(
        f"{name}: schema={ok_schema} rows={ok_rows} "
        f"({len(srows)}/{len(drows)}) hash={ok_hash}"
    )
    return ok_schema and ok_rows and ok_hash


def plan(df, path):
    import contextlib
    import io

    os.makedirs(os.path.dirname(path), exist_ok=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}")


def planq(name, path, sf_dir=None):
    plan(QS[name](spark, sf_dir or SF_DIR), path)


def oldmod(relpath, ref="HEAD"):
    """Load the git-``ref`` version of a repo module as a separate module
    object (for same-process A/B against the working-tree code)."""
    import subprocess
    import types

    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:{relpath}"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    mod = types.ModuleType("oldmod_" + relpath.replace("/", "_"))
    pkg = relpath.rsplit("/", 1)[0].replace("/", ".")
    mod.__package__ = pkg
    mod.__file__ = os.path.join(REPO, relpath) + " @" + ref
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


print(f"prof shell ready: SF_DIR={SF_DIR} oracle={ORACLE_SF}")
