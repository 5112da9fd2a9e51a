"""Visualization-grade downsampling: LTTB (Largest-Triangle-Three-
Buckets, Steinarsson 2013) per series.

The reference ecosystem ships this as the toolkit's ``lttb()``/
``gp_lttb()`` hyperfunction for dashboard rendering; at 100 TB a raw
series can't leave the cluster, so downsampling runs where the data is
and only ``n_out`` points per series return to the driver/dashboard.

LTTB is inherently sequential per series (each kept point depends on
the previously kept one), so the per-series body is an Arrow-batched
``applyInPandas`` over numpy — the correct Spark shape for an
irreducibly sequential per-group algorithm. Parallelism comes from the
``by`` keys: every series downsamples independently. A single series
must fit one worker (the same bound any LTTB implementation has);
bucket-average pre-aggregation (``time_bucket`` + avg) is the escape
hatch for series beyond worker memory.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _lttb_numpy(x, y, n_out: int):
    """Classic LTTB over float64 arrays; returns kept indices."""
    import numpy as np

    n = len(x)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    kept = [0]
    # n_out-2 interior buckets over points 1..n-2
    bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nxt_lo, nxt_hi = bounds[i + 1], min(bounds[i + 2] if i + 2 < len(bounds) else n - 1, n - 1)
        if nxt_hi > nxt_lo:
            avg_x = x[nxt_lo:nxt_hi].mean()
            avg_y = y[nxt_lo:nxt_hi].mean()
        else:
            avg_x, avg_y = x[n - 1], y[n - 1]
        bx, by_ = x[lo:hi], y[lo:hi]
        if len(bx) == 0:
            continue
        # triangle area with fixed vertices (x[a], y[a]) and the next
        # bucket's average point
        area = np.abs(
            (x[a] - avg_x) * (by_ - y[a]) - (x[a] - bx) * (avg_y - y[a])
        )
        a = lo + int(area.argmax())
        kept.append(a)
    kept.append(n - 1)
    return np.array(kept)


def lttb(
    df: DataFrame,
    time_col: str = "ts",
    value_col: str = "value",
    n_out: int = 1000,
    by: Sequence[str] = (),
) -> DataFrame:
    """Downsample each series (grouped by ``by``) to ``n_out`` visually
    representative points. First/last points are always kept; interior
    points maximize the rendered triangle area (LTTB). Output schema:
    ``by`` + ``time_col`` + ``value_col``."""
    import pandas as pd

    by = list(by)
    is_ts = dict(df.dtypes)[time_col].startswith("timestamp")
    src = df.select(*by, time_col, value_col)
    out_schema = src.schema

    def _per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(time_col, kind="mergesort").reset_index(drop=True)
        xs = (
            pdf[time_col].astype("int64").to_numpy()
            if is_ts
            else pdf[time_col].to_numpy()
        ).astype("float64")
        ys = pdf[value_col].to_numpy().astype("float64")
        idx = _lttb_numpy(xs, ys, n_out)
        return pdf.iloc[np.sort(idx)]

    if not by:
        # single global series: one group (documented worker-fit bound)
        return src.withColumn("_g", F.lit(0)).groupBy("_g").applyInPandas(
            lambda pdf: _per_series(pdf.drop(columns=["_g"])), out_schema
        )

    # applyInPandas pays one Arrow exchange PER GROUP — with thousands of
    # small series that overhead dominates (measured ~3x at sf0.1). So:
    # repartition on the keys, sort each partition by (keys, time), and
    # stream ONE mapInPandas pass that walks contiguous groups with a
    # carry across Arrow batch boundaries. The walk itself is pure numpy:
    # the partition sort already orders every group by time, so no
    # per-group pandas sort/groupby/concat is needed — group bounds come
    # from one vectorized key-change scan and each series is a zero-copy
    # array slice (measured 1.5s -> 0.7s per call at sf0.1, 1,500 series;
    # per-group pandas machinery was ~0.9ms/group).
    parts = src.repartition(*[F.col(c) for c in by]).sortWithinPartitions(
        *by, time_col
    )

    def _batch_xy(pdf: pd.DataFrame):
        import numpy as np

        xs = (
            pdf[time_col].to_numpy().astype("int64")
            if is_ts
            else pdf[time_col].to_numpy()
        ).astype("float64")
        ys = pdf[value_col].to_numpy().astype("float64")
        return np.asarray(xs), ys

    def _scan(batches):
        import numpy as np
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            changed = np.zeros(n, dtype=bool)
            changed[0] = True
            for c in by:
                a = pdf[c].to_numpy()
                prev, cur = a[:-1], a[1:]
                # NaN-safe group-change test: plain != treats NaN != NaN
                # as True, splitting a null-key series one-group-per-row
                changed[1:] |= (cur != prev) & ~(
                    pd.isna(cur) & pd.isna(prev)
                )
            starts = np.flatnonzero(changed)
            # the trailing group may continue into the next Arrow batch
            last_start = int(starts[-1])
            carry = pdf.iloc[last_start:]
            if last_start == 0:
                continue
            xs, ys = _batch_xy(pdf)
            bounds = np.append(starts[starts < last_start], last_start)
            kept = [
                int(bounds[g])
                + np.sort(
                    _lttb_numpy(
                        xs[bounds[g] : bounds[g + 1]],
                        ys[bounds[g] : bounds[g + 1]],
                        n_out,
                    )
                )
                for g in range(len(bounds) - 1)
            ]
            yield pdf.iloc[np.concatenate(kept)]
        if carry is not None and len(carry):
            pdf = carry.reset_index(drop=True)
            xs, ys = _batch_xy(pdf)
            yield pdf.iloc[np.sort(_lttb_numpy(xs, ys, n_out))]

    return parts.mapInPandas(_scan, out_schema)
