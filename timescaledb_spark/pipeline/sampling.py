"""Deterministic sampling operators for training-data curation.

Published pipelines sample with *deterministic hash* decisions, not
``rand()``: the same document must make the same cut on every rerun,
across engines, and under stage retries (a nondeterministic sample
re-evaluated by a retried Spark task can duplicate or drop rows). The
hash here is the portable 60-bit md5 from :mod:`.core` — DuckDB computes
the identical value, so every operator has an exact SQL oracle.

Scale shape: ``hash_sample`` is a pure filter (no shuffle, predicate
evaluated at scan speed); ``stratified_cap`` is one window over the
group key (single shuffle on ``by``) — the standard "cap documents per
domain/language" curation op; ``split_assign`` is a projection.

Reference analog: none (TimescaleDB has no sampling surface) — these
extend the engine for LLM-data work, like the rest of ``pipeline/``.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F

from .core import h60, h60_sql

#: denominator for hash-fraction decisions: the 60-bit hash is reduced
#: mod 1e6, giving ~1e-6 fraction granularity
_DEN = 1_000_000


def _key_col(id_col: Union[str, Column], salt: str) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return h60(F.concat(c.cast("string"), F.lit(salt)))


def _key_sql(id_expr: str, salt: str) -> str:
    return h60_sql(f"(CAST({id_expr} AS VARCHAR) || '{salt}')")


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id-hash — the same
    ids survive on every run and engine. ``salt`` decorrelates multiple
    samples over the same ids (e.g. an eval holdout vs a quality probe).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thresh = int(fraction * _DEN)
    return df.filter(F.pmod(_key_col(id_col, salt), F.lit(_DEN)) < thresh)


def hash_sample_sql(
    table: str = "documents",
    fraction: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "",
) -> str:
    thresh = int(fraction * _DEN)
    return (
        f"SELECT * FROM {table} "
        f"WHERE ({_key_sql(id_col, salt)} % {_DEN}) < {thresh}"
    )


def stratified_cap(
    df: DataFrame,
    by: Sequence[str],
    cap: int,
    id_col: str = "doc_id",
    salt: str = "",
    skew_partitions: int = 0,
) -> DataFrame:
    """At most ``cap`` rows per ``by`` group, chosen deterministically by
    id-hash order (the "cap per domain / per language" rebalancing op).
    One window shuffle on the group key; ties broken by the id itself so
    the selection is total-ordered and engine-portable.

    ``skew_partitions`` > 0 enables the exact two-stage top-k for
    LOW-CARDINALITY hot keys (e.g. capping per registrable domain, where
    a handful of domains hold most of the corpus and a single window
    would sort each domain on one task): stage 1 ranks within
    (group, id-hash mod S) subpartitions and keeps each subpartition's
    top ``cap``; stage 2 ranks the surviving ≤ S·cap rows per group.
    The selection criterion is a total order, so every global top-cap
    row survives its subpartition's cut — the result is IDENTICAL to
    the single-window form (same oracle), but the big shuffle spreads
    over S× more keys and the final sort touches S·cap rows per group
    instead of the whole group."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    # stage the md5 rank key as a real column: the window stages
    # reference it as partition subkey AND sort key, and each window
    # re-evaluates inline expressions — one md5 per row, not 3-4
    out = df.withColumn("_sc_key", _key_col(id_col, salt))
    key = F.col("_sc_key")
    if skew_partitions and int(skew_partitions) > 1:
        sub = F.pmod(key, F.lit(int(skew_partitions)))
        w1 = Window.partitionBy(*by, sub).orderBy(key, F.col(id_col))
        out = (
            out.withColumn("_sc_rn", F.row_number().over(w1))
            .filter(F.col("_sc_rn") <= cap)
            .drop("_sc_rn")
        )
    w = Window.partitionBy(*by).orderBy(key, F.col(id_col))
    return (
        out.withColumn("_sc_rn", F.row_number().over(w))
        .filter(F.col("_sc_rn") <= cap)
        .drop("_sc_rn", "_sc_key")
    )


def stratified_cap_sql(
    table: str = "documents",
    by: Sequence[str] = ("lang",),
    cap: int = 10,
    id_col: str = "doc_id",
    salt: str = "",
) -> str:
    bys = ", ".join(by)
    return f"""
    SELECT * EXCLUDE (_sc_rn) FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {bys}
            ORDER BY {_key_sql(id_col, salt)}, {id_col}
        ) AS _sc_rn
        FROM {table}
    ) WHERE _sc_rn <= {cap}
    """


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test ...) by id-hash,
    proportional to ``weights`` — stable across runs, disjoint and
    exhaustive. Pure projection, no shuffle."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = F.pmod(_key_col(id_col, salt), F.lit(_DEN))
    acc = 0.0
    expr = None
    items = sorted(weights.items())  # deterministic boundary order
    for name, wgt in items[:-1]:
        acc += wgt / total
        cut = int(acc * _DEN)
        expr = (
            F.when(bucket < cut, F.lit(name))
            if expr is None
            else expr.when(bucket < cut, F.lit(name))
        )
    last = items[-1][0]
    out = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, out)


def source_mix(
    df: DataFrame,
    source_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Epoch-weighted source mixing — the training-recipe operator
    (GPT-3 / Llama style: each source is seen ``rate`` epochs per pass,
    e.g. Wikipedia 3.4, CommonCrawl 0.44; Brown et al. 2020 Table 2.2).

    ``rates[source] = r`` emits ``floor(r)`` full copies of every row of
    that source plus a deterministic id-hash sample of the fractional
    remainder; sources absent from ``rates`` (or rated 0) are dropped.
    Output adds ``epoch_col`` (0-based copy index) so downstream
    shuffling can interleave copies. Deterministic: the same ids make
    the same cut every run and engine (stage-retry-safe — ``rand()``
    would duplicate/drop under retries); the fractional decision is
    salted with the epoch index so copy k's sample is decorrelated from
    copy k−1's.

    Scale shape: a projection + bounded ``explode`` (≤ ``ceil(max
    rate)`` rows out per row in) + a scan-speed filter — no shuffle, no
    driver state.
    """
    import math as _math

    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for source {s!r} must be >= 0")
    kept = {s: float(r) for s, r in rates.items() if r > 0}
    if not kept:
        return df.limit(0).withColumn(epoch_col, F.lit(0))
    src = F.col(source_col)

    def _case(vals: dict[str, int]) -> Column:
        expr = None
        for s, v in sorted(vals.items()):
            cond = src == F.lit(s)
            expr = (
                F.when(cond, F.lit(v))
                if expr is None
                else expr.when(cond, F.lit(v))
            )
        return expr.otherwise(F.lit(0))

    n_copies = _case({s: int(_math.ceil(r)) for s, r in kept.items()})
    frac_cut = _case(
        {s: int((r - _math.floor(r)) * _DEN) for s, r in kept.items()}
    )
    full = _case({s: int(_math.floor(r)) for s, r in kept.items()})
    out = (
        df.withColumn("_mx_n", n_copies)
        .filter(F.col("_mx_n") > 0)
        .select(
            "*",
            F.explode(
                F.sequence(F.lit(0), F.col("_mx_n") - 1)
            ).alias(epoch_col),
        )
        .drop("_mx_n")
    )
    bucket = F.pmod(
        h60(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(f":{salt}:"),
                F.col(epoch_col).cast("string"),
            )
        ),
        F.lit(_DEN),
    )
    return out.filter((F.col(epoch_col) < full) | (bucket < frac_cut))


def source_mix_sql(
    table: str = "documents",
    source_expr: str = "src",
    rates: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "mix",
    epoch_col: str = "epoch",
    projection: str = "*",
) -> str:
    """DuckDB oracle replaying :func:`source_mix` decision-for-decision
    (same ceil/floor/fraction splits, same salted 60-bit hash)."""
    import math as _math

    rates = rates or {}
    kept = {s: float(r) for s, r in rates.items() if r > 0}
    if not kept:
        # mirror source_mix(): every source rated 0 (or no rates) yields
        # an empty frame — a zero-WHEN CASE would be a parse error
        return (
            f"SELECT {projection} FROM "
            f"(SELECT *, 0 AS {epoch_col} FROM {table}) WHERE false"
        )

    def _case(vals: dict[str, int]) -> str:
        whens = " ".join(
            f"WHEN '{s}' THEN {v}" for s, v in sorted(vals.items())
        )
        return f"(CASE {source_expr} {whens} ELSE 0 END)"

    n_copies = _case({s: int(_math.ceil(r)) for s, r in kept.items()})
    frac_cut = _case(
        {s: int((r - _math.floor(r)) * _DEN) for s, r in kept.items()}
    )
    full = _case({s: int(_math.floor(r)) for s, r in kept.items()})
    bucket = (
        h60_sql(
            f"(CAST({id_col} AS VARCHAR) || ':{salt}:' || "
            f"CAST({epoch_col} AS VARCHAR))"
        )
        + f" % {_DEN}"
    )
    return f"""
    SELECT {projection}
    FROM (
      SELECT *, unnest(range(0, {n_copies})) AS {epoch_col}
      FROM {table}
      WHERE {n_copies} > 0
    )
    WHERE {epoch_col} < {full} OR ({bucket}) < {frac_cut}
    """


def split_assign_sql(
    table: str = "documents",
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
    projection: str = "*",
) -> str:
    """``projection`` selects the passthrough columns (oracle callers
    project explicitly rather than string-editing the generated SQL)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = f"({_key_sql(id_col, salt)} % {_DEN})"
    items = sorted(weights.items())
    acc, whens = 0.0, []
    for name, wgt in items[:-1]:
        acc += wgt / total
        whens.append(f"WHEN {bucket} < {int(acc * _DEN)} THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{items[-1][0]}' END"
    return f"SELECT {projection}, {case} AS {out_col} FROM {table}"


def temperature_rates(
    counts: dict[str, int],
    alpha: float,
    epochs_total: float = 1.0,
) -> dict[str, float]:
    """Temperature-smoothed mixing rates from per-source row counts —
    the multilingual/pretraining exponent-sampling recipe (mBERT's
    exponent-smoothed sampling; Conneau & Lample 2019 XLM §3.1: sample
    sources ∝ p^alpha, alpha<1 upweighting low-resource sources).

    Returns EPOCHS per source in :func:`source_mix` semantics:
    ``r_s = epochs_total * N * w_s / n_s`` with
    ``w_s = p_s^alpha / sum p^alpha`` — the expected emitted row count
    is ``epochs_total * N`` while each source's share of the output is
    ``w_s``. Pure integer-counts -> float math, so a gate and its
    oracle derive bit-identical rates from the same counts.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if epochs_total < 0:
        raise ValueError("epochs_total must be >= 0")
    kept = {s: int(n) for s, n in counts.items() if n > 0}
    if not kept:
        return {}
    total = sum(kept.values())
    w = {s: (n / total) ** alpha for s, n in kept.items()}
    z = sum(w.values())
    return {
        s: epochs_total * total * (w[s] / z) / kept[s] for s in kept
    }


def temperature_mix(
    df: DataFrame,
    source_col: str,
    alpha: float,
    epochs_total: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "tmix",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Temperature-based source mixing: derive per-source rates from
    the data (:func:`temperature_rates`) and emit the epoch-weighted
    mix (:func:`source_mix`).

    Scale shape: ONE bounded aggregation (rows per distinct source —
    driver state is the source list, like the BM25/IVF stats passes)
    followed by source_mix's zero-shuffle projection + bounded explode
    + scan-speed filter. Deterministic end to end: counts are exact,
    the rate math is pure, and the emit decision is the salted 60-bit
    id hash."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    }
    rates = temperature_rates(counts, alpha, epochs_total)
    return source_mix(
        df, source_col, rates, id_col=id_col, salt=salt,
        epoch_col=epoch_col,
    )
