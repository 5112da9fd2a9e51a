"""Full-text relevance scoring: distributed BM25 top-k retrieval.

The classic Okapi BM25 (Robertson & Zaragoza 2009) over the shared
pipeline tokenizer (``core.tokens``). Two-phase plan, mirroring the IVF
pattern in ``similarity.py``:

1. one corpus pass aggregates the global stats the formula needs —
   ``N`` (doc count), ``sum(dl)`` (total token count, an exact integer so
   ``avgdl = sum_dl / N`` is the *same double* in every engine), and the
   per-query-term document frequencies (a filtered explode whose shuffle
   carries only rows matching the ≤ tens of query terms);
2. the scores are then a pure per-row projection — the driver inlines
   ``idf_t`` inputs as literals, ``tf_t`` is an array filter over the
   token array — followed by a global top-k (Spark plans
   ``TakeOrderedAndProject``: per-partition heaps, no full sort).

The only driver-side state is O(|query terms|) — the same bounded
collect the reference's planner does for constants. Scores are rounded
to 6 decimals *inside both engines* and ranked by the rounded value, so
the cross-engine float fold (ln/div ulp differences) cannot reorder the
top-k.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from .core import TOKEN_RE, spread, tokens, tokens_sql

K1 = 1.2
B = 0.75


def _normalize_terms(terms: list[str]) -> list[str]:
    """Query terms must live in the same space as the tokenizer output
    (lowercase [a-z0-9] runs) — a raw \"Model\" or \"U.S.\" would
    otherwise silently score 0 everywhere. Multi-token inputs expand to
    their tokens; duplicates keep first position."""
    out: list[str] = []
    for t in terms:
        toks = re.findall(TOKEN_RE, t.lower())
        if not toks:
            raise ValueError(f"query term {t!r} has no indexable tokens")
        for tok in toks:
            if tok not in out:
                out.append(tok)
    return out


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag-of-words query.

    Returns ``(id, dl, score)`` ordered by ``(score DESC, id)``.
    """
    terms = _normalize_terms(list(terms))
    base = spread(df.select(id_col, text_col)).select(
        F.col(id_col), tokens(text_col).alias("w")
    )
    base = base.withColumn("dl", F.size("w"))
    # ONE stats pass: corpus size, total length, and every term's doc
    # frequency ride a single partial/final aggregation — no explode, no
    # extra shuffle beyond the one-row agg exchange
    st = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        *(
            F.sum(F.array_contains("w", t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ),
    ).collect()[0]
    n_docs, sum_dl = int(st["n"]), int(st["sdl"] or 0)
    dfreq = {t: int(st[f"df_{i}"] or 0) for i, t in enumerate(terms)}
    # avgdl from two exact integers: bit-identical across engines
    avgdl = F.lit(float(sum_dl)) / F.lit(float(n_docs))
    score = F.lit(0.0)
    for t in terms:
        dfi = dfreq.get(t, 0)
        # idf computed IN-ENGINE from integer literals so the ln() input
        # is the same double the oracle feeds its ln()
        idf = F.log(
            (F.lit(float(n_docs - dfi)) + F.lit(0.5))
            / (F.lit(float(dfi)) + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.size(F.filter(F.col("w"), lambda x: x == F.lit(t)))
        score = score + idf * (tf * (F.lit(K1) + F.lit(1.0))) / (
            tf + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / avgdl)
        )
    return (
        base.select(
            F.col(id_col), F.col("dl"), F.round(score, 6).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_topk_sql(
    terms: list[str],
    k: int = 20,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle replaying :func:`bm25_topk` literal-for-literal:
    same tokenizer, same ``(N - df + 0.5) / (df + 0.5) + 1`` idf input,
    same operand order in the tf saturation term, same 6-decimal round
    before ranking."""
    terms = _normalize_terms(list(terms))
    parts = []
    for t in terms:
        esc = t.replace("'", "''")
        dfi = f"(SELECT count(*) FROM d WHERE list_contains(w, '{esc}'))"
        tf = f"len(list_filter(w, x -> x = '{esc}'))"
        idf = f"ln(((st.n - {dfi}) + 0.5) / ({dfi} + 0.5) + 1.0)"
        parts.append(
            f"{idf} * ({tf} * ({K1!r} + 1.0)) / "
            f"({tf} + {K1!r} * (1.0 - {B!r} + {B!r} * dl / "
            f"(CAST(st.sdl AS DOUBLE) / st.n)))"
        )
    score = " + ".join(["0.0"] + parts)
    return f"""
    WITH d AS (
      SELECT {id_col}, {tokens_sql(text_col)} AS w FROM {table}
    ), dd AS (
      SELECT {id_col}, w, len(w) AS dl FROM d
    ), st AS (
      SELECT count(*) AS n, coalesce(sum(dl), 0) AS sdl FROM dd
    )
    SELECT {id_col}, dl::INT AS dl, round({score}, 6) AS score
    FROM dd, st
    ORDER BY score DESC, {id_col}
    LIMIT {k}
    """
