"""Training-sequence assembly operators: sequence packing and
overlapping context-window chunking.

The two ops every LLM training-data pipeline runs right before
tokenizer/writer stages:

- ``pack_sequences``: assign documents to fixed-token-budget training
  sequences by SEQUENTIAL FILL (concat-and-chunk) — the packing
  strategy real pipelines use because it is deterministic, streaming
  and order-preserving (first-fit bin packing is neither stable nor
  parallelizable). A document belongs to the sequence its starting
  token offset falls in.
- ``window_text``: split each document into overlapping fixed-width
  windows (context windows with stride), one output row per window.

Both are pure column-expression / window-function compositions — no
Python, no UDFs; at 100 TB packing MUST be sharded (``shard_by``): a
global cumulative sum is a single-partition window, so callers pack
per shard (per language / per date / per hash bucket), which is also
what keeps shard contents co-trainable. The unsharded form exists for
small corpora and tests.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .textproc import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 2048,
    shard_by: Sequence[str] = (),
) -> DataFrame:
    """Sequential-fill packing: order documents by ``id_col`` within
    each shard, accumulate token counts, and assign each document the
    sequence index its STARTING offset falls in
    (``seq_id = floor(start_offset / budget)``). Documents longer than
    the budget keep their own sequence(s) — exactly concat-and-chunk
    semantics. Output: shard cols, doc id, ``n_tok``, ``seq_id``,
    ``offset_in_seq``."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    w = (
        Window.partitionBy(*[F.col(c) for c in shard_by])
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(text_col)
    out = df.select(
        *shard_by,
        F.col(id_col),
        n_tok.alias("n_tok"),
    ).withColumn("_cum", F.sum("n_tok").over(w))
    start = F.col("_cum") - F.col("n_tok")
    return out.select(
        *shard_by,
        id_col,
        "n_tok",
        F.floor(start / F.lit(budget_tokens)).cast("long").alias("seq_id"),
        F.pmod(start, F.lit(budget_tokens)).cast("long").alias("offset_in_seq"),
    )


def pack_sequences_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 2048,
    shard_by: Sequence[str] = (),
) -> str:
    """DuckDB oracle for :func:`pack_sequences` (same tokenizer, same
    window algebra)."""
    from .textproc import token_count_sql

    part = f"PARTITION BY {', '.join(shard_by)} " if shard_by else ""
    shard_cols = "".join(f"{c}, " for c in shard_by)
    return f"""
    WITH t AS (
      SELECT {shard_cols}{id_col},
             CAST({token_count_sql(text_col)} AS BIGINT) AS n_tok
      FROM {table}
    ), c AS (
      SELECT *, sum(n_tok) OVER ({part}ORDER BY {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT {shard_cols}{id_col}, n_tok,
           CAST(floor((cum - n_tok) / {budget_tokens}.0) AS BIGINT) AS seq_id,
           CAST((cum - n_tok) % {budget_tokens} AS BIGINT) AS offset_in_seq
    FROM c
    """


def window_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Overlapping context windows: one row per (document, window),
    window ``i`` covering characters ``[i*stride, i*stride + width)``.
    The explode happens JVM-side (``sequence`` + ``substring``), output
    volume ≈ input chars × width/stride — no skew amplification beyond
    that ratio. Windows are emitted while any text remains, so tails
    shorter than ``width - stride`` still appear exactly once."""
    if not (0 < stride <= width):
        raise ValueError("need 0 < stride <= width")
    n = F.length(F.col(text_col))
    n_win = F.greatest(
        F.ceil((n - F.lit(width)) / F.lit(stride)) + F.lit(1), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(
            F.sequence(F.lit(0), (n_win - 1).cast("int"))
        ).alias("win_idx"),
    ).select(
        id_col,
        "win_idx",
        F.expr(
            f"substring({text_col}, win_idx * {stride} + 1, {width})"
        ).alias("win_text"),
    )


def window_text_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 512,
    stride: int = 384,
) -> str:
    return f"""
    SELECT {id_col},
           CAST(i AS BIGINT) AS win_idx,
           substring({text_col}, CAST(i * {stride} + 1 AS BIGINT), {width}) AS win_text
    FROM {table},
         LATERAL (SELECT unnest(range(0, greatest(
           CAST(ceil((length({text_col}) - {width}) / {stride}.0) AS BIGINT) + 1,
           1))) AS i)
    """
