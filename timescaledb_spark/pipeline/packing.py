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


def pack_token_ids(
    enc: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "piece_ids",
    budget: int = 2048,
    shard_by: Sequence[str] = (),
) -> DataFrame:
    """MATERIALIZED concat-and-chunk packing — the training-loader
    output itself, not just the assignment: concatenate every
    document's token ids in ``id_col`` order and cut the stream into
    exact ``budget``-length sequences (the final partial sequence
    remains short). One row per TRAINING SEQUENCE:
    ``(shard.., seq_id, n_docs, n_tok, ids)``.

    Compose with :func:`..unigram.unigram_encode` /
    :func:`..bpe.bpe_encode` for the full tokenize → pack path.

    Shape: a document spanning sequences ``[floor(start/B),
    floor((end-1)/B)]`` explodes into one slice per spanned sequence
    (array slicing, no per-token rows — the explode is bounded by
    n_tok/B + 1 per doc), then one groupBy on the sequence id
    reassembles slices in stream order. Like :func:`pack_sequences`,
    the cumulative offset is a per-shard window — at 100 TB callers
    MUST pack per shard (language / date / hash bucket); the global
    form is for small corpora and tests. Empty documents carry no
    tokens and are dropped (they produce no slice)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    B = int(budget)
    w = (
        Window.partitionBy(*[F.col(c) for c in shard_by])
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (
        enc.select(
            *shard_by,
            F.col(id_col),
            F.col(ids_col).alias("_ids"),
            F.size(ids_col).cast("long").alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .withColumn("_cum", F.sum("_n").over(w))
        .withColumn("_start", F.col("_cum") - F.col("_n"))
    )
    sliced = t.select(
        *shard_by,
        "_start",
        F.explode(
            F.expr(
                f"""transform(
                  sequence(CAST(floor(_start / {B}) AS BIGINT),
                           CAST(floor((_cum - 1) / {B}) AS BIGINT)),
                  s -> struct(
                    s AS seq_id,
                    greatest(s * {B}, _start) AS abs_from,
                    slice(_ids,
                          CAST(greatest(s * {B}, _start) - _start + 1 AS INT),
                          CAST(least((s + 1) * {B}, _cum)
                               - greatest(s * {B}, _start) AS INT)) AS piece))"""
            )
        ).alias("_sl"),
    ).select(*shard_by, "_sl.seq_id", "_sl.abs_from", "_sl.piece")
    return (
        sliced.groupBy(*shard_by, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("abs_from", "piece"))),
                    lambda x: x["piece"],
                )
            ).alias("ids"),
        )
        .select(
            *shard_by,
            "seq_id",
            "n_docs",
            F.size("ids").cast("long").alias("n_tok"),
            "ids",
        )
    )


def pack_token_ids_sql(
    inner_sql: str,
    id_col: str = "doc_id",
    ids_col: str = "piece_ids",
    budget: int = 2048,
) -> str:
    """DuckDB oracle for :func:`pack_token_ids` (unsharded form) over
    any inner query producing ``(id_col, ids_col)`` — same window
    algebra, same slice arithmetic, same stream-order reassembly."""
    B = int(budget)
    return f"""
    WITH enc AS ({inner_sql}),
    t AS (
      SELECT {id_col} AS _id, {ids_col} AS _ids,
             CAST(len({ids_col}) AS BIGINT) AS _n
      FROM enc WHERE len({ids_col}) > 0
    ),
    c AS (
      SELECT *, sum(_n) OVER (ORDER BY _id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum
      FROM t
    ),
    sliced AS (
      SELECT s.s AS seq_id,
             greatest(s.s * {B}, _cum - _n) AS abs_from,
             _ids[CAST(greatest(s.s * {B}, _cum - _n) - (_cum - _n) + 1 AS BIGINT):
                  CAST(least((s.s + 1) * {B}, _cum) - (_cum - _n) AS BIGINT)]
               AS piece
      FROM c, LATERAL (
        SELECT unnest(range(CAST(floor((_cum - _n) / {B}.0) AS BIGINT),
                            CAST(floor((_cum - 1) / {B}.0) AS BIGINT) + 1)) AS s
      ) s
    )
    SELECT seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(piece)) AS BIGINT) AS n_tok,
           flatten(list(piece ORDER BY abs_from)) AS ids
    FROM sliced
    GROUP BY seq_id
    """
