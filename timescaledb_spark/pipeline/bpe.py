"""BPE vocabulary induction over a corpus — the pair-counting core of
byte-pair-encoding training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units", Algorithm 1): count
adjacent symbol pairs weighted by word frequency; the argmax pair is
the next merge. The counting step is the distributed part (every
iteration is one scan of the word-frequency table); the merge loop
itself mutates a vocab-sized table and runs wherever the word table
lives.

Reference analog: none (SURVEY pipeline surface) — tokenizer training
is a standard pre-training pipeline stage.

Scale shape (100 TB):

- **Word-frequency table first** (one map-combined groupBy on the
  token): all later work is over DISTINCT words × their counts —
  bounded by vocabulary (~1e6-1e7 rows), not corpus size. This is the
  classic BPE-training trick and the whole reason the op scales.
- **Pair counting** explodes each distinct word into its adjacent
  symbol pairs (bounded by word length) and runs a second map-combined
  groupBy on the pair — output bounded by |alphabet|² per iteration.
- Zero Python in the hot path: tokenization, end-of-word marking,
  pair slicing are array expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .core import tokens, tokens_sql

#: end-of-word marker (the </w> of the paper, one char to keep symbol
#: arithmetic trivial)
EOW = "·"


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table under the shared tokenizer —
    ``(word, freq)``, one map-combined shuffle."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 0
) -> DataFrame:
    """Adjacent-symbol pair counts for the FIRST BPE merge iteration:
    every word is a character sequence plus the end-of-word marker;
    each adjacent (left, right) pair contributes the word's corpus
    frequency. Output ``(left, right, pair_count)``; ``top_k`` > 0
    keeps the best pairs (count desc, then left/right asc — the
    deterministic argmax order for the would-be merge)."""
    wf = word_freq(df, text_col)
    chars = F.concat(
        F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
        F.array(F.lit(EOW)),
    )
    pairs = (
        wf.withColumn("_chars", chars)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_chars) - 1), "
                    "i -> struct(_chars[i - 1] AS l, _chars[i] AS r))"
                )
            ).alias("p"),
        )
        .select("freq", "p.l", "p.r")
    )
    out = (
        pairs.groupBy(
            F.col("l").alias("left_sym"), F.col("r").alias("right_sym")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )
    if top_k and int(top_k) > 0:
        out = out.orderBy(
            F.col("pair_count").desc(),
            F.col("left_sym"),
            F.col("right_sym"),
        ).limit(int(top_k))
    return out


def bpe_pair_counts_sql(
    table: str = "documents", text_col: str = "text", top_k: int = 0
) -> str:
    """DuckDB replay: same tokenizer, same char split (testdata is
    ASCII so char==symbol in both engines), same end-of-word marker."""
    toks = tokens_sql(text_col)
    lim = (
        f"ORDER BY pair_count DESC, left_sym ASC, right_sym ASC "
        f"LIMIT {int(top_k)}"
        if top_k and int(top_k) > 0
        else ""
    )
    return f"""
    WITH wf AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest({toks}) AS word FROM {table}
      ) GROUP BY 1
    ),
    sym AS (
      SELECT freq,
             list_append(string_split(word, ''), '{EOW}') AS cs
      FROM wf
    ),
    pairs AS (
      SELECT freq, cs[i] AS l, cs[i + 1] AS r
      FROM sym, LATERAL (
        SELECT unnest(range(1, len(cs))) AS i
      )
    )
    SELECT l AS left_sym, r AS right_sym,
           CAST(sum(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1, 2
    {lim}
    """
