"""End-to-end corpus curation — the composed pipeline a pre-training
data run actually executes (the C4/Gopher/RefinedWeb recipe): line-wise
corrections, doc-level quality rules, exact dedup, near-dup dedup —
each document gets the verdict of the FIRST stage that drops it.

This is a composition of already-gated operators (``textproc.line_filter``,
``textproc.gopher_quality``, ``dedup.exact_dedup`` semantics,
``dedup.minhash_lsh_pairs`` + ``dedup.dup_clusters``), so the composed
DuckDB oracle replays the identical stage chain — the gate verifies
stage ORDER and survivor threading, not just each stage in isolation.

Scale shape: stages 1-2 are scan-speed projections; stage 3 is one
map-combined groupBy on the content hash; stage 4 runs the banded
MinHash protocol over stage-3 SURVIVORS only (each stage shrinks the
next one's input — the reason real pipelines order cheap filters
first)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dup_clusters, dup_clusters_sql, minhash_lsh_pairs, minhash_lsh_pairs_sql
from .textproc import gopher_quality, gopher_quality_sql, line_filter, line_filter_sql

VERDICTS = ("kept", "line_filter", "gopher_quality", "exact_dup", "near_dup")


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **gopher_kwargs,
) -> DataFrame:
    """One row per input document: ``(id, verdict)`` with verdict the
    first dropping stage (or 'kept')."""
    # NULL text makes both stage flags NULL; the survivor filter drops
    # those docs either way, but a NULL flag would skip every verdict
    # WHEN branch and mis-report them as 'kept' (round-15 advice) —
    # coalesce to FALSE so they carry the first stage's drop verdict
    lf = F.coalesce(line_filter(text_col)["keep"], F.lit(False))
    gq = F.coalesce(
        gopher_quality(text_col, **gopher_kwargs)["passes"], F.lit(False)
    )
    # pin the flag pass: it feeds the survivor chain (filter -> exact ->
    # minhash) AND the final verdict projection — without the pin the
    # two heavy array/regex flag expressions re-evaluate ~3x. Only
    # (id, 2 booleans) is pinned — ~17 bytes/row at ANY corpus size;
    # survivors re-read their text through a join against the source
    # (one extra scan, but the corpus TEXT is never held in storage
    # memory — the cluster-scale default per the round-15 review).
    # localCheckpoint, not cache: blocks are freed by the
    # ContextCleaner when the caller drops the result.
    flags = df.select(
        F.col(id_col), lf.alias("_lf"), gq.alias("_gq")
    ).localCheckpoint(eager=False)
    surv2 = df.select(id_col, text_col).join(
        flags.filter(F.col("_lf") & F.col("_gq")).select(id_col), id_col
    )
    # exact dedup among quality survivors: keeper = min id per content
    # hash — min() over Window.partitionBy(_h), not groupBy + join back
    # (the join's two inputs would each re-run the survivor join + md5
    # pass; one exchange on the hash gives every row its keeper —
    # guide §2.4, the substring_dedup discipline)
    from pyspark.sql import Window

    exmap = surv2.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_h")
    )
    # pinned like flags: exj feeds the surv3 filter AND the final
    # verdict join — unpinned, the source-scan → survivor-join → md5 →
    # window chain executed once per branch (r16 optimization round).
    # (id, bool) rows only, ~9 bytes/row at any corpus size.
    exj = exmap.select(
        id_col,
        (
            F.col(id_col)
            == F.min(id_col).over(Window.partitionBy("_h"))
        ).alias("_exk"),
    ).localCheckpoint(eager=False)
    surv3 = surv2.join(exj.filter("_exk").select(id_col), id_col)
    # near-dup dedup among exact survivors (banded MinHash + components)
    pairs = minhash_lsh_pairs(surv3, text_col, id_col)
    clusters = dup_clusters(pairs, shuffle_partitions=8)
    near_drop = clusters.filter(
        F.col("member") != F.col("cluster_id")
    ).select(F.col("member").alias(id_col), F.lit(True).alias("_nd"))
    return (
        flags
        .join(exj, id_col, "left")
        .join(near_drop, id_col, "left")
        .select(
            id_col,
            F.when(~F.col("_lf"), F.lit("line_filter"))
            .when(~F.col("_gq"), F.lit("gopher_quality"))
            .when(~F.col("_exk"), F.lit("exact_dup"))
            .when(F.col("_nd"), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )


def curate_corpus_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    **gopher_kwargs,
) -> str:
    lf = f"coalesce({line_filter_sql(text_col)['keep']}, FALSE)"
    gq = (
        f"coalesce({gopher_quality_sql(text_col, **gopher_kwargs)['passes']},"
        f" FALSE)"
    )
    pairs = minhash_lsh_pairs_sql("surv3", text_col, id_col)
    clusters = dup_clusters_sql(pairs)
    return f"""
    WITH flags AS (
      SELECT {id_col}, {text_col}, {lf} AS lf, {gq} AS gq FROM {table}
    ),
    surv2 AS (SELECT {id_col}, {text_col} FROM flags WHERE lf AND gq),
    exk AS (
      SELECT {id_col},
             {id_col} = min({id_col}) OVER (PARTITION BY md5({text_col}))
               AS is_keeper
      FROM surv2
    ),
    surv3 AS (
      SELECT surv2.{id_col}, surv2.{text_col}
      FROM surv2 JOIN exk USING ({id_col}) WHERE exk.is_keeper
    ),
    clusters AS ({clusters}),
    near AS (SELECT member FROM clusters WHERE member != cluster_id)
    SELECT flags.{id_col},
           CASE WHEN NOT flags.lf THEN 'line_filter'
                WHEN NOT flags.gq THEN 'gopher_quality'
                WHEN NOT exk.is_keeper THEN 'exact_dup'
                WHEN near.member IS NOT NULL THEN 'near_dup'
                ELSE 'kept' END AS verdict
    FROM flags
    LEFT JOIN exk USING ({id_col})
    LEFT JOIN near ON near.member = flags.{id_col}
    """
