"""Training-shard export — the materialize-the-mixture stage of a
training-data pipeline: assign every document a (split, shard) cell
deterministically, then write one sized file per shard so the training
loader streams shards without a manifest-side shuffle.

Reference analog: none (SURVEY pipeline surface). The determinism
contract matches :mod:`.sampling`: the same document lands in the same
split AND the same shard on every run and engine (portable 60-bit md5
id-hash), so an export can be resumed, diffed, or reproduced exactly.

Scale shape (100 TB):

- **Assignment** is a pure projection (two hash expressions) — zero
  shuffle, evaluated at scan speed.
- **The write** repartitions on the exact (split, shard) key, so every
  shard's rows land in ONE task → exactly one output file per shard
  directory; total shuffle volume = the dataset, once — the minimum any
  resharding write can do. Shard counts are chosen per split so file
  sizes track a target (``n_shards`` can be a dict per split).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import _key_col, _key_sql, split_assign, split_assign_sql


def shard_assign(
    df: DataFrame,
    n_shards: Union[int, dict],
    weights: Optional[dict] = None,
    id_col: str = "doc_id",
    salt: str = "shard",
    split_col: str = "split",
    out_col: str = "shard",
) -> DataFrame:
    """Add ``split`` (when ``weights`` given; otherwise the existing
    ``split_col`` is used or a single 'train' split assumed) and
    ``shard`` = id-hash mod the split's shard count."""
    out = df
    if weights is not None:
        out = split_assign(out, weights, id_col=id_col, out_col=split_col)
    elif split_col not in out.columns:
        out = out.withColumn(split_col, F.lit("train"))
    key = _key_col(id_col, salt)
    if isinstance(n_shards, dict):
        if not n_shards:
            raise ValueError("n_shards dict must not be empty")
        # a typo between weights keys and n_shards keys must be an
        # error, not a silent mis-shard through a fallback (round-15
        # advice): validate the statically-known split domain here and
        # guard the runtime domain (pre-existing split column) with
        # raise_error in the CASE's ELSE branch
        split_domain = set(weights) if weights is not None else None
        if split_domain is not None and not split_domain <= set(n_shards):
            missing = sorted(split_domain - set(n_shards))
            raise ValueError(
                f"shard_assign: splits {missing} have no n_shards entry "
                f"(known: {sorted(n_shards)})"
            )
        expr: Optional[Column] = None
        for name, n in sorted(n_shards.items()):
            branch = F.pmod(key, F.lit(int(n)))
            cond = F.col(split_col) == name
            expr = (
                F.when(cond, branch) if expr is None else expr.when(cond, branch)
            )
        shard = expr.otherwise(
            F.raise_error(
                F.concat(
                    F.lit("shard_assign: split not in n_shards: "),
                    F.col(split_col),
                )
            ).cast("bigint")
        )
    else:
        shard = F.pmod(key, F.lit(int(n_shards)))
    return out.withColumn(out_col, shard.cast("int"))


def shard_assign_sql(
    table: str = "documents",
    n_shards: Union[int, dict] = 16,
    weights: Optional[dict] = None,
    id_col: str = "doc_id",
    salt: str = "shard",
    projection: str = "doc_id",
) -> str:
    """DuckDB oracle replaying :func:`shard_assign` (split via the
    :func:`..sampling.split_assign_sql` thresholds, shard via the same
    portable hash)."""
    key = _key_sql(id_col, salt)
    if weights is not None:
        inner = split_assign_sql(
            table, weights, id_col=id_col, projection=f"{projection}"
        )
        base = f"({inner})"
    else:
        base = f"(SELECT {projection}, 'train' AS split FROM {table})"
    if isinstance(n_shards, dict):
        if weights is not None and not set(weights) <= set(n_shards):
            missing = sorted(set(weights) - set(n_shards))
            raise ValueError(
                f"shard_assign_sql: splits {missing} have no n_shards "
                f"entry (known: {sorted(n_shards)})"
            )
        cases = " ".join(
            f"WHEN split = '{name}' THEN ({key} % {int(n)})"
            for name, n in sorted(n_shards.items())
        )
        shard = (
            f"CASE {cases} ELSE CAST(error("
            f"'shard_assign: split not in n_shards: ' || split) AS BIGINT)"
            f" END"
        )
    else:
        shard = f"({key} % {int(n_shards)})"
    return (
        f"SELECT {projection}, split, CAST({shard} AS INT) AS shard "
        f"FROM {base}"
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: Union[int, dict],
    weights: Optional[dict] = None,
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> dict:
    """Materialize the corpus as ``path/split=<s>/shard=<k>/`` with
    exactly ONE file per shard: the frame is repartitioned on the exact
    (split, shard) key before a partitioned write, so each shard's rows
    are in a single task. Returns per-(split, shard) row counts (the
    export manifest).

    The manifest is derived from the files just WRITTEN (a zero-column
    count over the output — Parquet answers it from row-group metadata),
    never by re-aggregating ``assigned``: that would re-run the entire
    upstream pipeline for a second full corpus scan + shuffle (the
    round-15 review finding). One source scan per export, regression-
    tested by an accumulator in tests/test_export_shards.py."""
    assigned = shard_assign(df, n_shards, weights, id_col=id_col)
    total = (
        sum(int(v) for v in n_shards.values())
        if isinstance(n_shards, dict)
        else int(n_shards) * (len(weights) if weights else 1)
    )
    (
        assigned.repartition(max(total, 1), "split", "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .format(fmt)
        .save(path)
    )
    manifest = (
        df.sparkSession.read.format(fmt)
        .load(path)
        .groupBy("split", "shard")
        .count()
        .orderBy("split", "shard")
        .collect()
    )
    return {
        (r["split"], int(r["shard"])): r["count"] for r in manifest
    }


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Release-to-release corpus diff (round 16): classify every
    document id across two corpus versions as ``added`` / ``removed``
    / ``changed`` (same id, different content hash) / ``unchanged`` —
    the audit table a dataset release ships next to its card.

    Output: ``(id, status, old_hash, new_hash)``, one row per id seen
    in either version.

    Scale shape: each side reduces to (id, md5) at scan time — the
    full-outer join moves two hash columns, never text; on
    id-partitioned corpora the join is co-partitioned (no extra
    shuffle). Status totals are a cheap groupBy over the result."""
    o = old.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("old_hash")
    )
    n = new.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("new_hash")
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.col("_id").alias(id_col),
        status.alias("status"),
        "old_hash",
        "new_hash",
    )


def corpus_diff_sql(
    old_sql: str,
    new_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`corpus_diff` over two table
    expressions (subqueries or names)."""
    return f"""
    WITH o AS (
      SELECT {id_col} AS id, md5({text_col}) AS old_hash FROM {old_sql}
    ),
    n AS (
      SELECT {id_col} AS id, md5({text_col}) AS new_hash FROM {new_sql}
    )
    SELECT coalesce(o.id, n.id) AS {id_col},
           CASE WHEN o.id IS NULL THEN 'added'
                WHEN n.id IS NULL THEN 'removed'
                WHEN o.old_hash <> n.new_hash THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.old_hash, n.new_hash
    FROM o FULL OUTER JOIN n ON o.id = n.id
    """
