"""Columnstore semantics: segmentby/orderby clustering, sparse-index parity.

Reference: ``tsl/src/compression/`` — ``compress_chunk`` rewrites a chunk
grouped by ``segmentby`` columns, ordered by ``orderby``, into ~1000-row
batches, each with min/max + bloom metadata used for batch skipping
(``compression.c:294``, ``batch_metadata_builder_{minmax,bloom1}.c``,
qual pushdown in ``tsl/src/nodes/columnar_scan/qual_pushdown.c``).

Spark-first mapping (SURVEY §2.3): parquet *is* the columnstore — its
encodings subsume deltadelta/gorilla/dictionary (DELTA_BINARY_PACKED,
BYTE_STREAM_SPLIT, RLE_DICTIONARY), so we do not port the byte-level
algorithms. What we reproduce is the *physical organization* that makes
scans fast:

- ``convert_to_columnstore(chunk)`` = rewrite the chunk directory
  range-partitioned by segmentby and sorted by (segmentby, orderby).
  Row-group min/max stats then become tight per segment key — the exact
  analog of the reference's per-batch ``_ts_meta_min/max`` sparse index —
  and parquet bloom filters on segmentby columns replace ``bloom1``.
- per-chunk column min/max recorded in ``chunk_column_stats`` power
  chunk-level skipping on non-time predicates
  (``enable_chunk_skipping``, src/ts_catalog/chunk_column_stats.c).
- ``recompress_chunk`` merges rows appended after compression back into
  the sorted layout (``recompress.c``) — same rewrite, idempotent.

Scale: each chunk rewrite is an independent Spark job over one partition
directory; a compression policy sweeping N chunks parallelizes trivially,
and file count per chunk is sized from bytes, not hardcoded.
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import time as _time
from typing import Optional, Sequence, Union

from pyspark.sql import functions as F

from .hypertable import CHUNK_COL, SPACE_COL, Hypertable

# cap on per-chunk recorded segment values: above this a DISTINCT read
# falls back to scanning the chunk (the same "index jump stops paying"
# regime where the reference's SkipScan loses to a seq scan)
SEGMENT_VALUES_CAP = 1024
# chunk_column_stats sentinel "column" holding the distinct tuples of the
# FULL segmentby key (composite DISTINCT SkipScan, round 10); never a
# real column name, so min/max consumers skip it via find(column=<name>)
SEGMENT_TUPLES_KEY = "__segment_tuples__"

TARGET_FILE_BYTES = 128 * 1024 * 1024  # one spark input split per file


def get_segmentby_defaults(
    ht: Hypertable,
    sample_rows: int = 10_000,
    max_candidates: int = 10,
) -> dict:
    """Auto-select a default segmentby column — the analog of
    ``_timescaledb_functions.get_segmentby_defaults``
    (``sql/compression_defaults.sql``) with the direct-compress caps
    (≤10 candidate columns, ``src/guc.h:183``): among non-dimension,
    non-time-typed columns with more than one distinct value, pick the
    one whose value frequencies segment tuples most EVENLY (lowest
    population stddev of frequencies — the reference's
    ``stddev_pop(most_common_freqs)`` criterion), measured on a bounded
    sample. Returns ``{"columns": [...], "confidence": 0-10,
    "message": ...}`` like the reference; empty columns when nothing
    qualifies."""
    from pyspark.sql import types as T

    exclude = {ht.time_column, ht.row.get("space_column")}
    cands = [
        f.name
        for f in ht._schema().fields
        if f.name not in exclude
        and isinstance(
            f.dataType,
            (T.StringType, T.LongType, T.IntegerType, T.ShortType, T.BooleanType),
        )
    ][:max_candidates]
    if not cands:
        return {"columns": [], "confidence": 0, "message": "no candidate columns"}
    sample = ht.df().select(*cands).limit(sample_rows).cache()
    try:
        n = sample.count()
        best, best_score = None, None
        for c in cands:
            counts = [
                r["cnt"]
                for r in sample.groupBy(c).agg(F.count(F.lit(1)).alias("cnt")).collect()
            ]
            k = len(counts)
            # n_distinct > 1, and enough rows per segment to batch
            # (reference targets ~1000 rows/compressed batch)
            if k < 2 or n / k < 10:
                continue
            freqs = [cnt / n for cnt in counts]
            mean = sum(freqs) / k
            stddev = (sum((f - mean) ** 2 for f in freqs) / k) ** 0.5
            if best_score is None or (stddev, c) < best_score:
                best, best_score = c, (stddev, c)
        if best is None:
            return {
                "columns": [],
                "confidence": 0,
                "message": "no column segments the sample evenly",
            }
        return {
            "columns": [best],
            "confidence": 7,  # stats-only (no index signals in this engine)
            "message": f"picked {best!r} by frequency evenness on a "
            f"{n}-row sample",
        }
    finally:
        sample.unpersist()


def enable_columnstore(
    ht: Hypertable,
    segmentby: Union[str, Sequence[str]] = (),
    orderby: Union[str, Sequence[str], None] = None,
) -> None:
    """``ALTER TABLE .. SET (timescaledb.compress, compress_segmentby,
    compress_orderby)`` (src/with_clause/alter_table_with_clause.c:40).
    ``segmentby="auto"`` runs :func:`get_segmentby_defaults`."""
    if segmentby == "auto":
        segmentby = get_segmentby_defaults(ht)["columns"]
    elif isinstance(segmentby, str):
        segmentby = [segmentby]
    if orderby is None:
        orderby = [(ht.time_column, "desc")]
    norm = []
    if isinstance(orderby, str):
        orderby = [orderby]
    for ob in orderby:
        if isinstance(ob, str):
            parts = ob.split()
            norm.append((parts[0], parts[1].lower() if len(parts) > 1 else "asc"))
        else:
            norm.append((ob[0], ob[1].lower()))
    if ht.row.get("schema_ddl") is not None:
        # reference parity: ALTER TABLE .. compress_segmentby errors on
        # an unknown column; a typo silently skipped at compress time
        # would drop all clustering and bloom filters without a word
        known = {f.name for f in ht._schema().fields}
        for col in list(segmentby) + [c for c, _ in norm]:
            if col not in known:
                raise ValueError(
                    f"column {col!r} not in schema (compress_segmentby/"
                    f"compress_orderby must name existing columns)"
                )
    cat = ht.ts.catalog
    cat.compression_settings.delete({"hypertable_id": ht.id})
    cat.compression_settings.append(
        [
            {
                "hypertable_id": ht.id,
                "segmentby": list(segmentby),
                "orderby": norm,
            }
        ]
    )
    cat.hypertable.update({"name": ht.name}, {"compression": True})
    ht._refresh()


def _settings(ht: Hypertable) -> dict:
    s = ht.ts.catalog.compression_settings.find_one(hypertable_id=ht.id)
    if not s:
        raise ValueError(
            f"columnstore not enabled on {ht.name!r}; call enable_columnstore"
        )
    return s


def _chunk_path(ht: Hypertable, chunk: dict) -> str:
    return os.path.join(ht.data_dir, f"{CHUNK_COL}={chunk['range_start']}")


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def _compress_chunk_data(
    ht: Hypertable,
    chunk: dict,
    stats_columns: Sequence[str],
    target_file_bytes: int,
) -> dict:
    """The Spark side of a chunk compression: sorted clustered rewrite +
    stats scan + atomic dir swap. Touches only this chunk's directory, so
    many of these can run concurrently (catalog commits stay serial)."""
    s = _settings(ht)
    spark = ht.ts.spark
    path = _chunk_path(ht, chunk)
    before = _dir_bytes(path)

    df = ht._conform_chunk_df(chunk, ht._chunk_reader().parquet(path))
    segmentby = [c for c in s["segmentby"] if c in df.columns]
    order_cols = [
        F.col(c).desc() if d.startswith("desc") else F.col(c).asc()
        for c, d in s["orderby"]
        if c in df.columns
    ]
    live_order = [c for c, _ in s["orderby"] if c in df.columns]
    nfiles = max(1, math.ceil(before / target_file_bytes))
    if segmentby:
        out = df.repartitionByRange(nfiles, *segmentby)
    elif live_order:
        out = df.repartitionByRange(nfiles, *[F.col(c) for c in live_order])
    else:
        out = df.repartition(nfiles)
    out = out.sortWithinPartitions(*[F.col(c) for c in segmentby], *order_cols)

    writer = out.write.mode("overwrite")
    # a space-partitioned hypertable stores _space= subdirs INSIDE each
    # chunk dir — the rewrite must preserve that layout or later
    # basePath reads see conflicting partition depths across chunks
    space = SPACE_COL if ht.row.get("space_column") and SPACE_COL in df.columns else None
    if space:
        writer = writer.partitionBy(space)
    for col in segmentby:
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
    # dot-prefixed tmp OUTSIDE the _chunk= namespace: a leftover
    # '_chunk=<start>.tmp_columnstore' dir from a crashed compression
    # would make _scan_chunk_dirs (run by EVERY insert) fail on
    # int('<start>.tmp_columnstore') forever
    tmp = os.path.join(ht.data_dir, f".tmp_columnstore_{chunk['range_start']}")
    try:
        writer.parquet(tmp)
        # collect per-chunk column stats for chunk skipping while hot
        stat_cols = list(dict.fromkeys(list(stats_columns) + segmentby))
        stats = {}
        seg_values: dict = {}
        if stat_cols:
            row = (
                spark.read.parquet(tmp)
                .agg(
                    *[F.min(c).alias(f"min_{c}") for c in stat_cols],
                    *[F.max(c).alias(f"max_{c}") for c in stat_cols],
                    # SkipScan analog: the segment keys of a columnstore
                    # chunk ARE its distinct values — record them (capped)
                    # so SELECT DISTINCT <segmentby> answers from the
                    # catalog with zero scan (tsl/src/nodes/skip_scan/).
                    # slice caps the DRIVER transfer; the executor-side
                    # set is bounded by the same low-cardinality
                    # assumption segment compression already makes.
                    *[
                        F.slice(
                            F.sort_array(F.collect_set(F.col(c))),
                            1,
                            SEGMENT_VALUES_CAP + 1,
                        ).alias(f"dv_{c}")
                        for c in segmentby
                    ],
                    *[
                        F.max(F.col(c).isNull()).alias(f"dvn_{c}")
                        for c in segmentby
                    ],
                    # composite SkipScan (round 10): the full segmentby
                    # TUPLE list answers DISTINCT over ANY subset of the
                    # segmentby columns by projection (the reference
                    # builds SkipScan paths for every ordered index
                    # prefix, tsl/src/nodes/skip_scan/planner.c:576;
                    # recorded tuples subsume prefixes AND subsets)
                    *(
                        [
                            F.slice(
                                F.sort_array(
                                    F.collect_set(
                                        F.struct(
                                            *[F.col(c) for c in segmentby]
                                        )
                                    )
                                ),
                                1,
                                SEGMENT_VALUES_CAP + 1,
                            ).alias("dv__tuples")
                        ]
                        if len(segmentby) >= 2
                        else []
                    ),
                )
                .collect()[0]
            )
            stats = {c: [row[f"min_{c}"], row[f"max_{c}"]] for c in stat_cols}
            for c in segmentby:
                vals = row[f"dv_{c}"]
                if vals is not None and len(vals) <= SEGMENT_VALUES_CAP:
                    try:  # catalog is JSONL — only JSON-clean types persist
                        json.dumps(list(vals))
                    except TypeError:
                        continue
                    seg_values[c] = {
                        "values": list(vals),
                        "has_null": bool(row[f"dvn_{c}"]),
                    }
            if len(segmentby) >= 2:
                tuples = row["dv__tuples"]
                if tuples is not None and len(tuples) <= SEGMENT_VALUES_CAP:
                    as_lists = [list(t) for t in tuples]
                    try:
                        json.dumps(as_lists)
                    except TypeError:
                        as_lists = None
                    if as_lists is not None:
                        seg_values[SEGMENT_TUPLES_KEY] = {
                            "values": as_lists,
                            "columns": list(segmentby),
                        }
        # row count from the freshly written footers — free relative to
        # the rewrite; keeps approximate_row_count catalog-answerable
        # (the reference answers from pg stats, sql/size_utils.sql:311)
        import pyarrow.parquet as papq

        n_rows = sum(
            papq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(
                os.path.join(tmp, "**", "*.parquet"), recursive=True
            )
        )
        _swap_dir(path, tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return {
        "before": before,
        "after": _dir_bytes(path),
        "stats": stats,
        "segment_values": seg_values,
        "n_rows": n_rows,
    }


def _swap_dir(path: str, tmp: str) -> None:
    """Replace ``path`` with ``tmp`` without a destroy-first window:
    move the old dir ASIDE (dot-prefixed, invisible to chunk scans),
    move ``tmp`` in, delete the aside last. ``rmtree(path)`` before
    ``os.replace`` left a window where a failed rmtree/replace destroyed
    BOTH copies; here any failure leaves at least one intact copy and
    restores the original on a failed swap-in."""
    d, b = os.path.split(path)
    aside = os.path.join(d, f".old_{b}")
    if os.path.isdir(aside):
        shutil.rmtree(aside)
    os.replace(path, aside)
    try:
        os.replace(tmp, path)
    except BaseException:
        os.replace(aside, path)
        raise
    shutil.rmtree(aside, ignore_errors=True)


def _stats_rows(ht: Hypertable, chunk: dict, data: dict) -> list[dict]:
    """chunk_column_stats rows for one compressed chunk: min/max for
    every stats column, plus the recorded segment values (the DISTINCT
    SkipScan analog) on segmentby columns. Riding on the stats rows
    means every existing invalidation path (_mark_rewritten, insert
    staleness, rename, disable_chunk_skipping) retires the distinct
    list together with the min/max — a modified chunk falls back to
    being scanned, never answered from a lying catalog."""
    seg = data.get("segment_values") or {}
    rows = []
    for col, v in (data["stats"] or {}).items():
        r = {
            "chunk_id": chunk["id"],
            "hypertable_id": ht.id,
            "column": col,
            "min": v[0],
            "max": v[1],
        }
        if col in seg:
            r["distinct_values"] = seg[col]["values"]
            r["distinct_has_null"] = seg[col]["has_null"]
        rows.append(r)
    if SEGMENT_TUPLES_KEY in seg:
        # composite segment-key tuples ride the same stats rows so every
        # invalidation path (DML staleness, decompress, rename, disable)
        # retires them together with the per-column lists
        rows.append(
            {
                "chunk_id": chunk["id"],
                "hypertable_id": ht.id,
                "column": SEGMENT_TUPLES_KEY,
                "columns": seg[SEGMENT_TUPLES_KEY]["columns"],
                "distinct_values": seg[SEGMENT_TUPLES_KEY]["values"],
            }
        )
    return rows


def _compress_chunk_commit(ht: Hypertable, chunk: dict, data: dict) -> dict:
    """Catalog side of a chunk compression (single-threaded)."""
    cat = ht.ts.catalog
    cat.chunk.update(
        {"id": chunk["id"]},
        {
            "status": "columnstore",
            "n_rows": data.get("n_rows"),
            "unordered": False,
        },
    )
    ht._mark_fill_done([chunk["range_start"]])
    cat.chunk_column_stats.delete({"chunk_id": chunk["id"]})
    if data["stats"]:
        cat.chunk_column_stats.append(_stats_rows(ht, chunk, data))
    cat.table("metadata").append(
        [
            {
                "key": f"compression_chunk_size_{chunk['id']}",
                "value": {
                    "before": data["before"],
                    "after": data["after"],
                    "at": _time.time(),
                },
            }
        ]
    )
    return {
        "chunk": chunk["range_start"],
        "before_bytes": data["before"],
        "after_bytes": data["after"],
    }


def _compress_commit_batch(ht: Hypertable, items) -> list[dict]:
    """Batched catalog commit for many compressed chunks — the
    per-chunk :func:`_compress_chunk_commit` costs ~5 full catalog-file
    rewrites per chunk, O(k · chunks) for a k-chunk policy backlog. One
    pass per catalog table instead, holding the write lock across the
    compound transaction. ``items``: list of (chunk_row, data) pairs."""
    if not items:
        return []
    cat = ht.ts.catalog
    now = _time.time()
    by_id = {c["id"]: d for c, d in items}
    with cat.write_lock:
        rows = cat.chunk.read()
        for r in rows:
            d = by_id.get(r.get("id"))
            if d is not None:
                r["status"] = "columnstore"
                r["n_rows"] = d.get("n_rows")
                r["unordered"] = False
        cat.chunk.replace(rows)
        ht._mark_fill_done([c["range_start"] for c, _ in items])
        srows = cat.chunk_column_stats.read()
        keep = [s for s in srows if s.get("chunk_id") not in by_id]
        new_stats = [r for c, d in items for r in _stats_rows(ht, c, d)]
        if new_stats or len(keep) != len(srows):
            cat.chunk_column_stats.replace(keep + new_stats)
        cat.table("metadata").append(
            [
                {
                    "key": f"compression_chunk_size_{c['id']}",
                    "value": {
                        "before": d["before"],
                        "after": d["after"],
                        "at": now,
                    },
                }
                for c, d in items
            ]
        )
    return [
        {
            "chunk": c["range_start"],
            "before_bytes": d["before"],
            "after_bytes": d["after"],
        }
        for c, d in items
    ]


def compress_chunk(
    ht: Hypertable,
    chunk: Union[dict, int],
    stats_columns: Sequence[str] = (),
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> dict:
    """``compress_chunk`` / ``convert_to_columnstore``
    (sql/maintenance_utils.sql:35; tsl/src/compression/api.c:889).

    Rewrites one chunk directory clustered by segmentby, sorted by
    (segmentby, orderby); records before/after sizes
    (compression_chunk_size catalog) and per-chunk column min/max
    (chunk_column_stats) for the skip index.
    """
    chunk = _chunk_of(ht, chunk)
    # the rewrite reads the chunk's files, then rmtree+replace's the dir;
    # a concurrent insert appending into it between the read and the
    # swap would be silently deleted — serialize with DML like every
    # other rewrite path (insert/_recompute_stats/merge all hold it)
    with ht.ts.catalog.ht_lock(ht.name):
        data = _compress_chunk_data(ht, chunk, stats_columns, target_file_bytes)
        return _compress_chunk_commit(ht, chunk, data)


def decompress_chunk(ht: Hypertable, chunk: Union[dict, int]) -> None:
    """``decompress_chunk`` / ``convert_to_rowstore``
    (sql/maintenance_utils.sql:48): storage format is parquet either way —
    this only flips chunk status so DML paths treat it as rowstore."""
    chunk = _chunk_of(ht, chunk)
    ht.ts.catalog.chunk.update({"id": chunk["id"]}, {"status": "rowstore"})


def recompress_chunk(ht: Hypertable, chunk: Union[dict, int]) -> dict:
    """``recompress_chunk`` (tsl/src/compression/recompress.c): fold rows
    appended after compression back into the sorted clustered layout."""
    return compress_chunk(ht, chunk)


def _chunk_of(ht: Hypertable, chunk: Union[dict, int]) -> dict:
    if isinstance(chunk, int):
        match = next(
            (c for c in ht.chunks() if c["range_start"] == chunk), None
        )
        if match is None:
            raise KeyError(f"no chunk starting at {chunk}")
        return match
    return chunk


def compact_chunk(
    ht: Hypertable, chunk: Union[dict, int], max_batches: int = 0
) -> dict:
    """``_timescaledb_functions.compact_chunk`` (sql/
    maintenance_utils.sql:92, ``ts_compact_chunk``): fold small /
    partially-filled compressed batches back into the clustered layout —
    the segmentwise recompress. Parquet analog: the sorted clustered
    rewrite of :func:`recompress_chunk` (row-group packing is the
    parquet writer's job; ``max_batches`` is accepted for signature
    parity and ignored)."""
    return recompress_chunk(ht, _chunk_of(ht, chunk))


def rebuild_columnstore(ht: Hypertable, chunk: Union[dict, int]) -> dict:
    """``_timescaledb_functions.rebuild_columnstore`` (sql/
    maintenance_utils.sql:58, ``ts_rebuild_columnstore``): full rewrite
    of a columnstore chunk — errors on a rowstore chunk, unlike
    compress_chunk's convert semantics."""
    chunk = _chunk_of(ht, chunk)
    if chunk.get("status") != "columnstore":
        raise ValueError(
            f"chunk starting at {chunk['range_start']} is not a "
            f"columnstore chunk (use compress_chunk / "
            f"convert_to_columnstore first)"
        )
    return compress_chunk(ht, chunk)


def rebuild_sparse_index(
    ht: Hypertable, chunk: Union[dict, int], force: bool = False
) -> int:
    """``_timescaledb_functions.rebuild_sparse_index`` (sql/
    maintenance_utils.sql:62, ``ts_rebuild_sparse_index``): recompute the
    chunk's per-column min/max skip stats — the sparse-index analog
    (parquet bloom filters rebuild with the file rewrite inside the
    compress paths; the minmax side lives in ``chunk_column_stats``).
    Scans ONLY the one chunk. With ``force=False`` (the reference
    default) a chunk whose stats are already present is left alone;
    ``force=True`` recomputes unconditionally. Returns the number of
    stats rows written."""
    chunk = _chunk_of(ht, chunk)
    cols = list(ht.row.get("skip_columns") or [])
    if not cols:
        return 0
    if not force:
        have = {
            s["column"]
            for s in ht.ts.catalog.chunk_column_stats.find(chunk_id=chunk["id"])
        }
        if set(cols) <= have:
            return 0
    return ht._recompute_stats(cols, only_chunk_ids={chunk["id"]})


def compress_chunks(
    ht: Hypertable,
    older_than=None,
    newer_than=None,
    recompress: bool = False,
    recompress_unordered: bool = True,
    parallelism: int = 8,
) -> list[dict]:
    """Compress every (still-rowstore) chunk in the window — the payload of
    ``add_compression_policy`` (tsl/src/bgw_policy/compression_api.c).

    ``recompress_unordered`` (sql/policy_internal.sql:141,201-206;
    reference PR #10226, default TRUE like the reference): also fold
    columnstore chunks whose rowstore tail is UNORDERED — a plain
    append after compression set their ``unordered`` status bit. With
    ``False`` those chunks are skipped (the operator opts out of the
    expensive sorted rewrite until a quieter window); ``recompress=True``
    still rewrites every chunk regardless.

    Chunk rewrites are independent (each touches only its own directory),
    so the Spark work runs ``parallelism``-wide — concurrent job
    submission keeps the cluster saturated instead of draining between
    per-chunk jobs; catalog commits are applied serially afterwards."""
    cands = [
        c
        for c in ht.show_chunks(older_than=older_than, newer_than=newer_than)
        if c.get("status") != "columnstore"
        or recompress
        or (recompress_unordered and c.get("unordered"))
    ]
    if not cands:
        return []
    if parallelism <= 1 or len(cands) == 1:
        return [compress_chunk(ht, c) for c in cands]
    from concurrent.futures import ThreadPoolExecutor

    # same DML serialization compress_chunk takes per chunk: without it
    # a concurrent late-data insert appending into one of these chunks
    # between a worker's read and its dir swap would be silently deleted
    # (the policy job + streaming-ingest combination hits exactly this)
    with ht.ts.catalog.ht_lock(ht.name):
        with ThreadPoolExecutor(max_workers=min(parallelism, len(cands))) as ex:
            datas = list(
                ex.map(
                    lambda c: _compress_chunk_data(ht, c, (), TARGET_FILE_BYTES),
                    cands,
                )
            )
        return _compress_commit_batch(ht, list(zip(cands, datas)))


def reorder_chunk(ht: Hypertable, chunk: Union[dict, int], by: Sequence[str]) -> None:
    """``reorder_chunk`` (sql/maintenance_utils.sql:8; tsl/src/reorder.c):
    CLUSTER-like sorted rewrite by the given key. Serialized with DML
    (the rewrite deletes the dir it read), space layout preserved, and
    the staging dir is dot-prefixed + cleaned on failure — the same
    contract as compress_chunk."""
    chunk = _chunk_of(ht, chunk)
    with ht.ts.catalog.ht_lock(ht.name):
        path = _chunk_path(ht, chunk)
        df = ht._conform_chunk_df(chunk, ht._chunk_reader().parquet(path))
        nfiles = max(1, math.ceil(_dir_bytes(path) / TARGET_FILE_BYTES))
        out = df.repartitionByRange(nfiles, *by).sortWithinPartitions(*by)
        writer = out.write.mode("overwrite")
        if ht.row.get("space_column") and SPACE_COL in df.columns:
            writer = writer.partitionBy(SPACE_COL)
        tmp = os.path.join(ht.data_dir, f".tmp_reorder_{chunk['range_start']}")
        try:
            writer.parquet(tmp)
            _swap_dir(path, tmp)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        ht._mark_fill_done([chunk["range_start"]])


def chunk_compression_stats(ht: Hypertable) -> list[dict]:
    """``chunk_compression_stats`` (sql/size_utils.sql): per-chunk
    before/after byte sizes."""
    cat = ht.ts.catalog
    out = []
    for c in ht.chunks():
        m = cat.table("metadata").find_one(key=f"compression_chunk_size_{c['id']}")
        if m:
            v = m["value"] if isinstance(m["value"], dict) else None
            out.append(
                {
                    "chunk": c["range_start"],
                    "status": c.get("status"),
                    **(v or {}),
                }
            )
    return out
