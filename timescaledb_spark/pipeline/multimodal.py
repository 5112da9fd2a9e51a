"""Multimodal (image/audio/video) column handling.

Design: media travel as opaque ``binary`` payload columns with typed
metadata extracted into ordinary columns as early as possible, so all
downstream filtering/joining prunes to the narrow metadata and the bytes
are only shipped to the Python workers that actually decode them.

The decode itself is a Pandas-batched ``mapInPandas`` stage (Arrow
transfer, one Python roundtrip per ~10k-row batch — never per row). The
real decoders (PIL / soundfile / av) are not installed in this
environment, so ``decode_media`` dispatches: if a decoder import
succeeds it is used; otherwise a clearly-marked deterministic fake
derives metadata from the raw bytes. The Spark-side plumbing — schema,
batching, partition flow — is identical either way and is what the
tests/oracle verify.

At 100 TB: payloads dominate storage; keep them in their own parquet
column (Parquet keeps binary columns in separate column chunks, so
metadata-only queries never read them), partition by ingest time, and
size ``spark.sql.files.maxPartitionBytes`` so one task holds a few
hundred payloads at most.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

FRAME_BYTES = 256  # fake "video" frame granularity


def with_payload(df: DataFrame, text_col: str = "text", kind: str = "image") -> DataFrame:
    """Attach a deterministic binary payload column (UTF-8 bytes of the
    text) standing in for real media bytes, plus a media-kind tag."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "kind", F.lit(kind)
    )


def _try_pil():
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_image_header(p: bytes):
    """REAL image decode of the container headers — pure Python, no
    external libs: PNG IHDR, GIF logical screen descriptor, JPEG SOFn
    frame header. Returns ``(format, width, height)`` or None when the
    payload is not a recognized image."""
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
        return (
            "png",
            int.from_bytes(p[16:20], "big"),
            int.from_bytes(p[20:24], "big"),
        )
    if p[:4] == b"GIF8" and len(p) >= 10:
        return (
            "gif",
            int.from_bytes(p[6:8], "little"),
            int.from_bytes(p[8:10], "little"),
        )
    if p[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(p):
            if p[i] != 0xFF:
                i += 1
                continue
            marker = p[i + 1]
            if marker in _SOF_MARKERS:
                return (
                    "jpeg",
                    int.from_bytes(p[i + 7 : i + 9], "big"),
                    int.from_bytes(p[i + 5 : i + 7], "big"),
                )
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            i += 2 + int.from_bytes(p[i + 2 : i + 4], "big")
    return None


def _fake_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in dims for NON-image payloads (e.g. the text
    bytes the oracle harness uses), derived from the raw bytes."""
    n = len(payload)
    return n % 640 + 16, (n * 7) % 480 + 16


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas.

    Per payload, in order: PIL when importable (full decoder), else the
    built-in real header parser (PNG/GIF/JPEG); payloads that are not
    recognizable images fall back to the deterministic fake dims — the
    path the DuckDB oracle models, since the testdata payloads are text
    bytes. The stage is embarrassingly parallel: no shuffle, each task
    decodes its input split only."""
    use_pil = _try_pil()

    def _meta(p: bytes):
        if use_pil:
            try:
                import io

                import PIL.Image

                with PIL.Image.open(io.BytesIO(p)) as im:
                    return im.width, im.height
            except Exception:
                pass
        hdr = parse_image_header(p)
        if hdr is not None:
            return hdr[1], hdr[2]
        return _fake_meta(p)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (unfetched/missing media are routine in an
            # ingest pipeline) yield NULL metadata rather than a
            # task-killing TypeError
            metas = [
                _meta(p) if p is not None else (None, None)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(
                        [len(p) if p is not None else None for p in pdf["payload"]],
                        dtype="object",
                    ),
                    "payload_md5": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "width": pd.Series([m[0] for m in metas], dtype="object"),
                    "height": pd.Series([m[1] for m in metas], dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode, MEDIA_META_SCHEMA)


def decode_media_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    """Oracle for the fake decode path: pure byte arithmetic on the same
    payload (UTF-8 bytes of text)."""
    n = f"octet_length(encode({text_col}))"
    return f"""
    SELECT {id_col} AS doc_id,
           CAST({n} AS BIGINT) AS n_bytes,
           md5({text_col}) AS payload_md5,
           CAST({n} % 640 + 16 AS BIGINT) AS width,
           CAST(({n} * 7) % 480 + 16 AS BIGINT) AS height
    FROM {table}
    """


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_sig", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, id_col: str = "doc_id", stride: int = FRAME_BYTES) -> DataFrame:
    """Frame sampling for "video" payloads: one output row per
    ``stride``-byte frame, with a deterministic per-frame signature
    (md5 of the frame's byte slice). Row-explosion happens inside the
    Pandas batch — output rows per input row = ceil(n_bytes/stride), so
    task output size stays proportional to payload size (no skew
    amplification)."""

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    continue  # no frames from missing media
                n = len(payload)
                n_frames = max((n + stride - 1) // stride, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    sigs.append(
                        hashlib.md5(payload[i * stride : (i + 1) * stride]).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int64"),
                 "frame_sig": pd.Series(sigs, dtype="object")}
            )

    return df.select(id_col, "payload").mapInPandas(explode_frames, FRAMES_SCHEMA)


def sample_frames_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    stride: int = FRAME_BYTES,
) -> str:
    """Oracle: same frame slicing via substring on the UTF-8 payload.

    The testdata text is ASCII, so character substring == byte slice;
    md5 of the substring equals md5 of the byte slice."""
    n = f"octet_length(encode({text_col}))"
    return f"""
    SELECT {id_col} AS doc_id,
           CAST(i AS BIGINT) AS frame_idx,
           md5(substring({text_col}, i * {stride} + 1, {stride})) AS frame_sig
    FROM {table},
         LATERAL (SELECT unnest(range(0, greatest(CAST(ceil({n} / {stride}.0) AS BIGINT), 1))) AS i)
    """


def _png_container(width: int, height: int, body: bytes) -> bytes:
    """A structurally REAL PNG container (signature + IHDR with correct
    CRC + IDAT-shaped body + IEND) around an arbitrary byte body. The
    header round-trips through :func:`parse_image_header` (and any other
    header reader); only the pixel stream is a stand-in when PIL is
    absent."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize image payloads to ``width × height`` via Arrow-batched
    ``mapInPandas`` — the thumbnail/normalize stage of a multimodal
    training pipeline. With PIL importable this is a real decode →
    LANCZOS resize → PNG encode; without it, each output is a
    deterministic PNG container at the target dims whose body derives
    from the source bytes (md5-seeded), clearly a stand-in for the pixel
    stream — the Spark plumbing (schema, batch shape, no shuffle,
    payload-column pruning) is identical and is what the tests verify.
    Output payloads round-trip through :func:`decode_media` /
    :func:`parse_image_header` at the target dims either way."""
    use_pil = _try_pil()

    def _resize(p: bytes) -> bytes:
        if use_pil:
            try:
                import io

                import PIL.Image

                with PIL.Image.open(io.BytesIO(p)) as im:
                    out = io.BytesIO()
                    im.convert("RGB").resize(
                        (width, height), PIL.Image.LANCZOS
                    ).save(out, format="PNG")
                    return out.getvalue()
            except Exception:
                pass
        seed = hashlib.md5(p).digest()
        return _png_container(width, height, seed * 4)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _resize(p) if p is not None else None for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "width": pd.Series(
                        [width if p is not None else None for p in payloads],
                        dtype="object",
                    ),
                    "height": pd.Series(
                        [height if p is not None else None for p in payloads],
                        dtype="object",
                    ),
                    "n_bytes": pd.Series(
                        [len(p) if p is not None else None for p in payloads],
                        dtype="object",
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual-hash media dedup (round 15)
# ---------------------------------------------------------------------------

DHASH_ROWS, DHASH_COLS = 8, 9  # 8x9 brightness grid -> 64 dHash bits
_GRID_CELLS = DHASH_ROWS * DHASH_COLS

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _fallback_grid(p: bytes) -> list:
    """Deterministic stand-in for the decoded 8x9 brightness grid when
    PIL is absent: cell k = the integer mean byte of the k-th of 72
    equal byte segments (0 for empty segments). A REAL reduced image
    responds the same way a mean-pooled grayscale does — small payload
    edits perturb only the touched cells, so near-identical payloads
    land within small Hamming distance (unlike an md5-derived grid,
    which would scramble on any edit)."""
    n = len(p)
    g = []
    for k in range(_GRID_CELLS):
        lo = (k * n) // _GRID_CELLS
        hi = ((k + 1) * n) // _GRID_CELLS
        g.append(sum(p[lo:hi]) // (hi - lo) if hi > lo else 0)
    return g


def _grid_dhash(g: list) -> int:
    """difference hash over an 8x9 grid: bit (r*8+c) set iff
    g[r][c] < g[r][c+1] (Krawetz's dHash, gradient direction per
    adjacent-column pair). Returned as SIGNED int64 (Spark LongType)."""
    h = 0
    for r in range(DHASH_ROWS):
        for c in range(DHASH_COLS - 1):
            if g[r * DHASH_COLS + c] < g[r * DHASH_COLS + c + 1]:
                h |= 1 << (r * (DHASH_COLS - 1) + c)
    return h - (1 << 64) if h >= (1 << 63) else h


def dhash64(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit perceptual difference hash (dHash) per media payload —
    the fingerprint stage of multimodal dedup (reference has no media
    operators; this extends the pipeline surface like pHash dedup in
    web-scale curation, e.g. LAION's URL+pHash dedup).

    With PIL importable: real decode -> grayscale -> 9x8 LANCZOS
    reduce -> adjacent-column gradient bits. Without it: the
    deterministic mean-byte grid of :func:`_fallback_grid` (the
    established decode_media dispatch), which the DuckDB oracle
    replays byte-for-byte. NULL payloads hash to 0 (the empty-payload
    hash) so they cluster together rather than erroring.

    Single-scan ``mapInPandas`` projection, zero shuffle — at 100 TB
    each task hashes only its input split."""
    use_pil = _try_pil()

    def _hash(p: bytes) -> int:
        if use_pil:
            try:
                import io

                import PIL.Image

                with PIL.Image.open(io.BytesIO(p)) as im:
                    small = im.convert("L").resize(
                        (DHASH_COLS, DHASH_ROWS), PIL.Image.LANCZOS
                    )
                    px = list(small.getdata())
                    return _grid_dhash(px)
            except Exception:
                pass
        return _grid_dhash(_fallback_grid(p))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "dhash": pd.Series(
                        [
                            _hash(p) if p is not None else 0
                            for p in pdf["payload"]
                        ],
                        dtype="int64",
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, DHASH_SCHEMA)


def dhash64_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle replaying the FALLBACK dHash arithmetic on the
    same payload bytes (UTF-8 of ``text_col``; testdata is ASCII so
    char codes == bytes, the ``sample_frames_sql`` convention). The
    unsigned 64-bit sum is built in HUGEINT and folded to signed
    int64 exactly like the Python ``h - 2**64`` fold."""
    cells = _GRID_CELLS
    return f"""
    WITH codes AS (
      SELECT {id_col},
             coalesce(length({text_col}), 0) AS n,
             list_transform(
               range(1, coalesce(length({text_col}), 0) + 1),
               i -> ascii(substring({text_col}, CAST(i AS INT), 1))
             ) AS cs
      FROM {table}
    ),
    grid AS (
      SELECT {id_col}, k,
             CASE WHEN ((k + 1) * n) // {cells} > (k * n) // {cells}
                  THEN list_sum(cs[(k * n) // {cells} + 1 : ((k + 1) * n) // {cells}])
                       // (((k + 1) * n) // {cells} - (k * n) // {cells})
                  ELSE 0 END AS g
      FROM codes, (SELECT unnest(range(0, {cells})) AS k)
    ),
    sums AS (
      SELECT a.{id_col},
             sum(CASE WHEN a.g < b.g
                      THEN CAST(1 AS HUGEINT) << (a.k - a.k // {DHASH_COLS})
                      ELSE CAST(0 AS HUGEINT) END) AS h
      FROM grid a
      JOIN grid b ON b.{id_col} = a.{id_col} AND b.k = a.k + 1
                 AND a.k % {DHASH_COLS} < {DHASH_COLS - 1}
      GROUP BY 1
    )
    SELECT {id_col},
           CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
                     THEN h - CAST(18446744073709551616 AS HUGEINT)
                     ELSE h END AS BIGINT) AS dhash
    FROM sums
    """


def _banded_pairs(
    fp: DataFrame, id_col: str, max_hamming: int, max_bucket: int = 128
) -> DataFrame:
    """Hamming<=k pairs over a (id, dhash) frame via pigeonhole banding
    with recursive re-banding of oversized buckets — the shared
    :func:`..dedup.banded_hamming_pairs` discipline: band count derived
    from the radius (complete for ANY ``max_hamming``, not just 3), and
    buckets past ``max_bucket`` re-bucket on sub-bands of their residual
    bits so candidate volume stays ~linear past 1e7 distinct
    fingerprints (the round-15 scale ceiling)."""
    from .dedup import banded_hamming_pairs

    return banded_hamming_pairs(
        fp,
        id_col,
        "dhash",
        64,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def media_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate media pairs at Hamming(dhash) <= ``max_hamming``
    — the full pair enumeration. On exact-duplicate-heavy corpora the
    output itself is quadratic in the duplicate-group size (k identical
    payloads = k(k-1)/2 pairs); when you only need KEEPERS, use
    :func:`media_dedup`, which collapses identical hashes first and
    stays linear in the corpus."""
    return _banded_pairs(dhash64(df, id_col), id_col, max_hamming)


def media_dup_pairs_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> str:
    """Oracle: one-level pigeonhole banding + verification over the
    replayed hashes — the band count is derived from the radius
    (``max_hamming + 1``), matching the Spark side's completeness for
    any radius; the final pair set is the exact Hamming closure either
    way, so the oracle need not replay the recursive bucket splits.
    DuckDB ``>>`` on BIGINT is arithmetic like Spark's shiftright; the
    mask extracts the same bits either way."""
    n_bands = max_hamming + 1
    width = -(-64 // n_bands)
    mask = (1 << width) - 1 if width < 63 else None
    key = (
        f"(dhash >> ({width} * b)) & {mask}" if mask is not None else "dhash"
    )
    fp = dhash64_sql(table, text_col, id_col)
    return f"""
    WITH fp AS ({fp}),
    bands AS (
      SELECT {id_col}, dhash, b AS band, {key} AS key
      FROM fp, (SELECT unnest(range(0, {n_bands})) AS b)
    )
    SELECT DISTINCT x.{id_col} AS id_a, y.{id_col} AS id_b,
           bit_count(xor(x.dhash, y.dhash)) AS hamming
    FROM bands x
    JOIN bands y ON y.band = x.band AND y.key = x.key
                AND x.{id_col} < y.{id_col}
    WHERE bit_count(xor(x.dhash, y.dhash)) <= {max_hamming}
    """


def media_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shuffle_partitions: int = 8,
) -> DataFrame:
    """Keep-first perceptual dedup: near-dup pairs -> connected
    components (min-id label) -> keep exactly the component minimum.
    Output: one row per input payload ``(id, dhash, keep)``.

    Scale shape: identical hashes are collapsed FIRST (one map-combined
    groupBy: representative = min id per hash) — a web corpus is
    dominated by exact re-uploads, and banding k identical payloads
    would enumerate k(k-1)/2 pairs inside one bucket. The banded
    self-join and the connected components (alternating large-star /
    small-star, O(log n) shuffle rounds) then run over DISTINCT hashes
    only; members rejoin through their hash. The component minimum over
    representatives IS the global minimum (each rep is already its
    hash-group minimum), so the collapse is semantics-preserving —
    the gate oracle computes the uncollapsed transitive closure and
    hashes equal."""
    from .dedup import dup_clusters

    # the fingerprint pass (Python mapInPandas over every payload) is
    # by far the most expensive stage — pin it: it feeds the rep
    # groupBy AND the final member join, and recomputing it doubles
    # the corpus scans. fp is (id, hash) — 16 bytes/row at any corpus
    # size. localCheckpoint, not cache: the blocks are freed by the
    # ContextCleaner when the caller drops the result (a cache() here
    # pins the CacheManager entry forever — the round-15 hygiene leak).
    fp = dhash64(df, id_col).localCheckpoint(eager=False)
    reps = fp.groupBy("dhash").agg(F.min(id_col).alias("_rep"))
    rep_fp = reps.select(F.col("_rep").alias(id_col), "dhash")
    pairs = _banded_pairs(rep_fp, id_col, max_hamming)
    # the component rounds shuffle the (small) distinct-hash edge set —
    # corpus-sized partition counts pay per-round scheduling for empty
    # partitions (the q_dedup_clusters discipline)
    clusters = dup_clusters(pairs, shuffle_partitions=shuffle_partitions)
    labels = (
        reps.join(
            clusters.withColumnRenamed("member", "_rep"), "_rep", "left"
        ).select(
            "dhash", F.coalesce("cluster_id", F.col("_rep")).alias("_cl")
        )
    )
    return fp.join(labels, "dhash", "left").select(
        id_col,
        "dhash",
        (F.col(id_col) == F.col("_cl")).alias("keep"),
    )


def media_dedup_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> str:
    from .dedup import dup_clusters_sql

    pairs = media_dup_pairs_sql(table, text_col, id_col, max_hamming)
    clusters = dup_clusters_sql(pairs)
    fp = dhash64_sql(table, text_col, id_col)
    return f"""
    WITH fp AS ({fp}),
    clusters AS ({clusters})
    SELECT fp.{id_col}, fp.dhash,
           (clusters.cluster_id IS NULL
            OR clusters.cluster_id = fp.{id_col}) AS keep
    FROM fp LEFT JOIN clusters ON clusters.member = fp.{id_col}
    """


AHASH_CELLS = 64  # 8x8 grid

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def _fallback_grid_n(p: bytes, cells: int) -> list:
    """Mean-byte grid over ``cells`` equal byte segments (the
    :func:`_fallback_grid` arithmetic at an arbitrary cell count)."""
    n = len(p)
    g = []
    for k in range(cells):
        lo = (k * n) // cells
        hi = ((k + 1) * n) // cells
        g.append(sum(p[lo:hi]) // (hi - lo) if hi > lo else 0)
    return g


def _grid_ahash(g: list) -> int:
    """average hash over a 64-cell grid: bit k set iff g[k] > the
    integer mean of the grid (Krawetz's aHash; integer mean keeps both
    engines on identical rational arithmetic)."""
    m = sum(g) // len(g)
    h = 0
    for k, v in enumerate(g):
        if v > m:
            h |= 1 << k
    return h - (1 << 64) if h >= (1 << 63) else h


def ahash64(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit average hash (aHash) per media payload — the companion
    fingerprint to :func:`dhash64` (aHash keys on absolute brightness
    vs the mean, dHash on gradients; running both and intersecting
    candidates cuts false positives). Same dispatch: PIL decode ->
    grayscale -> 8x8 reduce when importable, deterministic mean-byte
    grid otherwise. Single-scan mapInPandas, zero shuffle."""
    use_pil = _try_pil()

    def _hash(p: bytes) -> int:
        if use_pil:
            try:
                import io

                import PIL.Image

                with PIL.Image.open(io.BytesIO(p)) as im:
                    small = im.convert("L").resize(
                        (8, 8), PIL.Image.LANCZOS
                    )
                    return _grid_ahash(list(small.getdata()))
            except Exception:
                pass
        return _grid_ahash(_fallback_grid_n(p, AHASH_CELLS))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "ahash": pd.Series(
                        [
                            _hash(p) if p is not None else 0
                            for p in pdf["payload"]
                        ],
                        dtype="int64",
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, AHASH_SCHEMA)


def ahash64_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle for the fallback aHash (same conventions as
    :func:`dhash64_sql`; integer grid mean -> identical thresholds)."""
    cells = AHASH_CELLS
    return f"""
    WITH codes AS (
      SELECT {id_col},
             coalesce(length({text_col}), 0) AS n,
             list_transform(
               range(1, coalesce(length({text_col}), 0) + 1),
               i -> ascii(substring({text_col}, CAST(i AS INT), 1))
             ) AS cs
      FROM {table}
    ),
    grid AS (
      SELECT {id_col}, k,
             CASE WHEN ((k + 1) * n) // {cells} > (k * n) // {cells}
                  THEN list_sum(cs[(k * n) // {cells} + 1 : ((k + 1) * n) // {cells}])
                       // (((k + 1) * n) // {cells} - (k * n) // {cells})
                  ELSE 0 END AS g
      FROM codes, (SELECT unnest(range(0, {cells})) AS k)
    ),
    means AS (
      SELECT {id_col}, sum(g) // {cells} AS m FROM grid GROUP BY 1
    ),
    sums AS (
      SELECT grid.{id_col},
             sum(CASE WHEN grid.g > means.m
                      THEN CAST(1 AS HUGEINT) << grid.k
                      ELSE CAST(0 AS HUGEINT) END) AS h
      FROM grid JOIN means ON means.{id_col} = grid.{id_col}
      GROUP BY 1
    )
    SELECT {id_col},
           CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
                     THEN h - CAST(18446744073709551616 AS HUGEINT)
                     ELSE h END AS BIGINT) AS ahash
    FROM sums
    """
