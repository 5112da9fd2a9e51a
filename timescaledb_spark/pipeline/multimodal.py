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


def _try_real_decoder():
    try:  # pragma: no cover - decoder libs absent in this environment
        import PIL.Image  # noqa: F401

        return "pil"
    except Exception:
        return None


def _fake_meta(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in for image decode: metadata from raw bytes."""
    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    width = n % 640 + 16
    height = (n * 7) % 480 + 16
    return n, digest, width, height


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

    With a real decoder installed this would parse actual image headers;
    here the deterministic fake keeps the full pipeline testable. The
    stage is embarrassingly parallel: no shuffle, each task decodes its
    input split only."""
    decoder = _try_real_decoder()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "pil":  # pragma: no cover
                raise NotImplementedError(
                    "real image decode requires PIL at runtime; "
                    "deterministic fake is the tested path here"
                )
            metas = [_fake_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m[0] for m in metas],
                    "payload_md5": [m[1] for m in metas],
                    "width": [m[2] for m in metas],
                    "height": [m[3] for m in metas],
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
