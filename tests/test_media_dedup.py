"""Perceptual-hash (dHash) media dedup — pipeline/multimodal.py r15.

The reference has no media operators; this is the multimodal leg of the
LLM-data-pipeline surface (LAION-style pHash dedup). Tests cover the
grid/dHash arithmetic, the banding pigeonhole guarantee, NULL payloads,
keep-first cluster resolution, and the PIL path when importable.
"""

import random

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.multimodal import (
    DHASH_COLS,
    DHASH_ROWS,
    _fallback_grid,
    _grid_dhash,
    _try_pil,
    dhash64,
    media_dedup,
    media_dup_pairs,
    with_payload,
)


def test_grid_dhash_reference_values():
    # hand-checked tiny grids: strictly increasing grid -> all 64 bits
    # set -> signed int64 -1
    inc = list(range(DHASH_ROWS * DHASH_COLS))
    assert _grid_dhash(inc) == -1
    # constant grid -> no gradient -> 0
    assert _grid_dhash([7] * (DHASH_ROWS * DHASH_COLS)) == 0
    # g = [0,5,0,...]: g[0]<g[1] sets bit 0; g[1]<g[2] is 5<0 -> False
    g = [0] * (DHASH_ROWS * DHASH_COLS)
    g[1] = 5
    assert _grid_dhash(g) == 1


def test_fallback_grid_locality():
    # a small edit perturbs only nearby cells -> small Hamming distance
    base = ("the quick brown fox jumps over the lazy dog " * 40).encode()
    edited = bytearray(base)
    edited[3] = ord("Q")
    h1 = _grid_dhash(_fallback_grid(bytes(base)))
    h2 = _grid_dhash(_fallback_grid(bytes(edited)))
    assert bin(h1 ^ h2).count("1") <= 3
    # a completely different payload is far away
    other = bytes(random.Random(7).randrange(32, 127) for _ in range(len(base)))
    h3 = _grid_dhash(_fallback_grid(other))
    assert bin(h1 ^ h3).count("1") > 3


def test_banding_pigeonhole_property():
    # any pair within Hamming<=3 shares at least one exact 16-bit band
    rnd = random.Random(42)
    for _ in range(200):
        a = rnd.getrandbits(64)
        b = a
        for _ in range(rnd.randint(0, 3)):
            b ^= 1 << rnd.randrange(64)
        shared = any(
            ((a >> (16 * k)) & 0xFFFF) == ((b >> (16 * k)) & 0xFFFF)
            for k in range(4)
        )
        assert shared


def test_dhash64_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, b"hello world"), (2, None), (3, b"")],
        "doc_id bigint, payload binary",
    )
    got = {r["doc_id"]: r["dhash"] for r in dhash64(df).collect()}
    assert got[2] == 0 and got[3] == 0  # NULL and empty hash alike
    assert got[1] != 0


def test_media_dedup_keep_first_clusters(spark):
    base = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 20
    rows = [
        (1, base),
        (5, base),            # exact dup of 1
        (9, base[:-1] + "X"), # near dup (tail edit)
        (20, "a completely different document body " * 30),
    ]
    df = with_payload(
        spark.createDataFrame(rows, "doc_id bigint, text string")
    )
    pairs = media_dup_pairs(df)
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 5) in got_pairs
    assert all(p[0] < p[1] for p in got_pairs)
    ded = {r["doc_id"]: r["keep"] for r in media_dedup(df).collect()}
    assert ded[1] is True          # component minimum survives
    assert ded[5] is False
    assert ded[20] is True         # singleton untouched
    # the near copy joins the cluster iff within Hamming<=3 — either
    # way exactly one of each component survives
    comp = [k for k in (1, 5, 9) if ded[k]]
    assert comp[0] == 1


@pytest.mark.skipif(not _try_pil(), reason="PIL not importable")
def test_dhash64_pil_real_images(spark):
    import io

    import PIL.Image

    def png(px_fn):
        im = PIL.Image.new("L", (64, 64))
        im.putdata([px_fn(i) for i in range(64 * 64)])
        out = io.BytesIO()
        im.save(out, format="PNG")
        return out.getvalue()

    grad = png(lambda i: (i % 64) * 4)        # horizontal gradient
    grad2 = png(lambda i: min(255, (i % 64) * 4 + 1))  # near-identical
    noise = png(lambda i: (i * 2654435761) % 256)
    df = spark.createDataFrame(
        [(1, grad), (2, grad2), (3, noise)], "doc_id bigint, payload binary"
    )
    got = {r["doc_id"]: r["dhash"] for r in dhash64(df).collect()}
    assert bin(got[1] ^ got[2]).count("1") <= 3
    assert bin(got[1] ^ got[3]).count("1") > 3


def test_gate_matches_oracle(spark, duck, sf_dir):
    from timescaledb_spark import queries as Q

    qs, oracles = Q.queries(), Q.oracle_sql()
    df = qs["q_media_dedup"](spark, sf_dir)
    got = {(r["doc_id"], r["dhash"], r["keep"]) for r in df.collect()}
    want = {tuple(r) for r in duck.execute(oracles["q_media_dedup"]).fetchall()}
    assert got == want
    assert any(not k for _, _, k in got)  # injected duplicates are caught


def test_ahash_reference_values(spark):
    from timescaledb_spark.pipeline.multimodal import (
        _fallback_grid_n,
        _grid_ahash,
        ahash64,
    )

    # constant grid: nothing exceeds the mean -> 0
    assert _grid_ahash([9] * 64) == 0
    # one hot cell: only it exceeds the integer mean
    g = [0] * 64
    g[5] = 200
    assert _grid_ahash(g) == 1 << 5
    # all-but-one hot: mean pulls below the hot cells -> 63 bits set
    g2 = [200] * 64
    g2[0] = 0
    h = _grid_ahash(g2)
    assert bin(h & ((1 << 64) - 1)).count("1") == 63
    # engine path: NULL/empty payloads hash to 0
    df = spark.createDataFrame(
        [(1, b"some payload bytes here"), (2, None), (3, b"")],
        "doc_id bigint, payload binary",
    )
    got = {r["doc_id"]: r["ahash"] for r in ahash64(df).collect()}
    assert got[2] == 0 and got[3] == 0 and got[1] != 0
    # fallback grid at 64 cells matches the generic helper
    assert _fallback_grid_n(b"abcdef" * 30, 64)


def test_ahash_gate_matches_oracle(spark, duck, sf_dir):
    from timescaledb_spark import queries as Q

    qs, oracles = Q.queries(), Q.oracle_sql()
    got = {tuple(r) for r in qs["q_media_ahash"](spark, sf_dir).collect()}
    want = {
        tuple(r) for r in duck.execute(oracles["q_media_ahash"]).fetchall()
    }
    assert got == want and got
