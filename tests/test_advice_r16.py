"""Round-16 ADVICE regressions.

1. Hamming banding completeness must hold for ANY radius: the band
   count is derived as ``max_hamming + 1`` (a fixed 4-band layout is
   silently incomplete at radius >= 4 — pigeonhole only covers 3
   differing bits over 4 bands).
2. ``registrable_domain`` must apply the "host IS a public suffix ->
   NULL" rule BEFORE the multi-label tail patterns: with a nested-suffix
   PSL (k12.ma.us and pvt.k12.ma.us) a host equal to the longer suffix
   otherwise matches the shorter suffix's tail pattern.
3. ``curate_corpus`` must not report NULL-text documents as 'kept':
   NULL stage flags skipped every verdict WHEN branch even though the
   survivor chain had already dropped the doc.
4. ``shard_assign`` with a dict ``n_shards`` must raise on a split
   outside the dict's key set instead of silently falling back to
   ``pmod(key, min(n_shards))`` and mis-sharding the whole split.

Plus the round-16 scale fix the advice motivated: recursive re-banding
of oversized buckets keeps the candidate set complete while bounding
bucket sizes (verified against brute force with max_bucket=1).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from timescaledb_spark.pipeline.dedup import banded_hamming_pairs
from timescaledb_spark.pipeline.urlfilter import (
    registrable_domain,
    registrable_domain_sql,
)


def _brute_pairs(hashes, k):
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= k:
                out.add((a, b))
    return out


def _spark_pairs(spark, hashes, k, **kw):
    fp = spark.createDataFrame(
        [(i, h) for i, h in hashes.items()], "doc_id bigint, h bigint"
    )
    got = banded_hamming_pairs(fp, "doc_id", "h", 64, max_hamming=k, **kw)
    return {(r["id_a"], r["id_b"]) for r in got.collect()}


def test_radius_above_three_is_complete(spark):
    """One flipped bit in EACH of the old fixed 4x16 bands: no band
    agrees, so the old layout missed the pair; 5 bands (radius+1) must
    find it."""
    base = 0x0123456789ABCDEF
    h4 = base ^ (1 << 3) ^ (1 << 19) ^ (1 << 35) ^ (1 << 51)
    hashes = {1: base, 2: h4, 3: base ^ 0b11111}  # id 3: 5 bits away
    got = _spark_pairs(spark, hashes, 4)
    assert got == _brute_pairs(hashes, 4) == {(1, 2)}


def test_radius_zero_and_three_match_brute_force(spark):
    import random

    rnd = random.Random(16)
    hashes = {}
    for i in range(40):
        if i % 3 == 0 or i == 0:
            h = rnd.getrandbits(63)
        else:  # perturb an earlier hash by 0-5 bits
            h = hashes[rnd.randrange(i)]
            for _ in range(rnd.randrange(6)):
                h ^= 1 << rnd.randrange(64)
        hashes[i] = h - (1 << 64) if h >= (1 << 63) else h
    for k in (0, 3):
        assert _spark_pairs(spark, hashes, k) == _brute_pairs(hashes, k)


def test_recursive_rebanding_matches_unbounded(spark):
    """max_bucket=1 forces every non-trivial bucket through the
    recursive split path; the output must still be the exact Hamming
    closure (including identical fingerprints, which no split can
    separate — the last level joins them regardless)."""
    import random

    rnd = random.Random(7)
    hashes = {}
    for i in range(30):
        if i < 6:
            hashes[i] = 0x00FF00FF00FF00F0 | i % 2  # clusters of equals
        else:
            h = hashes[rnd.randrange(i)] ^ (1 << rnd.randrange(64))
            hashes[i] = h
    got = _spark_pairs(spark, hashes, 2, max_bucket=1, max_levels=3)
    assert got == _brute_pairs(hashes, 2)


NESTED_PSL = ("us", "k12.ma.us", "pvt.k12.ma.us", "com")


def test_nested_suffix_null_rule_first(spark, duck):
    cases = [
        ("pvt.k12.ma.us", None),        # IS the longer suffix -> NULL
        ("k12.ma.us", None),            # IS the shorter suffix -> NULL
        ("x.pvt.k12.ma.us", "x.pvt.k12.ma.us"),
        ("school.k12.ma.us", "school.k12.ma.us"),
        ("a.school.k12.ma.us", "school.k12.ma.us"),
        ("boston.ma.us", "ma.us"),      # PSL default rule under 'us'
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = df.select(
        "h", registrable_domain("h", NESTED_PSL).alias("d")
    ).collect()
    spark_map = {r["h"]: r["d"] for r in got}
    sql = registrable_domain_sql("h", NESTED_PSL)
    hosts = ", ".join(f"('{h}')" for h, _ in cases)
    duck_rows = duck.execute(
        f"SELECT h, {sql} AS d FROM (VALUES {hosts}) t(h)"
    ).fetchall()
    duck_map = dict(duck_rows)
    for h, want in cases:
        assert spark_map[h] == want, (h, spark_map[h], want)
        assert duck_map[h] == want, (h, duck_map[h], want)


def test_curate_null_text_not_kept(spark, duck):
    from timescaledb_spark.pipeline.curate import (
        curate_corpus,
        curate_corpus_sql,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away "
            "because it must keep moving to stay warm in the winter"),
        (2, None),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["verdict"]
        for r in curate_corpus(df, min_required_stops=0).collect()
    }
    assert got[2] != "kept" and got[3] != "kept"
    # NULL text carries the FIRST stage's drop verdict; empty (non-NULL)
    # text legitimately passes line_filter and fails the Gopher rules
    assert got[2] == "line_filter" and got[3] == "gopher_quality"
    duck.execute(
        "CREATE OR REPLACE TEMP TABLE _adv16 (doc_id BIGINT, text VARCHAR)"
    )
    duck.executemany("INSERT INTO _adv16 VALUES (?, ?)", rows)
    oracle = {
        r[0]: r[1]
        for r in duck.execute(
            curate_corpus_sql(table="_adv16", min_required_stops=0)
        ).fetchall()
    }
    assert oracle == got
    duck.execute("DROP TABLE _adv16")


def test_shard_assign_rejects_unknown_split(spark):
    from timescaledb_spark.pipeline.export import shard_assign, shard_assign_sql

    # static domain (weights keys) validated eagerly
    with pytest.raises(ValueError, match="no n_shards entry"):
        shard_assign(
            spark.range(10).withColumnRenamed("id", "doc_id"),
            n_shards={"train": 4},
            weights={"train": 0.9, "val": 0.1},
        )
    with pytest.raises(ValueError, match="no n_shards entry"):
        shard_assign_sql(
            n_shards={"train": 4}, weights={"train": 0.9, "val": 0.1}
        )
    # runtime domain (pre-existing split column): unknown split must
    # abort the job, not silently fall back
    df = spark.createDataFrame(
        [(1, "train"), (2, "oops")], "doc_id bigint, split string"
    )
    out = shard_assign(df, n_shards={"train": 4})
    with pytest.raises(Exception, match="split not in n_shards"):
        out.collect()
    # matching domains still assign deterministically
    ok = shard_assign(
        df.filter("split = 'train'"), n_shards={"train": 4}
    ).collect()
    assert all(0 <= r["shard"] < 4 for r in ok)
