"""URL/domain curation filter — pipeline/urlfilter.py (round 15).

RefinedWeb/C4-style web-pipeline stage: host extraction, eTLD+1 under a
public-suffix subset (incl. the PSL default rule), blocklist/allowlist,
deterministic per-domain caps. No reference analog (SURVEY pipeline
surface)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.urlfilter import (
    domain_filter,
    host_of,
    registrable_domain,
    synth_url,
)

CASES = [
    # url, host, registrable domain
    ("https://example.com/p/1", "example.com", "example.com"),
    ("http://www.example.com:8080/a?q=1", "www.example.com", "example.com"),
    ("https://News.Example.COM/x", "news.example.com", "example.com"),
    ("http://a.b.example.co.uk/deep/path", "a.b.example.co.uk", "example.co.uk"),
    ("https://user:pw@cdn.spam.net/y#f", "cdn.spam.net", "spam.net"),
    ("http://user1.github.io/", "user1.github.io", "user1.github.io"),
    ("https://weird.internal/z", "weird.internal", "weird.internal"),  # PSL *
    ("http://com/p", "com", None),        # bare public suffix
    ("https://localhost/p", "localhost", None),  # single unknown label
    ("http://example.com./p", "example.com", "example.com"),  # root dot
    ("not a url at all", "", None),
]


def test_host_and_domain_extraction(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "i bigint, url string"
    )
    got = (
        df.select(
            "i",
            host_of("url").alias("h"),
            registrable_domain(host_of("url")).alias("d"),
        )
        .orderBy("i")
        .collect()
    )
    for r, (_, h, d) in zip(got, CASES):
        assert r["h"] == h, (r["i"], r["h"], h)
        assert r["d"] == d, (r["i"], r["d"], d)


def test_block_allow_and_cap(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id bigint"
    ).select("doc_id", synth_url("doc_id").alias("url"))
    out = domain_filter(df, block=["spam.net"]).collect()
    assert out and all(r["domain"] not in (None, "spam.net") for r in out)
    # DataFrame blocklist path (broadcast anti join) gives the same set
    bl = spark.createDataFrame([("spam.net",)], "domain string")
    out2 = domain_filter(df, block=bl).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in out2}
    # allowlist keeps only the listed domains
    al = domain_filter(df, allow=["example.com"]).collect()
    assert al and all(r["domain"] == "example.com" for r in al)
    # cap: at most N per domain, deterministic across runs
    capped = domain_filter(df, block=["spam.net"], cap_per_domain=5)
    counts = (
        capped.groupBy("domain").count().collect()
    )
    assert counts and all(r["count"] <= 5 for r in counts)
    again = domain_filter(df, block=["spam.net"], cap_per_domain=5)
    assert {r["doc_id"] for r in capped.collect()} == {
        r["doc_id"] for r in again.collect()
    }


def test_extraction_is_shuffle_free(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), synth_url("id").alias("url")
    )
    out = domain_filter(df, block=["spam.net"])  # no cap -> no window
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_gate_matches_oracle(spark, duck, sf_dir):
    from timescaledb_spark import queries as Q

    qs, oracles = Q.queries(), Q.oracle_sql()
    got = {tuple(r) for r in qs["q_domain_filter"](spark, sf_dir).collect()}
    want = {
        tuple(r) for r in duck.execute(oracles["q_domain_filter"]).fetchall()
    }
    assert got == want and got
