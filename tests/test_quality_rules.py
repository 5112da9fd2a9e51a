"""Gopher doc-level quality rules + RefinedWeb line-wise filter
(pipeline/textproc.py, round 15)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.textproc import (
    gopher_quality,
    gopher_quality_sql,
    line_filter,
    line_filter_sql,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs to the barn "
    "with great speed. It is said that every good sentence must have "
    "some of the usual English words, and this one tries to be of use "
    "for that purpose with plenty of plain text to pass the bounds."
)


def _gq(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    gq = gopher_quality("text")
    return {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id", *[gq[k].alias(k) for k in gq]
        ).collect()
    }


def test_gopher_rules(spark):
    rows = [
        (1, GOOD),                                  # passes everything
        (2, "too short"),                           # < 50 words
        (3, "# " * 60),                             # symbol ratio + no stops
        (4, ("WORD " * 60).strip()),                # no required stopwords
        (5, "- bullet line\n" * 60),                # bullet_line_frac > 0.9
    ]
    got = _gq(spark, rows)
    assert got[1]["passes"] is True
    assert got[2]["passes"] is False and got[2]["n_words"] == 2
    assert got[3]["passes"] is False
    assert got[4]["passes"] is False and got[4]["n_required_stop"] == 0
    assert got[5]["passes"] is False
    assert got[1]["n_required_stop"] >= 2
    assert 3.0 <= got[1]["mean_word_len"] <= 10.0


def test_gopher_matches_duckdb(spark):
    rows = [(i, t) for i, t in enumerate([GOOD, "short", "# # # ...", ""])]
    got = _gq(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    gq = gopher_quality_sql("text")
    sel = ", ".join(f"{v} AS {k}" for k, v in gq.items())
    for r in con.execute(f"SELECT doc_id, {sel} FROM t").fetchall():
        d = dict(zip(["doc_id", *gq.keys()], r))
        for k in gq:
            a, b = got[d["doc_id"]][k], d[k]
            if isinstance(a, float) and a is not None and b is not None:
                assert abs(a - b) < 1e-12, (d["doc_id"], k, a, b)
            else:
                assert a == b, (d["doc_id"], k, a, b)


def test_line_filter_rules(spark):
    text = "\n".join(
        [
            "A perfectly normal line of prose.",
            "42 likes",                      # counter -> dropped
            "1,234",                         # numeric-only -> dropped
            "THIS LINE IS ALL SHOUTING",     # uppercase-dominated -> dropped
            "Mixed Case Is Fine Here.",
            "VAT 19%",                       # short alpha (<10) -> kept
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    lf = line_filter("text")
    r = df.select(*[lf[k].alias(k) for k in lf]).collect()[0]
    kept = r["filtered"].split("\n")
    assert kept == [
        "A perfectly normal line of prose.",
        "Mixed Case Is Fine Here.",
        "VAT 19%",
    ]
    assert r["n_lines_removed"] == 3
    assert r["keep"] is True  # removed chars < half

    # a doc that is mostly counters gets dropped entirely
    spam = "\n".join(["9 likes", "8 comments", "7 shares", "ok"])
    df2 = spark.createDataFrame([(2, spam)], "doc_id bigint, text string")
    r2 = df2.select(*[lf[k].alias(k) for k in lf]).collect()[0]
    assert r2["keep"] is False


def test_line_filter_matches_duckdb(spark):
    rows = [
        (1, "Normal line.\n42 likes\nKEEP THIS? NO ALL CAPS LINE\nok"),
        (2, ""),
        (3, "only 123 456\n789"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    lf = line_filter("text")
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id", *[lf[k].alias(k) for k in lf]
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = line_filter_sql("text")
    sel = ", ".join(f"{v} AS {k}" for k, v in sql.items())
    for r in con.execute(f"SELECT doc_id, {sel} FROM t").fetchall():
        d = dict(zip(["doc_id", *sql.keys()], r))
        for k in sql:
            a, b = got[d["doc_id"]][k], d[k]
            if isinstance(a, float):
                assert abs(a - b) < 1e-12, (d["doc_id"], k, a, b)
            else:
                assert a == b, (d["doc_id"], k, a, b)


def test_gates_match_oracle(spark, duck, sf_dir):
    from timescaledb_spark import queries as Q

    qs, oracles = Q.queries(), Q.oracle_sql()
    for name in ("q_gopher_quality", "q_line_filter"):
        df = qs[name](spark, sf_dir)
        cols = sorted(df.columns)
        got = {
            tuple(
                round(v, 10) if isinstance(v, float) else v
                for v in (r[c] for c in cols)
            )
            for r in df.collect()
        }
        res = duck.execute(oracles[name])
        names = [d[0] for d in res.description]
        want = {
            tuple(
                round(d[c], 10) if isinstance(d[c], float) else d[c]
                for c in cols
            )
            for d in (dict(zip(names, row)) for row in res.fetchall())
        }
        assert got == want and got, name
