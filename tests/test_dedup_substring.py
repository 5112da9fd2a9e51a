"""Exact-substring dedup (round 11; Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better" — ExactSubstr via bucketed
fixed-length gram grouping, the suffix-array criterion without the
suffix array)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline import dedup
from timescaledb_spark.sources import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestSubstringDedup:
    def test_keep_first_flags_later_doc(self, spark):
        shared = "x" * 10 + "abcdefghijklmnopqrstuvwxyz" + "y" * 10
        rows = [
            (1, "AAA " + shared + " BBB"),
            (2, "CCC " + shared + " DDD"),  # later doc: flagged
            (3, "completely different text with no overlap at all ok"),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.substring_dedup(
                _docs(spark, rows), length=30
            ).collect()
        }
        assert out[1]["keep"] is True
        assert out[2]["keep"] is False
        assert out[2]["n_dup_grams"] > 0
        assert out[3]["keep"] is True

    def test_short_span_not_flagged(self, spark):
        # shared span shorter than `length` must NOT flag
        shared = "abcdefghij"  # 10 chars < 30
        rows = [
            (1, "A" * 30 + shared + "B" * 30),
            (2, "C" * 30 + shared + "D" * 30),
        ]
        out = {
            r["doc_id"]: r["keep"]
            for r in dedup.substring_dedup(
                _docs(spark, rows), length=30
            ).collect()
        }
        assert out == {1: True, 2: True}

    def test_short_and_null_docs_survive(self, spark):
        rows = [(1, "tiny"), (2, None), (3, "")]
        out = {
            r["doc_id"]: (r["n_grams"], r["keep"])
            for r in dedup.substring_dedup(
                _docs(spark, rows), length=30
            ).collect()
        }
        assert out == {1: (0, True), 2: (0, True), 3: (0, True)}

    def test_internal_repeat_not_cross_doc_flagged(self, spark):
        # a doc repeating ITS OWN span is not a cross-doc duplicate
        span = "q" * 35
        rows = [(1, span + "-middle-" + span)]
        out = dedup.substring_dedup(_docs(spark, rows), length=30).collect()
        assert out[0]["keep"] is True

    def test_stride_tail_window_covered(self, spark):
        # the final window is forced in even when stride skips past it:
        # a shared TAIL span is still detected
        tail = "z" * 30
        rows = [
            (1, "a" * 57 + tail),  # len 87, stride 10 starts: 0,10..50,57
            (2, "b" * 53 + tail),
        ]
        out = {
            r["doc_id"]: r["keep"]
            for r in dedup.substring_dedup(
                _docs(spark, rows), length=30, stride=10
            ).collect()
        }
        assert out[2] is False

    def test_oracle_parity_sf(self, spark, sf_dir, duck):
        got = {
            r["doc_id"]: (
                r["n_grams"],
                r["n_dup_grams"],
                round(r["dup_frac"], 9),
                r["keep"],
            )
            for r in dedup.substring_dedup(
                load_table(spark, sf_dir, "documents"), length=30
            ).collect()
        }
        want = {
            r[0]: (r[1], r[2], round(r[3], 9), r[4])
            for r in duck.execute(
                dedup.substring_dedup_sql(length=30)
            ).fetchall()
        }
        assert got == want
        # the synthetic corpus contains real duplicates — the gate must
        # actually exercise the flag path
        assert any(not v[3] for v in got.values())

    def test_trim_removes_exact_span(self, spark):
        shared = "0123456789" * 4  # 40 chars
        rows = [
            (1, "AAAA" + shared + "BBBB"),
            (2, "CCCC" + shared + "DDDD"),
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.substring_dedup_trim(
                _docs(spark, rows), length=30
            ).collect()
        }
        # doc 1 keeps everything (first occurrence)
        assert out[1]["clean"] == "AAAA" + shared + "BBBB"
        assert out[1]["n_spans"] == 0
        # doc 2 loses exactly the shared 40 chars
        assert out[2]["clean"] == "CCCC" + "DDDD"
        assert out[2]["n_chars_removed"] == 40
        assert out[2]["n_spans"] == 1

    def test_trim_multiple_islands_and_whole_doc(self, spark):
        a = "a" * 35
        b = "b" * 35
        rows = [
            (1, a + "-SEP-" + b),
            (2, a + "=====" + b),  # two separate islands removed
            (3, a),               # whole doc is a duplicate span
        ]
        out = {
            r["doc_id"]: r
            for r in dedup.substring_dedup_trim(
                _docs(spark, rows), length=30
            ).collect()
        }
        assert out[2]["clean"] == "====="
        assert out[2]["n_spans"] == 2
        assert out[2]["n_chars_removed"] == 70
        assert out[3]["clean"] == ""
        assert out[3]["n_chars_removed"] == 35

    def test_trim_oracle_parity_sf(self, spark, sf_dir, duck):
        got = {}
        for r in dedup.substring_dedup_trim(
            load_table(spark, sf_dir, "documents"), length=30
        ).collect():
            import hashlib

            got[r["doc_id"]] = (
                r["n_spans"],
                r["n_chars_removed"],
                len(r["clean"]),
                hashlib.md5(r["clean"].encode()).hexdigest()[:16],
            )
        want = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in duck.execute(
                dedup.substring_dedup_trim_sql(length=30)
            ).fetchall()
        }
        assert got == want
        assert any(v[0] > 0 for v in got.values())

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            dedup.substring_dedup(_docs(spark, [(1, "x")]), length=1)
        with pytest.raises(ValueError):
            dedup.substring_dedup(_docs(spark, [(1, "x")]), stride=0)
