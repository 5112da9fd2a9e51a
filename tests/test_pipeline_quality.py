"""Round-8 training-pipeline quality operators: Gopher repetition
signals, PII redaction, corpus-level line dedup, BM25 retrieval.
Corpus-scale oracle matches live in the q_text_repetition /
q_pii_redact / q_dedup_lines / q_bm25 gates; these cover the semantic
edges the gates can't isolate."""

import math

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.dedup import line_dedup
from timescaledb_spark.pipeline.search import bm25_topk
from timescaledb_spark.pipeline.textproc import redact_pii, repetition_signals


def _sig_row(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    sig = repetition_signals("text")
    return df.select(*(c.alias(k) for k, c in sig.items())).collect()[0]


def test_repetition_signals_duplicates(spark):
    r = _sig_row(spark, "aaaa\nbbbb\naaaa\ncccc")
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == pytest.approx(0.25)
    # the second "aaaa" instance carries 4 of 16 chars
    assert r["dup_line_char_frac"] == pytest.approx(4 / 16)
    assert r["dup_para_frac"] == 0.0


def test_repetition_signals_paragraphs_and_words(spark):
    r = _sig_row(spark, "para one\n\npara two\n\npara one")
    assert r["dup_para_frac"] == pytest.approx(1 / 3)
    # tokens: para one para two para one -> 3 distinct of 6
    assert r["frac_unique_words"] == pytest.approx(0.5)


def test_repetition_signals_format_lines(spark):
    r = _sig_row(spark, "- item\n* other\nplain\nto be continued...\nfin")
    assert r["bullet_line_frac"] == pytest.approx(2 / 5)
    assert r["ellipsis_line_frac"] == pytest.approx(1 / 5)


def test_repetition_signals_empty_text(spark):
    r = _sig_row(spark, "")
    assert r["n_lines"] == 1
    assert r["dup_line_frac"] == 0.0
    assert r["frac_unique_words"] == 0.0


def test_redact_pii_stages(spark):
    df = spark.createDataFrame(
        [
            (1, "write a@b.co or b.c+x@d-e.org now"),
            (2, "host 192.168.0.1 up, 999.1.2.3 still matches the regex"),
            (3, "call +4915112345678, (555) 123-4567 or 555-867-5309"),
            (4, "no pii here"),
        ],
        "id long, t string",
    )
    pii = redact_pii("t")
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            pii["n_email"].alias("ne"),
            pii["n_ip"].alias("ni"),
            pii["n_phone"].alias("np"),
            pii["redacted"].alias("red"),
        ).collect()
    }
    assert rows[1]["ne"] == 2 and "<EMAIL>" in rows[1]["red"]
    assert "@" not in rows[1]["red"]
    assert rows[2]["ni"] == 2 and rows[2]["red"].count("<IP>") == 2
    assert rows[3]["np"] == 3 and rows[3]["red"].count("<PHONE>") == 3
    assert rows[4]["red"] == "no pii here"
    assert (rows[4]["ne"], rows[4]["ni"], rows[4]["np"]) == (0, 0, 0)


def test_redact_pii_no_double_count(spark):
    """An IP already replaced by <IP> must not feed the phone stage."""
    df = spark.createDataFrame([("ip 10.0.0.7 only",)], "t string")
    pii = redact_pii("t")
    r = df.select(
        pii["n_ip"].alias("ni"), pii["n_phone"].alias("np"),
        pii["redacted"].alias("red"),
    ).collect()[0]
    assert r["ni"] == 1 and r["np"] == 0 and r["red"] == "ip <IP> only"


def test_line_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [
            (1, "unique line one\nshared long line\nx"),
            (2, "shared long line\nunique line two"),
            (3, "shared long line"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_len=10).collect()}
    # doc 1 holds the first occurrence -> keeps everything
    assert out[1]["n_kept"] == 3
    assert out[1]["clean"] == "unique line one\nshared long line\nx"
    # later occurrences of the shared line are dropped
    assert out[2]["clean"] == "unique line two"
    assert out[3]["clean"] == "" and out[3]["n_kept"] == 0
    # every doc survives as a row even when fully emptied
    assert set(out) == {1, 2, 3}


def test_line_dedup_short_lines_bypass(spark):
    df = spark.createDataFrame(
        [(1, "short\n\nshort"), (2, "short")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_len=10).collect()}
    # short lines (and blanks) always survive, including repeats
    assert out[1]["clean"] == "short\n\nshort" and out[1]["n_kept"] == 3
    assert out[2]["clean"] == "short"


def test_line_dedup_position_order_restored(spark):
    text = "\n".join(f"line number {i:04d}" for i in range(40))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = line_dedup(df, min_len=5).collect()[0]
    assert out["clean"] == text and out["n_kept"] == 40


def test_bm25_ranking_and_idf(spark):
    df = spark.createDataFrame(
        [
            (1, "cat cat cat"),
            (2, "cat dog"),
            (3, "dog dog dog dog"),
            (4, "bird"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(df, ["cat"], k=4).collect()
    ids = [r["doc_id"] for r in out]
    # highest tf first; zero-tf docs score 0 and tie-break by id
    assert ids[0] == 1 and ids[1] == 2 and ids[2:] == [3, 4]
    assert out[2]["score"] == 0.0 == out[3]["score"]
    # hand-check doc 2's score: N=4, df=2, tf=1, dl=2, avgdl=10/4
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    expect = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 2.5))
    assert out[1]["score"] == pytest.approx(expect, abs=1e-6)


def test_bm25_absent_term_and_k(spark):
    df = spark.createDataFrame(
        [(i, "word soup here") for i in range(10)],
        "doc_id long, text string",
    )
    out = bm25_topk(df, ["zebra"], k=3).collect()
    assert len(out) == 3 and all(r["score"] == 0.0 for r in out)
    assert [r["doc_id"] for r in out] == [0, 1, 2]


HOSTILE_TEXTS = [
    "",
    "\n",
    "\n\n\n",
    "a\r\nb\r\na",                      # CR kept inside lines (split is \n only)
    "café déjà-vu café\ncafé déjà-vu café",  # accents, dup long line
    "• bullet\n- dash\n* star\n· dot",
    "tab\tand  spaces   here",
    "ends with ellipsis…\nends with dots...\nno",
    "line with 'quote' and \\backslash\\ and |pipe|",
    "𝕦𝕟𝕚𝕔𝕠𝕕𝕖 𝕞𝕒𝕥𝕙 𝕤𝕪𝕞𝕓𝕠𝕝𝕤 beyond the BMP 😀😀",
    "x@y.zz then 1.2.3.4.5 then +123456789 end",
    "255.255.255.255\n0.0.0.0\n1.2.3",
    "(123) 456-7890 and (12) 456-7890 and 123-456-7890",
    "repeat me now\nrepeat me now\nrepeat me now\nshort",
]


def test_quality_ops_cross_engine_hostile(spark):
    """The repetition / PII / line-dedup formulas must agree with their
    DuckDB oracles on hostile inputs (unicode beyond the BMP, CRLF, regex
    metacharacters, boundary IPs/phones) — not just on the driver corpus."""
    import duckdb

    from .oracle import canon_rows, duck_rows, spark_rows
    from timescaledb_spark.pipeline.dedup import line_dedup_sql
    from timescaledb_spark.pipeline.textproc import (
        redact_pii_sql,
        repetition_signals_sql,
    )

    rows = [(i, t) for i, t in enumerate(HOSTILE_TEXTS)] + [
        (len(HOSTILE_TEXTS), None)  # NULL text must not drop the doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)

    # repetition signals (rounded like the gate)
    sig = repetition_signals("text")
    sdf = df.select(
        "doc_id",
        *(F.round(c, 6).alias(k) for k, c in sig.items() if k != "n_lines"),
        sig["n_lines"].alias("n_lines"),
    )
    rsql = repetition_signals_sql("text")
    dsql = "SELECT doc_id, " + ", ".join(
        f"round({v}, 6) AS {k}" for k, v in rsql.items() if k != "n_lines"
    ) + f", {rsql['n_lines']} AS n_lines FROM documents"
    scols, srows = spark_rows(sdf)
    dcols, drows = duck_rows(con, dsql)
    assert canon_rows(scols, srows) == canon_rows(dcols, drows)

    # pii redaction
    pii = redact_pii("text")
    sdf = df.select(
        "doc_id",
        pii["n_email"].alias("n_email"),
        pii["n_ip"].alias("n_ip"),
        pii["n_phone"].alias("n_phone"),
        pii["redacted"].alias("redacted"),
    )
    psql = redact_pii_sql("text")
    dsql = (
        f"SELECT doc_id, {psql['n_email']} AS n_email, {psql['n_ip']} AS n_ip, "
        f"{psql['n_phone']} AS n_phone, {psql['redacted']} AS redacted "
        "FROM documents"
    )
    scols, srows = spark_rows(sdf)
    dcols, drows = duck_rows(con, dsql)
    assert canon_rows(scols, srows) == canon_rows(dcols, drows)

    # corpus line dedup (gate shape)
    from timescaledb_spark.pipeline.dedup import line_dedup

    out = line_dedup(df).select(
        "doc_id", "n_lines", "n_kept",
        F.length("clean").alias("clean_len"),
        F.substring(F.md5("clean"), 1, 16).alias("clean_fp"),
    )
    scols, srows = spark_rows(out)
    dcols, drows = duck_rows(con, line_dedup_sql())
    assert canon_rows(scols, srows) == canon_rows(dcols, drows)


def test_line_dedup_null_text_survives(spark):
    """A NULL text document keeps its output row (treated as empty)."""
    df = spark.createDataFrame(
        [(1, "real line of text here"), (2, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert set(out) == {1, 2}
    assert out[2]["clean"] == "" and out[2]["n_lines"] == 1


def test_bm25_term_normalization(spark):
    """Raw query terms normalize through the corpus tokenizer: case and
    punctuation cannot silently zero every score."""
    df = spark.createDataFrame(
        [(1, "the model works"), (2, "no match here")],
        "doc_id long, text string",
    )
    out = bm25_topk(df, ["Model!"], k=1).collect()
    assert out[0]["doc_id"] == 1 and out[0]["score"] > 0
    # multi-token phrases expand; unindexable terms raise
    assert bm25_topk(df, ["the model"], k=1).collect()[0]["doc_id"] == 1
    with pytest.raises(ValueError):
        bm25_topk(df, ["!!!"], k=1)


def test_chargram_lm_ranks_indomain_above_gibberish(spark):
    """CCNet contract: documents resembling the training corpus score a
    higher avg log-prob than character gibberish."""
    from timescaledb_spark.pipeline.quality_lm import (
        chargram_logprob,
        train_chargram_lm,
    )

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again")
         for i in range(20)],
        "doc_id long, text string",
    )
    model = train_chargram_lm(corpus)
    probe = spark.createDataFrame(
        [(100, "the quick brown fox jumps"),
         (101, "zq xv jk qz wx kj zzqqxx vkwjz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["avg_logp"] for r in
           chargram_logprob(probe, model).collect()}
    assert got[100] > got[101]


def test_chargram_lm_short_docs_excluded_and_backoff(spark):
    """Docs shorter than the order after normalization are excluded;
    grams unseen at training back off to ln(1/ALPHABET), never NULL."""
    import math

    from timescaledb_spark.pipeline.quality_lm import (
        ALPHABET,
        chargram_logprob,
        train_chargram_lm,
    )

    model = train_chargram_lm(
        spark.createDataFrame([(1, "aaaa bbbb")], "doc_id long, text string")
    )
    probe = spark.createDataFrame(
        [(1, "zz"), (2, "zzzz")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in chargram_logprob(probe, model).collect()}
    assert set(rows) == {2}  # "zz" has no trigram
    assert rows[2]["avg_logp"] == pytest.approx(
        round(math.log(1.0 / ALPHABET), 6)
    )


def test_chargram_lm_plan_shape(spark, sf_dir):
    """Scoring joins the model by BROADCAST (the ≤50k-row model never
    shuffles the corpus) and contains no cartesian product; the per-doc
    aggregation map-combines (exploded grams collapse before the
    exchange)."""
    from timescaledb_spark.pipeline.quality_lm import (
        chargram_logprob,
        train_chargram_lm,
    )
    from timescaledb_spark.plans.inspect import (
        broadcast_join_count,
        cartesian_count,
    )
    from timescaledb_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = chargram_logprob(docs, train_chargram_lm(docs))
    assert broadcast_join_count(out) >= 1
    assert cartesian_count(out) == 0


def test_chunk_documents_grid_and_tail(spark):
    from timescaledb_spark.pipeline.textproc import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),
        (2, "a b c"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk"])
           for r in chunk_documents(df, window=4, stride=3).collect()}
    assert out[(1, 0)] == (4, "w0 w1 w2 w3")
    assert out[(1, 2)] == (4, "w6 w7 w8 w9")
    assert out[(2, 0)] == (3, "a b c")
    assert not any(k[0] == 3 for k in out)  # empty doc -> no rows
    # overlap: consecutive windows share window - stride tokens
    assert out[(1, 1)][1].split()[0] == out[(1, 0)][1].split()[-1]
