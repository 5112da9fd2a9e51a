"""Unigram-LM tokenizer (pipeline/unigram.py): the Spark build and the
DuckDB oracle are both checked against an independent pure-Python model
of the determinism contract (quantized-integer Viterbi with the
(score, j) tie-break, hard-EM with add-one single survival), plus edge
cases the sf corpus cannot hit (unreachable words, the word-length cap,
score ties)."""

import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.unigram import (
    MAX_WORD_LEN,
    NEG,
    NEG_HALF,
    piece_logp,
    seed_pieces,
    unigram_segment,
    unigram_segment_sql,
    unigram_train,
    unigram_train_sql,
    unigram_word_freq,
    viterbi_segment,
)

L = 4


# ---------------------------------------------------------------------------
# pure-Python reference model
# ---------------------------------------------------------------------------


def _toks(t):
    return re.findall(r"[a-z0-9]+", t.lower())


def _model_wf(corpus):
    wf = {}
    for t in corpus:
        for w in _toks(t):
            if len(w) <= MAX_WORD_LEN:
                wf[w] = wf.get(w, 0) + 1
    return wf


def _model_seed(wf, top_multi):
    cnt = {}
    for w, f in wf.items():
        for j in range(len(w)):
            for l in range(1, min(L, len(w) - j) + 1):
                s = w[j : j + l]
                cnt[s] = cnt.get(s, 0) + f
    sel = {p: c for p, c in cnt.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:top_multi]
    sel.update(dict(multis))
    return sel


def _model_lp(sel):
    total = float(sum(sel.values()))
    return {
        p: math.floor(math.log(c / total) * 1e6 + 0.5) for p, c in sel.items()
    }


def _model_viterbi(w, lp):
    n = len(w)
    alphas, bps = [0], [0]
    for i in range(1, n + 1):
        best = None
        for j in range(max(0, i - L), i):
            p = w[j:i]
            if p in lp and alphas[j] > NEG_HALF:
                c = (alphas[j] + lp[p], j)
                if best is None or c > best:
                    best = c
        if best is None:
            best = (NEG, i - 1)
        alphas.append(best[0])
        bps.append(best[1])
    if alphas[n] <= NEG_HALF:
        return alphas[n], None
    cuts = [n]
    while cuts[0] > 0:
        cuts.insert(0, bps[cuts[0]])
    return alphas[n], [w[cuts[k] : cuts[k + 1]] for k in range(len(cuts) - 1)]


def _model_train(corpus, top_multi, rounds):
    wf = _model_wf(corpus)
    sel = _model_seed(wf, top_multi)
    for _ in range(rounds):
        lp = _model_lp(sel)
        usage = {}
        for w, f in wf.items():
            _, pieces = _model_viterbi(w, lp)
            for p in pieces or []:
                usage[p] = usage.get(p, 0) + f
        nxt = {p: usage.get(p, 0) + 1 for p in sel if len(p) == 1}
        multis = sorted(
            ((p, c) for p, c in usage.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:top_multi]
        nxt.update(dict(multis))
        sel = nxt
    lp = _model_lp(sel)
    return {p: (c, lp[p]) for p, c in sel.items()}


CORPUS = [
    "the cat sat on the mat",
    "the catalog of cats and hats",
    "a matter of fact the cat",
    "concatenate the cats",
]


def _corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


# ---------------------------------------------------------------------------
# Spark vs model
# ---------------------------------------------------------------------------


def test_segment_matches_model(spark):
    wf = _model_wf(CORPUS)
    lp = _model_lp(_model_seed(wf, 8))
    got = {
        r["word"]: (r["score"], r["seg"])
        for r in unigram_segment(_corpus_df(spark), top_multi=8).collect()
    }
    assert set(got) == set(wf)
    for w in wf:
        score, pieces = _model_viterbi(w, lp)
        assert got[w] == (score, " ".join(pieces)), w
        # segmentation is a real cover of the word
        assert got[w][1].replace(" ", "") == w


def test_train_matches_model(spark):
    want = _model_train(CORPUS, 8, 2)
    got = {
        r["piece"]: (r["cnt"], r["lp"])
        for r in unigram_train(_corpus_df(spark), top_multi=8, rounds=2).collect()
    }
    assert got == want
    # every single char survives training (required-character set)
    chars = {c for w in _model_wf(CORPUS) for c in w}
    assert chars <= set(got)


def test_oracle_matches_model(spark):
    """The DuckDB oracle independently reproduces the model on a corpus
    the sf tables don't contain (guards the recursive-CTE replay, not
    just the gate corpus)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in enumerate(CORPUS))
        + ") t(doc_id, text)"
    )
    wf = _model_wf(CORPUS)
    lp = _model_lp(_model_seed(wf, 8))
    rows = con.execute(unigram_segment_sql(top_multi=8)).fetchall()
    assert len(rows) == len(wf)
    for word, freq, score, seg in rows:
        mscore, mpieces = _model_viterbi(word, lp)
        assert (score, seg) == (mscore, " ".join(mpieces)), word
        assert freq == wf[word]
    want = _model_train(CORPUS, 8, 2)
    got = {
        p: (c, l)
        for p, c, l in con.execute(
            unigram_train_sql(top_multi=8, rounds=2)
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# edge cases
# ---------------------------------------------------------------------------


def test_unreachable_word_null_pieces(spark):
    """A vocabulary missing one of a word's characters: score is the
    NEG sentinel and pieces are NULL, not a bogus segmentation."""
    wf = spark.createDataFrame([("abc", 1)], "word string, freq bigint")
    lp = spark.createDataFrame(
        [("a", -100), ("b", -100)], "piece string, lp bigint"
    )
    row = viterbi_segment(wf, lp).collect()[0]
    assert row["score"] == NEG
    assert row["pieces"] is None


def test_tie_break_prefers_larger_backpointer(spark):
    """Two segmentations with identical integer scores: the DP must
    pick the larger j (shorter final piece) at every tie — 'ab' with
    lp(ab) == lp(a) + lp(b) segments as 'a b'."""
    wf = spark.createDataFrame([("ab", 1)], "word string, freq bigint")
    lp = spark.createDataFrame(
        [("a", -50), ("b", -50), ("ab", -100)], "piece string, lp bigint"
    )
    row = viterbi_segment(wf, lp).collect()[0]
    assert row["score"] == -100
    assert row["pieces"] == ["a", "b"]


def test_word_len_cap(spark):
    long_word = "x" * (MAX_WORD_LEN + 1)
    df = spark.createDataFrame(
        [(0, f"short {long_word}")], "doc_id bigint, text string"
    )
    words = {r["word"] for r in unigram_word_freq(df).collect()}
    assert words == {"short"}


def test_seed_keeps_all_singles_and_caps_multis(spark):
    wf = unigram_word_freq(_corpus_df(spark))
    sel = seed_pieces(wf, top_multi=5).collect()
    singles = {r["piece"] for r in sel if len(r["piece"]) == 1}
    multis = [r["piece"] for r in sel if len(r["piece"]) > 1]
    assert singles == {c for w in _model_wf(CORPUS) for c in w}
    assert len(multis) == 5
    model = _model_seed(_model_wf(CORPUS), 5)
    assert set(multis) == {p for p in model if len(p) > 1}


def test_logp_quantization_is_integral(spark):
    wf = unigram_word_freq(_corpus_df(spark))
    lp = piece_logp(seed_pieces(wf, top_multi=8))
    assert dict(lp.dtypes)["lp"] == "bigint"
    vals = [r["lp"] for r in lp.collect()]
    assert all(isinstance(v, int) and v < 0 for v in vals)


def test_encode_matches_model(spark):
    """unigram_encode: ids are lexicographic ranks of used pieces and
    per-document sequences follow token order; over-cap words are
    skipped (not counted)."""
    from timescaledb_spark.pipeline.unigram import unigram_encode

    long_word = "y" * (MAX_WORD_LEN + 1)
    corpus = CORPUS + [f"the {long_word} cat"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id bigint, text string"
    )
    wf = _model_wf(corpus)
    lp = _model_lp(_model_seed(wf, 8))
    seg = {w: _model_viterbi(w, lp)[1] for w in wf}
    used = sorted({p for ps in seg.values() for p in ps})
    rank = {p: i for i, p in enumerate(used)}
    got = {
        r["doc_id"]: (r["n_words"], r["n_subtok"], r["piece_ids"])
        for r in unigram_encode(df, top_multi=8).collect()
    }
    for i, t in enumerate(corpus):
        words = [w for w in _toks(t) if len(w) <= MAX_WORD_LEN]
        ids = [rank[p] for w in words for p in seg[w]]
        assert got[i] == (len(words), len(ids), ids), i


def test_edgeless_word_still_emits_row(spark):
    """A word with NO vocabulary substring at all must emit its
    (NEG, NULL) row, not vanish in the edge join (hypothesis-found)."""
    wf = spark.createDataFrame([("b", 1)], "word string, freq bigint")
    lp = spark.createDataFrame([("a", -1)], "piece string, lp bigint")
    rows = viterbi_segment(wf, lp).collect()
    assert len(rows) == 1
    assert rows[0]["score"] == NEG and rows[0]["pieces"] is None
