"""Iterative BPE training — pipeline/bpe.py (round 16).

The Spark loop, the unrolled DuckDB oracle, and a pure-Python
Sennrich-2016 reference implementation must learn bit-identical merge
tables (counts, tie-breaks, greedy left-to-right merge application),
and segmentation under a merge list must match the reference's final
vocabulary."""

import collections
import re

import pytest

from timescaledb_spark.pipeline.bpe import (
    EOW,
    SEP,
    SEP2,
    bpe_segment,
    bpe_segment_sql,
    bpe_train,
    bpe_train_sql,
    merge_pattern,
)


def ref_train(texts, n):
    """Pure-Python Sennrich et al. 2016 Algorithm 1 (greedy
    left-to-right non-overlapping merge application, argmax ties broken
    (count desc, left asc, right asc))."""
    wf = collections.Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", (t or "").lower()):
            wf[w] += 1
    vocab = {tuple(list(w) + [EOW]): c for w, c in wf.items()}
    merges = []
    for step in range(1, n + 1):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (l, r), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, c))
        newv = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            newv[tuple(out)] = newv.get(tuple(out), 0) + cnt
        vocab = newv
    return merges, vocab


CORPUS = [
    (1, "low lower lowest low low newer new newest wider wide wide"),
    (2, "low lower new news newest wide widest lowest"),
    (3, "aaaa aaa aa a aaaa aaaa"),  # consecutive same-pair merges
    (4, None),  # NULL text contributes no words
    (5, "the the the then than thin thing think and and banana"),
]


def test_train_matches_reference_and_oracle(spark, duck):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    want, _ = ref_train([t for _, t in CORPUS], 30)
    got = [
        (m["step"], m["left_sym"], m["right_sym"], m["pair_count"])
        for m in bpe_train(df, 30, checkpoint_every=7)
    ]
    assert got == want
    duck.execute(
        "CREATE OR REPLACE TEMP TABLE _bpe16 (doc_id BIGINT, text VARCHAR)"
    )
    duck.executemany("INSERT INTO _bpe16 VALUES (?, ?)", CORPUS)
    oracle = sorted(
        duck.execute(bpe_train_sql(table="_bpe16", n_merges=30)).fetchall()
    )
    assert oracle == sorted(want)
    duck.execute("DROP TABLE _bpe16")


def test_segment_matches_reference_vocab(spark, duck):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    merges_full, vocab = ref_train([t for _, t in CORPUS], 25)
    merges = [(l, r) for _, l, r, _ in merges_full]
    got = {
        r["word"]: (r["freq"], r["n_syms"], r["syms"])
        for r in bpe_segment(df, merges).collect()
    }
    ref_seg = {
        "".join(s).replace(EOW, ""): (" ".join(s), len(s))
        for s in vocab
    }
    assert set(got) == set(ref_seg)
    for w, (syms, n) in ref_seg.items():
        assert got[w][2] == syms and got[w][1] == n, (w, got[w], syms)
    duck.execute(
        "CREATE OR REPLACE TEMP TABLE _bpe16s (doc_id BIGINT, text VARCHAR)"
    )
    duck.executemany("INSERT INTO _bpe16s VALUES (?, ?)", CORPUS)
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            bpe_segment_sql(merges, table="_bpe16s")
        ).fetchall()
    }
    assert oracle == got
    duck.execute("DROP TABLE _bpe16s")


def test_merge_pattern_replace_is_greedy_nonoverlapping():
    """The encoding's load-bearing property: a plain string replace of
    the pattern IS the greedy left-to-right non-overlapping pair merge —
    including consecutive merges in one word ('aaaa' -> aa aa), odd
    tails ('aaa' -> aa a), and NO partial-token matches ('ab'+'c' must
    not merge on (b, c), 'a'+'bc' must not merge on (a, b))."""

    def enc(syms):
        return SEP2 + SEP2.join(syms) + SEP2

    def dec(s):
        return [x for x in s.split(SEP2) if x]

    search, repl = merge_pattern("a", "a")
    assert dec(enc(["a"] * 4).replace(search, repl)) == ["aa", "aa"]
    assert dec(enc(["a"] * 5).replace(search, repl)) == ["aa", "aa", "a"]
    assert dec(enc(["a", "b", "a"]).replace(search, repl)) == ["a", "b", "a"]
    search, repl = merge_pattern("b", "c")
    assert dec(enc(["ab", "c"]).replace(search, repl)) == ["ab", "c"]
    search, repl = merge_pattern("a", "b")
    assert dec(enc(["a", "bc"]).replace(search, repl)) == ["a", "bc"]
    assert dec(enc(["a", "b"]).replace(search, repl)) == ["ab"]
    # chained: a second merge consuming a first merge's output
    s = enc(["t", "h", "e", EOW])
    s = s.replace(*merge_pattern("e", EOW))
    s = s.replace(*merge_pattern("t", "h"))
    s = s.replace(*merge_pattern("th", "e" + EOW))
    assert dec(s) == ["the" + EOW]


def test_train_property_random_corpora(spark):
    """Randomized corpora (seeded): the distributed loop must track the
    reference exactly — this catches any divergence in tie-breaking,
    encoding, or replace semantics that the hand corpus misses."""
    import random

    rnd = random.Random(1600)
    alphabet = "abc"
    for trial in range(3):
        texts = [
            " ".join(
                "".join(
                    rnd.choice(alphabet)
                    for _ in range(rnd.randrange(1, 7))
                )
                for _ in range(rnd.randrange(3, 20))
            )
            for _ in range(8)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        want, _ = ref_train(texts, 15)
        got = [
            (m["step"], m["left_sym"], m["right_sym"], m["pair_count"])
            for m in bpe_train(df, 15, checkpoint_every=4)
        ]
        assert got == want, f"trial {trial}"


def test_encode_matches_reference(spark, duck):
    """bpe_encode: per-document subword ids equal a direct Python
    replay (segment each word with the reference merge application,
    ids = lexicographic symbol rank, concatenated in document order),
    and the DuckDB oracle matches bit-for-bit."""
    from timescaledb_spark.pipeline.bpe import bpe_encode, bpe_encode_sql

    merges_full, _ = ref_train([t for _, t in CORPUS], 12)
    merges = [(l, r) for _, l, r, _ in merges_full]

    def seg_word(w):
        syms = list(w) + [EOW]
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = sorted(
        {
            w
            for _, t in CORPUS
            for w in re.findall(r"[a-z0-9]+", (t or "").lower())
        }
    )
    segd = {w: seg_word(w) for w in words}
    ranks = {
        s: i
        for i, s in enumerate(sorted({x for v in segd.values() for x in v}))
    }
    want = {}
    for did, t in CORPUS:
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        ids = [ranks[s] for w in toks for s in segd[w]]
        want[did] = (len(toks), len(ids), ids)

    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_subtok"], list(r["sym_ids"]))
        for r in bpe_encode(df, merges).collect()
    }
    assert got == want
    duck.execute(
        "CREATE OR REPLACE TEMP TABLE _bpe16e (doc_id BIGINT, text VARCHAR)"
    )
    duck.executemany("INSERT INTO _bpe16e VALUES (?, ?)", CORPUS)
    oracle = {
        r[0]: (r[1], r[2], list(r[3]))
        for r in duck.execute(
            bpe_encode_sql(merges, table="_bpe16e")
        ).fetchall()
    }
    assert oracle == want
    duck.execute("DROP TABLE _bpe16e")


def test_train_exhausts_gracefully(spark):
    """Fewer possible merges than requested: the loop stops when every
    word is a single symbol (no pairs left) instead of erroring."""
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id bigint, text string")
    m = bpe_train(df, 10)
    # 'ab·' needs exactly 2 merges; afterwards no adjacent pairs remain
    assert [x["step"] for x in m] == [1, 2]
