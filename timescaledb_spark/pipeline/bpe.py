"""BPE vocabulary training over a corpus (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units", Algorithm 1):
:func:`bpe_pair_counts` is one counting iteration; :func:`bpe_train`
runs the full loop — count adjacent symbol pairs weighted by word
frequency, take the deterministic argmax as the next merge, apply it to
the distinct-word symbol table (a single codegen string replace under
the SEP2 encoding — see ``SEP``), repeat; :func:`bpe_segment` applies a
learned merge list to segment the vocabulary.

Reference analog: none (SURVEY pipeline surface) — tokenizer training
is a standard pre-training pipeline stage.

Scale shape (100 TB):

- **Word-frequency table first** (one map-combined groupBy on the
  token): all later work is over DISTINCT words × their counts —
  bounded by vocabulary (~1e6-1e7 rows), not corpus size. This is the
  classic BPE-training trick and the whole reason the op scales.
- **Pair counting** explodes each distinct word into its adjacent
  symbol pairs (bounded by word length) and runs a second map-combined
  groupBy on the pair — output bounded by |alphabet|² per iteration.
- Zero Python in the hot path: tokenization, end-of-word marking,
  pair slicing are array expressions.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from .core import tokens, tokens_sql

#: end-of-word marker (the </w> of the paper, one char to keep symbol
#: arithmetic trivial)
EOW = "·"

#: symbol-sequence encoding: a word's symbols are joined AND bounded by
#: a doubled unit separator — ``␟␟s1␟␟s2␟␟…␟␟`` (U+001F never occurs in
#: tokenizer output, which is [a-z0-9]+ plus the EOW marker). With this
#: encoding, applying ONE BPE merge (l, r) greedily left-to-right and
#: non-overlapping — exactly Sennrich et al. 2016's merge application —
#: is a single plain-string ``replace(enc, '␟l␟␟r␟', '␟lr␟')``: the
#: pattern consumes the inner half of each boundary and the replacement
#: restores it, so consecutive merges in one word chain correctly
#: (scan resumes after the replacement, like every engine's replace),
#: while partial-token matches are impossible (a symbol can neither
#: start nor end inside another symbol across a ␟). The same replace is
#: a JVM-codegen string op in Spark, a plain replace() in DuckDB, and
#: str.replace in Python — all three scan left-to-right non-overlapping,
#: so the oracle and the reference replay are bit-identical.
SEP = "\x1f"
SEP2 = SEP + SEP


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table under the shared tokenizer —
    ``(word, freq)``, one map-combined shuffle."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 0
) -> DataFrame:
    """Adjacent-symbol pair counts for the FIRST BPE merge iteration:
    every word is a character sequence plus the end-of-word marker;
    each adjacent (left, right) pair contributes the word's corpus
    frequency. Output ``(left, right, pair_count)``; ``top_k`` > 0
    keeps the best pairs (count desc, then left/right asc — the
    deterministic argmax order for the would-be merge)."""
    wf = word_freq(df, text_col)
    chars = F.concat(
        F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
        F.array(F.lit(EOW)),
    )
    pairs = (
        wf.withColumn("_chars", chars)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_chars) - 1), "
                    "i -> struct(_chars[i - 1] AS l, _chars[i] AS r))"
                )
            ).alias("p"),
        )
        .select("freq", "p.l", "p.r")
    )
    out = (
        pairs.groupBy(
            F.col("l").alias("left_sym"), F.col("r").alias("right_sym")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )
    if top_k and int(top_k) > 0:
        out = out.orderBy(
            F.col("pair_count").desc(),
            F.col("left_sym"),
            F.col("right_sym"),
        ).limit(int(top_k))
    return out


def _encode_word(word_col: str = "word") -> F.Column:
    """Initial symbol sequence of a word (chars + EOW) in the SEP2
    encoding — ``␟␟c1␟␟c2␟␟…␟␟·␟␟``."""
    chars = F.concat(
        F.filter(F.split(F.col(word_col), ""), lambda c: c != ""),
        F.array(F.lit(EOW)),
    )
    return F.concat(F.lit(SEP2), F.array_join(chars, SEP2), F.lit(SEP2))


def _enc_syms(enc_col: str = "enc") -> F.Column:
    """Symbol array back out of the SEP2 encoding."""
    return F.filter(F.split(F.col(enc_col), SEP2), lambda s: s != "")


def _pair_counts_of(words: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count) over an encoded word-frequency
    frame ``(enc, freq)`` — one map-combined shuffle, output bounded by
    |current symbol vocabulary|²."""
    # zip_with over two shifted slices, NOT transform(sequence(1, n-1)):
    # a fully-merged word has ONE symbol, and sequence(1, 0) steps
    # DOWNWARD ([1, 0] — an out-of-bounds index under ANSI mode) where
    # slice(.., 1, 0) is simply empty
    pairs = (
        words.withColumn("_syms", _enc_syms())
        .select(
            "freq",
            F.explode(
                F.expr(
                    "zip_with(slice(_syms, 1, size(_syms) - 1), "
                    "slice(_syms, 2, size(_syms) - 1), "
                    "(x, y) -> struct(x AS l, y AS r))"
                )
            ).alias("p"),
        )
        .select("freq", "p.l", "p.r")
    )
    return pairs.groupBy(
        F.col("l").alias("left_sym"), F.col("r").alias("right_sym")
    ).agg(F.sum("freq").alias("pair_count"))


def merge_pattern(left_sym: str, right_sym: str) -> Tuple[str, str]:
    """(search, replacement) strings applying the merge under the SEP2
    encoding (see the SEP docstring for why a plain replace is exactly
    the greedy left-to-right non-overlapping BPE merge)."""
    return (
        f"{SEP}{left_sym}{SEP2}{right_sym}{SEP}",
        f"{SEP}{left_sym}{right_sym}{SEP}",
    )


#: per-round argmax over an encoded ``(enc, freq)`` frame, as ONE SQL
#: string (same expression tree as ``_pair_counts_of`` + TakeOrdered):
#: a training round costs one parse instead of ~20 py4j Column round
#: trips — measured 137 ms -> 97 ms per round (r16 optimization round,
#: the ``_lr_p_sql`` discipline). ``{words}`` is bound per round via
#: ``spark.sql`` DataFrame substitution.
_ROUND_SQL = f"""
SELECT l AS left_sym, r AS right_sym, sum(freq) AS pair_count
FROM (
  SELECT freq, p.l, p.r
  FROM (SELECT freq, filter(split(enc, '{SEP2}'), s -> s != '') AS _syms
        FROM {{words}})
  LATERAL VIEW explode(zip_with(slice(_syms, 1, size(_syms) - 1),
                                slice(_syms, 2, size(_syms) - 1),
                                (x, y) -> struct(x AS l, y AS r))) AS p
)
GROUP BY l, r
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT 1
"""

#: merge application as one parameterized statement (the search/replace
#: strings are bound as named parameters, not spliced into the text)
_MERGE_SQL = "SELECT replace(enc, :s, :r) AS enc, freq FROM {words}"


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    shuffle_partitions: Optional[int] = 8,
    checkpoint_every: int = 25,
) -> List[dict]:
    """Full iterative BPE vocabulary training (Sennrich et al. 2016
    Algorithm 1): ``n_merges`` rounds of count-pairs → argmax →
    apply-merge over the distinct-word frequency table. Returns the
    learned merge table ``[{step, left_sym, right_sym, pair_count}]``
    (1-based steps, argmax ties broken (count desc, left asc, right
    asc) — the deterministic order shared with the DuckDB oracle).

    Scale shape (100 TB): the corpus is touched ONCE (the word-frequency
    groupBy); every iteration then scans only the distinct-word table —
    bounded by vocabulary (~1e6-1e7 rows), not corpus size. The merge
    application is a single plain-string replace (see ``SEP``) — a JVM
    codegen op, no UDF, no Python in the executor path. The word table
    is lazily localCheckpoint-ed EVERY merge — the next round's argmax
    job materializes it, so plans never grow past one replace deep and
    no standalone checkpoint job runs (``checkpoint_every`` is retained
    for API compatibility but inert; blocks are ContextCleaner-freed).
    Each iteration is inherently a driver round trip (one argmax collect
    of a single row) — the sequential argmax IS the algorithm; batching
    k merges per scan changes the learned sequence unless the top-k are
    provably non-interacting, so exact training stays one merge per
    round. Each round is ONE SQL parse (``_ROUND_SQL``/``_MERGE_SQL``)
    instead of ~20 py4j Column round trips: 137 -> 97 ms per round
    measured at sf0.1, full 50-merge train 7.1-7.6 -> 5.4-5.6 s.

    ``shuffle_partitions`` sizes the per-round shuffles to the vocab
    table (corpus-sized partition counts pay per-round scheduling for
    empty partitions); the session conf is restored afterwards.
    """
    spark = df.sparkSession
    old = None
    if shuffle_partitions is not None:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        words = word_freq(df, text_col).select(
            _encode_word().alias("enc"), "freq"
        )
        words = words.localCheckpoint(eager=True)
        merges: List[dict] = []
        for step in range(1, int(n_merges) + 1):
            # one SQL parse per round (see _ROUND_SQL) instead of
            # rebuilding the pair/argmax Column tree — same plan
            top = spark.sql(_ROUND_SQL, words=words).collect()
            if not top:  # every word is a single symbol — vocab exhausted
                break
            l, r, c = (
                top[0]["left_sym"],
                top[0]["right_sym"],
                int(top[0]["pair_count"]),
            )
            merges.append(
                {
                    "step": step,
                    "left_sym": l,
                    "right_sym": r,
                    "pair_count": c,
                }
            )
            search, repl = merge_pattern(l, r)
            # lazy per-round checkpoint: the NEXT round's argmax job
            # materializes it, so the replace chain never grows past
            # depth 1 (analysis time stays flat) and no separate
            # checkpoint job runs; superseded blocks are
            # ContextCleaner-freed as `words` is rebound
            words = spark.sql(
                _MERGE_SQL, args={"s": search, "r": repl}, words=words
            ).localCheckpoint(eager=False)
        return merges
    finally:
        if old is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)


def bpe_train_df(
    df: DataFrame, n_merges: int = 50, text_col: str = "text"
) -> DataFrame:
    """:func:`bpe_train` as a DataFrame — the gate-shaped form."""
    spark = df.sparkSession
    merges = bpe_train(df, n_merges=n_merges, text_col=text_col)
    return spark.createDataFrame(
        [
            (m["step"], m["left_sym"], m["right_sym"], m["pair_count"])
            for m in merges
        ],
        "step int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_segment(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Segment the corpus vocabulary under a learned merge list: one row
    per DISTINCT word — ``(word, freq, n_syms, syms)`` with ``syms`` the
    space-joined subword sequence after applying every merge in order.

    The merge chain is ``len(merges)`` nested plain-string replaces —
    all whole-stage codegen, zero Python per row; work is bounded by the
    vocabulary (the corpus is only touched by the word-frequency
    groupBy). Re-joining subwords to documents is a broadcast join of
    this table against exploded tokens when needed."""
    out = word_freq(df, text_col).select(
        "word", "freq", _encode_word().alias("enc")
    )
    enc = F.col("enc")
    for l, r in merges:
        search, repl = merge_pattern(str(l), str(r))
        enc = F.replace(enc, F.lit(search), F.lit(repl))
    syms = F.filter(F.split(enc, SEP2), lambda s: s != "")
    return out.select(
        "word",
        "freq",
        F.size(syms).alias("n_syms"),
        F.array_join(syms, " ").alias("syms"),
    )


def bpe_encode(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode the corpus to subword-id sequences under a learned merge
    list — the tokenizer APPLICATION stage that train → segment → encode
    → pack pipelines ship to the training loader. One row per document:
    ``(id, n_words, n_subtok, sym_ids)`` with ``sym_ids`` the
    concatenated per-word subword ids in document order; ids are the
    0-based lexicographic rank of the symbol string (deterministic
    across engines and runs — no dependence on discovery order).

    Scale shape (100 TB): segmentation and id assignment run over the
    DISTINCT-word table (vocab-bounded; the symbol table is
    |alphabet| + |merges| rows, so its rank window is a non-issue);
    the corpus-sized work is one explode of the shared tokenizer and a
    BROADCAST join of exploded tokens against the (word → ids) map —
    the corpus text itself is never shuffled; the per-document
    reassembly groupBy is the only corpus-scale shuffle (the
    ``line_dedup`` class)."""
    from pyspark.sql import Window

    words = (
        df.select(F.explode(tokens(text_col)).alias("word")).distinct()
    )
    enc = _encode_word()
    for l, r in merges:
        search, repl = merge_pattern(str(l), str(r))
        enc = F.replace(enc, F.lit(search), F.lit(repl))
    # seg feeds BOTH the symbol-rank branch and the (word -> ids)
    # branch; unpinned, the corpus explode-distinct AND the |merges|-
    # deep replace chain execute twice. Only (word, syms) is pinned —
    # vocabulary-bounded (r16 optimization round: bounded-frame reuse).
    seg = words.select(
        "word",
        F.filter(F.split(enc, SEP2), lambda s: s != "").alias("_syms"),
    ).localCheckpoint(eager=False)
    sym_ids = (
        seg.select(F.explode("_syms").alias("sym"))
        .distinct()
        .select(
            "sym",
            (
                F.row_number().over(Window.orderBy("sym")) - 1
            ).alias("sym_id"),
        )
    )
    wids = (
        seg.select("word", F.posexplode("_syms").alias("p", "sym"))
        .join(F.broadcast(sym_ids), "sym")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "sym_id"))),
                lambda x: x["sym_id"],
            ).alias("ids")
        )
    )
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("wp", "word")
    ).join(F.broadcast(wids), "word")
    assembled = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("ids")).alias("n_subtok"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wp", "ids"))),
                lambda x: x["ids"],
            )
        ).alias("sym_ids"),
    )
    return (
        df.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_subtok", F.lit(0)).alias("n_subtok"),
            F.coalesce(
                "sym_ids", F.array().cast("array<int>")
            ).alias("sym_ids"),
        )
    )


def bpe_encode_sql(
    merges: Sequence[Tuple[str, str]],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`bpe_encode` — identical replace chain,
    identical lexicographic symbol ids, identical document-order
    concatenation."""
    toks = tokens_sql(text_col)
    s2 = _sq(SEP2)
    enc = _encode_word_sql()
    for l, r in merges:
        enc = (
            f"replace({enc}, {_sq(f'{SEP}{l}{SEP2}{r}{SEP}')}, "
            f"{_sq(f'{SEP}{l}{r}{SEP}')})"
        )
    return f"""
    WITH wf AS (
      SELECT DISTINCT unnest({toks}) AS word FROM {table}
    ),
    seg AS (
      SELECT word,
             list_filter(string_split({enc}, {s2}), x -> x <> '') AS cs
      FROM wf
    ),
    syms AS (
      SELECT sym,
             CAST(row_number() OVER (ORDER BY sym) - 1 AS INT) AS sym_id
      FROM (SELECT DISTINCT unnest(cs) AS sym FROM seg)
    ),
    wids AS (
      SELECT word, list(sym_id ORDER BY p) AS ids
      FROM (
        SELECT word, p, cs[p] AS sym
        FROM seg, LATERAL (SELECT unnest(range(1, len(cs) + 1)) AS p)
      ) JOIN syms USING (sym)
      GROUP BY word
    ),
    toks AS (
      SELECT {id_col}, wp, arr[wp] AS word
      FROM (SELECT {id_col}, {toks} AS arr FROM {table}),
           LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS wp)
    ),
    assembled AS (
      SELECT toks.{id_col},
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(len(ids)) AS BIGINT) AS n_subtok,
             flatten(list(ids ORDER BY wp)) AS sym_ids
      FROM toks JOIN wids USING (word)
      GROUP BY 1
    )
    SELECT t.{id_col},
           coalesce(a.n_words, 0) AS n_words,
           coalesce(a.n_subtok, 0) AS n_subtok,
           coalesce(a.sym_ids, []) AS sym_ids
    FROM {table} t LEFT JOIN assembled a ON a.{id_col} = t.{id_col}
    """


def _sq(s: str) -> str:
    """SQL string literal (single-quote doubling; SEP is a control char
    DuckDB passes through verbatim)."""
    return "'" + str(s).replace("'", "''") + "'"


def _encode_word_sql(word_expr: str = "word") -> str:
    return (
        f"{_sq(SEP2)} || array_to_string("
        f"list_append(string_split({word_expr}, ''), '{EOW}'), {_sq(SEP2)})"
        f" || {_sq(SEP2)}"
    )


def _pair_counts_sql(words_cte: str) -> str:
    """Pair counts over an encoded (enc, freq) CTE."""
    return f"""
      SELECT cs[j] AS l, cs[j + 1] AS r, CAST(sum(freq) AS BIGINT) AS c
      FROM (
        SELECT list_filter(string_split(enc, {_sq(SEP2)}), s -> s <> '') AS cs,
               freq
        FROM {words_cte}
      ), LATERAL (SELECT unnest(range(1, len(cs))) AS j)
      GROUP BY 1, 2
    """


def bpe_train_sql(
    table: str = "documents", text_col: str = "text", n_merges: int = 50
) -> str:
    """DuckDB oracle replaying the FULL training loop: the ``n_merges``
    iterations are unrolled into a CTE chain — each step recomputes pair
    counts from the previous word table, takes the same deterministic
    argmax, and applies the merge with the identical plain-string
    replace under the identical SEP2 encoding, so the learned merge
    table is bit-equal."""
    toks = tokens_sql(text_col)
    s, s2 = _sq(SEP), _sq(SEP2)
    ctes = [
        f"""wf AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest({toks}) AS word FROM {table}
      ) GROUP BY 1
    )""",
        f"w0 AS MATERIALIZED (SELECT {_encode_word_sql()} AS enc, freq FROM wf)",
    ]
    for i in range(int(n_merges)):
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT {i + 1} AS step, l, r, c FROM "
            f"({_pair_counts_sql(f'w{i}')}) ORDER BY c DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"""w{i + 1} AS MATERIALIZED (
      SELECT replace(enc,
                     {s} || (SELECT l FROM m{i}) || {s2} ||
                       (SELECT r FROM m{i}) || {s},
                     {s} || (SELECT l FROM m{i}) ||
                       (SELECT r FROM m{i}) || {s}) AS enc,
             freq
      FROM w{i}
    )"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM m{i}" for i in range(int(n_merges)))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT step, l AS left_sym, r AS right_sym, c AS pair_count"
        f" FROM ({union})"
    )


def bpe_segment_sql(
    merges: Sequence[Tuple[str, str]],
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`bpe_segment` under a GIVEN merge list —
    the identical replace chain over the identical encoding."""
    toks = tokens_sql(text_col)
    s, s2 = _sq(SEP), _sq(SEP2)
    enc = _encode_word_sql()
    for l, r in merges:
        search = _sq(f"{SEP}{l}{SEP2}{r}{SEP}")
        repl = _sq(f"{SEP}{l}{r}{SEP}")
        enc = f"replace({enc}, {search}, {repl})"
    return f"""
    WITH wf AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest({toks}) AS word FROM {table}
      ) GROUP BY 1
    ),
    seg AS (
      SELECT word, freq,
             list_filter(string_split({enc}, {s2}), x -> x <> '') AS cs
      FROM wf
    )
    SELECT word, freq, CAST(len(cs) AS INT) AS n_syms,
           array_to_string(cs, ' ') AS syms
    FROM seg
    """


def bpe_pair_counts_sql(
    table: str = "documents", text_col: str = "text", top_k: int = 0
) -> str:
    """DuckDB replay: same tokenizer, same char split (testdata is
    ASCII so char==symbol in both engines), same end-of-word marker."""
    toks = tokens_sql(text_col)
    lim = (
        f"ORDER BY pair_count DESC, left_sym ASC, right_sym ASC "
        f"LIMIT {int(top_k)}"
        if top_k and int(top_k) > 0
        else ""
    )
    return f"""
    WITH wf AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest({toks}) AS word FROM {table}
      ) GROUP BY 1
    ),
    sym AS (
      SELECT freq,
             list_append(string_split(word, ''), '{EOW}') AS cs
      FROM wf
    ),
    pairs AS (
      SELECT freq, cs[i] AS l, cs[i + 1] AS r
      FROM sym, LATERAL (
        SELECT unnest(range(1, len(cs))) AS i
      )
    )
    SELECT l AS left_sym, r AS right_sym,
           CAST(sum(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1, 2
    {lim}
    """
