"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization",
the SentencePiece unigram model) — the second of the two tokenizer
families real pre-training pipelines ship (alongside BPE,
:mod:`.bpe`): a piece VOCABULARY with log-probabilities, Viterbi
(max-likelihood) segmentation of every word over that vocabulary, and
hard-EM (Viterbi-EM, Kudo 2018 §3.2's iterative approximation)
training that re-estimates piece probabilities from the Viterbi
segmentation and prunes the vocabulary each round.

Reference analog: none (SURVEY pipeline surface) — tokenizer training
is a standard pre-training pipeline stage.

Scale shape (100 TB):

- **Word-frequency table first** (the same trick as BPE training): one
  map-combined corpus groupBy, then EVERY training step — seeding,
  edge generation, the Viterbi DP, count re-estimation — runs over
  DISTINCT words × frequencies, bounded by vocabulary (~1e6-1e7 rows),
  never corpus size.
- **The Viterbi DP is a single JVM-side expression** (higher-order
  functions: ``aggregate`` over word positions with the per-position
  edge lists pre-bucketed), not a UDF and not a driver loop: one pass
  over the vocab table per EM round.
- **Integer score arithmetic**: piece log-probs quantize once to 1e-6
  units (BIGINT); every DP sum/compare after that is exact int64, so
  segmentations, tie-breaks, and scores are bit-identical across
  Spark, DuckDB, and the pure-Python test reference (the
  ``chargram_logprob`` discipline — order-dependent float sums can
  straddle rounding boundaries; integers cannot).

Determinism contract (shared by the Spark build, the DuckDB oracle,
and ``tests``' Python model):

- words longer than :data:`MAX_WORD_LEN` are excluded from training
  (they would also bound the oracle's recursive-CTE depth);
- the seed vocabulary is ALL single characters plus the
  ``top_multi`` multi-char substrings by (count desc, piece asc);
- Viterbi maximizes the integer score sum; ties prefer the LARGER
  backpointer (struct max over (score, j) — the shorter final piece);
- unreachable positions carry the :data:`NEG` sentinel; a word whose
  final position is unreachable segments to NULL (cannot happen while
  the vocabulary keeps every single character — which seeding and
  every EM round both guarantee);
- hard-EM re-estimation: multi-char counts are the Viterbi usage
  counts (top ``top_multi`` survive, count desc / piece asc);
  single-char counts are usage + 1 (add-one keeps required chars
  alive — SentencePiece's required-character set).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, functions as F

from .core import tokens, tokens_sql

#: words longer than this are excluded from vocabulary training (also
#: the oracle's recursive-CTE depth bound)
MAX_WORD_LEN = 24

#: unreachable-position sentinel (int64 "-inf"); any real score is a
#: sum of <= MAX_WORD_LEN quantized log-probs, far above NEG_HALF
NEG = -(1 << 62)
NEG_HALF = -(1 << 61)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def unigram_word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` under the shared pipeline tokenizer, capped at
    :data:`MAX_WORD_LEN` — the ONLY corpus-scale scan of training."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.length("word") <= MAX_WORD_LEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _substr_expr(max_piece_len: int) -> F.Column:
    """All substrings of ``word`` with length 1..max_piece_len."""
    return F.expr(
        f"""flatten(transform(sequence(0, length(word) - 1), j ->
          transform(sequence(1, least({max_piece_len}, length(word) - j)), l ->
            substring(word, j + 1, l))))"""
    )


def seed_pieces(
    wf: DataFrame, max_piece_len: int = 4, top_multi: int = 512
) -> DataFrame:
    """Seed vocabulary ``(piece, cnt)``: every substring of every
    distinct word (length <= ``max_piece_len``) weighted by word
    frequency; ALL single chars survive, plus the ``top_multi``
    multi-char pieces by (count desc, piece asc).

    The top-k is ``orderBy().limit()`` — Spark's TakeOrdered, a
    per-partition heap + driver merge over the vocabulary-bounded
    substring table, not a global sort shuffle."""
    subs = (
        wf.select("freq", F.explode(_substr_expr(max_piece_len)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    singles = subs.filter(F.length("piece") == 1)
    multis = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(int(top_multi))
    )
    return singles.unionByName(multis)


def piece_logp(sel: DataFrame) -> DataFrame:
    """``(piece, lp)`` with ``lp = floor(ln(cnt / total) * 1e6 + 0.5)``
    as BIGINT — quantized once; all DP arithmetic downstream is exact
    integer (the :mod:`.quality_lm` discipline)."""
    total = sel.agg(F.sum("cnt").cast("double").alias("total"))
    return sel.crossJoin(F.broadcast(total)).select(
        "piece",
        F.floor(
            F.log(F.col("cnt").cast("double") / F.col("total")) * F.lit(1e6)
            + F.lit(0.5)
        ).alias("lp"),
    )


def viterbi_segment(
    wf: DataFrame, lp_df: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """Maximum-likelihood segmentation of every distinct word over a
    ``(piece, lp)`` vocabulary: ``(word, freq, score, pieces)``.

    One broadcast join builds the per-word lattice edges (position
    pairs whose substring is in the vocabulary), then the Viterbi DP,
    backpointer walk, and piece reconstruction are a single JVM-side
    expression chain over the vocab-bounded word table:

    - ``by_i`` pre-buckets edges by end position (one ``filter`` per
      position instead of per DP candidate);
    - the forward pass is ``aggregate`` over positions with an
      ``array<struct<a, bp>>`` accumulator — ``a`` the best integer
      score, ``bp`` the argmax backpointer (struct max breaks score
      ties toward the larger ``j``);
    - the backtrace is a second bounded ``aggregate`` (a word of
      length n needs <= n steps), then pieces slice out of the word.

    A word with an unreachable end (vocabulary missing one of its
    characters) gets ``score = NEG`` and NULL pieces."""
    edge_expr = F.expr(
        f"""flatten(transform(sequence(0, length(word) - 1), j ->
          transform(sequence(1, least({max_piece_len}, length(word) - j)), l ->
            struct(CAST(j AS INT) AS j, CAST(j + l AS INT) AS i,
                   substring(word, j + 1, l) AS sub))))"""
    )
    wsub = wf.select("word", "freq", F.explode(edge_expr).alias("e")).select(
        "word", "freq", "e.j", "e.i", "e.sub"
    )
    wedge_inner = (
        wsub.join(F.broadcast(lp_df), wsub.sub == lp_df.piece)
        .groupBy("word")
        .agg(F.collect_list(F.struct("j", "i", "lp")).alias("edges"))
    )
    # LEFT join back to the word table: a word with NO vocabulary
    # substring at all (possible under an arbitrary caller-supplied
    # vocabulary) must still emit its (NEG, NULL) row, not vanish in
    # the edge inner join — hypothesis caught the dropped-row variant
    wedge = (
        wf.select("word", "freq")
        .join(wedge_inner, "word", "left")
        .select(
            "word",
            "freq",
            F.coalesce(
                "edges",
                F.array().cast("array<struct<j:int,i:int,lp:bigint>>"),
            ).alias("edges"),
        )
    )
    dp = (
        wedge.withColumn(
            "by_i",
            F.expr(
                "transform(sequence(1, length(word)), i ->"
                " filter(edges, e -> e.i = i))"
            ),
        )
        .withColumn(
            "state",
            F.expr(
                f"""aggregate(
                  sequence(1, length(word)),
                  array(struct(CAST(0 AS BIGINT) AS a, CAST(0 AS INT) AS bp)),
                  (acc, i) -> concat(acc, array(coalesce(
                    array_max(transform(
                      filter(element_at(by_i, i),
                             e -> element_at(acc, e.j + 1).a > {NEG_HALF}L),
                      e -> struct(element_at(acc, e.j + 1).a + e.lp AS a,
                                  e.j AS bp))),
                    struct({NEG}L AS a, CAST(i - 1 AS INT) AS bp)))))"""
            ),
        )
        .withColumn("score", F.expr("element_at(state, length(word) + 1).a"))
        .withColumn(
            "cuts",
            F.expr(
                """aggregate(sequence(1, length(word)),
                     array(CAST(length(word) AS INT)),
                     (acc, x) -> IF(element_at(acc, 1) > 0,
                       concat(array(element_at(state,
                                    element_at(acc, 1) + 1).bp), acc),
                       acc))"""
            ),
        )
        .withColumn(
            "pieces",
            F.expr(
                f"""IF(score > {NEG_HALF}L,
                  transform(sequence(1, size(cuts) - 1), k ->
                    substring(word, element_at(cuts, k) + 1,
                              element_at(cuts, k + 1) - element_at(cuts, k))),
                  CAST(NULL AS ARRAY<STRING>))"""
            ),
        )
    )
    return dp.select("word", "freq", "score", "pieces")


def _em_round(
    wf: DataFrame, sel: DataFrame, max_piece_len: int, top_multi: int
) -> DataFrame:
    """One hard-EM round: Viterbi-segment the vocabulary under
    ``sel``'s quantized log-probs, then re-estimate ``(piece, cnt)``
    from usage (multis: the ``top_multi`` best raw Viterbi usage
    counts — usage pieces are a subset of ``sel``'s, so the cap only
    bites when pruning; singles: usage + 1)."""
    seg = viterbi_segment(wf, piece_logp(sel), max_piece_len)
    # usage feeds BOTH the singles and multis branches; unpinned, the
    # whole Viterbi chain above it executes twice per EM round. Only
    # (piece, u) is pinned — vocabulary-bounded (r16 optimization
    # round: bounded-frame reuse).
    usage = (
        seg.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("u"))
        .localCheckpoint(eager=False)
    )
    singles = (
        sel.filter(F.length("piece") == 1)
        .select("piece")
        .join(usage, "piece", "left")
        .select("piece", (F.coalesce(F.col("u"), F.lit(0)) + F.lit(1)).alias("cnt"))
    )
    multis = (
        usage.filter(F.length("piece") > 1)
        .select("piece", F.col("u").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(int(top_multi))
    )
    return singles.unionByName(multis)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def unigram_segment(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    top_multi: int = 512,
) -> DataFrame:
    """Seed a unigram vocabulary from the corpus and Viterbi-segment
    every distinct word: ``(word, freq, score, seg)`` with ``seg`` the
    space-joined piece sequence and ``score`` the exact integer DP
    maximum (1e-6 log-prob units)."""
    # same pin discipline as unigram_encode: wf has 3 subtree uses,
    # the seed 2 — both vocabulary-bounded
    wf = unigram_word_freq(df, text_col).localCheckpoint(eager=False)
    sel = seed_pieces(wf, max_piece_len, top_multi).localCheckpoint(
        eager=False
    )
    lp = piece_logp(sel)
    out = viterbi_segment(wf, lp, max_piece_len)
    return out.select(
        "word", "freq", "score", F.array_join("pieces", " ").alias("seg")
    )


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    top_multi: int = 512,
    rounds: int = 2,
) -> DataFrame:
    """Hard-EM (Viterbi-EM) unigram training: seed, then ``rounds``
    iterations of segment → re-count → prune. Returns the final
    vocabulary ``(piece, cnt, lp)``.

    Every round reads only the distinct-word table; the intermediate
    vocabulary is ``localCheckpoint``-ed per round to keep the plan
    flat (blocks are ContextCleaner-freed, no CacheManager pin)."""
    wf = unigram_word_freq(df, text_col).localCheckpoint(eager=False)
    sel = seed_pieces(wf, max_piece_len, top_multi)
    for _ in range(int(rounds)):
        sel = _em_round(
            wf, sel.localCheckpoint(eager=False), max_piece_len, top_multi
        )
    sel = sel.localCheckpoint(eager=False)
    return sel.join(piece_logp(sel), "piece").select("piece", "cnt", "lp")


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def _sql_chain(
    table: str,
    text_col: str,
    max_piece_len: int,
    top_multi: int,
    rounds: int,
) -> Tuple[list, str, str]:
    """Shared oracle CTE chain. Returns ``(ctes, final_bt, final_sel)``
    — the WITH-fragment list plus the names of the last backtrace CTE
    (for segment output) and the last vocabulary CTE (for train
    output). The per-round Viterbi is a recursive CTE carrying the
    full alpha/backpointer lists (depth bounded by MAX_WORD_LEN);
    round ``r`` names are suffixed ``_{r}`` so hard-EM unrolls as a
    materialized chain, like the BPE train oracle."""
    L = max_piece_len
    ctes = [
        f"""tok AS (
          SELECT unnest({tokens_sql(text_col)}) AS word FROM {table}
        )""",
        f"""wf AS MATERIALIZED (
          SELECT word, count(*) AS freq FROM tok
          WHERE length(word) <= {MAX_WORD_LEN} GROUP BY 1
        )""",
        f"""subs AS (
          SELECT e.sub AS piece, CAST(sum(freq) AS BIGINT) AS cnt
          FROM (
            SELECT freq, unnest(flatten(list_transform(range(0, length(word)), j ->
                     list_transform(range(1, least({L}, length(word) - j) + 1), l ->
                       substr(word, CAST(j AS INTEGER) + 1, CAST(l AS INTEGER)))))) AS sub
            FROM wf
          ) e(freq, sub)
          GROUP BY 1
        )""",
        f"""sel_0 AS MATERIALIZED (
          SELECT piece, cnt FROM subs WHERE length(piece) = 1
          UNION ALL
          SELECT piece, cnt FROM (
            SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
            FROM subs WHERE length(piece) > 1
          ) WHERE rn <= {top_multi}
        )""",
        f"""wsub AS MATERIALIZED (
          SELECT word, e.j AS j, e.j + e.l AS i, substr(word, e.j + 1, e.l) AS sub
          FROM (
            SELECT word, unnest(flatten(list_transform(range(0, length(word)), j ->
                     list_transform(range(1, least({L}, length(word) - j) + 1), l ->
                       {{'j': CAST(j AS INTEGER), 'l': CAST(l AS INTEGER)}})))) AS e
            FROM wf
          ) t(word, e)
        )""",
    ]
    for r in range(rounds + 1):
        ctes.append(
            f"""lp_{r} AS MATERIALIZED (
              SELECT piece,
                     CAST(floor(ln(CAST(cnt AS DOUBLE) / t.total) * 1e6 + 0.5)
                          AS BIGINT) AS lp
              FROM sel_{r}, (SELECT CAST(sum(cnt) AS DOUBLE) AS total
                             FROM sel_{r}) t
            )"""
        )
        ctes.append(
            # LEFT join: an edgeless word still emits its (NEG, NULL)
            # row — same contract as the Spark side
            f"""wedge_{r} AS MATERIALIZED (
              SELECT w.word, w.freq,
                     coalesce(e.edges,
                              CAST([] AS STRUCT(j INTEGER, i INTEGER,
                                                lp BIGINT)[])) AS edges
              FROM wf w LEFT JOIN (
                SELECT s.word,
                       list({{'j': s.j, 'i': s.i, 'lp': lp.lp}}) AS edges
                FROM wsub s JOIN lp_{r} lp ON s.sub = lp.piece
                GROUP BY 1
              ) e ON w.word = e.word
            )"""
        )
        ctes.append(
            f"""dp_{r} AS (
              SELECT word, freq, CAST(length(word) AS INTEGER) AS n, edges,
                     0 AS i, [CAST(0 AS BIGINT)] AS alphas,
                     [CAST(0 AS INTEGER)] AS bps
              FROM wedge_{r}
              UNION ALL
              SELECT word, freq, n, edges, i + 1,
                     list_append(alphas, coalesce(cand[1].a, CAST({NEG} AS BIGINT))),
                     list_append(bps, coalesce(cand[1].bp, i))
              FROM (
                SELECT word, freq, n, edges, i, alphas, bps,
                       list_reverse_sort(list_transform(
                         list_filter(edges, e -> e.i = i + 1
                           AND alphas[e.j + 1] > CAST({NEG_HALF} AS BIGINT)),
                         e -> {{'a': alphas[e.j + 1] + e.lp, 'bp': e.j}})) AS cand
                FROM dp_{r} WHERE i < n
              )
            )""")
        ctes.append(
            f"""bt_{r} AS (
              SELECT word, freq, n, bps, alphas[n + 1] AS score,
                     n AS pos, [n] AS cuts
              FROM dp_{r} WHERE i = n
              UNION ALL
              SELECT word, freq, n, bps, score, bps[pos + 1] AS pos,
                     list_prepend(bps[pos + 1], cuts) AS cuts
              FROM bt_{r} WHERE pos > 0
            )""")
        ctes.append(
            f"""seg_{r} AS MATERIALIZED (
              SELECT word, freq, score,
                     CASE WHEN score > CAST({NEG_HALF} AS BIGINT) THEN
                       list_transform(range(1, len(cuts)), k ->
                         substr(word, cuts[CAST(k AS INTEGER)] + 1,
                                cuts[CAST(k AS INTEGER) + 1]
                                - cuts[CAST(k AS INTEGER)]))
                     END AS pieces
              FROM bt_{r} WHERE pos = 0
            )""")
        if r < rounds:
            ctes.append(
                f"""usage_{r} AS MATERIALIZED (
                  SELECT piece, CAST(sum(freq) AS BIGINT) AS u
                  FROM (SELECT freq, unnest(pieces) AS piece FROM seg_{r})
                  GROUP BY 1
                )"""
            )
            ctes.append(
                f"""sel_{r + 1} AS MATERIALIZED (
                  SELECT s.piece, coalesce(u.u, 0) + 1 AS cnt
                  FROM (SELECT piece FROM sel_{r} WHERE length(piece) = 1) s
                  LEFT JOIN usage_{r} u ON s.piece = u.piece
                  UNION ALL
                  SELECT piece, cnt FROM (
                    SELECT piece, u AS cnt,
                           row_number() OVER (ORDER BY u DESC, piece) AS rn
                    FROM usage_{r} WHERE length(piece) > 1
                  ) WHERE rn <= {top_multi}
                )"""
            )
    return ctes, f"seg_{rounds}", f"sel_{rounds}"


def unigram_segment_sql(
    table: str = "documents",
    text_col: str = "text",
    max_piece_len: int = 4,
    top_multi: int = 512,
) -> str:
    """DuckDB oracle for :func:`unigram_segment`: the identical seed,
    quantization, and Viterbi DP replayed as a recursive CTE carrying
    the alpha/backpointer lists (depth <= MAX_WORD_LEN), with the same
    integer scores and (score, j) tie-break."""
    ctes, seg, _ = _sql_chain(table, text_col, max_piece_len, top_multi, 0)
    return (
        "WITH RECURSIVE\n" + ",\n".join(ctes) + f"""
        SELECT word, freq, score, array_to_string(pieces, ' ') AS seg
        FROM {seg}"""
    )


def unigram_train_sql(
    table: str = "documents",
    text_col: str = "text",
    max_piece_len: int = 4,
    top_multi: int = 512,
    rounds: int = 2,
) -> str:
    """DuckDB oracle for :func:`unigram_train`: ``rounds`` hard-EM
    iterations unrolled as a materialized CTE chain (each with its own
    recursive Viterbi), then the final vocabulary with re-quantized
    log-probs."""
    ctes, _, sel = _sql_chain(table, text_col, max_piece_len, top_multi, rounds)
    return (
        "WITH RECURSIVE\n" + ",\n".join(ctes) + f""",
        lp_fin AS (
          SELECT piece,
                 CAST(floor(ln(CAST(cnt AS DOUBLE) / t.total) * 1e6 + 0.5)
                      AS BIGINT) AS lp
          FROM {sel}, (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM {sel}) t
        )
        SELECT s.piece, CAST(s.cnt AS BIGINT) AS cnt, l.lp
        FROM {sel} s JOIN lp_fin l ON s.piece = l.piece"""
    )


def unigram_encode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
    top_multi: int = 512,
) -> DataFrame:
    """Encode the corpus to unigram piece-id sequences — the
    application stage (train → segment → encode) for the unigram
    family, mirroring :func:`..bpe.bpe_encode`'s discipline: one row
    per document ``(id, n_words, n_subtok, piece_ids)``; ids are the
    0-based lexicographic rank of the pieces actually used, so the
    mapping has no dependence on discovery order.

    Scale shape: segmentation and id assignment are vocab-bounded; the
    corpus-sized work is one tokenizer explode and a BROADCAST join of
    tokens against the (word → ids) map — corpus text is never
    shuffled; the per-document ordered reassembly is the only
    corpus-scale shuffle. Words longer than :data:`MAX_WORD_LEN` are
    outside the trained vocabulary and are skipped (not counted),
    identically in the oracle."""
    from pyspark.sql import Window

    # Pins (all vocabulary-bounded, r16 optimization round): wf feeds
    # seeding AND both sides of the lattice build (3 subtree uses = 3
    # corpus explode+groupBy passes unpinned); the seed feeds the
    # log-prob total AND the projection; seg feeds the id-rank and the
    # (word -> ids) branches. Each pin makes its chain execute once.
    wf = unigram_word_freq(df, text_col).localCheckpoint(eager=False)
    sel = seed_pieces(wf, max_piece_len, top_multi).localCheckpoint(
        eager=False
    )
    lp = piece_logp(sel)
    seg = viterbi_segment(wf, lp, max_piece_len).localCheckpoint(
        eager=False
    )
    pid = (
        seg.select(F.explode("pieces").alias("piece"))
        .distinct()
        .select(
            "piece",
            (F.row_number().over(Window.orderBy("piece")) - 1).alias(
                "piece_id"
            ),
        )
    )
    wids = (
        seg.select("word", F.posexplode("pieces").alias("p", "piece"))
        .join(F.broadcast(pid), "piece")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "piece_id"))),
                lambda x: x["piece_id"],
            ).alias("ids")
        )
    )
    toks = (
        df.select(
            F.col(id_col), F.posexplode(tokens(text_col)).alias("wp", "word")
        )
        .filter(F.length("word") <= MAX_WORD_LEN)
        .join(F.broadcast(wids), "word")
    )
    assembled = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("ids")).alias("n_subtok"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wp", "ids"))),
                lambda x: x["ids"],
            )
        ).alias("piece_ids"),
    )
    return (
        df.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_subtok", F.lit(0)).alias("n_subtok"),
            F.coalesce("piece_ids", F.array().cast("array<int>")).alias(
                "piece_ids"
            ),
        )
    )


def unigram_encode_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
    top_multi: int = 512,
) -> str:
    """DuckDB oracle for :func:`unigram_encode`: the seeded-vocabulary
    Viterbi replay (recursive CTE) plus the identical lexicographic id
    assignment and document-order concatenation."""
    ctes, seg, _ = _sql_chain(table, text_col, max_piece_len, top_multi, 0)
    toks = tokens_sql(text_col)
    return (
        "WITH RECURSIVE\n" + ",\n".join(ctes) + f""",
    pid AS (
      SELECT piece,
             CAST(row_number() OVER (ORDER BY piece) - 1 AS INT) AS piece_id
      FROM (SELECT DISTINCT unnest(pieces) AS piece FROM {seg})
    ),
    wids AS (
      SELECT word, list(piece_id ORDER BY p) AS ids
      FROM (
        SELECT word, p, pieces[p] AS piece
        FROM {seg}, LATERAL (SELECT unnest(range(1, len(pieces) + 1)) AS p)
      ) JOIN pid USING (piece)
      GROUP BY word
    ),
    tok2 AS (
      SELECT {id_col}, wp, arr[wp] AS word
      FROM (SELECT {id_col}, {toks} AS arr FROM {table}),
           LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS wp)
      WHERE length(arr[wp]) <= {MAX_WORD_LEN}
    ),
    assembled AS (
      SELECT tok2.{id_col},
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(len(ids)) AS BIGINT) AS n_subtok,
             flatten(list(ids ORDER BY wp)) AS piece_ids
      FROM tok2 JOIN wids USING (word)
      GROUP BY 1
    )
    SELECT t.{id_col},
           coalesce(a.n_words, 0) AS n_words,
           coalesce(a.n_subtok, 0) AS n_subtok,
           coalesce(a.piece_ids, []) AS piece_ids
    FROM {table} t LEFT JOIN assembled a ON a.{id_col} = t.{id_col}"""
    )
