"""Character-ngram language-model perplexity scoring — the CCNet-style
quality filter (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020: documents are
ranked by LM perplexity and the tail is dropped; Gopher/The Pile use the
same shape with KenLM). No external LM library exists in this
environment, so the model is a self-contained add-one-smoothed char
n-gram LM over the shared pipeline tokenizer alphabet — the plumbing
(train pass → broadcastable model → scoring pass) is exactly the
production shape; swap the probability table for a KenLM export when one
is available.

Scale design:
- **Training** is one explode + map-combined groupBy. The model space is
  bounded by the alphabet (``[a-z0-9 ]`` → ≤ 37^order grams, ~50k for
  trigrams), so partial aggregation collapses per-partition and the
  shuffle moves ``partitions × |grams|`` rows no matter the corpus size.
  Context counts DERIVE from the gram counts (group by prefix) — the
  corpus is scanned once.
- **Scoring** is one explode + a broadcast join against the ≤50k-row
  model + a map-combined per-doc aggregation: a doc's exploded grams
  stay in its input partition, so the partial agg collapses them to one
  row per doc before the exchange — shuffle is O(docs), never O(chars).
- Everything is JVM-side Column expressions (no Python in the hot path);
  counts are exact integers in both engines, so ``ln()`` sees identical
  rational inputs and 6-decimal rounding makes scores hash-comparable
  (the same cross-engine float fold BM25 uses).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .core import spread, tokens, tokens_sql

#: ``[a-z0-9 ]`` — 26 letters + 10 digits + space, the add-one
#: smoothing denominator ``V`` (alphabet of the normalized text)
ALPHABET = 37


def _norm(col) -> Column:
    """Normalized text: pipeline tokens joined by single spaces — reuses
    the proven cross-engine tokenizer, so unicode case folding and
    whitespace classes can never diverge between engines."""
    return F.array_join(tokens(col), " ")


def _norm_sql(expr: str) -> str:
    return f"array_to_string({tokens_sql(expr)}, ' ')"


def char_ngrams(col, n: int = 3) -> Column:
    """All character n-grams of the normalized text (empty array when
    shorter than ``n``). The normalized string is BOUND as a lambda
    variable before the per-index lambda slices it — referencing the
    normalization directly inside the lambda would re-evaluate it per
    gram (no CSE across lambda scopes; same trick as word_shingles)."""

    def _grams(t: Column) -> Column:
        ln = F.length(t)
        g = F.transform(
            F.sequence(F.lit(1), ln - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        )
        return F.when(ln >= n, g).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(_norm(col)), _grams), 1)


def _char_ngrams_sql(expr: str, n: int = 3) -> str:
    t = _norm_sql(expr)
    return (
        f"CASE WHEN length({t}) >= {n} THEN "
        f"[substr({t}, i, {n}) FOR i IN range(1, length({t}) - {n} + 2)] "
        f"ELSE [] END"
    )


def train_chargram_lm(
    df: DataFrame, text_col: str = "text", order: int = 3
) -> DataFrame:
    """Train the add-one-smoothed char n-gram LM: returns the model as a
    small DataFrame ``(g, logp)`` with
    ``logp = ln((count(g) + 1) / (count(prefix(g)) + ALPHABET))``.

    ≤ ``ALPHABET^order`` rows (~50k for trigrams) — persist or save it;
    scoring broadcasts it. One corpus scan.
    """
    grams = spread(df.select(text_col)).select(
        F.explode(char_ngrams(text_col, order)).alias("g")
    )
    c_gram = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c_g"))
    c_ctx = c_gram.groupBy(
        F.substring("g", 1, order - 1).alias("ctx")
    ).agg(F.sum("c_g").alias("c_ctx"))
    return c_gram.join(
        c_ctx, F.substring(c_gram["g"], 1, order - 1) == c_ctx["ctx"]
    ).select(
        "g",
        F.log(
            (F.col("c_g").cast("double") + F.lit(1.0))
            / (F.col("c_ctx").cast("double") + F.lit(float(ALPHABET)))
        ).alias("logp"),
    )


def chargram_logprob(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 3,
) -> DataFrame:
    """Score documents against a trained model: returns
    ``(id, n_grams, avg_logp)`` where ``avg_logp`` is the mean ln-prob
    of the doc's char n-grams (higher = more in-domain; CCNet keeps the
    head of this ranking). Docs with no grams (shorter than ``order``
    after normalization) are excluded, like CCNet's length floor.

    Grams unseen at training time back off to ``ln(1/ALPHABET)`` — the
    add-one floor for an unseen context.
    """
    grams = spread(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(char_ngrams(text_col, order)).alias("g")
    )
    # per-gram log-probs quantize to 1e-9 int64 units so the per-doc
    # mean is an exact integer sum with one final division chain —
    # order-dependent float sums can straddle the output rounding's
    # half boundary (the ASAP lesson), and engine round() itself
    # diverges on shortest-repr ties, so the output rounds via
    # floor(x*1e6+0.5)/1e6 spelled identically in the DuckDB oracle
    floor_lit = F.lit(math.log(1.0 / ALPHABET))
    lq = F.floor(
        F.coalesce(F.col("logp"), floor_lit) * F.lit(1.0e9) + F.lit(0.5)
    )
    return (
        grams.join(F.broadcast(model), "g", "left")
        .select(F.col(id_col), lq.alias("_lq"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            (
                F.floor(
                    F.sum("_lq").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(1.0e3)
                    + F.lit(0.5)
                )
                / F.lit(1.0e6)
            ).alias("avg_logp"),
        )
    )


def chargram_logprob_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 3,
) -> str:
    """DuckDB oracle replaying train-on-corpus + score-corpus
    literal-for-literal: identical tokenizer normalization, identical
    integer counts feeding ``ln()``, the same Python-literal unseen-gram
    floor, per-gram 1e-9 int quantization (exact sums), and the
    engine-neutral ``floor(x*1e6+0.5)/1e6`` output rounding."""
    grams = _char_ngrams_sql(text_col, order)
    return f"""
    WITH g AS (
      SELECT {id_col}, unnest({grams}) AS g FROM {table}
    ), c_gram AS (
      SELECT g, count(*) AS c_g FROM g GROUP BY g
    ), c_ctx AS (
      SELECT substr(g, 1, {order - 1}) AS ctx, sum(c_g) AS c_ctx
      FROM c_gram GROUP BY 1
    ), model AS (
      SELECT g, ln((c_g + 1.0) / (c_ctx + {ALPHABET}.0)) AS logp
      FROM c_gram JOIN c_ctx ON substr(c_gram.g, 1, {order - 1}) = c_ctx.ctx
    )
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_grams,
           floor(CAST(sum(CAST(floor(
                 coalesce(m.logp, {math.log(1.0 / ALPHABET)!r}) * 1000000000.0
                 + 0.5) AS BIGINT)) AS DOUBLE)
                 / count(*) / 1000.0 + 0.5) / 1000000.0 AS avg_logp
    FROM g LEFT JOIN model m USING (g)
    GROUP BY {id_col}
    """


# ---------------------------------------------------------------------------
# CCNet perplexity bucketing (head / middle / tail)
# ---------------------------------------------------------------------------


def ppl_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's per-language perplexity partition (Wenzek et al. 2020
    §4.3: each language is split into equal head/middle/tail thirds by
    LM perplexity; downstream training mixes or drops whole buckets).
    Documents are ranked by the char-gram LM's mean log-prob DESC
    (higher log-prob = lower perplexity = head — the monotone stand-in
    for perplexity, so no cross-engine ``exp`` enters the ordering),
    ties broken by id, and ntile'd per language.

    Output: ``(id, lang, n_grams, avg_logp, ppl_tile, ppl_bucket)``
    for every document the LM can score (≥ ``order`` chars after
    normalization — CCNet's length floor drops the rest).

    Scale shape: train + score are the :func:`chargram_logprob`
    plumbing (broadcast model, O(docs) shuffle). The exact per-language
    ntile is ONE sort per language — fine to ~1e8 docs/language; for a
    100 TB corpus use :func:`ppl_bucket_cutoffs` instead (exact
    percentile CUTOFFS from the bounded value histogram of the
    1e-6-quantized avg_logp, broadcast, labels by comparison at scan
    speed — no global sort)."""
    model = train_chargram_lm(df, text_col)
    scored = chargram_logprob(df, model, text_col, id_col)
    from pyspark.sql import Window

    j = scored.join(
        df.select(F.col(id_col), F.col(lang_col)), id_col
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_logp").desc(), F.col(id_col)
    )
    tile = F.ntile(int(n_buckets)).over(w)
    name = (
        F.when(tile == 1, F.lit("head"))
        .when(tile == int(n_buckets), F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return j.select(
        F.col(id_col),
        F.col(lang_col),
        "n_grams",
        "avg_logp",
        tile.alias("ppl_tile"),
        name.alias("ppl_bucket"),
    )


def ppl_buckets_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> str:
    """DuckDB oracle for :func:`ppl_buckets`: the chargram train+score
    replay, the identical (avg_logp DESC, id) per-language ordering,
    and the same ntile → head/middle/tail mapping."""
    inner = chargram_logprob_sql(table, text_col, id_col)
    return f"""
    WITH scored AS ({inner}),
    tiled AS (
      SELECT s.{id_col}, t.{lang_col}, s.n_grams, s.avg_logp,
             CAST(ntile({int(n_buckets)}) OVER (
               PARTITION BY t.{lang_col}
               ORDER BY s.avg_logp DESC, s.{id_col}
             ) AS INT) AS ppl_tile
      FROM scored s JOIN {table} t USING ({id_col})
    )
    SELECT {id_col}, {lang_col}, n_grams, avg_logp, ppl_tile,
           CASE WHEN ppl_tile = 1 THEN 'head'
                WHEN ppl_tile = {int(n_buckets)} THEN 'tail'
                ELSE 'middle' END AS ppl_bucket
    FROM tiled
    """


def ppl_bucket_cutoffs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The 100 TB form of :func:`ppl_buckets` — CCNet's actual
    deployment shape (Wenzek et al. 2020 §4.3 compute per-language
    perplexity THRESHOLDS once, then label by comparison): no corpus
    sort, no per-language ntile window.

    Algorithm: the per-document mean log-probs are already
    1e-6-quantized, so ``groupBy(lang, avg_logp).count()`` is an EXACT
    value histogram (bounded by distinct quantized scores, not docs);
    a cumulative count over that small frame finds the crossing values

    - ``c1`` = max score v with ``|{logp ≥ v}| ≥ ⌈n/3⌉``  (head floor)
    - ``c2`` = max score v with ``|{logp ≥ v}| ≥ ⌈2n/3⌉`` (middle floor)

    and the ≤2 cutoffs per language broadcast back: ``head`` =
    ``logp ≥ c1``, ``tail`` = ``logp < c2``, else ``middle``. Ties sit
    wholly on the head side of their boundary (value semantics — equal
    scores land in equal buckets, unlike ntile's positional split), so
    bucket sizes overshoot n/3 by at most the boundary tie group.

    Output: ``(id, lang, avg_logp, ppl_bucket)`` for every scoreable
    document."""
    from pyspark.sql import Window

    model = train_chargram_lm(df, text_col)
    # scored feeds TWO plan branches (the cutoff histogram and the
    # final labeling join); unmaterialized, the whole train + score
    # subtree — two corpus scans plus the model join — would execute
    # once per branch (r16 optimization round). (id, n_grams,
    # avg_logp, lang) is ~30 bytes/row at any scale; localCheckpoint
    # blocks are ContextCleaner-freed when the caller drops the result.
    scored = chargram_logprob(df, model, text_col, id_col).join(
        df.select(F.col(id_col), F.col(lang_col)), id_col
    ).localCheckpoint(eager=False)
    hist = scored.groupBy(lang_col, "avg_logp").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wdesc = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("avg_logp").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(lang_col)
    cum = hist.select(
        lang_col,
        "avg_logp",
        F.sum("_c").over(wdesc).alias("_cum"),
        F.sum("_c").over(wtot).alias("_n"),
    )
    n1 = F.ceil(F.col("_n") / 3)
    n2 = F.ceil(F.col("_n") * 2 / 3)
    cuts = cum.groupBy(lang_col).agg(
        F.max(
            F.when(F.col("_cum") >= n1, F.col("avg_logp"))
        ).alias("_c1"),
        F.max(
            F.when(F.col("_cum") >= n2, F.col("avg_logp"))
        ).alias("_c2"),
    )
    lab = (
        F.when(F.col("avg_logp") >= F.col("_c1"), F.lit("head"))
        .when(F.col("avg_logp") >= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(cuts), lang_col).select(
        F.col(id_col),
        F.col(lang_col),
        "avg_logp",
        lab.alias("ppl_bucket"),
    )


def ppl_bucket_cutoffs_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> str:
    """DuckDB oracle for :func:`ppl_bucket_cutoffs`: the identical
    histogram, cumulative crossing values, and comparison labels."""
    inner = chargram_logprob_sql(table, text_col, id_col)
    return f"""
    WITH scored AS (
      SELECT s.{id_col}, t.{lang_col}, s.avg_logp
      FROM ({inner}) s JOIN {table} t USING ({id_col})
    ),
    hist AS (
      SELECT {lang_col}, avg_logp, count(*) AS c
      FROM scored GROUP BY 1, 2
    ),
    cum AS (
      SELECT {lang_col}, avg_logp,
             sum(c) OVER (
               PARTITION BY {lang_col} ORDER BY avg_logp DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cm,
             sum(c) OVER (PARTITION BY {lang_col}) AS n
      FROM hist
    ),
    cuts AS (
      SELECT {lang_col},
             max(CASE WHEN cm >= ceil(n / 3) THEN avg_logp END) AS c1,
             max(CASE WHEN cm >= ceil(n * 2 / 3) THEN avg_logp END) AS c2
      FROM cum GROUP BY 1
    )
    SELECT s.{id_col}, s.{lang_col}, s.avg_logp,
           CASE WHEN s.avg_logp >= c.c1 THEN 'head'
                WHEN s.avg_logp >= c.c2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored s JOIN cuts c USING ({lang_col})
    """
