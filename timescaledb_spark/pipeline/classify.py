"""Multinomial Naive Bayes document classification — the
classifier-based quality/domain filter family (GPT-3's LR-over-features
quality classifier, Brown et al. 2020 Appendix A; LLaMA's fasttext
language filter, Touvron et al. 2023 §2.1). No external classifier
library exists in this environment, so the model is a self-contained
add-one-smoothed multinomial NB over the shared pipeline tokenizer —
the plumbing (bounded train pass → broadcastable dense model → one
scoring pass) is exactly the production shape; swap the probability
table for an exported fasttext/LR model when one is available.

Scale design:

- **Vocabulary** is capped top-``vocab_cap`` words by global count
  (deterministic tie-break count desc, word asc) — the model space is
  ``vocab × labels`` rows no matter the corpus size, so it broadcasts.
- **Training** is one explode + two map-combined groupBys (word-label
  counts, label totals); the shuffle moves ``partitions × vocab`` rows.
- **Scoring** is one explode + a broadcast join against the dense
  model + a map-combined per-(doc, label) aggregation; out-of-vocab
  tokens contribute each label's smoothing floor, computed from the
  per-doc token count — no second scan. Shuffle is O(docs × labels).
- Counts are exact integers in both engines, so ``ln()`` sees identical
  rational inputs; per-doc sums are rounded to 6 decimals before the
  argmax (the BM25/chargram cross-engine float fold), and label ties
  break lexicographically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .core import spread, tokens, tokens_sql

DEFAULT_VOCAB_CAP = 20_000


def train_nb(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    vocab_cap: int = DEFAULT_VOCAB_CAP,
) -> DataFrame:
    """Train the dense NB model: one row per (word, label) over the
    capped vocabulary, with
    ``logp = ln((c(w,l) + 1) / (T_l + V))`` (add-one smoothing over
    the vocab), plus per-label ``prior = ln(docs_l / docs)`` and the
    label's OOV floor ``logp0 = ln(1 / (T_l + V))`` repeated on every
    row (keeps the model a single broadcastable frame).

    ``vocab × labels`` rows — bounded regardless of corpus size."""
    toks = spread(df.select(label_col, text_col)).select(
        F.col(label_col).alias("_l"),
        F.explode(tokens(text_col)).alias("_w"),
    )
    vocab = (
        toks.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("_w").asc())
        .limit(int(vocab_cap))
        .select("_w")
    )
    wl = (
        toks.join(F.broadcast(vocab), "_w")
        .groupBy("_w", "_l")
        .agg(F.count(F.lit(1)).alias("_cwl"))
    )
    labels = (
        df.groupBy(F.col(label_col).alias("_l"))
        .agg(F.count(F.lit(1)).alias("_docs"))
    )
    tot = labels.agg(F.sum("_docs").alias("_n")).collect()[0]["_n"]
    v = vocab.count()
    lt = wl.groupBy("_l").agg(F.sum("_cwl").alias("_tl"))
    lab = labels.join(lt, "_l", "left").select(
        "_l",
        F.log(F.col("_docs").cast("double") / F.lit(float(tot))).alias(
            "prior"
        ),
        F.coalesce(F.col("_tl"), F.lit(0)).alias("_tl"),
    )
    dense = vocab.crossJoin(F.broadcast(lab)).join(
        wl, ["_w", "_l"], "left"
    )
    denom = F.col("_tl").cast("double") + F.lit(float(v))
    return dense.select(
        F.col("_w").alias("word"),
        F.col("_l").alias("label"),
        F.log(
            (F.coalesce(F.col("_cwl"), F.lit(0)).cast("double") + 1.0)
            / denom
        ).alias("logp"),
        F.col("prior"),
        F.log(F.lit(1.0) / denom).alias("logp0"),
    )


def nb_scores(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against every label and keep the argmax:
    ``score_l = prior_l + Σ_matched logp(w,l) + oov_count · logp0_l``,
    rounded to 6 decimals; ties break by label asc.

    Output: ``(id, label, score)`` — one row per document."""
    # NULL text tokenizes to NULL, and F.size(NULL) is -1 — which would
    # make the OOV count negative and the score wrong (and diverge from
    # the oracle, whose len(NULL) is NULL → coalesced to 0). Coalesce to
    # an empty token array so NULL documents score as zero-token docs.
    base = spread(df.select(id_col, text_col)).select(
        F.col(id_col).alias("_id"),
        F.coalesce(
            tokens(text_col), F.array().cast("array<string>")
        ).alias("_ts"),
    )
    ntok = base.select("_id", F.size("_ts").alias("_n"))
    ex = base.select("_id", F.explode("_ts").alias("word"))
    matched = (
        ex.join(F.broadcast(model), "word")
        .groupBy("_id", "label")
        .agg(
            F.count(F.lit(1)).alias("_m"),
            F.sum("logp").alias("_s"),
        )
    )
    # per-label model scalars for docs with zero matched tokens
    lab = model.select("label", "prior", "logp0").distinct()
    scored = (
        ntok.crossJoin(F.broadcast(lab))
        .join(matched, ["_id", "label"], "left")
        .select(
            "_id",
            "label",
            F.round(
                F.col("prior")
                + F.coalesce(F.col("_s"), F.lit(0.0))
                + (
                    F.col("_n") - F.coalesce(F.col("_m"), F.lit(0))
                ).cast("double")
                * F.col("logp0"),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("label").alias("pred"),
            "score",
        )
    )


def nb_classify(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    vocab_cap: int = DEFAULT_VOCAB_CAP,
) -> DataFrame:
    """Self-train on the labeled corpus and score it — the one-call
    form (production splits train/score across corpora; both passes
    are the same plumbing)."""
    model = train_nb(df, text_col, label_col, vocab_cap)
    return nb_scores(df, model, text_col, id_col)


def nb_classify_sql(
    table: str = "documents",
    text_expr: str = "text",
    label_expr: str = "lang",
    id_expr: str = "doc_id",
    vocab_cap: int = DEFAULT_VOCAB_CAP,
) -> str:
    """DuckDB oracle replaying :func:`nb_classify` end to end: same
    tokenizer, same capped vocabulary (count desc, word asc), same
    integer counts → identical ln() inputs, same 6-decimal rounded
    scores and lexicographic tie-break."""
    toks = tokens_sql(text_expr)
    return f"""
    WITH tok AS (
      SELECT {id_expr} AS id, {label_expr} AS l,
             unnest({toks}) AS w
      FROM {table}
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS c FROM tok GROUP BY 1
      ) ORDER BY c DESC, w ASC LIMIT {int(vocab_cap)}
    ),
    vsize AS (SELECT count(*) AS v FROM vocab),
    wl AS (
      SELECT tok.w, tok.l, count(*) AS cwl
      FROM tok JOIN vocab USING (w) GROUP BY 1, 2
    ),
    labels AS (
      SELECT {label_expr} AS l, count(*) AS docs FROM {table} GROUP BY 1
    ),
    tot AS (SELECT sum(docs) AS n FROM labels),
    lt AS (SELECT l, sum(cwl) AS tl FROM wl GROUP BY 1),
    lab AS (
      SELECT labels.l,
             ln(CAST(docs AS DOUBLE) / (SELECT n FROM tot)) AS prior,
             coalesce(lt.tl, 0) AS tl
      FROM labels LEFT JOIN lt ON labels.l = lt.l
    ),
    model AS (
      SELECT vocab.w AS word, lab.l AS label,
             ln((coalesce(wl.cwl, 0) + 1.0)
                / (lab.tl + (SELECT v FROM vsize))) AS logp,
             lab.prior,
             ln(1.0 / (lab.tl + (SELECT v FROM vsize))) AS logp0
      FROM vocab CROSS JOIN lab
      LEFT JOIN wl ON wl.w = vocab.w AND wl.l = lab.l
    ),
    ntok AS (
      SELECT {id_expr} AS id, coalesce(len({toks}), 0) AS n FROM {table}
    ),
    matched AS (
      SELECT tok.id, model.label, count(*) AS m, sum(model.logp) AS s
      FROM tok JOIN model ON tok.w = model.word
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT ntok.id, lab.l AS label,
             round(lab.prior + coalesce(matched.s, 0)
                   + (ntok.n - coalesce(matched.m, 0))
                     * ln(1.0 / (lab.tl + (SELECT v FROM vsize))),
                   6) AS score
      FROM ntok CROSS JOIN lab
      LEFT JOIN matched ON matched.id = ntok.id AND matched.label = lab.l
    )
    SELECT id AS {id_expr}, label AS pred, score
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY id ORDER BY score DESC, label ASC
      ) AS rk
      FROM scored
    ) WHERE rk = 1
    """
