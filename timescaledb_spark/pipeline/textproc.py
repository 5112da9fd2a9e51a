"""Text analysis operators for training-data curation.

Language ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (min-hash of
character k-grams, a winnowing-style rolling fingerprint).

All pure SQL expressions — JVM-side, codegen-friendly, no UDFs — so a
100 TB documents table processes at full scan speed with zero shuffle
(every feature is a per-row projection). Functions take a *column name*
and return a Column built with ``F.expr`` so the paired ``*_sql`` helper
emits the bit-identical DuckDB formula for the oracle. Reference analog:
TimescaleDB has no text pipeline; these extend the engine for LLM data
curation (BASELINE north-star items).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .core import TOKEN_RE

#: BPE-ish pre-tokenization: letter runs, single digits, single symbols.
BPE_RE = "[a-z]+|[0-9]|[^a-z0-9\\s]"
PUNCT_RE = "[^a-z0-9\\s]"
# Spark SQL single-quoted literals process backslash escapes (\s -> s),
# DuckDB's do not — double them for the Spark expr strings only.
BPE_RE_SPARK = BPE_RE.replace("\\", "\\\\")
PUNCT_RE_SPARK = PUNCT_RE.replace("\\", "\\\\")

#: stopword lists for the stopword-hit language heuristic, in
#: deterministic priority order for tie-breaking.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "on", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "ist", "im", "den"),
    "fr": ("le", "les", "des", "et", "une", "du", "dans", "pour", "est", "au"),
}


def _toks(name: str) -> str:
    return f"regexp_extract_all(lower({name}), '{TOKEN_RE}', 0)"


def _toks_duck(name: str) -> str:
    return f"regexp_extract_all(lower({name}), '{TOKEN_RE}')"


def token_count(name: str) -> Column:
    """Token count under the shared `[a-z0-9]+` tokenizer."""
    return F.expr(f"size({_toks(name)})")


def token_count_sql(name: str) -> str:
    return f"len({_toks_duck(name)})"


def bpe_token_count(name: str) -> Column:
    """Upper-bound BPE token estimate via GPT-style pre-tokenizer regex."""
    return F.expr(f"regexp_count(lower({name}), '{BPE_RE_SPARK}')")


def bpe_token_count_sql(name: str) -> str:
    return f"len(regexp_extract_all(lower({name}), '{BPE_RE}'))"


def punct_count(name: str) -> Column:
    return F.expr(f"regexp_count(lower({name}), '{PUNCT_RE_SPARK}')")


def punct_count_sql(name: str) -> str:
    return f"len(regexp_extract_all(lower({name}), '{PUNCT_RE}'))"


def _stoplist(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])


def stop_hits(name: str, lang: str = "en") -> Column:
    """Count of tokens (with multiplicity) in the language's stopword list."""
    return F.expr(f"size(filter({_toks(name)}, t -> t IN ({_stoplist(lang)})))")


def stop_hits_sql(name: str, lang: str = "en") -> str:
    return f"len(list_filter({_toks_duck(name)}, t -> t IN ({_stoplist(lang)})))"


def mean_token_len(name: str) -> Column:
    t = _toks(name)
    return F.expr(
        f"CAST(aggregate({t}, 0, (acc, w) -> acc + length(w)) AS DOUBLE)"
        f" / CAST(nullif(size({t}), 0) AS DOUBLE)"
    )


def mean_token_len_sql(name: str) -> str:
    t = _toks_duck(name)
    return (
        f"CAST(list_sum([length(w) FOR w IN {t}]) AS DOUBLE)"
        f" / CAST(nullif(len({t}), 0) AS DOUBLE)"
    )


def quality_score(name: str) -> Column:
    """Deterministic [0,1] quality heuristic: length, stopword density,
    punctuation density. Fixed formula so the oracle reproduces it:

      0.4*min(n_tok/64, 1) + 0.3*min(4*stop/n_tok, 1)
      + 0.3*max(1 - 8*punct/n_chars, 0)
    """
    n_tok = f"CAST(size({_toks(name)}) AS DOUBLE)"
    stop = f"CAST(size(filter({_toks(name)}, t -> t IN ({_stoplist('en')}))) AS DOUBLE)"
    punct = f"CAST(regexp_count(lower({name}), '{PUNCT_RE_SPARK}') AS DOUBLE)"
    n_chars = f"CAST(greatest(length({name}), 1) AS DOUBLE)"
    return F.expr(
        f"0.4 * least({n_tok} / 64.0, 1.0)"
        f" + 0.3 * (CASE WHEN {n_tok} > 0 THEN least(4.0 * {stop} / {n_tok}, 1.0)"
        f"          ELSE 0.0 END)"
        f" + 0.3 * greatest(1.0 - 8.0 * {punct} / {n_chars}, 0.0)"
    )


def quality_score_sql(name: str) -> str:
    n_tok = f"CAST({token_count_sql(name)} AS DOUBLE)"
    stop = f"CAST({stop_hits_sql(name)} AS DOUBLE)"
    punct = f"CAST({punct_count_sql(name)} AS DOUBLE)"
    n_chars = f"CAST(greatest(length({name}), 1) AS DOUBLE)"
    return (
        f"0.4 * least({n_tok} / 64.0, 1.0)"
        f" + 0.3 * (CASE WHEN {n_tok} > 0 THEN least(4.0 * {stop} / {n_tok}, 1.0)"
        f"          ELSE 0.0 END)"
        f" + 0.3 * greatest(1.0 - 8.0 * {punct} / {n_chars}, 0.0)"
    )


def _langid_case(hit_exprs: dict[str, str]) -> str:
    """Shared CASE chain: argmax of hits, earlier languages win ties."""
    langs = list(LANG_STOPWORDS)
    out = "'und'"
    for lang in reversed(langs):
        conds = [f"{hit_exprs[lang]} > 0"]
        for o in langs[langs.index(lang) + 1 :]:
            conds.append(f"{hit_exprs[lang]} >= {hit_exprs[o]}")
        for o in langs[: langs.index(lang)]:
            conds.append(f"{hit_exprs[lang]} > {hit_exprs[o]}")
        out = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {out} END"
    return out


def lang_id(name: str) -> Column:
    """Language guess: argmax of per-language stopword hits; ties go to the
    earlier language in LANG_STOPWORDS order; zero hits → 'und'."""
    hits = {
        lang: f"size(filter({_toks(name)}, t -> t IN ({_stoplist(lang)})))"
        for lang in LANG_STOPWORDS
    }
    return F.expr(_langid_case(hits))


def lang_id_sql(name: str) -> str:
    hits = {lang: stop_hits_sql(name, lang) for lang in LANG_STOPWORDS}
    return _langid_case(hits)


FP_GRAM = 16
FP_STRIDE = 8


def doc_fingerprint(name: str) -> Column:
    """Rolling-hash document fingerprint: min md5 over character
    FP_GRAM-grams sampled every FP_STRIDE chars (winnowing-style). Texts
    shorter than FP_GRAM hash the whole text."""
    return F.expr(
        f"array_min(transform("
        f"sequence(1, greatest(length({name}) - {FP_GRAM - 1}, 1), {FP_STRIDE}),"
        f" i -> md5(substring({name}, i, {FP_GRAM}))))"
    )


def doc_fingerprint_sql(name: str) -> str:
    return (
        f"list_aggregate([md5(substring({name}, i, {FP_GRAM})) "
        f"FOR i IN range(1, greatest(length({name}) - {FP_GRAM - 1}, 1) + 1, "
        f"{FP_STRIDE})], 'min')"
    )


def text_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All text-analysis features as one narrow projection (single scan,
    column-pruned to (id, text) at the parquet reader)."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tok"),
        bpe_token_count(text_col).alias("n_bpe"),
        punct_count(text_col).alias("n_punct"),
        stop_hits(text_col).alias("n_stop"),
        mean_token_len(text_col).alias("mean_tok_len"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_guess"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )


#: feature-hashing defaults: 3-gram char shingles into 64 buckets via a
#: polynomial codepoint key — deterministic and engine-portable (ascii/
#: substring/length behave identically in Spark SQL and DuckDB), unlike
#: engine hash() builtins.
FEAT_DIM = 64
FEAT_N = 3


def _feat_bucket(name: str, dim: int) -> str:
    """(codepoint-polynomial of the 3-gram at position i) % dim — the
    shared Spark/DuckDB formula body (i is the lambda/comprehension
    variable in both dialects)."""
    return (
        f"(ascii(substring({name}, i, 1)) * 65536 + "
        f"ascii(substring({name}, i + 1, 1)) * 256 + "
        f"ascii(substring({name}, i + 2, 1))) % {dim}"
    )


def _cps_expr(text_col: str) -> Column:
    """Codepoint array of ``text_col`` — the single split+ascii pass every
    gram consumer shares (bind it to a sibling column named ``cps``)."""
    return F.expr(f"transform(split({text_col}, ''), c -> ascii(c))")


def _gram_buckets_expr(text_col: str, dim: int) -> Column:
    """Bucket stream of the FEAT_N-gram codepoint polynomial, reading a
    sibling ``cps`` column built by :func:`_cps_expr`. THE shared
    featurizer formula: ``hash_features`` and ``classify.lr_features``
    must produce identical integer buckets (their DuckDB oracles replay
    this exact arithmetic), so the expression lives here once (r16
    ADVICE: the lr_features copy could silently diverge).

    One codepoint pass per row, then O(1) ``element_at`` per gram — the
    naive per-position form calls substring+ascii 3x per character and
    measured ~2x slower at sf0.1."""
    return F.expr(
        f"CASE WHEN length({text_col}) >= {FEAT_N} THEN "
        f"transform(sequence(1, length({text_col}) - {FEAT_N - 1}), "
        f"i -> (cps[i - 1] * 65536 + cps[i] * 256 + cps[i + 1]) % {int(dim)}) "
        f"ELSE array() END"
    )


def hash_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = FEAT_DIM,
) -> DataFrame:
    """Feature hashing (the 'hashing trick'): bucket counts of character
    3-grams — the classic cheap featurizer for quality classifiers and
    near-dup triage over a training corpus. Pure JVM expressions
    (sequence/transform/explode + one map-combined groupBy), so the only
    shuffle is the final (id, bucket) count — output is bounded by
    docs × dim regardless of text length. Returns (id, bucket, cnt)."""
    df = df.withColumn("cps", _cps_expr(text_col))
    return (
        df.select(
            F.col(id_col),
            F.explode(_gram_buckets_expr(text_col, dim)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hash_features_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = FEAT_DIM,
) -> str:
    """DuckDB oracle for :func:`hash_features` (list comprehension +
    unnest mirrors sequence/transform + explode; an empty list drops the
    row in both engines)."""
    return f"""
    SELECT {id_col}, bucket, count(*) AS cnt FROM (
        SELECT {id_col},
               unnest([{_feat_bucket(text_col, dim)}
                       FOR i IN range(1, greatest(length({text_col}) - {FEAT_N - 1}, 0) + 1)]) AS bucket
        FROM {table}
    ) GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------

#: leading bullet / list markers (Gopher "lines starting with a bullet")
BULLET_RE = r"^\s*[-*•·]"
#: trailing ellipsis (Gopher "lines ending with an ellipsis")
ELLIPSIS_RE = r"(\.\.\.|…)\s*$"


def repetition_signals(name: str) -> dict[str, Column]:
    """Gopher-style repetition / format signals as pure per-row column
    expressions (Rae et al. 2021, "Scaling Language Models", table A1):

    - ``dup_line_frac``: fraction of lines that are repeats of an earlier
      line in the same document.
    - ``dup_line_char_frac``: fraction of characters contained in those
      repeated line instances.
    - ``dup_para_frac``: same at paragraph (blank-line-separated) level.
    - ``frac_unique_words``: distinct-token / token ratio.
    - ``bullet_line_frac`` / ``ellipsis_line_frac``: format signals.

    Zero shuffle — a 100 TB corpus filters at scan speed. The paired
    :func:`repetition_signals_sql` emits the bit-identical DuckDB formula
    (counts and lengths are set-invariant, so ``array_distinct`` /
    ``list_distinct`` ordering differences cannot leak into the values).
    """
    col = F.col(name)
    ls = F.split(col, "\n", -1)
    ps = F.split(col, "\n\n", -1)
    ws = F.expr(_toks(name))
    n_lines = F.size(ls)
    n_paras = F.size(ps)
    all_chars = F.length(F.array_join(ls, ""))
    return {
        "n_lines": n_lines,
        "dup_line_frac": (n_lines - F.size(F.array_distinct(ls))) / n_lines,
        "dup_line_char_frac": (
            all_chars - F.length(F.array_join(F.array_distinct(ls), ""))
        )
        / F.greatest(F.lit(1), all_chars),
        "dup_para_frac": (n_paras - F.size(F.array_distinct(ps))) / n_paras,
        "frac_unique_words": F.size(F.array_distinct(ws))
        / F.greatest(F.lit(1), F.size(ws)),
        "bullet_line_frac": F.size(
            F.filter(ls, lambda x: x.rlike(BULLET_RE))
        )
        / n_lines,
        "ellipsis_line_frac": F.size(
            F.filter(ls, lambda x: x.rlike(ELLIPSIS_RE))
        )
        / n_lines,
    }


def repetition_signals_sql(name: str) -> dict[str, str]:
    """DuckDB formulas matching :func:`repetition_signals` bit-exactly."""
    ls = f"string_split({name}, chr(10))"
    ps = f"string_split({name}, chr(10) || chr(10))"
    ws = _toks_duck(name)
    n_lines = f"len({ls})"
    n_paras = f"len({ps})"
    all_chars = f"length(list_aggregate({ls}, 'string_agg', ''))"
    dedup_chars = f"length(list_aggregate(list_distinct({ls}), 'string_agg', ''))"
    return {
        "n_lines": n_lines,
        "dup_line_frac": f"({n_lines} - len(list_distinct({ls}))) / {n_lines}",
        "dup_line_char_frac": (
            f"({all_chars} - {dedup_chars}) / greatest(1, {all_chars})"
        ),
        "dup_para_frac": f"({n_paras} - len(list_distinct({ps}))) / {n_paras}",
        "frac_unique_words": (
            f"len(list_distinct({ws})) / greatest(1, len({ws}))"
        ),
        "bullet_line_frac": (
            f"len(list_filter({ls}, x -> regexp_matches(x, '{BULLET_RE}')))"
            f" / {n_lines}"
        ),
        "ellipsis_line_frac": (
            f"len(list_filter({ls}, x -> regexp_matches(x, '{ELLIPSIS_RE}')))"
            f" / {n_lines}"
        ),
    }


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: conservative PII patterns, valid under BOTH Java regex (Spark) and RE2
#: (DuckDB): no lookaround, no backrefs, identical \b/\d/\s semantics.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{8,15}|\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b"

_PII_STAGES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_pii(name: str) -> dict[str, Column]:
    """Regex PII scrubbing as pure column expressions: emails, IPv4
    addresses, then phone numbers are replaced with typed placeholders,
    each stage counting its matches on the previous stage's output (so a
    phone can never double-count digits inside an already-redacted IP).

    Returns ``{"redacted": Column, "n_email": .., "n_ip": .., "n_phone": ..}``.
    Zero shuffle — redaction runs at scan speed on a 100 TB corpus; the
    paired :func:`redact_pii_sql` replays the identical stage order in
    DuckDB ('g' flag — Spark's regexp_replace is always global).
    """
    out: dict[str, Column] = {}
    cur = F.col(name)
    for key, pat, token in _PII_STAGES:
        out[f"n_{key}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, token)
    out["redacted"] = cur
    return out


def redact_pii_sql(name: str) -> dict[str, str]:
    """DuckDB formulas matching :func:`redact_pii` stage-for-stage."""
    out: dict[str, str] = {}
    cur = name
    for key, pat, token in _PII_STAGES:
        out[f"n_{key}"] = f"len(regexp_extract_all({cur}, '{pat}'))"
        cur = f"regexp_replace({cur}, '{pat}', '{token}', 'g')"
    out["redacted"] = cur
    return out


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Context-window document splitting — the pretraining chunking
    step (split long documents into fixed-token windows with overlap so
    no training example truncates mid-context; e.g. BERT's 512-token
    sliding windows, RAG passage chunking). Windows start every
    ``stride`` tokens (stride < window ⇒ overlap of window−stride); the
    final window is the shorter tail unless it is fully contained in
    the previous one. Documents with no tokens yield zero rows.

    Pure array expressions: tokenize once, bind the array, slice per
    start index — one projection + a bounded explode (≤ n_tokens /
    stride rows out per doc), no shuffle, no Python.

    Output: ``(id, chunk_idx, n_tokens, chunk)``.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # stride > window leaves token gaps between chunks AND the
        # ceil start grid can overshoot past the end (found by
        # tests/test_r14_properties.py) — every real chunking config
        # overlaps or exactly partitions
        raise ValueError("stride must be <= window (no coverage gaps)")
    toks = F.expr(_toks(text_col))
    # bind the token array before slicing (no CSE across lambda scopes
    # — the word_shingles/char_ngrams discipline)
    starts = F.expr(
        f"""
        transform(
          array({_toks(text_col)}),
          t -> CASE
            WHEN size(t) = 0 THEN array()
            WHEN size(t) <= {window} THEN array(0)
            ELSE transform(
              sequence(0, CAST(ceil((size(t) - {window})
                                    / CAST({stride} AS DOUBLE)) AS INT)),
              i -> i * {stride})
          END
        )[0]
        """
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        toks.alias("_t"),
        starts.alias("_ss"),
    )
    ex = base.select(
        "_id", "_t", F.posexplode("_ss").alias("_ci", "_st")
    )
    piece = F.slice(F.col("_t"), F.col("_st") + 1, window)
    return ex.select(
        F.col("_id").alias(id_col),
        F.col("_ci").alias("chunk_idx"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )


def chunk_documents_sql(
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
    window: int = 256,
    stride: int = 192,
) -> str:
    """DuckDB oracle replaying :func:`chunk_documents` exactly (same
    tokenizer, same start grid, same tail rule)."""
    toks = _toks_duck(text_expr)
    return f"""
    WITH t AS (
      SELECT {id_expr} AS id, {toks} AS tk FROM {table}
    ), s AS (
      SELECT id, tk,
             CASE
               WHEN len(tk) = 0 THEN []
               WHEN len(tk) <= {window} THEN [0]
               ELSE [i * {stride} FOR i IN range(0,
                 CAST(ceil((len(tk) - {window})
                           / CAST({stride} AS DOUBLE)) AS INT) + 1)]
             END AS starts
      FROM t
    ), ex AS (
      SELECT id, tk, unnest(starts) AS st,
             generate_subscripts(starts, 1) - 1 AS ci
      FROM s
    )
    SELECT id AS {id_expr}, CAST(ci AS INT) AS chunk_idx,
           CAST(len(tk[st + 1 : st + {window}]) AS INT) AS n_tokens,
           array_to_string(tk[st + 1 : st + {window}], ' ') AS chunk
    FROM ex
    """


# ---------------------------------------------------------------------------
# Gopher doc-level quality rules (round 15)
# ---------------------------------------------------------------------------

#: the eight Gopher "required English words" (Rae et al. 2021, A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: whitespace-word splitter (Gopher counts whitespace words, which keep
#: punctuation — unlike the shared alnum tokenizer); the _SPARK variant
#: survives Spark SQL string-literal backslash processing
_WS_RE = r"\s+"
_WS_RE_SPARK = r"\\s+"


def gopher_quality(
    name: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_required_stops: int = 2,
) -> dict[str, Column]:
    """The doc-level half of Gopher's quality rules (Rae et al. 2021
    Table A1; the repetition half is :func:`repetition_signals`) as pure
    column expressions — zero shuffle, scan-speed filtering at 100 TB:

    - ``n_words``: whitespace word count (bounds 50..100,000)
    - ``mean_word_len``: over the alnum tokenizer (bounds 3..10)
    - ``symbol_word_ratio``: '#' or '...' occurrences per word (< 0.1)
    - ``frac_alpha_words``: whitespace words containing >= 1 alphabetic
      character (>= 0.80)
    - ``n_required_stop``: DISTINCT hits among the 8 required English
      words (>= 2)
    - ``passes``: the conjunction, including the bullet (<= 0.90) and
      ellipsis (<= 0.30) line fractions from :func:`repetition_signals`

    The paired :func:`gopher_quality_sql` emits the bit-identical DuckDB
    formulas (counts and ratios of integer counts)."""
    words = f"filter(split({name}, '{_WS_RE_SPARK}'), w -> length(w) > 0)"
    n_words = F.expr(f"size({words})")
    n_words_d = n_words.cast("double")
    mwl = mean_token_len(name)
    n_sym = F.expr(
        f"regexp_count({name}, '#') + regexp_count({name}, '\\\\.\\\\.\\\\.')"
    )
    frac_alpha = F.expr(
        f"size(filter({words}, w -> w rlike '[A-Za-z]'))"
    ) / F.greatest(F.lit(1).cast("double"), n_words_d)
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    n_req = F.expr(
        f"size(filter(array({stops}), s -> array_contains({_toks(name)}, s)))"
    )
    rep = repetition_signals(name)
    sym_ratio = n_sym.cast("double") / F.greatest(
        F.lit(1).cast("double"), n_words_d
    )
    passes = (
        (n_words >= int(min_words))
        & (n_words <= int(max_words))
        & (mwl >= 3.0)
        & (mwl <= 10.0)
        & (sym_ratio < 0.1)
        & (frac_alpha >= 0.8)
        & (n_req >= int(min_required_stops))
        & (rep["bullet_line_frac"] <= 0.9)
        & (rep["ellipsis_line_frac"] <= 0.3)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mwl,
        "symbol_word_ratio": sym_ratio,
        "frac_alpha_words": frac_alpha,
        "n_required_stop": n_req,
        "passes": passes,
    }


def gopher_quality_sql(
    name: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_required_stops: int = 2,
) -> dict[str, str]:
    """DuckDB formulas matching :func:`gopher_quality` bit-exactly."""
    words = (
        f"list_filter(regexp_split_to_array({name}, '{_WS_RE}'),"
        f" w -> length(w) > 0)"
    )
    n_words = f"len({words})"
    mwl = mean_token_len_sql(name)
    n_sym = (
        f"(len(regexp_extract_all({name}, '#'))"
        f" + len(regexp_extract_all({name}, '\\.\\.\\.')))"
    )
    frac_alpha = (
        f"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))"
        f" / greatest(1.0, CAST({n_words} AS DOUBLE))"
    )
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    n_req = (
        f"len(list_filter([{stops}],"
        f" s -> list_contains({_toks_duck(name)}, s)))"
    )
    rep = repetition_signals_sql(name)
    sym_ratio = (
        f"CAST({n_sym} AS DOUBLE) / greatest(1.0, CAST({n_words} AS DOUBLE))"
    )
    passes = (
        f"({n_words} >= {int(min_words)} AND {n_words} <= {int(max_words)}"
        f" AND {mwl} >= 3.0 AND {mwl} <= 10.0"
        f" AND {sym_ratio} < 0.1"
        f" AND {frac_alpha} >= 0.8"
        f" AND {n_req} >= {int(min_required_stops)}"
        f" AND {rep['bullet_line_frac']} <= 0.9"
        f" AND {rep['ellipsis_line_frac']} <= 0.3)"
    )
    return {
        "n_words": n_words,
        "mean_word_len": mwl,
        "symbol_word_ratio": sym_ratio,
        "frac_alpha_words": frac_alpha,
        "n_required_stop": n_req,
        "passes": passes,
    }


# ---------------------------------------------------------------------------
# RefinedWeb line-wise filtering (round 15)
# ---------------------------------------------------------------------------

#: line-drop rules (Penedo et al. 2023 §3.2 "line-wise corrections"):
#: social-media counters, numeric-only lines, uppercase-dominated lines
COUNTER_LINE_RE = (
    r"(?i)^\s*\d+\s+(likes?|comments?|shares?|views?|points?|votes?"
    r"|retweets?|followers?)\b\s*$"
)
NUMERIC_LINE_RE = r"^[\s0-9.,:/()\[\]#-]*[0-9][\s0-9.,:/()\[\]#-]*$"


def _line_bad_spark(x: Column) -> Column:
    upper = F.length(F.regexp_replace(x, "[^A-Z]", ""))
    alpha = F.length(F.regexp_replace(x, "[^A-Za-z]", ""))
    return (
        x.rlike(COUNTER_LINE_RE)
        | x.rlike(NUMERIC_LINE_RE)
        | ((alpha >= 10) & (upper * 10 > alpha * 6))
    )


def _line_bad_sql(x: str) -> str:
    upper = f"length(regexp_replace({x}, '[^A-Z]', '', 'g'))"
    alpha = f"length(regexp_replace({x}, '[^A-Za-z]', '', 'g'))"
    return (
        f"(regexp_matches({x}, '{COUNTER_LINE_RE}')"
        f" OR regexp_matches({x}, '{NUMERIC_LINE_RE}')"
        f" OR ({alpha} >= 10 AND {upper} * 10 > {alpha} * 6))"
    )


def line_filter(name: str, max_removed_frac: float = 0.5) -> dict[str, Column]:
    """RefinedWeb-style line-wise corrections as pure array expressions:
    drop counter lines ("3 likes"), numeric-only lines, and
    uppercase-dominated lines (> 60% of >= 10 alphabetic chars); keep
    the document unless the dropped lines exceed ``max_removed_frac``
    of its characters (Penedo et al. 2023: "if these corrections remove
    more than 5%/50% of the document, drop it" — the char-fraction
    form). Zero shuffle.

    Returns ``{"filtered", "n_lines_removed", "removed_char_frac",
    "keep"}``."""
    ls = F.split(F.col(name), "\n", -1)
    kept = F.filter(ls, lambda x: ~_line_bad_spark(x))
    total_chars = F.length(F.array_join(ls, ""))
    kept_chars = F.length(F.array_join(kept, ""))
    removed_frac = (total_chars - kept_chars).cast("double") / F.greatest(
        F.lit(1), total_chars
    ).cast("double")
    return {
        "filtered": F.array_join(kept, "\n"),
        "n_lines_removed": F.size(ls) - F.size(kept),
        "removed_char_frac": removed_frac,
        "keep": removed_frac <= F.lit(float(max_removed_frac)),
    }


def line_filter_sql(
    name: str, max_removed_frac: float = 0.5
) -> dict[str, str]:
    """DuckDB formulas matching :func:`line_filter` bit-exactly."""
    ls = f"string_split({name}, chr(10))"
    kept = f"list_filter({ls}, x -> NOT {_line_bad_sql('x')})"
    total = f"length(list_aggregate({ls}, 'string_agg', ''))"
    keptc = (
        f"coalesce(length(list_aggregate({kept}, 'string_agg', '')), 0)"
    )
    frac = (
        f"CAST({total} - {keptc} AS DOUBLE)"
        f" / CAST(greatest(1, {total}) AS DOUBLE)"
    )
    return {
        "filtered": f"coalesce(list_aggregate({kept}, 'string_agg', chr(10)), '')",
        "n_lines_removed": f"len({ls}) - len({kept})",
        "removed_char_frac": frac,
        "keep": f"({frac} <= {float(max_removed_frac)})",
    }


# ---------------------------------------------------------------------------
# corpus card (per-slice data-card summary)
# ---------------------------------------------------------------------------


def corpus_card(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: tuple = ("lang", "source"),
    min_required_stops: int = 2,
) -> DataFrame:
    """Per-slice corpus summary — the numbers a dataset card reports
    (Gebru et al. 2021 "Datasheets for Datasets"; every release's
    composition table): document/token/char volume, exact-duplicate
    fraction, mean heuristic quality, Gopher pass rate, grouped by
    ``by`` (default language × source).

    One corpus scan + one map-combined groupBy bounded by
    ``|lang × source|`` — scan-speed at 100 TB. Cross-engine float
    discipline: per-doc quality quantizes to 1e-9 int64 before the
    sum (order-independent), the mean rounds via the shared
    ``floor(x + 0.5)`` fold; the fraction columns are exact-integer
    ratios (bit-equal division in both engines)."""
    q9 = F.floor(
        quality_score(text_col) * F.lit(1.0e9) + F.lit(0.5)
    ).cast("long")
    gq = gopher_quality(
        text_col, min_required_stops=min_required_stops
    )["passes"].cast("long")
    base = df.select(
        *[F.col(c) for c in by],
        F.md5(F.col(text_col)).alias("_h"),
        token_count(text_col).alias("_t"),
        F.length(text_col).alias("_len"),
        q9.alias("_q9"),
        gq.alias("_gp"),
    )
    agg = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_h").alias("n_distinct"),
        F.sum("_t").alias("n_tokens"),
        F.sum("_len").alias("n_chars"),
        F.sum("_q9").alias("_sq9"),
        F.sum("_gp").alias("_sgp"),
    )
    n = F.col("n_docs")
    return agg.select(
        *by,
        "n_docs",
        "n_distinct",
        ((n - F.col("n_distinct")) / n).alias("dup_frac"),
        "n_tokens",
        "n_chars",
        (
            F.floor(
                F.col("_sq9").cast("double") / n / F.lit(1.0e3)
                + F.lit(0.5)
            )
            / F.lit(1.0e6)
        ).alias("avg_quality"),
        (F.col("_sgp") / n).alias("gopher_pass_frac"),
    )


def corpus_card_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    by: tuple = ("lang", "source"),
    min_required_stops: int = 2,
) -> str:
    """DuckDB oracle for :func:`corpus_card` — identical per-doc
    quantization, identical integer sums and ratio folds."""
    cols = ", ".join(by)
    gq = gopher_quality_sql(
        text_col, min_required_stops=min_required_stops
    )["passes"]
    return f"""
    WITH base AS (
      SELECT {cols},
             md5({text_col}) AS h,
             {token_count_sql(text_col)} AS t,
             length({text_col}) AS len,
             CAST(floor(({quality_score_sql(text_col)}) * 1000000000.0
                        + 0.5) AS BIGINT) AS q9,
             CAST({gq} AS BIGINT) AS gp
      FROM {table}
    )
    SELECT {cols},
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
           (count(*) - count(DISTINCT h)) / count(*) AS dup_frac,
           CAST(sum(t) AS BIGINT) AS n_tokens,
           CAST(sum(len) AS BIGINT) AS n_chars,
           floor(CAST(sum(q9) AS DOUBLE) / count(*) / 1000.0 + 0.5)
             / 1000000.0 AS avg_quality,
           sum(gp) / count(*) AS gopher_pass_frac
    FROM base GROUP BY {cols}
    """
