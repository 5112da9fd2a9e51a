"""URL / domain-level curation filtering — the RefinedWeb/C4-style
web-pipeline stage: extract each document's registrable domain
(eTLD+1), drop block-listed domains, optionally restrict to an
allow-list, and cap documents per domain.

Reference analog: none (TimescaleDB has no web-curation surface) —
this extends the engine for LLM-data work like the rest of
``pipeline/`` (RefinedWeb, Penedo et al. 2023 §3.1 "URL filtering";
C4, Raffel et al. 2020 §2.2 blocklist filtering; Gopher, Rae et al.
2021 caps per domain).

Scale shape (100 TB):

- **Host + registrable-domain extraction** are pure string/array
  expressions — evaluated at scan speed inside whole-stage codegen,
  zero shuffle, no UDF.
- **Block/allow lists** are broadcast: a literal ``isin`` for small
  inline lists, a broadcast anti/semi join when the list is a
  DataFrame (real blocklists run to ~1e6 domains — still MBs).
- **Per-domain caps** reuse :func:`..sampling.stratified_cap` — one
  window shuffle on the domain key, deterministic id-hash order so
  the same documents survive on every engine and rerun.

The public-suffix handling is a compact, explicit subset of the PSL
(the full list is data, not code — swap ``PUBLIC_SUFFIXES`` for a
loaded copy in production). Unknown TLDs fall back to the PSL's
default ``*`` rule: the last label is the public suffix, so the
registrable domain is the last two labels.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import _key_sql, stratified_cap

#: compact PSL subset used by default; multi-label entries matched first
PUBLIC_SUFFIXES = (
    "ac.uk",
    "co.jp",
    "co.uk",
    "com",
    "com.au",
    "edu",
    "github.io",
    "gov",
    "io",
    "net",
    "org",
    "org.uk",
)

#: scheme://[userinfo@]HOST[:port][/path...] — group 1 is the host
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+).*$"


def _c(col: Union[str, Column]) -> Column:
    return F.col(col) if isinstance(col, str) else col


def host_of(url: Union[str, Column]) -> Column:
    """Lowercased host component of a URL (userinfo and port stripped,
    trailing root-dot removed). Empty string when the URL does not
    parse — callers treat that like an unknown domain."""
    h = F.lower(F.regexp_extract(_c(url), _HOST_RE, 1))
    return F.regexp_replace(h, r"\.$", "")


def host_of_sql(url_expr: str) -> str:
    return (
        f"regexp_replace(lower(regexp_extract({url_expr}, "
        f"'{_HOST_RE}', 1)), '\\.$', '')"
    )


def load_public_suffixes(
    source, icann_only: bool = False
) -> Tuple[str, ...]:
    """Load a public-suffix list in the standard PSL file format
    (https://publicsuffix.org/list/ — the format is public; the list
    itself is data, not code): one rule per line, ``//`` comments,
    ``*.`` wildcard rules, ``!`` exception rules. ``source`` is a file
    path, an iterable of lines, or a one-column DataFrame of rules.
    ``icann_only`` stops at the ICANN section end marker (drops the
    PRIVATE DOMAINS section — github.io-style vendor suffixes).

    Returns the rule tuple (markers preserved) that
    :func:`registrable_domain` / :func:`domain_filter` accept."""
    if isinstance(source, DataFrame):
        col = source.columns[0]
        lines = [r[col] for r in source.select(col).collect()]
    elif isinstance(source, (str, bytes)):
        with open(source, encoding="utf-8") as f:
            lines = f.read().splitlines()
    else:
        lines = list(source)
    rules = []
    for raw in lines:
        line = (raw or "").strip()
        if icann_only and "===END ICANN DOMAINS===" in line:
            break
        if not line or line.startswith("//"):
            continue
        rules.append(line.split()[0].lower().lstrip("."))
    return tuple(dict.fromkeys(rules))


def _parse_rules(
    suffixes: Sequence[str],
) -> Tuple[Tuple[str, ...], Tuple[str, ...], Tuple[str, ...]]:
    """Split a rule list into (plain, wildcard bases, exceptions) —
    markers stripped, lowercased, de-duplicated, order-normalized."""
    plain, wild, exc = [], [], []
    for s in suffixes:
        s = str(s).strip().lower()
        if not s:
            continue
        if s.startswith("!"):
            exc.append(s[1:])
        elif s.startswith("*."):
            wild.append(s[2:])
        elif s == "*":
            continue  # the implicit default rule — always active
        else:
            plain.append(s)
    return (
        tuple(sorted(set(plain))),
        tuple(sorted(set(wild))),
        tuple(sorted(set(exc))),
    )


def _labels(s: str) -> int:
    return s.count(".") + 1


def _by_label_count(suffixes: Sequence[str]) -> list:
    """Group suffixes by label count, most labels first — single-label
    suffixes are omitted because their rule coincides with the PSL
    default ``*`` rule (registrable = last two labels)."""
    groups: dict = {}
    for s in suffixes:
        groups.setdefault(s.count(".") + 1, []).append(s)
    return sorted(
        ((k, sorted(v)) for k, v in groups.items() if k >= 2), reverse=True
    )


def _tail_pattern(group: Sequence[str]) -> str:
    """Anchored regex capturing "one label + a suffix from ``group``"
    at the end of a host. Suffix dots become ``[.]`` (no backslash
    layers to get wrong across Java/RE2/SQL-literal quoting)."""
    alts = "|".join(s.replace(".", "[.]") for s in group)
    return f"([^.]+[.](?:{alts}))$"


_GENERIC_TAIL = "([^.]+[.][^.]+)$"  # PSL default rule: last two labels


def _tail_groups(plain: Sequence[str], wild: Sequence[str]) -> list:
    """Rules grouped by EFFECTIVE label count, most labels first, as
    regex alternation fragments: a plain suffix contributes itself; a
    wildcard base ``b`` (the PSL rule ``*.b``) contributes
    ``[^.]+[.]b`` — one more (arbitrary) label, so it lands in the
    ``labels(b) + 1`` group. Single-label plain suffixes are omitted
    (their rule coincides with the PSL default ``*`` rule)."""
    groups: dict = {}
    for s in plain:
        k = _labels(s)
        if k >= 2:
            groups.setdefault(k, []).append(s.replace(".", "[.]"))
    for b in wild:
        groups.setdefault(_labels(b) + 1, []).append(
            "[^.]+[.]" + b.replace(".", "[.]")
        )
    return sorted(((k, sorted(v)) for k, v in groups.items()), reverse=True)


def registrable_domain(
    host: Union[str, Column],
    suffixes: Sequence[str] = PUBLIC_SUFFIXES,
) -> Column:
    """eTLD+1 of a host under the given public-suffix rules — full PSL
    semantics (https://publicsuffix.org/list/, the documented
    algorithm): plain rules, ``*.`` wildcard rules (any label + base is
    a public suffix), ``!`` exception rules (the exception itself is a
    registrable domain; its public suffix is the rule minus its leftmost
    label), prevailing rule = exception first, else most labels, else
    the implicit ``*`` default (last label is the suffix → registrable =
    last two labels). A host that IS a public suffix has no registrable
    domain (NULL).

    Evaluation cost is INDEPENDENT of the rule count's distribution
    across hosts: exceptions are a handful of cheap equality/endswith
    branches, every "host IS a suffix" check is one ``isin`` plus one
    anchored regex per wildcard label count, and tail extraction is one
    anchored regex per DISTINCT label count (~5 for the real ~9.7k-rule
    PSL — the alternation grows with the list, the WHEN chain does
    not, so whole-stage codegen never sees more branches). The regex
    PATTERN is data, compiled once per task, so a 1k-rule list costs
    the same codegen as 12 rules (proven by test_urlfilter_psl.py);
    past ~RE2-unfriendly sizes use :func:`registrable_domain_join`,
    the broadcast-join matcher (``domain_filter`` switches
    automatically above ``REGEX_MAX_RULES``).

    Deliberately CHEAP per row (anchored regexes, no array machinery):
    Catalyst's predicate pushdown substitutes projection aliases into
    filter conditions, so curation predicates re-evaluate this
    expression 2-3x per row — the earlier split/slice/array_join form
    tripled under pushdown; the regex form makes duplication
    immaterial."""
    plain, wild, exc = _parse_rules(suffixes)
    h = _c(host)
    expr = None

    def _when(cond, val):
        nonlocal expr
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)

    # 1. exception rules beat everything (PSL: "If more than one rule
    #    matches, the prevailing rule is the one which is an exception
    #    rule"): any host ending with the exception registers AS it
    for e in sorted(exc, key=lambda s: (-_labels(s), s)):
        _when((h == e) | h.endswith("." + e), F.lit(e))
    # 2. "host IS a public suffix -> NULL" before any tail pattern
    #    (nested-suffix ordering, round-15 advice). No longer rule can
    #    claim such a host: a k'-label tail needs k'+1 > k labels.
    if plain:
        _when(h.isin(*plain), F.lit(None).cast("string"))
    if wild:
        walts = "|".join(b.replace(".", "[.]") for b in sorted(wild))
        _when(
            F.regexp_extract(h, f"^([^.]+[.](?:{walts}))$", 1) != "",
            F.lit(None).cast("string"),
        )
    # 3. registrable = one label + the longest matching suffix:
    #    label-count groups descending implement longest-match
    for _k, alts in _tail_groups(plain, wild):
        m = F.regexp_extract(h, f"([^.]+[.](?:{'|'.join(alts)}))$", 1)
        _when(m != "", m)
    # 4. the implicit * default rule
    generic = F.regexp_extract(h, _GENERIC_TAIL, 1)
    if expr is None:
        return F.when(generic != "", generic).otherwise(F.lit(None))
    return expr.when(generic != "", generic).otherwise(F.lit(None))


def registrable_domain_sql(
    host_expr: str, suffixes: Sequence[str] = PUBLIC_SUFFIXES
) -> str:
    """DuckDB replay of :func:`registrable_domain` — identical rule
    chain (exceptions, IS-suffix NULLs, label-count tails, default
    rule); regexp_extract returns '' on no match in both engines, so
    the CASE shape is identical."""
    plain, wild, exc = _parse_rules(suffixes)
    cases = []
    for e in sorted(exc, key=lambda s: (-_labels(s), s)):
        cases.append(
            f"WHEN {host_expr} = '{e}' OR {host_expr} LIKE '%.{e}' "
            f"THEN '{e}'"
        )
    if plain:
        inlist = ", ".join(f"'{s}'" for s in plain)
        cases.append(f"WHEN {host_expr} IN ({inlist}) THEN NULL")
    if wild:
        walts = "|".join(b.replace(".", "[.]") for b in sorted(wild))
        cases.append(
            f"WHEN regexp_extract({host_expr}, "
            f"'^([^.]+[.](?:{walts}))$', 1) <> '' THEN NULL"
        )
    for _k, alts in _tail_groups(plain, wild):
        pat = f"([^.]+[.](?:{'|'.join(alts)}))$"
        cases.append(
            f"WHEN regexp_extract({host_expr}, '{pat}', 1) <> '' "
            f"THEN regexp_extract({host_expr}, '{pat}', 1)"
        )
    cases.append(
        f"WHEN regexp_extract({host_expr}, '{_GENERIC_TAIL}', 1) <> '' "
        f"THEN regexp_extract({host_expr}, '{_GENERIC_TAIL}', 1)"
    )
    return "CASE " + " ".join(cases) + " ELSE NULL END"


#: above this rule count, domain_filter switches from the regex
#: expression to the broadcast-join matcher (regex alternations in the
#: tens of thousands of branches stress RE2/Java compilation; the join
#: path's cost is flat in the rule count)
REGEX_MAX_RULES = 5000


def registrable_domain_join(
    df: DataFrame,
    host_col: str,
    suffixes: Sequence[str],
    out_col: str = "domain",
) -> DataFrame:
    """eTLD+1 via a broadcast rule join — the arbitrarily-large-PSL
    path, semantics identical to :func:`registrable_domain` (property-
    tested equal). Each host emits one candidate tail per DISTINCT rule
    label count (~5 for the real PSL, so the explode factor is tiny and
    independent of the rule count), tails probe the broadcast rule
    table twice (exact match; first label wildcarded), and the
    prevailing rule (exception first, else most labels) picks the
    registrable slice. One broadcast hash join, no shuffle of the
    corpus beyond the per-host aggregate's map-side combine — at 100 TB
    the rule table is ~300 KB against any corpus size."""
    plain, wild, exc = _parse_rules(suffixes)
    spark = df.sparkSession
    rules = (
        [(s, _labels(s), 0) for s in plain]
        + [("*." + b, _labels(b) + 1, 1) for b in wild]
        + [(e, _labels(e), 2) for e in exc]
    )
    if not rules:
        rules = [("\x00none", 0, 0)]  # unmatchable — default rule only
    rdf = spark.createDataFrame(
        rules, "rule string, eff_labels int, kind int"
    )
    ks = sorted({r[1] for r in rules if r[1] > 0})
    # resolve DISTINCT hosts only (web corpora repeat hosts heavily),
    # then map the host -> domain table back onto the corpus
    hosts = df.select(F.col(host_col).alias("_rdj_h")).distinct()
    labels = F.split(F.col("_rdj_h"), r"\.")
    n = F.size(labels)

    def _tail(k: int) -> Column:
        return F.array_join(F.slice(labels, n - F.lit(k) + 1, F.lit(k)), ".")

    # candidate keys: per distinct rule label count k, the host's exact
    # k-label tail AND the same tail with its first label wildcarded —
    # flat strings, so the rule probe is ONE broadcast hash equi-join
    cands = []
    for k in ks:
        cands.append(F.when(n >= k, _tail(k)))
        if k >= 2:
            cands.append(
                F.when(n >= k, F.concat(F.lit("*."), _tail(k - 1)))
            )
    exploded = hosts.select(
        "_rdj_h",
        n.alias("_rdj_n"),
        F.explode(
            F.filter(F.array(*cands), lambda c: c.isNotNull())
        ).alias("_rdj_c"),
    )
    # prevailing rule per host: exception first, else most labels
    # (kind breaks plain/wildcard ties deterministically; either way
    # both describe a public suffix of the same length)
    rank = (
        F.when(F.col("kind") == 2, F.lit(1 << 20)).otherwise(F.lit(0))
        + F.col("eff_labels") * 4
        + F.col("kind")
    )
    best = (
        exploded.join(F.broadcast(rdf), F.col("_rdj_c") == F.col("rule"))
        .groupBy("_rdj_h", "_rdj_n")
        .agg(
            F.max_by(
                F.struct("kind", "eff_labels", "rule"), rank
            ).alias("_r")
        )
    )
    nn = F.col("_rdj_n")
    lbl2 = F.split(F.col("_rdj_h"), r"\.")
    kind, eff = F.col("_r.kind"), F.col("_r.eff_labels")
    reg = lambda cnt: F.array_join(  # noqa: E731
        F.slice(lbl2, nn - cnt + 1, cnt), "."
    )
    resolved = best.select(
        "_rdj_h",
        F.when(kind == 2, F.col("_r.rule"))
        .when(nn > eff, reg(eff + 1))
        .otherwise(F.lit(None).cast("string"))
        .alias("_rdj_d"),
        F.lit(True).alias("_rdj_m"),  # matched (domain may still be NULL)
    )
    # ONLY unmatched hosts fall to the implicit * default rule — a
    # matched host whose domain is NULL IS a public suffix and stays NULL
    hl = F.split(F.col("_rdj_h"), r"\.")
    hn = F.size(hl)
    default_reg = F.when(
        (hn >= 2) & (F.col("_rdj_h") != ""),
        F.array_join(F.slice(hl, hn - 1, 2), "."),
    )
    mapped = hosts.join(resolved, "_rdj_h", "left").select(
        "_rdj_h",
        F.when(F.col("_rdj_m"), F.col("_rdj_d"))
        .otherwise(default_reg)
        .alias(out_col),
    )
    return df.join(
        mapped, df[host_col] == mapped["_rdj_h"], "left"
    ).drop("_rdj_h")


# --------------------------------------------------------------------------
# deterministic synthetic URLs (for gates/tests: testdata has no URLs)
# --------------------------------------------------------------------------

#: host table exercising subdomains, mixed case, multi-label suffixes,
#: an unknown TLD (PSL default rule), and a bare public suffix ("com" —
#: no registrable domain, dropped by any active blocklist)
_SYNTH_HOSTS = (
    "example.com",
    "www.example.com",
    "News.Example.COM",
    "a.b.example.co.uk",
    "spam.net",
    "cdn.spam.net",
    "docs.python.org",
    "user1.github.io",
    "weird.internal",
    "com",
)


def synth_url(
    id_col: Union[str, Column] = "doc_id",
    hosts: Sequence[str] = _SYNTH_HOSTS,
) -> Column:
    """Deterministic URL derived from the id: scheme by parity, host by
    id modulo the host table, an explicit port every 5th id, userinfo
    every 11th —
    exercising every branch of :func:`host_of` /
    :func:`registrable_domain` without external data."""
    i = _c(id_col)
    host = F.element_at(
        F.array(*[F.lit(h) for h in hosts]),
        (F.pmod(i, F.lit(len(hosts))) + 1).cast("int"),
    )
    scheme = F.when(F.pmod(i, F.lit(2)) == 0, F.lit("https")).otherwise(
        F.lit("http")
    )
    userinfo = F.when(
        F.pmod(i, F.lit(11)) == 0, F.lit("user:pw@")
    ).otherwise(F.lit(""))
    port = F.when(F.pmod(i, F.lit(5)) == 0, F.lit(":8080")).otherwise(
        F.lit("")
    )
    return F.concat(
        scheme,
        F.lit("://"),
        userinfo,
        host,
        port,
        F.lit("/p/"),
        i.cast("string"),
    )


def synth_url_sql(
    id_expr: str = "doc_id", hosts: Sequence[str] = _SYNTH_HOSTS
) -> str:
    host_list = hosts
    hosts = ", ".join(f"'{h}'" for h in host_list)
    n = len(host_list)
    return (
        f"(CASE WHEN ({id_expr}) % 2 = 0 THEN 'https' ELSE 'http' END"
        f" || '://'"
        f" || CASE WHEN ({id_expr}) % 11 = 0 THEN 'user:pw@' ELSE '' END"
        f" || [{hosts}][CAST(({id_expr}) % {n} AS INT) + 1]"
        f" || CASE WHEN ({id_expr}) % 5 = 0 THEN ':8080' ELSE '' END"
        f" || '/p/' || CAST({id_expr} AS VARCHAR))"
    )


# --------------------------------------------------------------------------
# the filter
# --------------------------------------------------------------------------


def domain_filter(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    block: Union[Sequence[str], DataFrame, None] = None,
    allow: Union[Sequence[str], DataFrame, None] = None,
    cap_per_domain: Optional[int] = None,
    suffixes: Sequence[str] = PUBLIC_SUFFIXES,
    out_col: str = "domain",
) -> DataFrame:
    """Domain-level curation: annotate each row with its registrable
    domain, drop block-listed domains (and NULL-domain rows when a
    blocklist is active — unparseable URLs are not trusted past a
    curation gate), keep only allow-listed ones when given, and cap
    rows per domain deterministically.

    ``block``/``allow`` accept a small in-code sequence (compiled to a
    literal ``isin`` — zero shuffle) or a one-column DataFrame
    (broadcast anti/semi join — the production-size path).

    ``suffixes`` takes full PSL rule lists (wildcards/exceptions — see
    :func:`load_public_suffixes`); above ``REGEX_MAX_RULES`` rules the
    eTLD+1 extraction switches from the regex expression to the
    broadcast-join matcher automatically (identical semantics)."""
    hosted = df.withColumn("_df_host", host_of(F.col(url_col)))
    if len(suffixes) > REGEX_MAX_RULES:
        out = registrable_domain_join(
            hosted, "_df_host", suffixes, out_col=out_col
        ).drop("_df_host")
    else:
        out = hosted.withColumn(
            out_col, registrable_domain(F.col("_df_host"), suffixes)
        ).drop("_df_host")
    if block is not None:
        if isinstance(block, DataFrame):
            bl = block.toDF(out_col)
            out = out.join(F.broadcast(bl), out_col, "left_anti").filter(
                F.col(out_col).isNotNull()
            )
        else:
            out = out.filter(
                F.col(out_col).isNotNull()
                & ~F.col(out_col).isin(*[str(b) for b in block])
            )
    if allow is not None:
        if isinstance(allow, DataFrame):
            al = allow.toDF(out_col)
            out = out.join(F.broadcast(al), out_col, "left_semi")
        else:
            out = out.filter(F.col(out_col).isin(*[str(a) for a in allow]))
    if cap_per_domain is not None:
        # registrable domains are a LOW-cardinality hot-key distribution
        # (a few domains hold most of a web corpus): use the exact
        # two-stage top-k so the rank shuffle spreads over 32 subkeys
        # per domain instead of sorting each domain on one task
        out = stratified_cap(
            out,
            by=[out_col],
            cap=cap_per_domain,
            id_col=id_col,
            skew_partitions=32,
        )
    return out


def domain_filter_sql(
    table: str = "documents",
    url_expr: Optional[str] = None,
    id_expr: str = "doc_id",
    block: Sequence[str] = (),
    allow: Sequence[str] = (),
    cap_per_domain: Optional[int] = None,
    suffixes: Sequence[str] = PUBLIC_SUFFIXES,
    projection: str = "doc_id",
) -> str:
    """DuckDB oracle replaying :func:`domain_filter` over
    :func:`synth_url`-derived URLs (or a given ``url_expr``)."""
    url = url_expr or synth_url_sql(id_expr)
    dom = registrable_domain_sql(host_of_sql(url), suffixes)
    preds = []
    if block:
        inb = ", ".join(f"'{b}'" for b in block)
        preds.append(f"domain IS NOT NULL AND domain NOT IN ({inb})")
    if allow:
        ina = ", ".join(f"'{a}'" for a in allow)
        preds.append(f"domain IN ({ina})")
    where = ("WHERE " + " AND ".join(preds)) if preds else ""
    base = (
        f"SELECT {projection}, {url} AS url, {dom} AS domain FROM {table}"
    )
    if cap_per_domain is None:
        return f"SELECT * FROM ({base}) {where}"
    key = _key_sql(id_expr, "")
    return f"""
    SELECT {projection}, url, domain FROM (
        SELECT *, row_number() OVER (
            PARTITION BY domain ORDER BY {key}, {id_expr}
        ) AS _dc_rn
        FROM (SELECT * FROM ({base}) {where})
    ) WHERE _dc_rn <= {int(cap_per_domain)}
    """
