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

from typing import Optional, Sequence, Union

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


def registrable_domain(
    host: Union[str, Column],
    suffixes: Sequence[str] = PUBLIC_SUFFIXES,
) -> Column:
    """eTLD+1 of a host under the given public-suffix set: the suffix's
    label count plus one trailing label. A host that IS a public suffix
    has no registrable domain (NULL); unknown TLDs use the PSL default
    rule (last two labels), which also covers every single-label suffix
    — so evaluation is one anchored regex per DISTINCT multi-label
    suffix LENGTH plus one generic tail regex, not per-suffix work.

    Deliberately CHEAP (a couple of small anchored regexes, no array
    machinery): Catalyst's predicate pushdown substitutes projection
    aliases into filter conditions, so curation predicates re-evaluate
    this expression 2-3x per row — the earlier split/slice/array_join
    form cost 6 µs per evaluation and tripled to 18 µs under pushdown
    (measured over 500k rows); the regex form makes the duplication
    immaterial."""
    h = _c(host)
    # the "host IS a public suffix -> NULL" rule must run BEFORE the
    # tail patterns: with a nested-suffix list (real PSL entries like
    # k12.ma.us and pvt.k12.ma.us) a host equal to the LONGER suffix
    # would otherwise match the shorter suffix's tail pattern and be
    # reported as a registrable domain (round-15 advice)
    expr = F.when(h.isin(*suffixes), F.lit(None).cast("string"))
    for _k, group in _by_label_count(suffixes):
        m = F.regexp_extract(h, _tail_pattern(group), 1)
        expr = expr.when(m != "", m)
    generic = F.regexp_extract(h, _GENERIC_TAIL, 1)
    return expr.when(generic != "", generic).otherwise(F.lit(None))


def registrable_domain_sql(
    host_expr: str, suffixes: Sequence[str] = PUBLIC_SUFFIXES
) -> str:
    """DuckDB replay: regexp_extract returns '' on no match in both
    engines, so the CASE shape is identical."""
    inlist = ", ".join(f"'{s}'" for s in suffixes)
    cases = [f"WHEN {host_expr} IN ({inlist}) THEN NULL"]
    for _k, group in _by_label_count(suffixes):
        pat = _tail_pattern(group)
        cases.append(
            f"WHEN regexp_extract({host_expr}, '{pat}', 1) <> '' "
            f"THEN regexp_extract({host_expr}, '{pat}', 1)"
        )
    cases.append(
        f"WHEN regexp_extract({host_expr}, '{_GENERIC_TAIL}', 1) <> '' "
        f"THEN regexp_extract({host_expr}, '{_GENERIC_TAIL}', 1)"
    )
    return "CASE " + " ".join(cases) + " ELSE NULL END"


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


def synth_url(id_col: Union[str, Column] = "doc_id") -> Column:
    """Deterministic URL derived from the id: scheme by parity, host by
    id modulo the host table, an explicit port every 5th id, userinfo
    every 11th —
    exercising every branch of :func:`host_of` /
    :func:`registrable_domain` without external data."""
    i = _c(id_col)
    host = F.element_at(
        F.array(*[F.lit(h) for h in _SYNTH_HOSTS]),
        (F.pmod(i, F.lit(len(_SYNTH_HOSTS))) + 1).cast("int"),
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


def synth_url_sql(id_expr: str = "doc_id") -> str:
    hosts = ", ".join(f"'{h}'" for h in _SYNTH_HOSTS)
    n = len(_SYNTH_HOSTS)
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
    (broadcast anti/semi join — the production-size path)."""
    out = (
        df.withColumn("_df_host", host_of(F.col(url_col)))
        .withColumn(
            out_col, registrable_domain(F.col("_df_host"), suffixes)
        )
        .drop("_df_host")
    )
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
