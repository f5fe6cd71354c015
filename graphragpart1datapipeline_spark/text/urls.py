"""URL canonicalization, URL-key dedup, and per-domain caps — the
crawl-frontier hygiene layer every 100 TB pipeline runs BEFORE any
content pass (URL dedup costs a string expression; content dedup
costs a corpus scan): the same page is crawled as
``HTTP://WWW.Site.COM:80/a//b/?utm_source=x&b=2&a=1#frag`` and
``http://site.com/a/b?a=1&b=2``, and per-domain volume caps (the
C4/Gopher curation rule) need a stable domain key.

Canonicalization rules (the standard safe set — RFC 3986 §6 syntax
normalization plus the universally-applied tracking-param strip):

1. trim surrounding whitespace; drop the ``#fragment``.
2. scheme lowercased; missing scheme defaults to ``http``.
3. userinfo (``user:pass@``) dropped; host lowercased; one leading
   ``www.`` stripped.
4. default ports dropped (``:80`` for http, ``:443`` for https);
   other ports kept.
5. path: runs of ``/`` collapsed to one, trailing ``/`` stripped
   (root path becomes empty string, matching the hostname-only form).
6. query: split on ``&``, tracking params dropped
   (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``), empty
   fragments dropped, remainder SORTED bytewise and rejoined — param
   order never splits a dedup group.

Everything is row-local JVM column work (regexp_extract / split /
filter / array_sort / concat) — zero shuffle, whole-stage codegen,
scan-bound at 100 TB, and every primitive has an exact DuckDB twin
(regexp_extract / string_split / list_filter / list_sort), so the
whole rule replays bit-for-bit in the oracle (q250/q251).

``domain_cap`` is the C4-style per-domain volume cap: rank within
domain by a caller-supplied quality ordering, keep the top ``cap``.
One window over the domain key — the same single-shuffle shape as
W3's top-k-within-group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAMS",
    "canonical_url",
    "canonical_url_sql",
    "url_domain",
    "url_domain_sql",
    "url_key",
    "url_seen_bloom",
    "url_frontier_gate",
    "bloom_key_member",
    "domain_cap",
    "politeness_schedule",
    "politeness_schedule_per_domain",
]

# exact-name strips plus the utm_ prefix family
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# the scheme is STRIPPED first ("rest"), then host/path/query parse
# from the remainder — an optional-scheme group inside the path regex
# would mis-parse no-path URLs (http://h.com → path "/h.com") under
# the leftmost-first preference BOTH engines share
_SCHEME_STRIP_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"
_HOSTPORT_RE = r"^([^/?#]*)"
# userinfo ('user:pass@') is stripped from the authority: the same
# page with and without credentials must land in ONE dedup group and
# ONE domain-cap bucket (round-9 verdict finding — keeping it split
# both). '@' cannot appear unencoded inside userinfo or host per
# RFC 3986, so everything up to the first '@' is exactly the userinfo.
_USERINFO_RE = r"^[^@/]*@"
_PATH_RE = r"^[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _is_tracking(param: Column) -> Column:
    name = F.split(param, "=", 2)[0]
    cond = name.startswith("utm_")
    for p in TRACKING_PARAMS:
        cond = cond | (name == F.lit(p))
    return cond


def canonical_url(col: Column | str) -> Column:
    """The canonical form as one row-local expression (rules above)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme_raw = F.regexp_extract(u, _SCHEME_RE, 1)
    scheme = F.when(scheme_raw == "", F.lit("http")).otherwise(
        F.lower(scheme_raw)
    )
    rest = F.regexp_replace(u, _SCHEME_STRIP_RE, "")
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, _HOSTPORT_RE, 1)), _USERINFO_RE, ""
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":[0-9]*$", ""), r"^www\.", ""
    )
    port_raw = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    port = F.when(
        (port_raw == "")
        | ((scheme == "http") & (port_raw == "80"))
        | ((scheme == "https") & (port_raw == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port_raw))
    path_raw = F.regexp_extract(rest, _PATH_RE, 1)
    path = F.regexp_replace(
        F.regexp_replace(path_raw, r"/+", "/"), r"/$", ""
    )
    query_raw = F.regexp_extract(rest, _QUERY_RE, 1)
    params = F.filter(
        F.split(query_raw, "&", -1),
        lambda x: (x != "") & ~_is_tracking(x),
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    query = F.when(qsorted == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qsorted)
    )
    return F.concat(scheme, F.lit("://"), host, port, path, query)


def url_domain(col: Column | str) -> Column:
    """The canonical host (lowercased, www-stripped, port dropped) —
    the per-domain cap/rollup key."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    rest = F.regexp_replace(u, _SCHEME_STRIP_RE, "")
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, _HOSTPORT_RE, 1)), _USERINFO_RE, ""
    )
    return F.regexp_replace(
        F.regexp_replace(hostport, r":[0-9]*$", ""), r"^www\.", ""
    )


def _sql_re(pat: str) -> str:
    """A regex constant as a DuckDB string literal (the patterns
    contain no single quotes, asserted so a future edit fails loudly
    instead of silently generating broken SQL)."""
    assert "'" not in pat, pat
    return "'" + pat + "'"


def canonical_url_sql(expr: str) -> str:
    """The identical canonicalization as a DuckDB SQL expression over
    ``expr`` — GENERATED from the same regex constants as the Spark
    column (the html_to_text_sql discipline), so the oracle cannot
    drift from the engine rule."""
    u = f"trim({expr})"
    scheme = (
        f"(CASE WHEN regexp_extract({u}, {_sql_re(_SCHEME_RE)}, 1) = '' "
        f"THEN 'http' ELSE lower(regexp_extract({u}, "
        f"{_sql_re(_SCHEME_RE)}, 1)) END)"
    )
    rest = f"regexp_replace({u}, {_sql_re(_SCHEME_STRIP_RE)}, '')"
    hostport = (
        f"regexp_replace(lower(regexp_extract({rest}, "
        f"{_sql_re(_HOSTPORT_RE)}, 1)), {_sql_re(_USERINFO_RE)}, '')"
    )
    host = (
        f"regexp_replace(regexp_replace({hostport}, ':[0-9]*$', ''), "
        "'^www\\.', '')"
    )
    port_raw = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port = (
        f"(CASE WHEN {port_raw} = '' "
        f"OR ({scheme} = 'http' AND {port_raw} = '80') "
        f"OR ({scheme} = 'https' AND {port_raw} = '443') "
        f"THEN '' ELSE ':' || {port_raw} END)"
    )
    path = (
        "regexp_replace(regexp_replace("
        f"regexp_extract({rest}, {_sql_re(_PATH_RE)}, 1), "
        "'/+', '/', 'g'), '/$', '')"
    )
    tracking = " OR ".join(
        f"string_split(x, '=')[1] = '{p}'" for p in TRACKING_PARAMS
    )
    params = (
        f"list_filter(string_split(regexp_extract({rest}, "
        f"{_sql_re(_QUERY_RE)}, 1), '&'), "
        f"x -> x <> '' AND NOT (starts_with(string_split(x, '=')[1], "
        f"'utm_') OR {tracking}))"
    )
    # DuckDB array_to_string([], sep) is NULL, not '' — coalesce or a
    # param-free URL canonicalizes to NULL (the q85 gotcha)
    qsorted = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    query = f"(CASE WHEN {qsorted} = '' THEN '' ELSE '?' || {qsorted} END)"
    return f"({scheme} || '://' || {host} || {port} || {path} || {query})"


def url_domain_sql(expr: str) -> str:
    """:func:`url_domain`'s DuckDB twin, generated from the same
    constants."""
    u = f"trim({expr})"
    rest = f"regexp_replace({u}, {_sql_re(_SCHEME_STRIP_RE)}, '')"
    hostport = (
        f"regexp_replace(lower(regexp_extract({rest}, "
        f"{_sql_re(_HOSTPORT_RE)}, 1)), {_sql_re(_USERINFO_RE)}, '')"
    )
    return (
        f"regexp_replace(regexp_replace({hostport}, ':[0-9]*$', ''), "
        "'^www\\.', '')"
    )


def url_key(col: Column | str) -> Column:
    """md5 of the canonical form — the fixed-width join/dedup key (the
    engine's portable-hash idiom; two URLs dedup iff they canonicalize
    equal)."""
    return F.md5(canonical_url(col))


def url_seen_bloom(
    seen: DataFrame,
    url_col: str = "url",
    num_bits: int = 1 << 15,
    num_hashes: int = 5,
) -> list[int]:
    """A Bloom literal over the CANONICAL url keys of a seen-frontier
    snapshot (operators/sketches.py machinery — ~num_bits/8 bytes no
    matter how many URLs). Pair with :func:`url_frontier_gate` for the
    stateless have-we-crawled-this gate."""
    from ..operators.sketches import bloom_dense, bloom_words

    keys = seen.select(url_key(url_col).alias("__uk"))
    return bloom_dense(
        bloom_words(keys, "__uk", num_bits, num_hashes), num_bits
    )


def url_frontier_gate(
    df: DataFrame,
    dense: list[int],
    url_col: str = "url",
    num_bits: int = 1 << 15,
    num_hashes: int = 5,
) -> DataFrame:
    """The crawl-frontier seen-URL gate: keep rows whose canonical url
    key is NOT in the seen bloom. Entirely STATELESS and row-local
    (canonicalize → md5 key → bloom probe, all codegen column work,
    the bloom rides as a plan literal) — so the same expression gates
    a batch frame and an append-mode stream identically, at scan
    parallelism, with no state store and no shuffle.

    Error direction (OPPOSITE of the decontamination gate, state it
    loudly): no false negatives means a SEEN url is ALWAYS dropped —
    the gate never double-crawls; a bloom false positive drops a
    genuinely NEW url at the fp rate. That is the trade every
    production frontier accepts — size ``num_bits`` for the fp budget,
    and the next crawl cycle re-discovers anything lost."""
    probe = bloom_key_member(url_key(url_col), dense, num_bits, num_hashes)
    return df.filter(~probe)


def bloom_key_member(
    key: Column, dense: list[int], num_bits: int, num_hashes: int
) -> Column:
    """Row-local bloom membership of an arbitrary key column (thin
    alias over sketches.bloom_contains, re-exported here so frontier
    callers need one import)."""
    from ..operators.sketches import bloom_contains

    return bloom_contains(key, dense, num_bits, num_hashes)


def politeness_schedule(
    df: DataFrame,
    url_col: str = "url",
    gap_slots: int = 16,
    slot_ms: int = 1000,
    start_epoch_ms: int = 0,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """POLITENESS SCHEDULING for the crawl frontier (round-9 verdict
    task 10 — the operator between :func:`url_frontier_gate` and a
    real fetcher): assign every candidate URL a deterministic fetch
    slot such that the SAME domain is never hit more often than once
    per ``gap_slots`` slots (the robots.txt crawl-delay discipline),
    while different domains interleave freely.

    Rule, fully replayable: ``domain_seq`` = the URL's 0-based rank
    within its canonical domain under ``order_by`` (default: canonical
    URL asc, pass a priority ordering in production — MUST be a total
    order or the schedule is nondeterministic); the domain's phase
    ``offset`` = md5(domain) mod ``gap_slots`` (the portable-hash
    idiom — staggers domains so they don't all burst at slot 0);
    ``slot = offset + domain_seq · gap_slots``;
    ``fetch_at_ms = start_epoch_ms + slot · slot_ms``. Consecutive
    same-domain fetches are therefore EXACTLY ``gap_slots`` slots
    apart — the per-domain gap invariant — and the whole schedule is
    a pure function of the frontier snapshot (re-running it after a
    crash reproduces the identical timetable).

    One window over the domain key (the :func:`domain_cap` shuffle
    shape — at 100 TB a mega-domain is exactly the key that needs the
    cap applied FIRST, which also bounds this window's output). Adds
    (domain, domain_seq, slot, fetch_at_ms)."""
    if gap_slots < 1:
        raise ValueError(
            f"politeness_schedule: gap_slots must be >= 1, got {gap_slots}"
        )
    if slot_ms < 1:
        raise ValueError(
            f"politeness_schedule: slot_ms must be >= 1, got {slot_ms}"
        )
    order = order_by if order_by is not None else [
        F.asc(canonical_url(url_col))
    ]
    d = df.withColumn("domain", url_domain(url_col))
    offset = (
        F.conv(F.substring(F.md5(F.col("domain")), 1, 8), 16, 10)
        .cast("long")
        % gap_slots
    )
    w = Window.partitionBy("domain").orderBy(*order)
    ranked = d.withColumn(
        "domain_seq", (F.row_number().over(w) - 1).cast("long")
    )
    slot = (offset + F.col("domain_seq") * gap_slots).cast("long")
    return ranked.withColumn("slot", slot).withColumn(
        "fetch_at_ms",
        (F.lit(start_epoch_ms) + F.col("slot") * slot_ms).cast("long"),
    )


def politeness_schedule_per_domain(
    df: DataFrame,
    domain_gaps: DataFrame,
    url_col: str = "url",
    default_gap: int = 16,
    slot_ms: int = 1000,
    start_epoch_ms: int = 0,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """:func:`politeness_schedule` with a PER-DOMAIN gap — the
    robots.txt ``Crawl-delay`` integration (pair with
    :func:`~.robots.robots_crawl_delay`): ``domain_gaps`` is a
    (domain, gap_slots) table, BROADCAST onto the frontier;
    domains without a row use ``default_gap``. The rule is the fixed
    one with gap a column: phase = md5(domain) mod gap_d, slot =
    phase + rank·gap_d — so consecutive same-domain fetches are
    EXACTLY gap_d slots apart while the phase stays inside the
    domain's own gap. Non-positive gaps in the table raise at plan
    execution (a zero gap would schedule every fetch at the phase).
    Same single domain-keyed window; adds (domain, gap_slots,
    domain_seq, slot, fetch_at_ms)."""
    if default_gap < 1:
        raise ValueError(
            f"politeness_schedule_per_domain: default_gap must be >= 1, "
            f"got {default_gap}"
        )
    if slot_ms < 1:
        raise ValueError(
            f"politeness_schedule_per_domain: slot_ms must be >= 1, "
            f"got {slot_ms}"
        )
    order = order_by if order_by is not None else [
        F.asc(canonical_url(url_col))
    ]
    d = df.withColumn("domain", url_domain(url_col)).join(
        F.broadcast(
            domain_gaps.select(
                "domain", F.col("gap_slots").cast("long").alias("__g")
            )
        ),
        "domain",
        "left",
    )
    gap = F.coalesce(
        F.when(
            F.col("__g") < 1,
            F.raise_error(
                F.concat(
                    F.lit(
                        "politeness_schedule_per_domain: non-positive "
                        "gap for domain "
                    ),
                    F.col("domain"),
                )
            ).cast("long"),
        ).otherwise(F.col("__g")),
        F.lit(default_gap).cast("long"),
    )
    offset = (
        F.conv(F.substring(F.md5(F.col("domain")), 1, 8), 16, 10)
        .cast("long")
        % gap
    )
    w = Window.partitionBy("domain").orderBy(*order)
    ranked = d.withColumn(
        "domain_seq", (F.row_number().over(w) - 1).cast("long")
    )
    slot = (offset + F.col("domain_seq") * gap).cast("long")
    return (
        ranked.withColumn("gap_slots", gap)
        .withColumn("slot", slot)
        .withColumn(
            "fetch_at_ms",
            (F.lit(start_epoch_ms) + F.col("slot") * slot_ms).cast("long"),
        )
        .drop("__g")
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 1000,
    order_by: list[Column] | None = None,
    keep_rank: bool = False,
) -> DataFrame:
    """C4/Gopher-style per-domain volume cap: keep at most ``cap``
    rows per canonical domain, ranked by ``order_by`` (default: the
    URL's canonical form ascending — deterministic but arbitrary;
    pass a quality ordering like ``[F.desc("quality"), F.asc("id")]``
    in production). One window over the domain key — a single
    domain-keyed shuffle; a mega-domain is exactly the skew a salted
    pre-aggregation would need at the extreme, but the cap itself
    bounds the output per key so the window never materializes more
    than it keeps per task after the rank filter."""
    if cap < 1:
        raise ValueError(f"domain_cap: cap must be >= 1, got {cap}")
    order = order_by if order_by is not None else [
        F.asc(canonical_url(url_col))
    ]
    d = df.withColumn("__domain", url_domain(url_col))
    w = Window.partitionBy("__domain").orderBy(*order)
    ranked = d.withColumn("__rank", F.row_number().over(w)).filter(
        F.col("__rank") <= cap
    )
    if keep_rank:
        return ranked.withColumnRenamed(
            "__domain", "domain"
        ).withColumnRenamed("__rank", "domain_rank")
    return ranked.drop("__domain", "__rank")
