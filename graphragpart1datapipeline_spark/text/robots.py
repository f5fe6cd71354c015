"""robots.txt parsing + crawl-frontier compliance (RFC 9309) — the
legal/politeness gate between frontier seeding and fetching: parse
each domain's ``robots.txt`` into the rule group that governs OUR
user agent, then keep only frontier URLs that group allows.

Group semantics (RFC 9309 §2.2.1): a group is one or more consecutive
``User-agent`` lines followed by rules; a crawler obeys the group(s)
naming it EXACTLY (case-insensitive) when any exist, else the ``*``
group(s); rules before any ``User-agent`` line belong to no group and
are ignored. Matching (§2.2.2): a rule applies when its path is a
byte prefix of the request path; the LONGEST matching rule wins; on a
specificity tie ``Allow`` wins. Unknown fields (``Crawl-delay``,
``Sitemap``) are skipped by the rule parser; ``#`` comments and blank
lines stripped.

Documented simplification — WILDCARDS, conservative direction only:
RFC 9309 rules may carry ``*`` (any run) and ``$`` (end anchor).
Per-row regex compilation from data is the scan-killing anti-pattern
this engine never ships, so wildcard rules are honored
CONSERVATIVELY: a ``Disallow`` containing ``*``/``$`` is truncated at
the first wildcard character (its prefix blocks a superset — we may
over-block, never under-block: ``Disallow: *foo`` truncates to ``''``
and blocks the whole domain); an ``Allow`` containing a wildcard is
DROPPED (less allowance = again over-blocking). An empty ``Disallow``
value is the spec's allow-all no-op and is dropped. The crawler
therefore never fetches anything a compliant wildcard-aware parser
would block.

Scale shape: parsing is per-FILE row-local work (one line explode +
two windows over the domain key — robots files are KB-sized, domains
~1e8 at web scale, so the rules table is dims-sized); the frontier
filter BROADCASTS the rules and resolves longest-match with one
window partitioned by the frontier row — the corpus-side frontier
never shuffles against the rules. Every primitive (regexp_extract,
running-sum window, starts_with, row_number) has an exact DuckDB
twin, so parse + match replay bit-for-bit (q262).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .urls import canonical_url, url_domain

__all__ = [
    "robots_rules",
    "robots_crawl_delay",
    "robots_frontier_filter",
    "request_path",
]


def _applicable_lines(
    df: DataFrame,
    agent: str,
    body_col: str,
    domain_col: str,
) -> tuple[DataFrame, DataFrame]:
    """The shared parse core: (marked, applicable) — every line with
    its field/value/UA-group id, and the (domain, grp) pairs that
    govern ``agent`` (exact groups when any exist, else ``*``)."""
    if not agent or agent.strip() == "*":
        raise ValueError(
            f"robots: agent must be a concrete product token, "
            f"got {agent!r}"
        )
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(
            F.split(F.col(body_col), r"\r?\n", -1)
        ).alias("pos", "__l"),
    )
    clean = F.trim(F.regexp_replace("__l", "#.*$", ""))
    fields = lines.select(
        "domain",
        "pos",
        F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)\s*:", 1)).alias(
            "field"
        ),
        F.trim(F.regexp_replace(clean, r"^[A-Za-z-]+\s*:", "")).alias(
            "value"
        ),
    )
    w = Window.partitionBy("domain").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = (
        fields.withColumn("is_ua", F.col("field") == "user-agent")
        .withColumn(
            "prev_ua",
            F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
        )
        .withColumn(
            "grp",
            F.sum(
                F.when(F.col("is_ua") & ~F.col("prev_ua"), 1).otherwise(0)
            ).over(run),
        )
    )
    ua = (
        marked.filter("is_ua")
        .groupBy("domain", "grp")
        .agg(
            F.max(
                (F.lower("value") == agent.lower()).cast("int")
            ).alias("m_exact"),
            F.max((F.col("value") == "*").cast("int")).alias("m_any"),
        )
    )
    dom = ua.groupBy("domain").agg(F.max("m_exact").alias("has_exact"))
    applicable = (
        ua.join(dom, "domain")
        .filter(
            F.when(F.col("has_exact") == 1, F.col("m_exact") == 1).otherwise(
                F.col("m_any") == 1
            )
        )
        .select("domain", "grp")
    )
    return marked, applicable


def robots_rules(
    df: DataFrame,
    agent: str,
    body_col: str = "robots_txt",
    domain_col: str = "domain",
) -> DataFrame:
    """Parse one ``robots.txt`` body per domain into the applicable
    rules for ``agent``: (domain, rule ∈ {'allow','disallow'}, path)
    — exact-agent groups when any exist, else ``*`` groups; wildcard
    rules already conservatively transformed (module docstring)."""
    marked, applicable = _applicable_lines(df, agent, body_col, domain_col)
    rules0 = marked.filter(
        F.col("field").isin("allow", "disallow") & (F.col("grp") >= 1)
    ).select("domain", "grp", F.col("field").alias("rule"), "value")
    wildcard = F.col("value").rlike(r"[*$]")
    path = F.when(
        F.col("rule") == "disallow",
        F.regexp_extract("value", r"^([^*$]*)", 1),
    ).otherwise(F.col("value"))
    return (
        rules0.join(applicable, ["domain", "grp"])
        .filter(
            (F.col("value") != "")
            & ~((F.col("rule") == "allow") & wildcard)
        )
        .select("domain", "rule", path.alias("path"))
    )


def robots_crawl_delay(
    df: DataFrame,
    agent: str,
    body_col: str = "robots_txt",
    domain_col: str = "domain",
) -> DataFrame:
    """Per-domain ``Crawl-delay`` (the de-facto extension most
    crawlers honor; RFC 9309 leaves it out, so its absence is normal)
    from the groups governing ``agent`` — the same group-selection
    rule as :func:`robots_rules`, so an exact-agent group's delay
    OVERRIDES the ``*`` group's (and an exact group WITHOUT a numeric
    delay yields none for the domain — the governing group made no
    request; it does not fall back to ``*``, documented). Integer
    seconds only; non-numeric values are ignored. When several
    applicable lines remain, the MAXIMUM wins (the conservative,
    politest reading). Returns (domain, delay_s). Feed into
    :func:`~.urls.politeness_schedule_per_domain`."""
    marked, applicable = _applicable_lines(df, agent, body_col, domain_col)
    lines = marked.filter(
        (F.col("field") == "crawl-delay")
        & (F.col("grp") >= 1)
        & F.col("value").rlike(r"^[0-9]+$")
    ).select("domain", "grp", F.col("value").cast("long").alias("delay_s"))
    return (
        lines.join(applicable, ["domain", "grp"])
        .groupBy("domain")
        .agg(F.max("delay_s").alias("delay_s"))
    )


def request_path(url) -> "F.Column":
    """The request path a robots rule matches against: the CANONICAL
    URL's path component, ``/`` when empty (the canonical form strips
    the bare trailing slash). Query strings are not matched
    (documented simplification — rules carrying ``?`` are treated as
    path prefixes like any other byte)."""
    p = F.regexp_extract(
        canonical_url(url), r"^[a-z0-9+.-]+://[^/?#]*([^?#]*)", 1
    )
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_frontier_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    keep_blocked: bool = False,
) -> DataFrame:
    """Resolve RFC 9309 longest-match for every frontier URL against
    the (broadcast) applicable-rules table: adds ``domain``, ``path``,
    ``matched_rule``, ``matched_path``, ``allowed``; rows with no
    matching rule (or no robots.txt at all) are allowed — the spec's
    default. Returns only allowed rows unless ``keep_blocked`` (the
    audit view). One broadcast join + one window partitioned by the
    frontier row — the frontier never shuffles against the rules."""
    u = urls.withColumn("domain", url_domain(url_col)).withColumn(
        "path", request_path(url_col)
    )
    r = F.broadcast(
        rules.select(
            F.col("domain").alias("__rdom"),
            F.col("rule").alias("__rule"),
            F.col("path").alias("__rpath"),
        )
    )
    j = u.join(
        r,
        (F.col("domain") == F.col("__rdom"))
        & F.col("path").startswith(F.col("__rpath")),
        "left",
    )
    score = F.length("__rpath") * 2 + F.when(
        F.col("__rule") == "allow", 1
    ).otherwise(0)
    w = Window.partitionBy(id_col, url_col).orderBy(
        score.desc_nulls_last(),
        F.col("__rpath").desc(),
        F.col("__rule").asc(),
    )
    best = (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *urls.columns,
            "domain",
            "path",
            F.col("__rule").alias("matched_rule"),
            F.col("__rpath").alias("matched_path"),
            (
                F.col("__rule").isNull() | (F.col("__rule") == "allow")
            ).alias("allowed"),
        )
    )
    return best if keep_blocked else best.filter("allowed")
