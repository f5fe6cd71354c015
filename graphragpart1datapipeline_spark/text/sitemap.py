"""Sitemap parsing + frontier seeding (the sitemaps.org protocol) —
the OTHER source of crawl-frontier URLs besides discovered links:
every serious site publishes ``sitemap.xml``, and a polite crawler
seeds from it (the pages the site WANTS crawled) before following
links. Two document kinds share the format: a ``<urlset>`` lists page
URLs; a ``<sitemapindex>`` lists child sitemap URLs (fetch-loop
input, NOT frontier pages — seeding must route them away or the
frontier fills with XML files).

``sitemap_locs`` is pure row-local column work — one
``regexp_extract_all`` for the ``<loc>`` values (the only element the
frontier needs; per the protocol locs are absolute URLs), a
``posexplode``, a trim, and the root-element kind tag — zero Python,
zero shuffle until the caller aggregates, scan-bound at 100 TB.
``sitemap_frontier_seed`` then runs the standard hygiene chain this
module's siblings provide: canonicalize (text/urls.py — the sitemap
spelling and the crawl-log spelling of one page must collapse),
group per canonical URL, and anti-join against the SEEN frontier's
canonical keys (the exact-batch twin of q252's streaming bloom gate —
at the daily-increment scale an exact anti-join is affordable and has
no false drops). Every primitive has an exact DuckDB twin, so the
whole seed chain replays bit-for-bit (q265).

Documented simplifications, stated loudly: ``<lastmod>``/
``<changefreq>``/``<priority>`` are not paired with their locs
(pairing is positional XML work the frontier doesn't need — a
re-crawl scheduler would parse them behind the same seam), and XML
entities inside locs are NOT decoded (the protocol requires
entity-escaped URLs; ``&amp;`` in a loc is passed through to the
canonicalizer as-is, matching how the seen-set spellings were
recorded by the same chain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urls import canonical_url, url_domain

__all__ = [
    "sitemap_locs",
    "sitemap_entries",
    "sitemap_frontier_seed",
    "sitemap_recrawl",
    "LOC_RE",
    "LASTMOD_RE",
]

LOC_RE = "<loc>([^<]*)</loc>"
LASTMOD_RE = "<lastmod>([^<]*)</lastmod>"


def sitemap_locs(
    df: DataFrame,
    xml_col: str = "xml",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode sitemap XML blobs into (``keep_cols``..., kind,
    loc_idx, loc): ``kind`` is ``index`` for ``<sitemapindex>`` roots
    else ``urlset``; ``loc`` is the trimmed ``<loc>`` text in
    document order (``loc_idx`` 0-based)."""
    keep = keep_cols if keep_cols is not None else []
    kind = F.when(
        F.col(xml_col).contains("<sitemapindex"), F.lit("index")
    ).otherwise(F.lit("urlset"))
    locs = F.regexp_extract_all(xml_col, F.lit(LOC_RE), 1)
    return (
        df.select(*keep, kind.alias("kind"), locs.alias("__locs"))
        .select(
            *keep, "kind", F.posexplode("__locs").alias("loc_idx", "__l")
        )
        .select(
            *keep,
            "kind",
            F.col("loc_idx").cast("long").alias("loc_idx"),
            F.trim("__l").alias("loc"),
        )
    )


def sitemap_locs_sql(xml_expr: str) -> str:
    """The loc-list extraction's DuckDB twin, GENERATED from the same
    ``LOC_RE`` (trim applies per element after unnest, as the engine
    trims after posexplode)."""
    assert "'" not in LOC_RE
    return f"regexp_extract_all({xml_expr}, '{LOC_RE}', 1)"


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "xml",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """PAIRED sitemap entries — (``keep_cols``..., entry_idx, loc,
    lastmod): the ``<url>`` blocks split positionally (one block =
    one entry, so loc and lastmod pair BY BLOCK, never by global
    position — the pairing :func:`sitemap_locs` documents as out of
    its scope), then per-block regexp extracts; ``lastmod`` is ''
    when the entry has none. Only ``<urlset>`` documents have
    ``<url>`` blocks, so index blobs yield no rows here. ``lastmod``
    stays the protocol's W3C/ISO-8601 STRING — lexical order IS
    chronological order for it, which is what :func:`sitemap_recrawl`
    compares by (documented; no timezone parsing)."""
    keep = keep_cols if keep_cols is not None else []
    blocks = F.split(F.col(xml_col), "<url>", -1)
    out = df.select(
        *keep, F.posexplode(blocks).alias("__bi", "__b")
    ).filter(F.col("__bi") > 0)
    return out.select(
        *keep,
        (F.col("__bi") - 1).cast("long").alias("entry_idx"),
        F.trim(F.regexp_extract("__b", LOC_RE, 1)).alias("loc"),
        F.trim(F.regexp_extract("__b", LASTMOD_RE, 1)).alias("lastmod"),
    )


def sitemap_recrawl(
    sitemaps: DataFrame,
    crawl_log: DataFrame,
    xml_col: str = "xml",
    log_url_col: str = "url",
    log_ts_col: str = "crawled_at",
) -> DataFrame:
    """The RE-crawl selector (freshness, the sitemap protocol's whole
    reason for ``lastmod``): canonical-key join of the sitemap
    entries against the last-crawl log and keep pages that are STALE
    — never crawled (no log row) or ``lastmod`` after the logged
    crawl time (ISO-8601 lexical compare; an entry WITHOUT lastmod is
    conservatively stale — the site gave no freshness evidence, and
    skipping it would mean never re-crawling that page). Entries
    collapse per canonical key keeping the MAX lastmod (a page listed
    in several sitemaps re-crawls once). Returns (canon, domain,
    lastmod, crawled_at, reason ∈ {'new','updated','no-lastmod'}).
    One canonical groupBy + one key join — increment-sized."""
    ent = sitemap_entries(sitemaps, xml_col).filter(F.col("loc") != "")
    canon = ent.select(
        canonical_url("loc").alias("canon"),
        url_domain("loc").alias("domain"),
        F.col("lastmod"),
    )
    grouped = canon.groupBy("canon", "domain").agg(
        F.max("lastmod").alias("lastmod")
    )
    log = crawl_log.select(
        canonical_url(log_url_col).alias("canon"),
        F.col(log_ts_col).alias("crawled_at"),
    ).groupBy("canon").agg(F.max("crawled_at").alias("crawled_at"))
    j = grouped.join(log, "canon", "left")
    reason = (
        F.when(F.col("crawled_at").isNull(), F.lit("new"))
        .when(F.col("lastmod") == "", F.lit("no-lastmod"))
        .when(F.col("lastmod") > F.col("crawled_at"), F.lit("updated"))
    )
    return j.withColumn("reason", reason).filter(
        F.col("reason").isNotNull()
    )


def sitemap_frontier_seed(
    sitemaps: DataFrame,
    seen: DataFrame,
    xml_col: str = "xml",
    seen_url_col: str = "url",
) -> DataFrame:
    """Page URLs a crawler should ADD to its frontier: ``urlset``
    locs (index locs are fetch-loop input and are excluded),
    canonicalized and grouped per canonical URL (n_spellings counts
    collapsed duplicates), minus every canonical key already in the
    ``seen`` snapshot (exact anti-join — no false drops; the
    streaming twin is q252's bloom gate). Returns (canon, domain,
    n_spellings). The seen side reduces to DISTINCT canonical keys
    before the join; at daily-increment scale the NEW side is small
    and the join shuffles only the keys."""
    locs = sitemap_locs(sitemaps, xml_col).filter(
        F.col("kind") == "urlset"
    )
    canon = locs.select(
        canonical_url("loc").alias("canon"),
        url_domain("loc").alias("domain"),
    )
    grouped = canon.groupBy("canon", "domain").agg(
        F.count(F.lit(1)).alias("n_spellings")
    )
    seen_keys = seen.select(
        canonical_url(seen_url_col).alias("canon")
    ).distinct()
    return grouped.join(seen_keys, "canon", "left_anti")
