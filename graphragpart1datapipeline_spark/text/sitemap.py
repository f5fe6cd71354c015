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

__all__ = ["sitemap_locs", "sitemap_frontier_seed", "LOC_RE"]

LOC_RE = "<loc>([^<]*)</loc>"


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
