"""Scalar column functions (SURVEY §2.8 F1–F14).

Everything here stays JVM-side (whole-stage codegen) except
:func:`normalize_text_deep`, which needs Python's unicodedata/ftfy and is
a pandas_udf — the reference has the exact same split (native regex chain
for speed, row UDF only for mojibake repair + NFKC;
utils/data_transformation_helpers.py:20-86).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Latin + Latin-Extended-A/B + IPA + Latin-Extended-Additional, as in the
# reference's script filter (extract_artists.py:42-63: "^[ -ɏḀ-ỿ]*$").
LATIN_SCRIPT_RE = r"^[ -ɏḀ-ỿ]+$"


def normalize_text(col: Column | str) -> Column:
    """Fast, JVM-side text canonicalization: collapse newlines and runs of
    whitespace, trim (reference's native expression chain,
    data_transformation_helpers.py:74-83). Mojibake/NFKC repair is the
    separate, optional :func:`normalize_text_deep` — keep it off the
    100 TB hot path."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[\n\r]+", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def _deep_normalize_impl(s: pd.Series) -> pd.Series:
    import unicodedata

    try:  # ftfy is optional; not present in this container
        import ftfy

        fix = ftfy.fix_text
    except ImportError:  # pragma: no cover
        def fix(x: str) -> str:
            return x

    def go(x):
        if x is None:
            return None
        x = unicodedata.normalize("NFKC", fix(x))
        x = x.replace('\\"', '"')
        return x

    return s.map(go)


_deep_normalize_udf = None


def _deep_normalize(c: Column) -> Column:
    # built lazily: pandas_udf needs an active SparkSession to resolve
    global _deep_normalize_udf
    if _deep_normalize_udf is None:
        from pyspark.sql.types import StringType

        _deep_normalize_udf = pandas_udf(_deep_normalize_impl, StringType())
    return _deep_normalize_udf(c)


_WARNED_FTFY_FALLBACK = False


def normalize_text_deep(col: Column | str, require_ftfy: bool = False) -> Column:
    """Full canonicalization incl. mojibake repair (if ftfy present) and
    Unicode NFKC, then the native whitespace chain. Arrow-batched
    pandas_udf — the one unavoidable Python stage (reference F1,
    data_transformation_helpers.py:20-73).

    Without ftfy the mojibake-repair step degrades to identity — warned
    once at plan-build time, never silent. Pass ``require_ftfy=True`` to
    raise instead (two environments then cannot produce different
    "normalized" text without one of them failing loudly)."""
    try:
        import ftfy  # noqa: F401  (driver-side probe; executors re-probe)
    except ImportError:
        if require_ftfy:
            raise ImportError(
                "normalize_text_deep(require_ftfy=True) but ftfy is not "
                "installed; mojibake repair would silently degrade to identity"
            ) from None
        global _WARNED_FTFY_FALLBACK
        if not _WARNED_FTFY_FALLBACK:
            import warnings

            warnings.warn(
                "ftfy not installed: normalize_text_deep will apply NFKC + "
                "whitespace normalization but skip mojibake repair. Install "
                "ftfy or pass require_ftfy=True to make this an error.",
                RuntimeWarning,
                stacklevel=2,
            )
            _WARNED_FTFY_FALLBACK = True
    c = F.col(col) if isinstance(col, str) else col
    return normalize_text(_deep_normalize(c))


def latin_script_filter(col: Column | str) -> Column:
    """Predicate: non-empty and entirely Latin-script (reference P3,
    extract_artists.py:42-63; goldens keep Björk/Dvořák, drop Cyrillic,
    CJK, mixed-script)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (c != "") & c.rlike(LATIN_SCRIPT_RE)


def format_list_natural(col: Column | str) -> Column:
    """Oxford-comma natural-language list join with order-preserving dedup
    (reference F2, data_transformation_helpers.py:123-158):
    [] -> "", [a] -> "a", [a,b] -> "a and b", [a,b,c] -> "a, b, and c".
    Pure column expressions — array_distinct preserves first-seen order."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array_distinct(F.coalesce(c, F.array()))
    n = F.size(arr)
    last = F.element_at(arr, -1)
    return (
        F.when(n == 0, F.lit(""))
        .when(n == 1, F.element_at(arr, 1))
        .when(n == 2, F.concat(F.element_at(arr, 1), F.lit(" and "), last))
        .otherwise(
            F.concat(
                F.array_join(F.slice(arr, 1, n - 1), ", "),
                F.lit(", and "),
                last,
            )
        )
    )


def context_header(
    topic: Column,
    genres: Column,
    country: Column,
    active_since: Column,
    name: Column,
    section: Column,
) -> Column:
    """RAG context-header enrichment T3 (reference
    extract_artists_articles.py:146-193): the ``search_document:``
    prefix line prepended to every chunk, built entirely from column
    expressions — sparse parts (genres/country/year) drop out when
    null/empty, exactly like the reference's conditional f-string."""
    return F.concat(
        F.lit("search_document: Topic: "),
        topic,
        F.lit(". Context: "),
        F.when(
            F.size(F.coalesce(genres, F.array())) > 0,
            F.concat(F.lit("Genres: "), format_list_natural(genres), F.lit("; ")),
        ).otherwise(F.lit("")),
        F.when(
            country.isNotNull(), F.concat(F.lit("Country: "), country, F.lit("; "))
        ).otherwise(F.lit("")),
        F.when(
            active_since.isNotNull(),
            F.concat(F.lit("Active since: "), active_since.cast("string"), F.lit(" ")),
        ).otherwise(F.lit("")),
        F.lit("| "),
        name,
        F.lit(" (Section: "),
        section,
        F.lit(") |"),
    )


def track_entry(pos: Column | str, title: Column | str) -> Column:
    """``"{position}. {title}"`` (reference F3, ingest_graph_db.py:100-102)."""
    p = F.col(pos) if isinstance(pos, str) else pos
    t = F.col(title) if isinstance(title, str) else title
    return F.concat(p.cast("string"), F.lit(". "), t)


def qid_from_uri(col: Column | str) -> Column:
    """Last path segment of an entity URI → QID (reference F4,
    extract_artists.py:122-126)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "/", -1)


def year_from_date_string(col: Column | str) -> Column:
    """Leading ``YYYY`` of an ISO-ish date string → int, null-safe
    (reference F5, musicbrainz_helpers.py:260-277)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, 4).cast("int")


def year_from_wikidata_time(col: Column | str) -> Column:
    """Wikidata time literal ``"+1988-00-00T..."`` → 1988 (reference F6,
    extract_genres_articles.py:48-66)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 2, 4).cast("int")


def doc_id_hash(text: Column | str, ident: Column | str) -> Column:
    """Stable 32-hex document id: sha256(text + "-" + id)[:32]
    (reference F7, utils/chroma_helpers.py:111-124)."""
    t = F.col(text) if isinstance(text, str) else text
    i = F.col(ident) if isinstance(ident, str) else ident
    return F.substring(F.sha2(F.concat(t, F.lit("-"), i), 256), 1, 32)


def title_underscores_to_spaces(col: Column | str) -> Column:
    """Wikipedia URL title → display title (reference F9,
    extract_artists_articles.py:123)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.substring_index(c, "/", -1), "_", " ")


def sitelink_to_wikipedia_url(title: Column | str) -> Column:
    """Article title → canonical Wikipedia URL (reference F12,
    wikidata_helpers.py:414-432)."""
    t = F.col(title) if isinstance(title, str) else title
    return F.concat(
        F.lit("https://en.wikipedia.org/wiki/"), F.regexp_replace(t, " ", "_")
    )
