"""MIME sniffing (magic-byte content detection) + payload routing —
the dispatch step of a real crawl-ingest chain: a WARC record's
``Content-Type`` header is whatever the origin server CLAIMED, and at
Common Crawl scale servers lie constantly (PDFs served as text/plain,
PNGs as application/octet-stream). Every production pipeline therefore
sniffs the payload's leading bytes (the file(1) / WHATWG
mime-sniffing discipline) and trusts the header only when no magic
matches.

Rule (``route_mime``): sniffed magic wins; otherwise the declared
header's media type (lower-cased, parameters after ``;`` dropped —
RFC 9110 §8.3.1); otherwise ``application/octet-stream``. The sniff
itself (``sniff_mime``) is a hex-prefix CASE chain over
``hex(payload)`` — pure row-local column work on the binary column,
zero Python, whole-stage codegen, scan-bound at 100 TB. The magic
table is ONE module constant (``MAGIC_RULES``); the DuckDB twins are
GENERATED from it (the canonical_url_sql / html_to_text_sql
discipline), so the sniff rule cannot drift between engines. The SQL
twin takes the payload's HEX STRING — the oracle rebuilds payload hex
from the fixture synthesis and replays the identical chain (q261);
the byte round-trip through the binary reader stays the Spark side's
to prove, exactly the decode-seam discipline (q255/q256).

Magic coverage is the crawl-relevant set: PDF, PNG, JPEG, GIF87a/89a,
WebP (the two-field RIFF....WEBP check), gzip, bzip2, zip. HTML is
deliberately NOT sniffed: text formats have no reliable magic (the
WHATWG algorithm's text heuristics are locale- and whitespace-
sensitive), so text routing trusts the declared header — the
conservative direction for curation (an unroutable payload lands in
``application/octet-stream`` and is dropped, never mis-extracted).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "MAGIC_RULES",
    "sniff_mime",
    "sniff_mime_hex_sql",
    "media_type",
    "media_type_sql",
    "route_mime",
    "route_mime_sql",
]

# (uppercase hex prefix at byte 1, optional (hex, 1-based hex offset)
# second field, mime). Order matters and is shared verbatim by both
# dialects: first match wins.
MAGIC_RULES: tuple[tuple[str, tuple[str, int] | None, str], ...] = (
    ("25504446", None, "application/pdf"),            # %PDF
    ("89504E470D0A1A0A", None, "image/png"),
    ("FFD8FF", None, "image/jpeg"),
    ("474946383761", None, "image/gif"),              # GIF87a
    ("474946383961", None, "image/gif"),              # GIF89a
    ("52494646", ("57454250", 17), "image/webp"),     # RIFF....WEBP
    ("1F8B", None, "application/gzip"),
    ("425A68", None, "application/x-bzip2"),          # BZh
    ("504B0304", None, "application/zip"),
)


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sniff_mime(payload: Column | str) -> Column:
    """Magic-byte mime of a BINARY payload column, NULL when no magic
    matches — the hex-prefix CASE chain over ``MAGIC_RULES`` (first
    match wins; Spark's ``hex`` emits uppercase, as does DuckDB's)."""
    hx = F.hex(_col(payload))
    out: Column | None = None
    for prefix, extra, mime in MAGIC_RULES:
        cond = hx.startswith(prefix)
        if extra is not None:
            tag, off = extra
            cond = cond & (F.substring(hx, off, len(tag)) == tag)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    assert out is not None
    return out.otherwise(F.lit(None).cast("string"))


def sniff_mime_hex_sql(hex_expr: str) -> str:
    """:func:`sniff_mime`'s DuckDB twin, GENERATED from the same
    ``MAGIC_RULES`` — over the payload's HEX STRING (the oracle
    rebuilds hex from the fixture synthesis; see module docstring)."""
    arms = []
    for prefix, extra, mime in MAGIC_RULES:
        cond = f"starts_with({hex_expr}, '{prefix}')"
        if extra is not None:
            tag, off = extra
            cond += f" AND substring({hex_expr}, {off}, {len(tag)}) = '{tag}'"
        arms.append(f"WHEN {cond} THEN '{mime}'")
    return "(CASE " + " ".join(arms) + " ELSE NULL END)"


def media_type(declared: Column | str) -> Column:
    """The declared header normalized to its bare media type:
    parameters after ``;`` dropped, trimmed, lower-cased (RFC 9110
    §8.3.1 — ``text/HTML; charset=utf-8`` → ``text/html``)."""
    return F.lower(F.trim(F.split(_col(declared), ";", 2)[0]))


def media_type_sql(expr: str) -> str:
    """:func:`media_type`'s DuckDB twin."""
    return f"lower(trim(string_split({expr}, ';')[1]))"


def route_mime(
    payload: Column | str, declared: Column | str
) -> Column:
    """The routing decision: sniffed magic wins; else the normalized
    declared type; else ``application/octet-stream``."""
    norm = media_type(declared)
    return F.coalesce(
        sniff_mime(payload),
        F.when(norm != "", norm),
        F.lit("application/octet-stream"),
    )


def route_mime_sql(hex_expr: str, declared_expr: str) -> str:
    """:func:`route_mime`'s DuckDB twin (payload as hex string)."""
    norm = media_type_sql(declared_expr)
    return (
        f"COALESCE({sniff_mime_hex_sql(hex_expr)}, "
        f"CASE WHEN {norm} <> '' THEN {norm} END, "
        f"'application/octet-stream')"
    )
