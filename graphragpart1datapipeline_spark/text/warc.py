"""WARC (ISO 28500) record parsing — the entry format of every real
crawl corpus (Common Crawl ships WARC; the reference sidesteps the
entire ingest front by calling the Wikipedia API). A WARC file is a
concatenation of records, each:

    WARC/1.0\\r\\n
    <Header-Name>: <value>\\r\\n ...        (the header block)
    \\r\\n                                   (blank line)
    <content>                               (Content-Length bytes)
    \\r\\n\\r\\n                              (record terminator)

This module parses TEXT-MODE WARC blobs entirely row-locally: split
the blob on the record sentinel, regexp-extract the headers every
curation pipeline actually reads (WARC-Type, WARC-Target-URI,
Content-Type), take the body after the first blank line. One
``split`` + ``posexplode`` + a few ``regexp_extract``s — zero
shuffle, whole-stage codegen, scan-bound at 100 TB, and every
primitive has an exact DuckDB twin, so the parse replays bit-for-bit
(q253 runs the FULL ingest chain: WARC → records → HTML → text).

SIMPLIFICATION, stated loudly: the body is delimited by the record
terminator, not by counting ``Content-Length`` bytes — correct for
text-mode WARC whose payloads do not themselves contain a bare
``\\r\\n\\r\\nWARC/1.0`` sequence (true of HTML/text responses; HTML
escapes make the sentinel unrepresentable in content). BINARY
payloads (images in WARC) need the byte-exact reader, which belongs
behind the Arrow decode seam (multimodal/assets.py) exactly like the
image codecs — this parser is the curation-text path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["warc_records", "warc_record_text"]

_SENTINEL = "WARC/1.0\r\n"


def _header(rec: Column, name: str) -> Column:
    """One header value from a record's header block (first match;
    header names are case-sensitive per the spec's canonical forms,
    which is what every writer emits)."""
    return F.regexp_extract(rec, name + r": ([^\r\n]*)", 1)


def warc_records(
    df: DataFrame,
    blob_col: str = "warc",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode WARC file blobs into one row per record:
    (``keep_cols``..., rec_idx, warc_type, target_uri, content_type,
    body). ``rec_idx`` is the record's 0-based position in its file.
    Records are the non-empty sentinel splits; the body is everything
    after the first blank line, with the record terminator trimmed."""
    keep = keep_cols if keep_cols is not None else []
    # split on the literal sentinel (regex-escaped dot); element 0 is
    # whatever precedes the first record (normally empty) — dropped
    parts = F.split(F.col(blob_col), r"WARC/1\.0\r\n", -1)
    recs = F.filter(parts, lambda x: x != "")
    out = df.select(
        *keep, F.posexplode(recs).alias("rec_idx", "__rec")
    )
    rec = F.col("__rec")
    body = F.regexp_replace(
        F.regexp_extract(rec, r"(?s)\r\n\r\n(.*)$", 1),
        r"(?s)\r\n\r\n$",
        "",
    )
    return out.select(
        *keep,
        F.col("rec_idx").cast("long").alias("rec_idx"),
        _header(rec, "WARC-Type").alias("warc_type"),
        _header(rec, "WARC-Target-URI").alias("target_uri"),
        _header(rec, "Content-Type").alias("content_type"),
        body.alias("body"),
    )


def warc_record_text(
    records: DataFrame,
    body_col: str = "body",
    content_type_col: str = "content_type",
) -> Column:
    """The curation-text view of a parsed record body: HTML bodies go
    through the q247 extraction chain (text/html.py), anything else
    passes through as-is — the standard WARC→text step. Returns a
    column; select it onto the records frame."""
    from .html import html_to_text

    return F.when(
        F.col(content_type_col).startswith("text/html"),
        html_to_text(F.col(body_col)),
    ).otherwise(F.col(body_col))
