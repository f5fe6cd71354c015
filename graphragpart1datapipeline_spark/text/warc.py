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

Two readers, one contract:

* :func:`warc_records` — TEXT-MODE, pure column work. The body is
  delimited by the record terminator, not by counting
  ``Content-Length`` bytes — correct for text-mode WARC whose
  payloads do not themselves contain a bare ``\\r\\n\\r\\nWARC/1.0``
  sequence (true of HTML/text responses; HTML escapes make the
  sentinel unrepresentable in content). Fully SQL-replayable.
* :func:`warc_records_binary` — BYTE-EXACT, the Arrow mapInPandas
  seam (the multimodal/assets.py pattern). Payload length is COUNTED
  from the mandatory ``Content-Length`` header, so binary payloads
  (images — most Common Crawl records by count) that contain the
  record sentinel in their bytes round-trip intact. This is the
  reader that feeds decode_image_features → dhash → near-dup
  (q255); one blob = one Arrow row = one parse pass, so at 100 TB
  the parallelism is file-level, exactly how warc files ship
  (~1 GB each), with zero shuffle until an explicit rollup.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "warc_records",
    "warc_records_binary",
    "warc_record_text",
    "warc_header_sql",
]

_SENTINEL = "WARC/1.0\r\n"

# the header BLOCK is everything before the first blank line — headers
# are extracted from it, never from the whole record, so an
# HTTP-response BODY's own 'Content-Type:' line can never stand in for
# a missing WARC header (round-9 verdict finding: whole-record extract
# bled the payload's value when the header block lacked the name)
_HEADER_BLOCK_RE = r"(?s)^(.*?)\r\n\r\n"


def _header_value_re(name: str) -> str:
    """Regex for one header's value, shared verbatim by both dialects
    (names are case-sensitive per the spec's canonical forms, which is
    what every writer emits)."""
    return name + r": ([^\r\n]*)"


def _header(rec: Column, name: str) -> Column:
    """One header value from a record's PRE-BLANK-LINE header block
    (first match); '' when the block lacks the header — the body's
    embedded copies are unreachable by construction."""
    block = F.regexp_extract(rec, _HEADER_BLOCK_RE, 1)
    return F.regexp_extract(block, _header_value_re(name), 1)


def warc_header_sql(rec_expr: str, name: str) -> str:
    """:func:`_header`'s DuckDB twin, GENERATED from the same regex
    constants (the canonical_url_sql discipline) so the oracle's
    header rule cannot drift from the engine's."""
    for pat in (_HEADER_BLOCK_RE, _header_value_re(name)):
        assert "'" not in pat, pat
    block = f"regexp_extract({rec_expr}, '{_HEADER_BLOCK_RE}', 1)"
    return f"regexp_extract({block}, '{_header_value_re(name)}', 1)"


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


_SENTINEL_B = b"WARC/1.0\r\n"
_BLANK_B = b"\r\n\r\n"

BINARY_RECORD_FIELDS = (
    "rec_idx long, warc_type string, target_uri string, "
    "content_type string, content_length long, payload binary"
)


def _parse_warc_blob(blob: bytes) -> Iterator[tuple]:
    """Byte-exact record iterator over one WARC file blob: headers are
    parsed from the pre-blank-line block (the same anchoring rule as
    the text-mode reader), the payload is EXACTLY ``Content-Length``
    bytes — a payload containing the record sentinel in its bytes
    (any image) is returned intact. A record without Content-Length
    is malformed per ISO 28500 §5.3 (the header is mandatory) and
    raises loudly — silently guessing the boundary is how a corrupt
    record swallows its successors."""
    pos = 0
    idx = 0
    n = len(blob)
    while pos < n:
        start = blob.find(_SENTINEL_B, pos)
        if start < 0:
            break
        hdr_start = start + len(_SENTINEL_B)
        hdr_end = blob.find(_BLANK_B, hdr_start)
        if hdr_end < 0:
            raise ValueError(
                f"warc_records_binary: record {idx} has no blank line "
                "after its header block — truncated or not WARC"
            )
        headers: dict[str, str] = {}
        for line in blob[hdr_start:hdr_end].decode(
            "utf-8", "replace"
        ).split("\r\n"):
            name, sep, value = line.partition(":")
            if sep:
                headers[name.strip()] = value.strip()
        if "Content-Length" not in headers:
            raise ValueError(
                f"warc_records_binary: record {idx} has no "
                "Content-Length header — mandatory per ISO 28500; "
                "a text-mode blob belongs in warc_records"
            )
        clen = int(headers["Content-Length"])
        body_start = hdr_end + len(_BLANK_B)
        if body_start + clen > n:
            raise ValueError(
                f"warc_records_binary: record {idx} declares "
                f"Content-Length={clen} but only "
                f"{n - body_start} bytes remain — truncated blob"
            )
        payload = blob[body_start : body_start + clen]
        yield (
            idx,
            headers.get("WARC-Type", ""),
            headers.get("WARC-Target-URI", ""),
            headers.get("Content-Type", ""),
            clen,
            payload,
        )
        pos = body_start + clen
        # the two-CRLF record terminator follows the counted payload
        if blob[pos : pos + len(_BLANK_B)] == _BLANK_B:
            pos += len(_BLANK_B)
        idx += 1


def warc_records_binary(
    df: DataFrame,
    blob_col: str = "warc",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode BINARY WARC file blobs into one row per record:
    (``keep_cols``..., rec_idx, warc_type, target_uri, content_type,
    content_length, payload) — the byte-exact reader (payload counted
    from Content-Length, see :func:`_parse_warc_blob`). Arrow-batched
    mapInPandas, 1 blob → N record rows, zero shuffle; chain the
    image payloads straight into
    multimodal.assets.decode_payloads/dhash_expr (q255)."""
    import pandas as pd

    keep = keep_cols if keep_cols is not None else []
    keep_types = "".join(
        f"{f.name} {f.dataType.simpleString()}, "
        for f in (df.select(*keep).schema.fields if keep else [])
    )
    schema = keep_types + BINARY_RECORD_FIELDS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            *keep,
            "rec_idx",
            "warc_type",
            "target_uri",
            "content_type",
            "content_length",
            "payload",
        ]
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                d = tup._asdict()
                blob = d[blob_col]
                raw = bytes(blob) if blob is not None else b""
                kv = [d[k] for k in keep]
                for rec in _parse_warc_blob(raw):
                    rows.append((*kv, *rec))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(*keep, blob_col).mapInPandas(gen, schema=schema)
