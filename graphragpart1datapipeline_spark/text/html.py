"""HTML → text extraction — the curation stage every real crawl
corpus needs before any quality/dedup/tokenize pass (the reference
sidesteps it by fetching Wikipedia ``prop=extracts`` plaintext,
reference: src/data_pipeline/utils/wikipedia_helpers.py:26-101 — a
real pipeline gets raw HTML). Deterministic RULE-BASED extraction in
the trafilatura/jusText spirit but fully oracle-replayable: excise
script/style/comments, turn block-level tags into newlines, strip the
remaining tags, decode the common entities, collapse whitespace.

Spark shape: ONE row-local ``regexp_replace``/``replace`` column
chain — JVM-side, whole-stage codegen, streamable, zero shuffle. At
100 TB the pass is scan-bound, exactly like :func:`pii_redact`.

Dual dialect (the PII_PATTERNS discipline): the ordered op chain in
:data:`HTML_TEXT_OPS` is the single source of truth; both the Spark
column (:func:`html_to_text`) and the DuckDB expression
(:func:`html_to_text_sql`) are generated from it, so the oracle
replays the EXACT rule. Every regex is RE2-compatible (no backrefs,
no lookaround, explicit ``[ \\t\\r\\n]`` classes — never ``\\s``,
whose definition differs between Java regex and RE2) and Spark
``F.replace`` / DuckDB ``replace`` share greedy-left non-overlapping
semantics for the literal entity swaps.

Rules (in order):

1. ``<script>…</script>`` / ``<style>…</style>`` excised wholesale
   (non-greedy, case-insensitive, dot-matches-newline).
2. HTML comments ``<!-- … -->`` excised.
3. Block-level tags (p, div, br, hr, h1-h6, li, ul, ol, table, tr,
   td, th, blockquote, pre, section, article, header, footer, nav,
   aside, form, figure, figcaption, main, dl, dt, dd) → newline, so
   block structure survives as line structure (q37's section splitter
   composes directly on the result).
4. Every remaining tag (``<letter…>`` / ``</letter…>`` / ``<!…>``)
   stripped. A bare ``<`` in prose (``a < b``) survives: the pattern
   requires a tag-opening character after ``<``.
5. Entity decode, literal swaps: ``&nbsp; &lt; &gt; &quot; &apos;
   &#39; &#34;`` then ``&amp;`` LAST (the standard order — decoding
   ``&amp;`` first would double-decode ``&amp;lt;``).
6. Whitespace collapse: space/tab/CR runs → one space, newline runs
   (with surrounding spaces) → one newline, leading/trailing
   space+newline trimmed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["HTML_TEXT_OPS", "html_to_text", "html_to_text_sql"]

_BLOCK_TAGS = (
    "p|div|br|hr|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|pre|"
    "section|article|header|footer|nav|aside|form|figure|figcaption|"
    "main|dl|dt|dd"
)

# (kind, pattern-or-literal, replacement), applied IN ORDER.
# kind "re" = regex replace (global), kind "lit" = literal replace.
HTML_TEXT_OPS: tuple[tuple[str, str, str], ...] = (
    ("re", r"(?is)<script\b.*?</script[^>]*>", ""),
    ("re", r"(?is)<style\b.*?</style[^>]*>", ""),
    ("re", r"(?s)<!--.*?-->", ""),
    ("re", r"(?i)</?(?:" + _BLOCK_TAGS + r")\b[^>]*>", "\n"),
    ("re", r"(?s)</?[A-Za-z][^>]*>", ""),
    ("re", r"(?s)<![^>]*>", ""),
    ("lit", "&nbsp;", " "),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&apos;", "'"),
    ("lit", "&#39;", "'"),
    ("lit", "&#34;", '"'),
    ("lit", "&amp;", "&"),
    ("re", r"[ \t\r]+", " "),
    ("re", r" ?\n(?:[ \n]*\n)? ?", "\n"),
    ("re", r"^[ \n]+", ""),
    ("re", r"[ \n]+$", ""),
)


def html_to_text(col: Column | str) -> Column:
    """Extracted plain text of an HTML column — the full rule chain as
    one row-local JVM expression."""
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat, repl in HTML_TEXT_OPS:
        if kind == "re":
            c = F.regexp_replace(c, pat, repl)
        else:
            c = F.replace(c, F.lit(pat), F.lit(repl))
    return c


def _sql_str(s: str) -> str:
    """DuckDB single-quoted literal with newline spelled via chr(10)
    so the generated SQL stays one readable line."""
    if s == "\n":
        return "chr(10)"
    quoted = "'" + s.replace("'", "''") + "'"
    if "\n" in s:  # pragma: no cover - no multi-char newline ops today
        parts = s.split("\n")
        quoted = " || chr(10) || ".join(
            "'" + p.replace("'", "''") + "'" for p in parts
        )
    return quoted


def html_to_text_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL expression over ``expr`` —
    generated from :data:`HTML_TEXT_OPS`, never hand-copied, so the
    oracle can NOT drift from the engine rule."""
    out = expr
    for kind, pat, repl in HTML_TEXT_OPS:
        if kind == "re":
            out = (
                f"regexp_replace({out}, {_sql_str(pat)}, "
                f"{_sql_str(repl)}, 'g')"
            )
        else:
            out = f"replace({out}, {_sql_str(pat)}, {_sql_str(repl)})"
    return out
