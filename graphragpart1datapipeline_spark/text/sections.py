"""Wikipedia-style section splitter — a 1→N UDTF-shaped operator.

Reference: utils/wikipedia_helpers.py:104-152 — regex-split on
``== Header ==`` markers, carry the current section name, stop at an
excluded header (References / External links / See also), drop segments
shorter than a minimum length.

Spark-first: ``mapInPandas`` so the explode happens inside an Arrow
batch (1 input row → N output rows) with no driver involvement and no
per-row Python overhead beyond the batch loop.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_EXCLUDED = ("references", "external links", "see also", "further reading")
DEFAULT_MIN_LEN = 30
_HEADER_RE = re.compile(r"^==+\s*(.*?)\s*==+\s*$", re.MULTILINE)


def parse_sections(
    text: str,
    excluded: tuple[str, ...] = DEFAULT_EXCLUDED,
    min_len: int = DEFAULT_MIN_LEN,
) -> list[tuple[str, str]]:
    """Pure-Python core (unit-testable): returns (section, content) pairs.
    The leading text before any header is section "Introduction"."""
    if not text:
        return []
    out: list[tuple[str, str]] = []
    pos = 0
    section = "Introduction"
    for m in _HEADER_RE.finditer(text):
        content = text[pos : m.start()].strip()
        if len(content) >= min_len:
            out.append((section, content))
        header = m.group(1)
        if header.lower() in excluded:
            return out
        section = header
        pos = m.end()
    content = text[pos:].strip()
    if len(content) >= min_len:
        out.append((section, content))
    return out


def split_sections(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    excluded: tuple[str, ...] = DEFAULT_EXCLUDED,
    min_len: int = DEFAULT_MIN_LEN,
) -> DataFrame:
    """1 article row → N (id, section, content) rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, text in zip(pdf[id_col], pdf[text_col]):
                for section, content in parse_sections(text, excluded, min_len):
                    rows.append((ident, section, content))
            yield pd.DataFrame(rows, columns=[id_col, "section", "content"])

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} string, section string, content string"
    )
