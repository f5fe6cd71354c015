"""Token-aware recursive text splitter — the engine's chunking operator.

Reference: data_transformation_helpers.py:161-183 — HF tokenizer +
RecursiveCharacterTextSplitter, chunk 2048 tokens / 512 overlap,
separators ["\\n\\n", "\\n", ". ", "? ", "! ", " ", ""].

The tokenizer is pluggable (reference couples to the Nomic HF tokenizer;
that lib is not in this container). Default is a deterministic
whitespace+punctuation tokenizer so chunking goldens are reproducible.
Runs as ``mapInPandas`` (1 row → N chunk rows) with the tokenizer
constructed once per Python worker, mirroring the reference's
per-process model load.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_SEPARATORS = ["\n\n", "\n", ". ", "? ", "! ", " ", ""]
# BPE-ish approximation: words, numbers, or single non-space symbols.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def default_token_len(text: str) -> int:
    return len(_TOKEN_RE.findall(text))


def _split_with_sep(text: str, sep: str) -> list[str]:
    """Split keeping the separator attached to the preceding piece."""
    if sep == "":
        return list(text)
    parts = text.split(sep)
    return [p + sep for p in parts[:-1]] + ([parts[-1]] if parts[-1] else [])


def recursive_split(
    text: str,
    chunk_tokens: int = 2048,
    overlap_tokens: int = 512,
    separators: list[str] | None = None,
    token_len: Callable[[str], int] = default_token_len,
) -> list[str]:
    """Pure-Python core: recursively split on the coarsest separator that
    yields pieces under the budget, then greedily merge pieces into
    chunks of ≤ chunk_tokens with ~overlap_tokens carried between
    consecutive chunks."""
    seps = separators if separators is not None else DEFAULT_SEPARATORS

    def split_rec(t: str, sep_idx: int) -> list[str]:
        if token_len(t) <= chunk_tokens or sep_idx >= len(seps):
            return [t]
        pieces = _split_with_sep(t, seps[sep_idx])
        if len(pieces) <= 1:
            return split_rec(t, sep_idx + 1)
        out: list[str] = []
        for p in pieces:
            if token_len(p) > chunk_tokens:
                out.extend(split_rec(p, sep_idx + 1))
            else:
                out.append(p)
        return out

    pieces = split_rec(text, 0)
    chunks: list[str] = []
    cur: list[str] = []
    cur_tok = 0
    for piece in pieces:
        pt = token_len(piece)
        if cur and cur_tok + pt > chunk_tokens:
            chunks.append("".join(cur).strip())
            # carry overlap: keep trailing pieces up to overlap_tokens
            keep: list[str] = []
            kept = 0
            for q in reversed(cur):
                qt = token_len(q)
                if kept + qt > overlap_tokens:
                    break
                keep.append(q)
                kept += qt
            cur = list(reversed(keep))
            cur_tok = kept
        cur.append(piece)
        cur_tok += pt
    if cur:
        tail = "".join(cur).strip()
        if tail:
            chunks.append(tail)
    return [c for c in chunks if c]


def recursive_split_chunks(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    chunk_tokens: int = 2048,
    overlap_tokens: int = 512,
    token_len: Callable[[str], int] = default_token_len,
) -> DataFrame:
    """1 document row → N chunk rows with reference bookkeeping
    (extract_artists_articles.py:195-217): ``chunk_id = "{id}_chunk_{i}"``,
    1-based ``chunk_index``, ``total_chunks``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, text in zip(pdf[id_col], pdf[text_col]):
                chunks = recursive_split(
                    text or "", chunk_tokens, overlap_tokens, token_len=token_len
                )
                total = len(chunks)
                for i, chunk in enumerate(chunks, start=1):
                    rows.append((f"{ident}_chunk_{i}", ident, chunk, i, total))
            yield pd.DataFrame(
                rows,
                columns=["chunk_id", id_col, "chunk", "chunk_index", "total_chunks"],
            )

    return df.select(id_col, text_col).mapInPandas(
        gen,
        schema=(
            f"chunk_id string, {id_col} string, chunk string, "
            "chunk_index long, total_chunks long"
        ),
    )


def stitch_context(
    chunks: DataFrame,
    hits: DataFrame,
    overlap_tokens: int = 0,
    context: int = 1,
    id_col: str = "doc_id",
    idx_col: str = "chunk_index",
    text_col: str = "chunk",
) -> DataFrame:
    """RAG-serving context expansion — the read-side inverse of
    chunking: for every retrieved (doc, chunk_index) hit, stitch the
    hit chunk together with its ±``context`` neighbors into ONE
    contiguous passage, dropping the ``overlap_tokens`` duplicated at
    each chunk boundary.

    EXACT-RECONSTRUCTION CONTRACT: the trim tokenizes on single
    spaces, which matches :func:`fixed_stride_chunks` output exactly
    (space-joined whitespace tokens), so the stitched passage IS the
    document's contiguous token span covering the window
    (unit-locked). Output of the separator-preserving
    :func:`recursive_split_chunks` does NOT satisfy that (newlines
    survive, punctuation counts as tokens) — stitch those with
    ``overlap_tokens=0`` and accept duplicated boundary text, or
    re-chunk fixed-stride for serving.

    Returns (id, chunk_index, n_chunks, ctx_start, ctx_end, stitched)
    — exactly one row per DISTINCT hit (duplicates collapse rather
    than garbling the passage). Hits at document edges clip
    (n_chunks < 2·context+1); stale hits whose whole window is absent
    from the chunks table survive with n_chunks=0 and an empty
    passage — a visible miss, not a dropped row. A gap MID-window
    (predecessor slot missing from the chunks table) suppresses the
    overlap trim for the chunk after the gap — no tokens were
    duplicated across a gap, so trimming there would delete real text.

    Scale shape: hits explode ×(2c+1) → ONE left equi-join onto the
    chunks table on (id, index) — at rest the chunks table is
    partitioned/bucketed by id, so the probe is co-located — then one
    groupBy per hit with a row-local sorted-struct stitch (each chunk
    split ONCE, then array slice/join in codegen). Never reads the
    original documents."""
    from pyspark.sql import functions as F

    if context < 0 or overlap_tokens < 0:
        raise ValueError("context and overlap_tokens must be >= 0")
    want = (
        hits.select(F.col(id_col), F.col(idx_col).alias("__hit"))
        .distinct()
        .withColumn(
            "__nidx",
            F.explode(
                F.sequence(
                    F.col("__hit") - context, F.col("__hit") + context
                )
            ),
        )
    )
    joined = want.join(
        chunks.select(
            F.col(id_col),
            F.col(idx_col).alias("__nidx"),
            F.col(text_col).alias("__txt"),
        ),
        [id_col, "__nidx"],
        "left",
    )
    # null-valued when() entries are SKIPPED by collect_list, so
    # unmatched window slots vanish here while the hit row survives
    arr = F.array_sort(
        F.collect_list(
            F.when(
                F.col("__txt").isNotNull(),
                F.struct(
                    F.col("__nidx").alias("i"),
                    F.split(F.col("__txt"), " ").alias("toks"),
                ),
            )
        )
    )
    # first window chunk keeps all tokens; a later one drops the
    # overlap it shares with its predecessor ONLY when that predecessor
    # slot is present AND contiguous (element i-1 carries index s.i-1).
    # Across a gap nothing was duplicated, so trimming there would
    # silently delete tokens never emitted twice — the chunk stays
    # whole (exact-reconstruction contract under partial chunk tables).
    trimmed = lambda s: F.when(  # noqa: E731
        F.size(s["toks"]) > overlap_tokens,
        F.concat_ws(
            " ",
            F.slice(
                s["toks"],
                overlap_tokens + 1,
                F.size(s["toks"]) - overlap_tokens,
            ),
        ),
    ).otherwise(F.lit(""))
    texts = F.transform(
        arr,
        lambda s, i: F.when(
            i == 0, F.concat_ws(" ", s["toks"])
        ).otherwise(
            F.when(
                F.element_at(arr, i)["i"] == s["i"] - 1,
                trimmed(s),
            ).otherwise(F.concat_ws(" ", s["toks"]))
        ),
    )
    return (
        joined.groupBy(id_col, "__hit")
        .agg(
            F.count(F.col("__txt")).alias("n_chunks"),
            F.min(F.when(F.col("__txt").isNotNull(), F.col("__nidx"))).alias(
                "ctx_start"
            ),
            F.max(F.when(F.col("__txt").isNotNull(), F.col("__nidx"))).alias(
                "ctx_end"
            ),
            F.array_join(
                F.filter(texts, lambda x: x != F.lit("")), " "
            ).alias("stitched"),
        )
        .select(
            id_col,
            F.col("__hit").alias(idx_col),
            "n_chunks",
            "ctx_start",
            "ctx_end",
            "stitched",
        )
    )


def fixed_stride_chunks(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap_tokens: int = 128,
):
    """Fixed-stride token windows — the fully-JVM chunking scale path.

    The recursive splitter (above) respects separator structure but runs
    as mapInPandas; this variant trades boundary awareness for a pure
    higher-order-function plan: whitespace tokens, chunk j covers
    [j·stride, j·stride + chunk_tokens) with stride = chunk_tokens −
    overlap_tokens, total = 1 + ceil((n − chunk)/stride) — map-only,
    whole-stage-codegen, engine-reproducible (integer arithmetic and
    space re-joining only, so a SQL oracle can value-check every chunk;
    q89). Same bookkeeping columns as recursive_split_chunks.
    """
    from pyspark.sql import functions as F

    stride = chunk_tokens - overlap_tokens
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    total = F.when(
        n <= chunk_tokens, F.lit(1).cast("long")
    ).otherwise(
        (F.floor((n - chunk_tokens + (stride - 1)) / stride) + 1).cast("long")
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), total.cast("int") - 1),
            lambda j: F.struct(
                (j + 1).cast("long").alias("chunk_index"),
                F.concat_ws(
                    " ", F.slice(toks, j * stride + 1, chunk_tokens)
                ).alias("chunk"),
                F.size(F.slice(toks, j * stride + 1, chunk_tokens))
                .cast("long")
                .alias("n_tokens"),
            ),
        )
    )
    return df.select(
        F.col(id_col), total.alias("total_chunks"), chunk.alias("c")
    ).select(
        F.concat(
            F.col(id_col).cast("string"), F.lit("_chunk_"),
            F.col("c.chunk_index").cast("string"),
        ).alias("chunk_id"),
        id_col,
        F.col("c.chunk").alias("chunk"),
        F.col("c.chunk_index").alias("chunk_index"),
        "total_chunks",
        F.col("c.n_tokens").alias("n_tokens"),
    )
