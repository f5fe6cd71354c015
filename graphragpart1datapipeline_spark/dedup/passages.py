"""Exact repeated-passage removal (substring-level dedup).

The dedup family so far works at document granularity (exact q20,
MinHash q24, SimHash q34, embedding q36/q53). Pretraining corpora also
need SUB-document dedup: boilerplate sentences, licence blocks and
syndicated paragraphs repeat across otherwise-distinct documents, and
verbatim passages repeated many times are exactly what an LM memorizes
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better" — their ExactSubstr step). The suffix-array construction used
there is single-machine; the distributed equivalent here is sliding
window-hash dedup: every ``window``-token window is hashed, a window
hash seen ``min_occurrences``+ times marks all its token positions
covered, covered tokens are dropped and the survivors rejoined.

Scale shape (the whole point):
- window hashing is map-only per document (transform over sequence on
  the token array — no explode until the window table, and that table
  is (doc, start, hash) — ~1 row per input token);
- ONE groupBy(hash) shuffle finds repeated hashes (map-side partial
  counts collapse the skew: the all-equal hash rows combine per
  partition first);
- the join back is hash-distributed (broadcast when the repeated set
  is small, which it is on clean corpora);
- coverage explodes ``window`` positions per REPEATED window only —
  duplicated text pays, unique text doesn't.
So cost is O(corpus tokens) map work + one shuffle of ~tokens rows —
linear, partition-parallel, no all-pairs anything. ``stride`` > 1
hashes every stride-th window only, cutting the shuffled rows by that
factor at the cost of missing repeats shorter than window+stride-1.

Determinism / oracle parity: tokens are whitespace-split (output text
is single-space re-normalized — document that to callers), hashes are
md5 over the space-joined window, so DuckDB reproduces every
intermediate and q85 value-checks the rebuilt text itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import tokens


def repeated_passage_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 12,
    min_occurrences: int = 2,
    stride: int = 1,
) -> DataFrame:
    """(id, start, window_hash) for every window whose hash occurs
    ``min_occurrences``+ times corpus-wide (counting every occurrence,
    including repeats inside one document). ``start`` is the 0-based
    token offset."""
    toks = tokens(text_col)
    n = F.size(toks)
    # sequence(0, n-window) is illegal when n < window: short docs get a
    # typed empty start array instead (slice of length 0).
    starts = F.when(n >= window, F.sequence(F.lit(0), n - window)).otherwise(
        F.slice(F.sequence(F.lit(0), F.lit(0)), 1, 0)
    )
    wins = (
        df.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    starts,
                    lambda s: F.struct(
                        s.alias("start"),
                        F.md5(
                            F.concat_ws(
                                " ", F.slice(toks, s + 1, window)
                            )
                        ).alias("window_hash"),
                    ),
                )
            ).alias("w"),
        )
        .select(id_col, "w.start", "w.window_hash")
        .filter((F.col("start") % stride) == 0)
    )
    repeated = (
        wins.groupBy("window_hash")
        .count()
        .filter(F.col("count") >= min_occurrences)
        .select("window_hash")
    )
    return wins.join(repeated, "window_hash").select(
        id_col, "start", "window_hash"
    )


def remove_repeated_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 12,
    min_occurrences: int = 2,
    stride: int = 1,
) -> DataFrame:
    """Drop every token covered by a repeated window and rebuild the
    text (single-space joined; fully-boilerplate documents come back as
    empty strings, not dropped rows). Output: id, ``text`` (rebuilt),
    ``n_tokens_removed``."""
    spans = repeated_passage_spans(
        df, id_col, text_col, window, min_occurrences, stride
    )
    covered = (
        spans.select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (window - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("__cov"))
    )
    toks = tokens(text_col)
    kept = F.filter(
        toks,
        lambda x, i: ~F.coalesce(
            F.array_contains(F.col("__cov"), i), F.lit(False)
        ),
    )
    return (
        df.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            F.concat_ws(" ", kept).alias(text_col),
            F.coalesce(F.size("__cov"), F.lit(0)).cast("long").alias(
                "n_tokens_removed"
            ),
        )
    )
