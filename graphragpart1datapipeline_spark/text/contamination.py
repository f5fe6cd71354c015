"""Train/test contamination REPORTING — the per-document overlap
FRACTION audit (GPT-3 appendix C / Llama-style dataset reports): a
training document is contaminated when too large a share of its
distinct token n-grams also occur in an evaluation benchmark.

Complements (does not replace) :func:`..dedup.ngram.decontaminate`,
the ABSOLUTE-count flag ("shares ≥ m shingles with any benchmark
doc") used as the pretrain-demo pipeline's cleanup verb: the count
rule is the cheap gate, the fraction report is the auditable one —
it normalizes by document length, so a 10-token quote in a book
doesn't score like a wholesale eval-set copy. Both ride the same
broadcast-benchmark shape.

The reference pipeline curates a training corpus (clean_dataset.py)
but has no eval-set hygiene step; these close that gap.

Scale shape (benchmarks are tiny next to the corpus — that asymmetry
IS the design):

- the corpus side is map-only until one per-doc aggregation: tokenize,
  window into n-grams (transform over sequence — no explode before the
  hash), md5 each window;
- the benchmark side collapses to a DISTINCT n-gram hash set and is
  BROADCAST — the 100 TB corpus never shuffles against it;
- one groupBy(doc) computes (total, hit) counts → overlap fraction.
So cost is O(corpus tokens) map work + one doc-keyed shuffle,
identical to the passage-dedup profile (dedup/passages.py). For a
benchmark too large to broadcast, pre-filter with a bloom filter
(operators/sketches.py bloom_pruned_join) and keep the same shape.

Determinism / oracle parity: whitespace tokens, md5 window hashes,
counts are exact longs and the fraction one int/int double division —
DuckDB replays every stage (q226).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

__all__ = [
    "ngram_hash_set",
    "contamination_report",
    "decontaminate_by_fraction",
    "contamination_bloom",
    "contamination_stats_cols",
    "stream_decontaminate",
]


def _ngram_hashes(df: DataFrame, id_col: str, text_col: str, n: int):
    """(id, __ngh) — md5 of every space-joined n-token window,
    duplicates within a document KEPT (the per-doc distinct happens in
    the aggregation so the fraction is over distinct n-grams)."""
    toks = tokens(text_col)
    sz = F.size(toks)
    starts = F.when(sz >= n, F.sequence(F.lit(0), sz - n)).otherwise(
        F.slice(F.sequence(F.lit(0), F.lit(0)), 1, 0)
    )
    return df.select(
        F.col(id_col),
        F.explode_outer(
            F.transform(
                starts,
                lambda s: F.md5(F.concat_ws(" ", F.slice(toks, s + 1, n))),
            )
        ).alias("__ngh"),
    )


def ngram_hash_set(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """The benchmark's DISTINCT n-gram hash set (one column ``__ngh``)
    — build once per benchmark, broadcast into every contamination
    scan. Benchmarks are eval-set-sized; if one ever isn't, bloom-prune
    instead of broadcasting."""
    keyed = bench.select(F.col(text_col)).withColumn("__bid", F.lit(1))
    return (
        _ngram_hashes(keyed, "__bid", text_col, n)
        .filter(F.col("__ngh").isNotNull())
        .select("__ngh")
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench_ngrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-document contamination: (id, total_ngrams, hit_ngrams,
    overlap_frac, contaminated). ``total_ngrams``/``hit_ngrams`` count
    DISTINCT n-grams (a boilerplate line repeated inside one doc counts
    once); ``overlap_frac`` = hit/total (0.0 when the doc is shorter
    than ``n`` tokens — undetectable, not contaminated);
    ``contaminated`` = overlap_frac >= threshold.

    ``bench_ngrams`` is :func:`ngram_hash_set`'s output (or any
    one-column ``__ngh`` frame) — it is broadcast, so the corpus scan
    never shuffles against the benchmark."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(
            f"contamination_report: threshold must be in (0, 1], got {threshold}"
        )
    grams = _ngram_hashes(docs, id_col, text_col, n).dropDuplicates(
        [id_col, "__ngh"]
    )
    hit = F.col("__ngh").isNotNull() & F.col("__hit").isNotNull()
    marked = grams.join(
        F.broadcast(bench_ngrams.withColumn("__hit", F.lit(1))),
        "__ngh",
        "left",
    )
    agg = marked.groupBy(id_col).agg(
        F.count(F.col("__ngh")).alias("total_ngrams"),
        F.count(F.when(hit, 1)).alias("hit_ngrams"),
    )
    frac = F.when(
        F.col("total_ngrams") > 0,
        F.col("hit_ngrams").cast("double") / F.col("total_ngrams"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        id_col,
        "total_ngrams",
        "hit_ngrams",
        frac.alias("overlap_frac"),
        (frac >= threshold).alias("contaminated"),
    )


def decontaminate_by_fraction(
    docs: DataFrame,
    bench_ngrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    threshold: float = 0.1,
) -> DataFrame:
    """The training corpus with contaminated documents REMOVED — the
    report's filter applied as one anti-join-by-flag (docs columns
    pass through untouched). The length-normalized counterpart of
    :func:`..dedup.ngram.decontaminate`'s absolute-count rule."""
    bad = (
        contamination_report(
            docs, bench_ngrams, id_col, text_col, n, threshold
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return docs.join(bad, id_col, "left_anti")


def contamination_bloom(
    bench_ngrams: DataFrame,
    num_bits: int = 1 << 15,
    num_hashes: int = 5,
) -> list[int]:
    """The benchmark n-gram set folded into a dense Bloom literal
    (operators/sketches.py machinery) — the STREAM-shaped form of
    :func:`ngram_hash_set`: membership becomes a row-local codegen
    probe, so the gate needs no join, no state, and no shuffle.
    Sized like bloom_words: ~``num_bits/8`` bytes regardless of
    benchmark size."""
    from ..operators.sketches import bloom_dense, bloom_words

    return bloom_dense(
        bloom_words(bench_ngrams, "__ngh", num_bits, num_hashes), num_bits
    )


def contamination_stats_cols(
    text_col: str,
    dense: list[int],
    num_bits: int = 1 << 15,
    n: int = 8,
    num_hashes: int = 5,
):
    """(total_ngrams, hit_ngrams, overlap_frac) as ROW-LOCAL column
    expressions against the benchmark bloom — stateless, so the same
    expressions run unchanged on a batch frame and a streaming one.
    Bloom semantics: NO false negatives (every true benchmark n-gram
    hits), false positives possible — the gate built on these columns
    over-drops conservatively; :func:`contamination_report` is the
    exact audit."""
    from ..operators.sketches import bloom_contains

    toks = tokens(text_col)
    sz = F.size(toks)
    starts = F.when(sz >= n, F.sequence(F.lit(0), sz - n)).otherwise(
        F.slice(F.sequence(F.lit(0), F.lit(0)), 1, 0)
    )
    grams = F.array_distinct(
        F.transform(
            starts,
            lambda s: F.md5(F.concat_ws(" ", F.slice(toks, s + 1, n))),
        )
    )
    total = F.size(grams).cast("long")
    hits = F.size(
        F.filter(
            grams,
            lambda g: bloom_contains(g, dense, num_bits, num_hashes),
        )
    ).cast("long")
    frac = F.when(
        total > 0, hits.cast("double") / total
    ).otherwise(F.lit(0.0))
    return total, hits, frac


def stream_decontaminate(
    sdf: DataFrame,
    dense: list[int],
    text_col: str = "text",
    n: int = 8,
    threshold: float = 0.1,
    num_bits: int = 1 << 15,
    num_hashes: int = 5,
) -> DataFrame:
    """STREAMING decontamination gate: drop incoming documents whose
    distinct-n-gram bloom-hit fraction reaches ``threshold`` — the
    ingest-time filter in front of the training corpus. Entirely
    STATELESS (row-local columns, no watermark, no state store,
    append-mode-safe): the 100 TB property is that a firehose of
    crawled documents is gated at scan parallelism with the benchmark
    carried as a ~``num_bits/8``-byte plan literal.

    Conservative by construction: bloom false positives can only
    OVER-drop (a clean doc discarded), never leak a contaminated one
    past the gate. Emits ``total_ngrams`` / ``hit_ngrams`` /
    ``overlap_frac`` audit columns alongside the input columns. Works
    identically on a batch frame (stream == batch is exact — the
    expressions are row-local; q232 locks it)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(
            f"stream_decontaminate: threshold must be in (0, 1], "
            f"got {threshold}"
        )
    total, hits, frac = contamination_stats_cols(
        text_col, dense, num_bits, n, num_hashes
    )
    return (
        sdf.withColumn("total_ngrams", total)
        .withColumn("hit_ngrams", hits)
        .withColumn("overlap_frac", frac)
        .filter(F.col("overlap_frac") < threshold)
    )
