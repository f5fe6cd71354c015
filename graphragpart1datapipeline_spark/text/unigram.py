"""Unigram-LM (SentencePiece) tokenizer TRAINING — the BPE twin for
the Llama/T5 lineage (Kudo 2018: seed a large candidate vocabulary,
EM-estimate piece probabilities, prune, repeat). Round-9 verdict
task 8.

Same two-tier scale shape as BPE (text/bpe.py): the corpus-sized work
is ONE word-count shuffle; every training round then runs on the WORD
TABLE (vocabulary-sized — millions of rows at 100 TB, not trillions)
with bounded joins. All arithmetic is the exact-integer discipline:
piece log-probs are ``floor(ln(cnt/total)·1e6 + 0.5)`` scaled longs
(ln taken ONCE per piece per round — the q230 rule), Viterbi path
scores are exact long sums, and every argmax/tiebreak compares exact
integers — so whole training runs replay value-for-value in SQL
(q260).

Documented variant, stated loudly (the BPE replace-variant rule):

* HARD-EM (Viterbi counts), not full forward-backward expected
  counts — the recognized "hard" variant; the E-step counts pieces
  on each word's single BEST segmentation.
* Viterbi tiebreak: equal path scores prefer the SMALLEST
  predecessor position (= the longest final piece), which makes the
  best segmentation — and therefore the counts — a total
  deterministic function of the model.
* Pruning keeps the top ``keep_multi`` multi-char pieces by
  (count desc, piece asc) and ALWAYS keeps every single character
  (floored at count 1) so segmentability is never lost — Kudo's
  character-coverage guarantee in its simplest exact form.
* Seeding: top ``seed_multi`` substrings (length ≤ ``max_piece_len``)
  by occurrence-weighted frequency — SentencePiece seeds from
  frequent substrings the same way (it uses a suffix array; the
  bounded-length explode is the DataFrame form).

The position-unrolled DP bounds ``max_word_len``: a longer word
RAISES loudly (the dhash grid rule — silently dropping it would
silently bias counts). Real corpora pre-split rare mega-tokens
upstream (SentencePiece's ``--max_sentence_length`` analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import tokens
from .lm import PROB_SCALE

__all__ = [
    "unigram_words",
    "unigram_seed",
    "unigram_viterbi_counts",
    "unigram_encode_words",
    "unigram_train",
]


def unigram_words(
    df: DataFrame,
    text_col: str = "text",
    max_word_len: int = 12,
) -> DataFrame:
    """(w, wc): distinct lower-cased words with corpus counts — the
    one corpus-sized pass. A word longer than ``max_word_len`` raises
    loudly (wc is routed through the check so it cannot be optimized
    away)."""
    words = (
        df.select(
            F.explode(
                F.transform(tokens(text_col), lambda t: F.lower(t))
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__wc"))
    )
    guard = F.when(
        F.length("w") <= max_word_len, F.col("__wc")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"unigram_words: word longer than "
                    f"max_word_len={max_word_len}: '"
                ),
                F.col("w"),
                F.lit("' — pre-split mega-tokens upstream"),
            )
        ).cast("long")
    )
    return words.select("w", guard.alias("wc"))


def _candidates(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(w, wc, j, i, piece): every substring occurrence of length ≤
    ``max_piece_len`` with its 0-based [j, i) span — row-local explode,
    ≤ len·max_piece_len rows per word."""
    spans = F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda s: F.transform(
                    F.sequence(F.lit(1), F.lit(max_piece_len)),
                    lambda l: F.struct(
                        (s - 1).cast("long").alias("j"),
                        (s - 1 + l).cast("long").alias("i"),
                    ),
                ),
            )
        ),
        lambda sp: sp["i"] <= F.length("w"),
    )
    return (
        words.select("w", "wc", F.explode(spans).alias("sp"))
        .select(
            "w",
            "wc",
            F.col("sp.j").alias("j"),
            F.col("sp.i").alias("i"),
            F.expr(
                "substring(w, cast(sp.j + 1 as int), cast(sp.i - sp.j as int))"
            ).alias("piece"),
        )
    )


def _with_ll(kept: DataFrame) -> DataFrame:
    """(piece, cnt) → (piece, cnt, ll): one global total (vocab-sized
    agg), each piece's ln taken once and half-up rounded to micro-nat
    longs."""
    tot = kept.agg(F.sum("cnt").alias("t"))
    return kept.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.floor(
            F.log(F.col("cnt").cast("double") / F.col("t").cast("double"))
            * F.lit(float(PROB_SCALE))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ll"),
    )


def unigram_seed(
    words: DataFrame,
    max_piece_len: int = 4,
    seed_multi: int = 64,
) -> DataFrame:
    """Seed vocabulary: ALL single characters plus the top
    ``seed_multi`` longer substrings by occurrence-weighted frequency
    (ties by piece asc — deterministic). Returns (piece, cnt, ll)."""
    sub = (
        _candidates(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("wc").alias("cnt"))
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("cnt"), F.asc("piece"))
    )
    multi = (
        sub.filter(F.length("piece") > 1)
        .withColumn("__rk", rk)
        .filter(F.col("__rk") <= seed_multi)
        .drop("__rk")
    )
    chars = sub.filter(F.length("piece") == 1)
    return _with_ll(chars.unionByName(multi))


def _viterbi_hops(
    words: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 12,
) -> DataFrame:
    """The shared Viterbi core (E-step counting AND encode ride on
    it): segment every word under ``pieces`` (piece, ll) and return
    one row per path piece — (w, wc, hop, piece), ``hop`` the 0-based
    backtrace step counted from the word END (hop 0 = the LAST
    piece). Table-form DP, positions unrolled (the k-core fixed-round
    shape, replayable in SQL):

    edges (w, j, i, ll) = substring spans joined to the piece table
    (inner — spans not in the vocab simply don't exist; single chars
    are always in the vocab, so every position stays reachable);
    best(w, i) built position-by-position (edges only point forward);
    backptr = smallest predecessor among exact-score ties (longest
    final piece); backtrace unrolled ``max_word_len`` steps."""
    cand = _candidates(words, max_piece_len)
    edges = cand.join(
        F.broadcast(pieces.select("piece", "ll")), "piece"
    ).select("w", "j", "i", "ll").localCheckpoint(eager=False)
    # DP by position. Each settled layer is eagerly checkpointed: a
    # layer feeds BOTH later layers' joins and the final union, and
    # un-checkpointed that double reference re-expands the lineage
    # per step — the exponential-plan trap every iterative op in this
    # repo avoids the same way (graph/communities.py round rule).
    # Layers are vocab-sized; the jobs are trivial.
    layer0 = words.select(
        "w", F.lit(0).cast("long").alias("i"),
        F.lit(0).cast("long").alias("best"),
    ).localCheckpoint(eager=False)
    layers = [layer0]
    for i in range(1, max_word_len + 1):
        lo = max(0, i - max_piece_len)
        prev = layers[lo]
        for p in layers[lo + 1 : i]:
            prev = prev.unionByName(p)
        step = (
            edges.filter(F.col("i") == i)
            .join(
                prev.select(F.col("w"), F.col("i").alias("j"), "best"),
                ["w", "j"],
            )
            .groupBy("w")
            .agg(F.max(F.col("best") + F.col("ll")).alias("best"))
            .select("w", F.lit(i).cast("long").alias("i"), "best")
            .localCheckpoint(eager=False)
        )
        layers.append(step)
    acc = layers[0]
    for p in layers[1:]:
        acc = acc.unionByName(p)
    # backpointers: smallest j among exact-score maximizers
    sc = edges.join(
        acc.select(F.col("w"), F.col("i").alias("j"), F.col("best").alias("bj")),
        ["w", "j"],
    ).select("w", "i", "j", (F.col("bj") + F.col("ll")).alias("score"))
    choose = (
        sc.join(
            acc.select("w", "i", F.col("best").alias("bi")),
            ["w", "i"],
        )
        .filter(F.col("score") == F.col("bi"))
        .groupBy("w", "i")
        .agg(F.min("j").alias("j"))
        .localCheckpoint(eager=False)
    )
    # backtrace, unrolled: pos walks len(w) -> 0 emitting pieces; each
    # hop is checkpointed for the same double-reference reason
    pos = words.select("w", "wc", F.length("w").cast("long").alias("pos"))
    segs = []
    for t in range(max_word_len):
        hop = (
            pos.filter(F.col("pos") > 0)
            .join(
                choose.select(
                    F.col("w"), F.col("i").alias("pos"), F.col("j")
                ),
                ["w", "pos"],
            )
            .localCheckpoint(eager=False)
        )
        segs.append(
            hop.select(
                "w",
                "wc",
                F.lit(t).cast("long").alias("hop"),
                F.expr(
                    "substring(w, cast(j + 1 as int), cast(pos - j as int))"
                ).alias("piece"),
            )
        )
        pos = hop.select("w", "wc", F.col("j").alias("pos"))
    out = segs[0]
    for s in segs[1:]:
        out = out.unionByName(s)
    return out


def unigram_viterbi_counts(
    words: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 12,
) -> DataFrame:
    """E-step: hard counts (piece, cnt = Σ wc over Viterbi path uses,
    with multiplicity) — one groupBy over :func:`_viterbi_hops`."""
    hops = _viterbi_hops(words, pieces, max_piece_len, max_word_len)
    return hops.groupBy("piece").agg(F.sum("wc").alias("cnt"))


def unigram_encode_words(
    words: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 12,
) -> DataFrame:
    """ENCODE (the tokenizer apply — SentencePiece's runtime twin of
    training's E-step): Viterbi-segment every distinct word under a
    TRAINED (piece, ll) vocabulary and return (w, n_pieces, encoded)
    — ``encoded`` the space-joined piece sequence in word order
    (hop runs from the END, so order = hop descending; hops are
    unique per word, making the sort total). The same DP/tiebreak as
    training, so encode(w) is exactly the segmentation the counts
    were estimated on. Two-tier scale shape: the DP runs on the
    DISTINCT-word table (vocab-sized); applying to a corpus is then
    a broadcast join of (w → encoded) onto the token stream — the
    corpus never shuffles (q263)."""
    # the true longest word bounds the useful layers (train's clamp)
    row = words.agg(F.max(F.length("w")).alias("m")).head()
    max_word_len = min(max_word_len, int(row["m"] or 0) or 1)
    hops = _viterbi_hops(words, pieces, max_piece_len, max_word_len)
    ordered = F.reverse(
        F.array_sort(
            F.collect_list(F.struct(F.col("hop"), F.col("piece")))
        )
    )
    return hops.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_pieces"),
        F.array_join(
            F.transform(ordered, lambda s: s["piece"]), " "
        ).alias("encoded"),
    )


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    seed_multi: int = 64,
    keep_multi: int = 48,
) -> DataFrame:
    """Full unigram-LM training: seed → ``rounds`` × (Viterbi E-step →
    prune to top ``keep_multi`` multi-char pieces by (count desc,
    piece asc), chars always kept floored at count 1 → M-step
    re-estimate). Returns the final (piece, cnt, ll) table — ``cnt``
    is the last E-step's hard count (chars floored), ``ll`` the
    micro-nat log-prob. Each round localCheckpoints its vocab-sized
    tables, so plan depth stays bounded like the iterative graph
    ops."""
    if rounds < 1:
        raise ValueError(f"unigram_train: rounds must be >= 1, got {rounds}")
    words = unigram_words(df, text_col, max_word_len).localCheckpoint(
        eager=True
    )
    # one bounded scalar: the true longest word. Layers above it are
    # provably empty (no edges end there), so clamping skips their
    # checkpoint jobs without changing a single output row — the
    # oracle unrolls the full max_word_len and matches regardless.
    # (This also evaluates the too-long-word guard eagerly.)
    row = words.agg(F.max(F.length("w")).alias("m")).head()
    max_word_len = min(max_word_len, int(row["m"] or 0) or 1)
    chars = (
        _candidates(words, 1)
        .select("piece")
        .distinct()
        .localCheckpoint(eager=False)
    )
    pieces = unigram_seed(words, max_piece_len, seed_multi).localCheckpoint(
        eager=True
    )
    for _ in range(rounds):
        cnt = unigram_viterbi_counts(
            words, pieces, max_piece_len, max_word_len
        )
        rk = F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("piece"))
        )
        multi = (
            cnt.filter(F.length("piece") > 1)
            .withColumn("__rk", rk)
            .filter(F.col("__rk") <= keep_multi)
            .drop("__rk")
        )
        kept_chars = chars.join(cnt, "piece", "left").select(
            "piece",
            F.greatest(F.coalesce("cnt", F.lit(0)), F.lit(1)).alias("cnt"),
        )
        pieces = _with_ll(kept_chars.unionByName(multi)).localCheckpoint(
            eager=True
        )
    return pieces
