"""SQ8 scalar quantization — the first rung of the engine's vector
compression ladder (SQ8 4× → PQ 48–192× (vector/pq.py) → residual
IVFPQ): each dimension quantizes independently to one byte against
per-dimension [min, max] corpus stats, keeping per-dimension fidelity
PQ gives up. This is the standard "SQ8" option of production vector
stores (FAISS ScalarQuantizer, Milvus/Qdrant int8).

Spark shape:

- **stats**: one corpus pass → per-dimension exact min/max
  (posexplode + groupBy(dim), map-side combined — the shuffle is
  dim-width, never corpus-width), collected as two dim-length arrays
  (serving state, plan-literal sized).
- **encode**: row-local ``floor((x − mn)·255/span + 0.5)`` clamped to
  [0, 255] — map-only, zero shuffle, int codes at 1 byte of
  information per dimension.
- **search**: dequantize row-locally (``mn + code·span/255``) and
  score with the fixed-parenthesization squared-L2 — one scan of the
  CODES column (4× less IO than the float column), no shuffle before
  the top-k.

Determinism / oracle parity (q237): min/max are exact (no float
accumulation), encode/dequant are fixed-op-order double arithmetic,
clamping is LEAST/GREATEST in both engines — every stage replays
bit-identically in SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .pq import l2sq_expr

__all__ = ["sq8_stats", "sq8_encode", "sq8_dequant_expr", "sq8_topk"]


def sq8_stats(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension exact (min, max) over the corpus, as two
    dim-length driver-side lists (the quantizer state — persist them
    next to the codes the way pq_build_index persists its codebook).
    One scan; the shuffle carries dim rows per partition."""
    rows = (
        df.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "d", "x"
            )
        )
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("d")
        .collect()
    )
    if not rows:
        raise ValueError("sq8_stats: empty corpus")
    return [r["mn"] for r in rows], [r["mx"] for r in rows]


def _lit_arr(xs: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def sq8_encode(
    df: DataFrame,
    mins: Sequence[float],
    maxs: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "codes",
) -> DataFrame:
    """(id, codes array<int>) — each component quantized to [0, 255]
    against the per-dimension stats: ``floor((x − mn)·255/span + 0.5)``
    clamped (a constant dimension — span 0 — codes to 0). Row-local,
    map-only; out-of-range values (an increment drifting past the
    build-time stats) clamp to the edge rather than wrapping."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    v = F.col(vec_col).cast("array<double>")
    codes = F.transform(
        v,
        lambda x, i: F.when(
            F.element_at(mx, i + 1) - F.element_at(mn, i + 1) == 0.0,
            F.lit(0),
        )
        .otherwise(
            # clamp on the LONG floor() returns BEFORE any int cast —
            # a non-ANSI long→int cast of an extreme out-of-range
            # value wraps silently and would clamp to the WRONG edge
            F.least(
                F.lit(255).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(
                        (x - F.element_at(mn, i + 1))
                        * 255.0
                        / (
                            F.element_at(mx, i + 1)
                            - F.element_at(mn, i + 1)
                        )
                        + 0.5
                    ),
                ),
            )
        )
        .cast("int"),
    )
    return df.select(F.col(id_col), codes.alias(out_col))


def sq8_dequant_expr(
    codes_col: Column | str,
    mins: Sequence[float],
    maxs: Sequence[float],
) -> Column:
    """Reconstruct the double array from codes:
    ``mn + (code · span) / 255`` per dimension — fixed op order, the
    exact values the oracle computes."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    c = (
        codes_col if isinstance(codes_col, Column) else F.col(codes_col)
    )
    return F.transform(
        c,
        lambda code, i: F.element_at(mn, i + 1)
        + (
            code.cast("double")
            * (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
        )
        / F.lit(255.0),
    )


def sq8_topk(
    codes: DataFrame,
    mins: Sequence[float],
    maxs: Sequence[float],
    query_vec: Sequence[float],
    k: int = 8,
    codes_col: str = "codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """Squared-L2 top-k over the QUANTIZED corpus: dequantize
    row-locally and score with the fixed-parenthesization l2sq — the
    scan reads the 1-byte codes, not the float column. Returns
    (id, adist) ordered (adist asc, id asc), k rows."""
    if k < 1:
        raise ValueError(f"sq8_topk: k must be >= 1, got {k}")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = codes.select(
        F.col(id_col),
        l2sq_expr(sq8_dequant_expr(codes_col, mins, maxs), q).alias(
            "adist"
        ),
    )
    return scored.orderBy(F.asc("adist"), F.asc(id_col)).limit(k)
