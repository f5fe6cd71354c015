"""Johnson–Lindenstrauss random projection — the dimensionality
reducer in front of ANN at 100 TB: project ``in_dim``-dim embeddings
onto ``out_dim`` signed sums (Achlioptas 2001 ±1 scheme) so the
downstream index (hyperplane LSH, IVF) stores and scans a fraction of
the bytes while inner products are preserved in expectation
(E[p_a·p_b] = out_dim · (a·b), variance O(1/out_dim)).

Determinism: the sign matrix s[i][j] ∈ {+1,-1} derives from the
parity of the 60-bit md5 prefix of ``"{seed}:{i}:{j}"`` — computed
driver-side ONCE into plan literals here, and replayed inside DuckDB
from the same md5 string in the oracle, so projected values are
bit-identical cross-engine (ordered fold, double arithmetic).

Scale shape: the projection is a pure per-row expression (zip_with +
ordered aggregate fold over plan-literal sign arrays) — whole-stage
codegen, ZERO shuffle, no UDF; out_dim·in_dim multiplies per row. The
sign matrix is out_dim × in_dim literals (~1k for 64→16), far below
broadcast thresholds — it ships inside the plan itself.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def projection_sign(seed: str, i: int, j: int) -> int:
    """±1 sign for input dim ``i`` → output dim ``j``: parity of the
    60-bit md5 prefix of ``"{seed}:{i}:{j}"`` (the repo-wide
    deterministic-hash convention; DuckDB replay:
    ``CAST('0x'||substring(md5(seed||':'||i||':'||j),1,15) AS
    UBIGINT) % 2``)."""
    h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def sign_matrix(seed: str, in_dim: int, out_dim: int) -> list[list[int]]:
    """out_dim rows of in_dim ±1 signs."""
    return [
        [projection_sign(seed, i, j) for i in range(in_dim)]
        for j in range(out_dim)
    ]


def project_expr(
    vec: Column, signs: list[list[int]]
) -> Column:
    """array<double> of len(signs) signed sums over ``vec`` — each an
    ORDERED aggregate fold (i ascending), matching DuckDB's
    list_dot_product element order so the doubles agree bitwise."""
    v = F.transform(vec, lambda x: x.cast("double"))
    outs = []
    for row in signs:
        s = F.array(*[F.lit(float(x)) for x in row])
        outs.append(
            F.aggregate(
                F.zip_with(v, s, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*outs)


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "jl",
) -> DataFrame:
    """Project every row's ``vec_col`` (length ``in_dim``) to an
    ``out_dim`` array<double> named ``proj``. Rows whose vector length
    differs from ``in_dim`` raise in-plan (a silently truncated
    zip_with would corrupt every downstream distance)."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(
            f"random_projection: dims must be >= 1, got {in_dim}->{out_dim}"
        )
    signs = sign_matrix(seed, in_dim, out_dim)
    guarded = F.when(
        F.size(F.col(vec_col)) == in_dim, F.col(vec_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"random_projection: expected dim {in_dim}, got "),
                F.size(F.col(vec_col)).cast("string"),
            )
        )
    )
    return df.select(
        F.col(id_col), project_expr(guarded, signs).alias("proj")
    )
