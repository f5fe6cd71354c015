"""HTTP redirect-chain resolution — the link-graph normalization a
crawl runs between fetching and frontier/dedup bookkeeping: a large
fraction of fetched URLs answer 3xx (Common Crawl measures ~a fifth),
and until ``A → B → C`` collapses to ``A ⇒ C`` the frontier counts
one page as three, the seen-set misses re-spellings, and per-domain
caps/budgets charge the wrong host.

Shape: POINTER DOUBLING (path halving), the standard log-round
technique this repo already uses for connected components — round k
composes the current mapping with itself (``m ∘ m``), so a chain of
length ≤ 2^k resolves in k rounds: ``rounds = ceil(log2(max_hops))``
self-joins on the redirect mapping (edge-table sized — the mapping
never grows past one row per redirecting URL), each round
localCheckpoint'd (the iterative-op lineage rule). Compare with
following one hop per round: 30-hop chains cost 5 rounds, not 30.

Everything is keyed on CANONICAL urls (text/urls.py) — the redirect
target's spelling never splits a chain. A URL with no outgoing
redirect is terminal. Redirect LOOPS (``x → y → x``) never terminate;
after the rounds a source whose resolved target STILL redirects is
flagged ``looped`` (hop budget exhausted — either a true cycle or a
chain longer than ``max_hops``; both are fetch-abandon cases per
every crawler's policy, browsers cap around 20). Multiple outgoing
redirects for one source (re-fetch disagreement) raise loudly — a
nondeterministic mapping would resolve different runs differently.

Every stage (canonicalize, k unrolled self-joins with hop addition,
the terminal probe) has an exact DuckDB twin, so resolution replays
bit-for-bit (q270).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import canonical_url

__all__ = ["resolve_redirects"]


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve every redirecting URL to its final target:
    (src, final, hops, looped) — ``src``/``final`` canonical;
    ``hops`` the chain length actually followed; ``looped`` true when
    the hop budget ran out with the target still redirecting (cycle
    or over-long chain). ceil(log2(max_hops)) self-joins."""
    if max_hops < 1:
        raise ValueError(
            f"resolve_redirects: max_hops must be >= 1, got {max_hops}"
        )
    m = (
        edges.select(
            canonical_url(src_col).alias("src"),
            canonical_url(dst_col).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dup = (
        m.groupBy("src")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"resolve_redirects: source {dup[0]['src']!r} has multiple "
            "redirect targets — resolve the fetch disagreement upstream"
        )
    cur = m.select("src", "dst", F.lit(1).cast("long").alias("hops"))
    rounds = max(1, (max_hops - 1).bit_length())
    for _ in range(rounds):
        nxt = cur.select(
            F.col("src").alias("__s"),
            F.col("dst").alias("__d"),
            F.col("hops").alias("__h"),
        )
        cur = (
            cur.join(nxt, cur["dst"] == nxt["__s"], "left")
            .select(
                "src",
                F.coalesce("__d", "dst").alias("dst"),
                (
                    F.col("hops")
                    + F.coalesce("__h", F.lit(0))
                ).cast("long").alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    # looped = the resolved target still has an outgoing redirect
    # (hop budget exhausted): probe via a left join on the mapping
    probe = m.select(F.col("src").alias("__t")).distinct()
    out = cur.join(probe, cur["dst"] == probe["__t"], "left").select(
        "src",
        F.col("dst").alias("final"),
        "hops",
        F.col("__t").isNotNull().alias("looped"),
    )
    return out
