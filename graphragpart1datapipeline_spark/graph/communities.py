"""Graph algorithms: connected components, community detection,
per-community rollups.

Reference: Leiden via igraph/leidenalg at resolutions [2.0, 0.5, 0.1],
seed 42, on a driver-local graph (utils/neo4j_helpers.py:196-268;
~5.4k nodes / 123k edges — trivially driver-sized). There is no
distributed Leiden; the engine keeps the same contract:

- :func:`connected_components` — fully distributed (alternating
  large-star/small-star DataFrame iterations; scales to the edge table).
- :func:`detect_communities` — driver-local Leiden when igraph/leidenalg
  are importable, else a deterministic seeded label-propagation
  fallback (documented semantic difference). The membership comes back
  as a DataFrame regardless, so downstream rollups stay distributed.
- :func:`community_rollup` — the reference's per-community Python loop
  (detect_communities.py:294-333) collapsed into ONE groupBy + window
  plan (A9): member counts, top tags/genres/countries, representative
  artists.
"""

from __future__ import annotations

import random
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import top_n_frequency, top_n_per_group


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    shortcut: bool = True,
) -> DataFrame:
    """Distributed connected components: every node converges to the
    minimum node-id in its component. Returns (id, component).

    Each round = min-neighbor propagation + (with ``shortcut``) one
    pointer-jumping step: component := component(component). The jump
    halves pointer-chain depth every round, so convergence is
    O(log diameter) rounds instead of O(diameter) — the difference
    between 4 shuffles and 40 on a long-path graph (property-tested
    against a driver-side union-find). localCheckpoint per round keeps
    the plan flat; AQE coalesces as the frontier shrinks."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        if shortcut:
            # component := component(component)  (pointer jumping)
            parents = new_labels.select(
                F.col("id").alias("component"), F.col("component").alias("grand")
            )
            new_labels = new_labels.join(parents, "component", "left").select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("grand", F.col("component"))
                ).alias("component"),
            )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels


def _leiden_driver_local(
    edge_list: list[tuple[str, str]],
    resolution: float,
    seed: int,
) -> dict[str, int]:
    """Leiden via igraph/leidenalg when available (exact reference
    semantics, utils/neo4j_helpers.py:237-268)."""
    import igraph
    import leidenalg

    nodes = sorted({n for e in edge_list for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    g = igraph.Graph(
        n=len(nodes), edges=[(idx[a], idx[b]) for a, b in edge_list], directed=False
    )
    part = leidenalg.find_partition(
        g,
        leidenalg.RBConfigurationVertexPartition,
        resolution_parameter=resolution,
        seed=seed,
    )
    return {nodes[i]: part.membership[i] for i in range(len(nodes))}


def _label_prop_driver_local(
    edge_list: list[tuple[str, str]],
    resolution: float,
    seed: int,
    max_iter: int = 30,
) -> dict[str, int]:
    """Deterministic seeded label propagation fallback (igraph absent in
    this container). Higher resolution → smaller communities, emulated
    by damping label adoption for high-degree labels. Communities are
    renumbered by (size desc, min-member) for stable ids."""
    rng = random.Random(seed)
    adj: dict[str, list[str]] = defaultdict(list)
    for a, b in edge_list:
        adj[a].append(b)
        adj[b].append(a)
    nodes = sorted(adj)
    labels = {n: i for i, n in enumerate(nodes)}
    order = nodes[:]
    for _ in range(max_iter):
        rng.shuffle(order)
        changed = 0
        label_sizes: dict[int, int] = defaultdict(int)
        for lbl in labels.values():
            label_sizes[lbl] += 1
        cap = max(2, int(len(nodes) / max(resolution, 1e-6) ** 0.5 / 2)) if resolution > 0 else len(nodes)
        for n in order:
            counts: dict[int, int] = defaultdict(int)
            for m in adj[n]:
                counts[labels[m]] += 1
            if not counts:
                continue
            # deterministic argmax: count desc, label asc; respect cap
            best = min(
                (
                    (-c, lbl)
                    for lbl, c in counts.items()
                    if label_sizes[lbl] < cap or lbl == labels[n]
                ),
                default=None,
            )
            if best is None:
                continue
            new = best[1]
            if new != labels[n]:
                label_sizes[labels[n]] -= 1
                label_sizes[new] += 1
                labels[n] = new
                changed += 1
        if changed == 0:
            break
    # stable renumbering
    groups: dict[int, list[str]] = defaultdict(list)
    for n, lbl in labels.items():
        groups[lbl].append(n)
    ordered = sorted(groups.values(), key=lambda ms: (-len(ms), min(ms)))
    return {n: i for i, ms in enumerate(ordered) for n in ms}


def detect_communities(
    spark: SparkSession,
    edges: DataFrame,
    resolutions: tuple[float, ...] = (2.0, 0.5, 0.1),
    seed: int = 42,
    src: str = "src",
    dst: str = "dst",
    max_driver_edges: int = 5_000_000,
) -> DataFrame:
    """Multi-resolution community membership: (id, community_L0,
    community_L1, community_L2) matching the reference's three levels
    (fine 2.0 / medium 0.5 / coarse 0.1; settings.py:137).

    The edge list is collected to the driver (documented size bound —
    the reference graph is ~123k edges; raise/partition for bigger
    graphs or use :func:`connected_components` for the coarse level).
    """
    rows = (
        edges.select(F.col(src).cast("string"), F.col(dst).cast("string"))
        .distinct()
        .limit(max_driver_edges + 1)
        .collect()
    )
    if len(rows) > max_driver_edges:
        raise ValueError(
            f"graph exceeds driver-local bound ({max_driver_edges} edges); "
            "pre-aggregate or use connected_components"
        )
    edge_list = [(r[0], r[1]) for r in rows]
    try:
        detector = _leiden_driver_local
        detector(edge_list[:1] or [("a", "b")], 1.0, seed)  # import probe
    except ImportError:
        detector = _label_prop_driver_local
    memberships = [detector(edge_list, res, seed) for res in resolutions]
    nodes = sorted({n for e in edge_list for n in e})
    data = [
        (n, *[int(m.get(n, -1)) for m in memberships])
        for n in nodes
    ]
    cols = ["id"] + [f"community_L{i}" for i in range(len(resolutions))]
    return spark.createDataFrame(data, cols)


def community_rollup(
    members: DataFrame,
    community_col: str = "community",
    id_col: str = "id",
    tags_col: str = "tags",
    genres_col: str = "genres",
    country_col: str = "country",
    similar_col: str = "similar_artists",
    name_col: str = "name",
) -> DataFrame:
    """Per-community metadata in one distributed plan (reference loops
    per community in Python, detect_communities.py:294-333):
    member_count, member_ids, top-10 tags, top-5 genres, top-3
    countries, top-5 representative artists by connectivity."""
    base = members.groupBy(community_col).agg(
        F.count(F.lit(1)).alias("member_count"),
        F.sort_array(F.collect_list(id_col)).alias("member_ids"),
    )
    top_tags = top_n_frequency(
        members.select(
            community_col, F.explode(F.coalesce(tags_col, F.array())).alias("t")
        ),
        [community_col],
        "t",
        10,
        out_col="top_tags",
    )
    top_genres = top_n_frequency(
        members.select(
            community_col, F.explode(F.coalesce(genres_col, F.array())).alias("g")
        ),
        [community_col],
        "g",
        5,
        out_col="top_genres",
    )
    top_countries = top_n_frequency(
        members.filter(F.col(country_col).isNotNull()).select(
            community_col, F.col(country_col).alias("c")
        ),
        [community_col],
        "c",
        3,
        out_col="top_countries",
    )
    reps = (
        top_n_per_group(
            members.withColumn(
                "__conn", F.size(F.coalesce(similar_col, F.array()))
            ),
            [community_col],
            [F.desc("__conn"), F.asc(name_col)],
            5,
            rank_col="__rk",
        )
        .groupBy(community_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__rk", name_col))),
                lambda s: s.getField(name_col),
            ).alias("representative_artists")
        )
    )
    return (
        base.join(top_tags, community_col, "left")
        .join(top_genres, community_col, "left")
        .join(top_countries, community_col, "left")
        .join(reps, community_col, "left")
    )


def community_name(countries: "F.Column", genres: "F.Column") -> "F.Column":
    """Human-readable community name T10 (reference
    generate_community_summaries.py:28-49): ``"{top_country} {top_genre}"``
    with 'Electronic' as the genre fallback; a missing country simply
    drops out (concat_ws skips nulls)."""
    return F.concat_ws(
        " ",
        F.get(countries, 0),
        F.coalesce(F.get(genres, 0), F.lit("Electronic")),
    )


def community_size_stats(assignments: DataFrame, community_col: str) -> DataFrame:
    """Community count + size distribution (reference
    utils/neo4j_helpers.py:271-290)."""
    sizes = assignments.groupBy(community_col).agg(F.count(F.lit(1)).alias("size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.max("size").alias("largest"),
        F.min("size").alias("smallest"),
        F.avg("size").alias("mean_size"),
    )
