"""Graph build/communities, streaming windows, sources, multimodal,
and pipeline-runner tests."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from graphragpart1datapipeline_spark.graph import (
    community_rollup,
    community_size_stats,
    connected_components,
    detect_communities,
)
from graphragpart1datapipeline_spark.graph.build import (
    build_graph_tables,
    validate_edges,
)
from graphragpart1datapipeline_spark.multimodal import (
    decode_image_features,
    fake_decode_stats,
    frame_sample_plan,
)
from graphragpart1datapipeline_spark.operators import multi_hop
from graphragpart1datapipeline_spark.plans import Pipeline
from graphragpart1datapipeline_spark.sources import (
    fetch_with_cache,
    write_jsonl_sparse,
)
from graphragpart1datapipeline_spark.streaming import (
    session_windows,
    tumbling_window_agg,
)


def _entity_frames(spark):
    artists = spark.createDataFrame(
        [
            ("Q1", "Kraftwerk", "m1", "Germany", ["KW"], ["G1"], ["electro"], ["Neu!"]),
            ("Q2", "Neu!", "m2", "Germany", None, ["G1", "G2"], None, ["Kraftwerk"]),
            ("Q3", "Aphex Twin", "m3", "UK", None, ["G2"], None, None),
        ],
        "id string, name string, mbid string, country string, "
        "aliases array<string>, genres array<string>, tags array<string>, "
        "similar_artists array<string>",
    )
    genres = spark.createDataFrame(
        [("G1", "Krautrock", None, None), ("G2", "Techno", None, ["G1"])],
        "id string, name string, aliases array<string>, parent_ids array<string>",
    )
    countries = spark.createDataFrame(
        [("C1", "Germany", None), ("C2", "UK", None)],
        "id string, name string, aliases array<string>",
    )
    releases = spark.createDataFrame(
        [("R1", "Autobahn", 1974, "Q1"), ("R2", "Neu! 75", 1975, "Q2")],
        "id string, title string, year long, artist_id string",
    )
    tracks = spark.createDataFrame(
        [("t1", "Autobahn", "R1"), ("t2", "Kometenmelodie", "R1")],
        "id string, title string, album_id string",
    )
    return artists, genres, countries, releases, tracks


def test_build_graph_tables(spark):
    nodes, edges = build_graph_tables(*_entity_frames(spark))
    labels = {r["label"] for r in nodes.select("label").distinct().collect()}
    assert labels == {"Artist", "Genre", "Country", "Release"}
    rels = {
        (r["src"], r["dst"], r["rel"]) for r in edges.collect()
    }
    assert ("Q1", "G1", "PLAYS_GENRE") in rels
    assert ("Q1", "Q2", "SIMILAR_TO") in rels and ("Q2", "Q1", "SIMILAR_TO") in rels
    assert ("Q1", "C1", "FROM_COUNTRY") in rels
    assert ("R1", "Q1", "PERFORMED_BY") in rels
    assert ("G2", "G1", "SUBGENRE_OF") in rels
    # release node got its ordered tracklist
    r1 = nodes.filter(F.col("id") == "R1").head()
    assert r1["tracks"] == ["1. Autobahn", "2. Kometenmelodie"]
    # edge endpoint validation drops nothing here
    assert validate_edges(nodes, edges).count() == edges.count()


def test_validate_edges_drops_unknown(spark):
    nodes = spark.createDataFrame([("a",), ("b",)], "id string")
    edges = spark.createDataFrame(
        [("a", "b", "X"), ("a", "ghost", "X")], "src string, dst string, rel string"
    )
    assert validate_edges(nodes, edges).count() == 1


def test_multi_hop(spark):
    edges = spark.createDataFrame(
        [("a", "g1", "PLAYS"), ("b", "g1", "PLAYS"), ("g1", "p", "PARENT")],
        "src string, dst string, rel string",
    )
    out = multi_hop(edges, ["PLAYS", "PARENT"]).collect()
    assert sorted((r["hop0"], r["hop2"]) for r in out) == [("a", "p"), ("b", "p")]


def test_connected_components_two_islands(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_detect_communities_two_cliques(spark):
    clique1 = [("a" + str(i), "a" + str(j)) for i in range(4) for j in range(i + 1, 4)]
    clique2 = [("b" + str(i), "b" + str(j)) for i in range(4) for j in range(i + 1, 4)]
    bridge = [("a0", "b0")]
    edges = spark.createDataFrame(
        clique1 + clique2 + bridge, "src string, dst string"
    )
    out = detect_communities(spark, edges, resolutions=(1.0,), seed=42)
    m = {r["id"]: r["community_L0"] for r in out.collect()}
    assert len({m[f"a{i}"] for i in range(1, 4)}) == 1
    assert len({m[f"b{i}"] for i in range(1, 4)}) == 1
    assert m["a1"] != m["b1"]
    # determinism under the same seed
    out2 = detect_communities(spark, edges, resolutions=(1.0,), seed=42)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_leiden_vendored_matches_native_leidenalg():
    """A/B parity with native leidenalg, skip-gated: proven
    automatically the day igraph/leidenalg install (reference contract
    utils/neo4j_helpers.py:237-268, seed 42; determinism test
    tests/data_pipeline/utils/test_neo4j_helpers.py:367). Partitions
    compared as set-of-member-sets (ids are arbitrary on both sides)."""
    import pytest

    pytest.importorskip("igraph")
    pytest.importorskip("leidenalg")
    from graphragpart1datapipeline_spark.graph.communities import (
        _leiden_driver_local,
        _leiden_driver_local_vendored,
    )

    # golden graph: two 5-cliques + a 4-clique, sparse bridges
    edge_list = (
        [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
        + [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
        + [(f"c{i}", f"c{j}") for i in range(4) for j in range(i + 1, 4)]
        + [("a0", "b0"), ("b1", "c0")]
    )
    for res in (2.0, 0.5, 0.1):
        native = _leiden_driver_local(edge_list, res, seed=42)
        vendored = _leiden_driver_local_vendored(edge_list, res, seed=42)
        def parts(m):
            groups: dict[int, set] = {}
            for node, c in m.items():
                groups.setdefault(c, set()).add(node)
            return {frozenset(g) for g in groups.values()}
        assert parts(native) == parts(vendored), f"resolution {res}"


def test_louvain_distributed_two_cliques(spark):
    """Distributed Louvain: cliques unify, the bridge doesn't merge
    them, the result is deterministic, and an empty graph yields an
    empty frame."""
    from graphragpart1datapipeline_spark.graph import louvain_communities

    clique1 = [("a" + str(i), "a" + str(j)) for i in range(4) for j in range(i + 1, 4)]
    clique2 = [("b" + str(i), "b" + str(j)) for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(
        clique1 + clique2 + [("a0", "b0")], "src string, dst string"
    )
    out = louvain_communities(edges, rounds_per_level=2, levels=2)
    m = {r["id"]: r["community"] for r in out.collect()}
    assert len({m[f"a{i}"] for i in range(4)}) == 1
    assert len({m[f"b{i}"] for i in range(4)}) == 1
    assert m["a0"] != m["b0"]
    again = louvain_communities(edges, rounds_per_level=2, levels=2)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    empty = spark.createDataFrame([], "src string, dst string")
    assert louvain_communities(empty).count() == 0
    # self-loops and duplicate/reversed edges are canonicalized away
    noisy = edges.unionByName(
        spark.createDataFrame(
            [("a1", "a0"), ("a0", "a0"), ("a0", "a1")], "src string, dst string"
        )
    )
    m2 = {r["id"]: r["community"] for r in louvain_communities(noisy).collect()}
    assert m2 == m


def test_leiden_distributed_two_cliques_ab_vendored(spark):
    """Distributed Leiden: partition-identical to the vendored
    driver-local Leiden on the golden two-clique graph, deterministic,
    refinement-correct (cliques stay whole, bridge doesn't merge),
    empty-safe."""
    from graphragpart1datapipeline_spark.graph import leiden_communities
    from graphragpart1datapipeline_spark.graph.communities import (
        _leiden_driver_local_vendored,
    )

    clique1 = [("a" + str(i), "a" + str(j)) for i in range(5) for j in range(i + 1, 5)]
    clique2 = [("b" + str(i), "b" + str(j)) for i in range(5) for j in range(i + 1, 5)]
    edge_list = clique1 + clique2 + [("a0", "b0")]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    out = leiden_communities(edges, rounds_per_level=2, levels=2)
    m = {r["id"]: r["community"] for r in out.collect()}
    parts = {}
    for node, c in m.items():
        parts.setdefault(c, set()).add(node)
    got = sorted(sorted(p) for p in parts.values())
    # A/B: same PARTITION as the vendored driver-local Leiden (labels
    # differ by construction; the grouping must not)
    ven = _leiden_driver_local_vendored(edge_list, 1.0, 42)
    vparts = {}
    for node, c in ven.items():
        vparts.setdefault(c, set()).add(node)
    assert got == sorted(sorted(p) for p in vparts.values())
    # determinism
    again = leiden_communities(edges, rounds_per_level=2, levels=2)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    empty = spark.createDataFrame([], "src string, dst string")
    assert leiden_communities(empty).count() == 0


def test_leiden_distributed_refinement_gates(spark):
    """The refinement phase only merges γ-gated well-connected nodes:
    at resolution high enough that no node is well-connected to its
    move community, refinement leaves singletons and the contraction
    is a no-op relabel — the run still completes and still groups the
    cliques (local moving does that part)."""
    from graphragpart1datapipeline_spark.graph import leiden_communities

    clique = [("a" + str(i), "a" + str(j)) for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(clique, "src string, dst string")
    out = {r["id"]: r["community"] for r in
           leiden_communities(edges, levels=2, resolution=1.0).collect()}
    assert len(set(out.values())) == 1  # one clique, one community
    # absurd resolution: everything prefers singletons, run is stable
    hi = {r["id"]: r["community"] for r in
          leiden_communities(edges, levels=2, resolution=100.0).collect()}
    assert len(set(hi.values())) == 4  # all singletons


def test_detect_communities_leiden_distributed_multires(spark):
    """algorithm='leiden-distributed' keeps the driver-local schema
    (dense long ids by size desc / min member) with no collected
    graph."""
    clique1 = [("a" + str(i), "a" + str(j)) for i in range(4) for j in range(i + 1, 4)]
    clique2 = [("b" + str(i), "b" + str(j)) for i in range(3) for j in range(i + 1, 3)]
    edges = spark.createDataFrame(
        clique1 + clique2 + [("a0", "b0")], "src string, dst string"
    )
    out = detect_communities(
        spark, edges, resolutions=(1.0, 0.5), algorithm="leiden-distributed"
    )
    assert out.columns == ["id", "community_L0", "community_L1"]
    rows = {r["id"]: (r["community_L0"], r["community_L1"]) for r in out.collect()}
    assert len(rows) == 7
    assert rows["a0"][0] == 0  # larger clique gets dense id 0
    assert {v[0] for v in rows.values()} == {0, 1}


def test_detect_communities_louvain_distributed_multires(spark):
    """algorithm='louvain-distributed' keeps the driver-local schema
    (dense long ids by size desc / min member) with no collected graph."""
    clique1 = [("a" + str(i), "a" + str(j)) for i in range(4) for j in range(i + 1, 4)]
    clique2 = [("b" + str(i), "b" + str(j)) for i in range(3) for j in range(i + 1, 3)]
    edges = spark.createDataFrame(
        clique1 + clique2 + [("a0", "b0")], "src string, dst string"
    )
    out = detect_communities(
        spark, edges, resolutions=(1.0, 0.5), algorithm="louvain-distributed"
    )
    assert out.columns == ["id", "community_L0", "community_L1"]
    rows = {r["id"]: (r["community_L0"], r["community_L1"]) for r in out.collect()}
    assert len(rows) == 7
    # dense ids: the larger (a) clique gets community 0
    assert rows["a0"][0] == 0
    assert {v[0] for v in rows.values()} == {0, 1}


def test_detect_communities_empty_graph(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    out = detect_communities(spark, edges, resolutions=(2.0, 0.5))
    assert out.columns == ["id", "community_L0", "community_L1"]
    assert out.count() == 0


def test_detect_communities_warns_on_leiden_fallback(spark):
    import warnings

    import pytest

    from graphragpart1datapipeline_spark.graph import communities as comm

    try:
        import leidenalg  # noqa: F401

        pytest.skip("leidenalg present; fallback path not reachable")
    except ImportError:
        pass
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    comm._WARNED_LEIDEN_FALLBACK = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        detect_communities(spark, edges, resolutions=(1.0,), algorithm="auto")
    assert any("vendored pure-Python seeded Leiden" in str(w.message) for w in rec)
    # explicit algorithm='louvain' is silent; 'leiden' raises
    comm._WARNED_LEIDEN_FALLBACK = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        detect_communities(spark, edges, resolutions=(1.0,), algorithm="louvain")
    assert not any("Louvain" in str(w.message) for w in rec)
    with pytest.raises(ImportError):
        detect_communities(spark, edges, resolutions=(1.0,), algorithm="leiden")


def test_louvain_resolution_semantics():
    import itertools

    from graphragpart1datapipeline_spark.graph.communities import (
        _louvain_driver_local,
    )

    # ring of 10 six-cliques: high resolution -> one community per clique,
    # very low resolution -> cliques merge (reference invariant: finer at
    # 2.0, coarser at 0.1; utils/neo4j_helpers.py:237-268)
    edges = []
    for c in range(10):
        ns = [f"c{c}n{i}" for i in range(6)]
        edges += list(itertools.combinations(ns, 2))
        edges.append((f"c{c}n0", f"c{(c + 1) % 10}n0"))
    fine = _louvain_driver_local(edges, 2.0, 42)
    coarse = _louvain_driver_local(edges, 0.05, 42)
    assert len(set(fine.values())) == 10
    assert len(set(coarse.values())) < 10
    # members of one clique always land together at fine resolution
    for c in range(10):
        assert len({fine[f"c{c}n{i}"] for i in range(6)}) == 1
    # seeded determinism (reference test_neo4j_helpers.py:367)
    assert fine == _louvain_driver_local(edges, 2.0, 42)


def test_leiden_vendored_semantics():
    import itertools
    import random

    from graphragpart1datapipeline_spark.graph.communities import (
        _leiden_driver_local_vendored,
    )

    # same ring-of-cliques invariants as the Louvain test
    edges = []
    for c in range(10):
        ns = [f"c{c}n{i}" for i in range(6)]
        edges += list(itertools.combinations(ns, 2))
        edges.append((f"c{c}n0", f"c{(c + 1) % 10}n0"))
    fine = _leiden_driver_local_vendored(edges, 2.0, 42)
    coarse = _leiden_driver_local_vendored(edges, 0.05, 42)
    assert len(set(fine.values())) == 10
    assert len(set(coarse.values())) < 10
    for c in range(10):
        assert len({fine[f"c{c}n{i}"] for i in range(6)}) == 1
    # seeded determinism (reference test_neo4j_helpers.py:367)
    assert fine == _leiden_driver_local_vendored(edges, 2.0, 42)

    # THE Leiden guarantee Louvain lacks: every community is internally
    # connected. Check on seeded random graphs at several resolutions.
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(120)]
    redges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.04
    ]
    adj = {v: set() for v in nodes}
    for a, b in redges:
        adj[a].add(b)
        adj[b].add(a)
    for res in (2.0, 0.5, 0.1):
        member = _leiden_driver_local_vendored(redges, res, 42)
        comms = {}
        for v, cid in member.items():
            comms.setdefault(cid, set()).add(v)
        for cid, ms in comms.items():
            seen = {next(iter(sorted(ms)))}
            frontier = list(seen)
            while frontier:
                v = frontier.pop()
                for u in adj[v] & ms:
                    if u not in seen:
                        seen.add(u)
                        frontier.append(u)
            assert seen == ms, f"community {cid} disconnected at res {res}"


def test_community_rollup(spark):
    members = spark.createDataFrame(
        [
            (0, "Q1", "Kraftwerk", ["electro", "krau"], ["Krautrock"], "Germany", ["Neu!"]),
            (0, "Q2", "Neu!", ["krau"], ["Krautrock"], "Germany", []),
            (1, "Q3", "Aphex Twin", ["idm"], ["Techno"], "UK", ["μ-Ziq", "Squarepusher"]),
        ],
        "community long, id string, name string, tags array<string>, "
        "genres array<string>, country string, similar_artists array<string>",
    )
    out = {r["community"]: r for r in community_rollup(members).collect()}
    assert out[0]["member_count"] == 2
    assert out[0]["member_ids"] == ["Q1", "Q2"]
    assert out[0]["top_tags"][0] == "krau"
    assert out[0]["top_countries"] == ["Germany"]
    assert out[1]["representative_artists"] == ["Aphex Twin"]
    stats = community_size_stats(
        members.select("community", "id"), "community"
    ).head()
    assert stats["n_communities"] == 2 and stats["largest"] == 2


def test_tumbling_and_session_windows(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 7, "click", 1.0),
        (2, base + dt.timedelta(minutes=10), 7, "click", 2.0),
        (3, base + dt.timedelta(minutes=70), 7, "click", 3.0),
        (4, base + dt.timedelta(minutes=75), 8, "view", 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    tumb = tumbling_window_agg(
        ev, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    )
    got = {
        (r["window_start"].hour, r["event_type"]): r["n"] for r in tumb.collect()
    }
    assert got == {(0, "click"): 2, (1, "click"): 1, (1, "view"): 1}
    sess = session_windows(ev, "ts", "user_id", gap_minutes=30)
    m = {r["event_id"]: r["session_id"] for r in sess.collect()}
    assert m[1] == 1 and m[2] == 1 and m[3] == 2 and m[4] == 1


def test_fetch_with_cache(spark):
    keys = spark.createDataFrame([("k1",), ("k2",), ("k3",)], "key string")
    cache = spark.createDataFrame([("k1", "cached")], "key string, val string")
    calls = []

    def fetcher(batch):
        calls.append(sorted(batch))
        return pd.DataFrame({"key": batch, "val": [f"fetched-{k}" for k in batch]})

    out = fetch_with_cache(
        keys, cache, "key", fetcher, result_schema="key string, val string",
        fetch_parallelism=1,
    )
    got = {r["key"]: r["val"] for r in out.collect()}
    assert got == {"k1": "cached", "k2": "fetched-k2", "k3": "fetched-k3"}


def test_write_jsonl_sparse(spark, tmp_path):
    df = spark.createDataFrame([("a", None), ("b", 2)], "id string, n long")
    path = str(tmp_path / "out_jsonl")
    write_jsonl_sparse(df, path)
    lines = sorted(
        ln
        for p in __import__("pathlib").Path(path).glob("*.json")
        for ln in p.read_text().splitlines()
    )
    assert lines == ['{"id":"a"}', '{"id":"b","n":2}']


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [("img1", "image", bytearray(b"\x89PNG fake"), 2000)],
        "asset_id string, kind string, payload binary, duration_ms long",
    )
    out = decode_image_features(df, decoder=fake_decode_stats).collect()
    assert len(out) == 1
    assert out[0]["byte_len"] == 9 and len(out[0]["feature"]) == 8
    frames = frame_sample_plan(df, every_ms=500).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 500, 1000, 1500]


def test_pillow_decoder_real_images(spark):
    """Pillow-backed decoder end to end, skip-gated like the HF
    adapters: real PNG bytes → 8×8 grayscale features through the same
    Arrow mapInPandas path."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from graphragpart1datapipeline_spark.multimodal import pillow_decoder

    def png_bytes(color):
        buf = io.BytesIO()
        Image.new("RGB", (32, 16), color).save(buf, format="PNG")
        return bytearray(buf.getvalue())

    df = spark.createDataFrame(
        [("white", "image", png_bytes((255, 255, 255)), 0),
         ("black", "image", png_bytes((0, 0, 0)), 0)],
        "asset_id string, kind string, payload binary, duration_ms long",
    )
    out = {r["asset_id"]: r for r in decode_image_features(
        df, decoder=pillow_decoder(resize=(8, 8))
    ).collect()}
    assert len(out["white"]["feature"]) == 64
    assert all(f == 1.0 for f in out["white"]["feature"])
    assert all(f == 0.0 for f in out["black"]["feature"])


def test_pillow_decoder_import_error_without_pil():
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; ImportError path not reachable")
    except ImportError:
        pass
    from graphragpart1datapipeline_spark.multimodal import pillow_decoder

    with pytest.raises(ImportError, match="Pillow"):
        pillow_decoder()


def test_multimodal_stub_raises(spark):
    df = spark.createDataFrame(
        [("a", "image", bytearray(b"x"), 1)],
        "asset_id string, kind string, payload binary, duration_ms long",
    )
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image_features(df)


def test_pipeline_runner(spark, tmp_path):
    pipe = Pipeline()

    @pipe.stage("base")
    def base(s):
        return s.createDataFrame([(1,), (2,)], "v long")

    @pipe.stage("doubled", deps=["base"], checkpoint=str(tmp_path / "ck"))
    def doubled(s, b):
        return b.select((F.col("v") * 2).alias("v"))

    out = pipe.run(spark)
    assert sorted(r["v"] for r in out["doubled"].collect()) == [2, 4]


def test_graphrag_demo_pipeline(spark, tmp_path):
    from graphragpart1datapipeline_spark.plans.graphrag_demo import (
        run_graphrag_demo,
    )

    out = run_graphrag_demo(
        spark, "/root/testdata/sf0.001", checkpoint_dir=str(tmp_path)
    )
    n_docs = out["documents"].count()
    assert out["deduped"].count() <= n_docs
    assert out["sections"].count() >= out["deduped"].count()  # >=1 section/doc
    chunks = out["chunks"]
    assert chunks.count() >= out["sections"].count()
    cols = set(chunks.columns)
    assert {"chunk_id", "doc_id", "section", "chunk_index", "total_chunks", "text"} <= cols
    # every chunk text carries the context header prefix
    assert chunks.filter(~F.col("text").startswith("search_document: ")).count() == 0
    # chunk table checkpointed to parquet (the inter-asset seam)
    assert (tmp_path / "chunks").exists()
    emb = out["chunk_embeddings"]
    assert emb.count() == chunks.count()
    meta = out["community_meta"]
    assert meta.count() >= 1
    assert {"member_count", "top_tags", "name"} <= set(meta.columns)
    top = out["search_demo"].collect()
    assert len(top) == 5 and top[0]["score"] >= top[-1]["score"]


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    from graphragpart1datapipeline_spark.streaming import running_totals_by_key

    # write a small events slice as a streamable directory
    src = str(tmp_path / "events_src")
    batch = (
        spark.range(100)
        .select(
            (F.col("id") % 7).alias("user_id"),
            (F.col("id") * 1.5).alias("value"),
        )
    )
    batch.write.parquet(src)
    sdf = spark.readStream.schema("user_id long, value double").parquet(src)
    out = running_totals_by_key(sdf, "user_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per key == batch aggregate
    got = {
        r["key"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT key, n_events, total_value FROM stateful_sink"
        ).collect()
    }
    expected = {
        str(r["user_id"]): (r["n"], r["t"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == expected


def test_paginated_source_fan_out(spark):
    import pandas as pd

    from graphragpart1datapipeline_spark.sources import paginated_source

    PAGE, TOTAL = 10, 33  # 4 pages, last one partial, pages 4+ empty

    def fetch_page(p):
        lo = p * PAGE
        hi = min(lo + PAGE, TOTAL)
        if lo >= TOTAL:
            return pd.DataFrame({"k": [], "v": []})
        return pd.DataFrame(
            {"k": list(range(lo, hi)), "v": [f"row{i}" for i in range(lo, hi)]}
        )

    out = paginated_source(
        spark, fetch_page, n_pages=6, schema="k long, v string",
        fetch_parallelism=3,
    )
    rows = sorted((r["k"], r["v"]) for r in out.collect())
    assert rows == [(i, f"row{i}") for i in range(TOTAL)]


def test_entity_schemas_contract(spark, tmp_path):
    """Every declared entity schema: all-nullable (reference msgspec
    Optional contract, models.py:152-159), and survives a sparse-JSONL
    round trip with nulls dropped on disk but restored on read."""
    from graphragpart1datapipeline_spark import schemas as sch
    from graphragpart1datapipeline_spark.sources import (
        read_jsonl,
        write_jsonl_sparse,
    )
    from pyspark.sql.types import StructType

    entity_schemas = {
        k: v for k, v in vars(sch).items()
        if isinstance(v, StructType) and k.isupper()
    }
    assert len(entity_schemas) >= 15
    for name, s in entity_schemas.items():
        assert all(f.nullable for f in s.fields), name

    # sparse round trip on ARTISTS: null fields omitted in the file
    row = {"id": "Q1", "name": "Kraftwerk", "mbid": None, "country": None,
           "aliases": None, "genres": ["electronic"], "tags": None,
           "similar_artists": None}
    df = spark.createDataFrame([row], sch.ARTISTS)
    path = str(tmp_path / "artists")
    write_jsonl_sparse(df, path)
    import glob
    raw = "".join(open(p).read() for p in glob.glob(f"{path}/part-*.json"))
    assert '"mbid"' not in raw and '"genres"' in raw  # sparse on disk
    back = read_jsonl(spark, path, sch.ARTISTS)
    assert back.schema == sch.ARTISTS
    r = back.head()
    assert r["name"] == "Kraftwerk" and r["mbid"] is None
    assert r["genres"] == ["electronic"]


def test_foreach_batched_sink(spark, tmp_path):
    """Every row lands exactly once; batches respect the size cap; the
    per-partition connection bracket opens/closes symmetrically."""
    import json
    import os

    from graphragpart1datapipeline_spark.sources import foreach_batched

    out_dir = str(tmp_path / "sink")
    os.makedirs(out_dir)

    def open_conn():
        import tempfile

        fd, path = tempfile.mkstemp(dir=out_dir, suffix=".jsonl")
        return os.fdopen(fd, "w")

    def close_conn(f):
        f.close()

    def writer(f, batch):
        assert len(batch) <= 7
        f.write(json.dumps(batch) + "\n")

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(4)
    foreach_batched(
        df, writer, batch_size=7, open_conn=open_conn, close_conn=close_conn
    )
    seen = []
    for fn in os.listdir(out_dir):
        with open(os.path.join(out_dir, fn)) as f:
            for line in f:
                seen.extend(r["id"] for r in json.loads(line))
    assert sorted(seen) == list(range(100))


def test_stream_dedup_registry_matches_batch(spark, tmp_path):
    from graphragpart1datapipeline_spark.streaming import stream_dedup_registry
    from graphragpart1datapipeline_spark.text import document_fingerprint

    src = str(tmp_path / "docs_src")
    batch = spark.createDataFrame(
        [(i, f"text {i % 10}") for i in range(50)],  # 10 contents, 5 dups each
        "doc_id long, text string",
    )
    batch.write.parquet(src)
    sdf = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = stream_dedup_registry(sdf, text_col="text", id_col="doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("registry_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["content_key"]: (r["keep_id"], r["n_seen"])
        for r in spark.sql("SELECT * FROM registry_sink").collect()
    }
    expected = {
        r["k"]: (r["keep"], r["n"])
        for r in batch.select(
            document_fingerprint("text", 32).alias("k"), "doc_id"
        )
        .groupBy("k")
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_stream_interval_join_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from graphragpart1datapipeline_spark.operators import range_join
    from graphragpart1datapipeline_spark.streaming import stream_interval_join

    src = str(tmp_path / "ev_src")
    rows = [
        # (event_id, user_id, epoch_s, type): clicks at -2h, -30min, 0, +5min
        (1, 1, 10000, "purchase"),
        (10, 1, 2800, "click"),    # -2h   -> out
        (11, 1, 8200, "click"),    # -30m  -> in
        (12, 1, 10000, "click"),   # equal -> in (inclusive)
        (13, 1, 10300, "click"),   # after -> out
        (2, 2, 5000, "purchase"),  # no clicks for user 2
        (14, 3, 5000, "click"),    # click without purchase
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, user_id long, epoch long, event_type string"
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch")
    batch.write.parquet(src)

    def _split(df):
        p = df.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        c = df.filter(F.col("event_type") == "click").select("user_id", "ts")
        return p, c

    sdf = spark.readStream.schema(batch.schema).parquet(src)
    sp, sc = _split(sdf)
    q = (
        stream_interval_join(sp, sc, on="user_id", lower=-3600, upper=0)
        .select("event_id", F.col("r_ts"))
        .writeStream.format("memory")
        .queryName("ij_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["r_ts"])
        for r in spark.sql("SELECT * FROM ij_sink").collect()
    }
    bp, bc = _split(batch)
    want = {
        (r["event_id"], r["r_ts"])
        for r in range_join(
            bp, bc, on="user_id", lower=-3600, upper=0, right_select=[]
        ).select("event_id", "r_ts").collect()
    }
    assert got == want and len(want) == 2  # event 1 with clicks 11 and 12


def test_compact_parquet_clusters_and_preserves_rows(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from graphragpart1datapipeline_spark.sources import compact_parquet

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    df.repartition(64).write.parquet(src)  # simulate small-files ingest
    assert len(glob.glob(f"{src}/part-*")) == 64

    n = compact_parquet(
        spark, src, out, target_file_bytes=10 * 1024 * 1024, cluster_by=["k"]
    )
    files = glob.glob(f"{out}/part-*")
    assert len(files) == n and n < 64
    got = spark.read.parquet(out)
    assert got.count() == 10_000
    # clustering: each output file covers a narrow, sorted k-range, so
    # per-file (min, max) spans don't all cover the full domain
    stats = (
        got.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    if len(stats) > 1:
        assert any(r["hi"] - r["lo"] < 96 for r in stats)


def test_pagerank_golden_and_invariance(spark):
    from graphragpart1datapipeline_spark.graph import pagerank

    # star: 1 -> {2,3}, 2 -> 3 ; n=3, scale small for hand-replay
    edges = spark.createDataFrame(
        [("1", "2"), ("1", "3"), ("2", "3")], "src string, dst string"
    )
    got = {
        r["id"]: r["rank"]
        for r in pagerank(edges, iters=2, scale=1000, checkpoint=False).collect()
    }
    # hand replay: n=3, r0 = 333 each; teleport = 3000 // 60 = 50
    # iter1: c(2) = 333 // 2 = 166 ; c(3) = 166 + 333 = 499
    #   r1(1)=50, r1(2)=50+(17*166)//20=50+141=191, r1(3)=50+(17*499)//20=474
    # iter2: c(2) = 50 // 2 = 25 ; c(3) = 25 + 191 = 216
    #   r2(1)=50, r2(2)=50+(17*25)//20=71, r2(3)=50+(17*216)//20=233
    assert got == {"1": 50, "2": 71, "3": 233}
    # pure function of the graph: identical under repartitioning
    again = {
        r["id"]: r["rank"]
        for r in pagerank(
            edges.repartition(5), iters=2, scale=1000, checkpoint=False
        ).collect()
    }
    assert again == got
    # empty graph returns an empty frame, not an error
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, iters=2, checkpoint=False).count() == 0


def test_pretrain_demo_pipeline(spark):
    from graphragpart1datapipeline_spark.plans.pretrain_demo import (
        build_pretrain_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    out = build_pretrain_pipeline(sf).run(spark)
    n_docs = out["documents"].count()
    n_gate = out["quality_gated"].count()
    n_exact = out["exact_deduped"].count()
    n_passage = out["passage_cleaned"].count()
    n_near = out["near_deduped"].count()
    n_clean = out["decontaminated"].count()
    n_bal = out["rebalanced"].count()
    n_split = out["split_assigned"].count()
    final = out["packed"]
    n_final = final.count()
    # monotone funnel, nothing degenerate; splits partition the
    # rebalanced set and only the train split is sharded/packed
    assert (
        n_docs >= n_gate >= n_exact >= n_passage >= n_near > n_clean
        >= n_bal == n_split > n_final
    )
    assert n_final > 50
    splits = {
        r["split"]: r["count"]
        for r in out["split_assigned"].groupBy("split").count().collect()
    }
    assert splits.get("train", 0) == n_final
    # packed schema carries shard/pos AND sequence addresses
    assert {"doc_id", "shard", "pos", "stream_id", "seq_id", "seq_offset"} <= set(
        final.columns
    )
    # achieved mixture matches the requested target shares (binding
    # stratum exact, others within bucket granularity), measured on the
    # full split-assigned set
    counts = {
        r["lang"]: r["count"]
        for r in out["split_assigned"].groupBy("lang").count().collect()
    }
    total = sum(counts.values())
    assert abs(counts["en"] / total - 0.25) < 0.07
    assert abs(counts["de"] / total - 0.125) < 0.05
    # end-to-end determinism: a re-run reproduces every address
    again = build_pretrain_pipeline(sf).run(spark)["packed"]
    key = ["doc_id", "shard", "pos", "stream_id", "seq_id", "seq_offset"]
    assert sorted(map(tuple, final.select(key).collect())) == sorted(
        map(tuple, again.select(key).collect())
    )


def test_csv_orc_roundtrip(spark, tmp_path):
    from graphragpart1datapipeline_spark.sources import (
        read_csv,
        read_orc,
        write_csv,
        write_orc,
    )

    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, None, -2.0), (3, "c", 0.0)],
        "id long, s string, v double",
    )
    csv_path = str(tmp_path / "csv")
    write_csv(df, csv_path)
    back = read_csv(spark, csv_path, "id long, s string, v double")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    orc_path = str(tmp_path / "orc")
    write_orc(df, orc_path, partition_by=["id"])
    back = read_orc(spark, orc_path).select("id", "s", "v")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_label_propagation_communities(spark):
    from graphragpart1datapipeline_spark.graph.communities import (
        label_propagation_communities,
    )

    clique1 = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    clique2 = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(
        clique1 + clique2 + [("a0", "b0")], "src string, dst string"
    )
    out = {r["id"]: r["label"] for r in
           label_propagation_communities(edges, iters=4).collect()}
    # each clique converges to one label; the two cliques stay apart
    assert len({out[f"a{i}"] for i in range(4)}) == 1
    assert len({out[f"b{i}"] for i in range(4)}) == 1
    assert out["a1"] != out["b1"]
    # deterministic under re-run (no seed involved at all)
    again = {r["id"]: r["label"] for r in
             label_propagation_communities(edges, iters=4).collect()}
    assert out == again


def test_read_events_stream_nanos_and_ntz(spark, tmp_path):
    """The driver has shipped the events table both as TIMESTAMP(NANOS)
    and as TIMESTAMP_NTZ across rounds; read_events_stream must yield a
    watermarkable TIMESTAMP ts either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphragpart1datapipeline_spark.sources import read_events_stream

    base = {
        "event_id": [1, 2],
        "user_id": [1, 2],
        "event_type": ["a", "b"],
        "value": [1.0, 2.0],
        "props": ["{}", "{}"],
    }
    micros = [1704067200_000_000, 1704070800_123_456]  # 2024-01-01 +1h
    for name, ts_type, vals in (
        ("nanos", pa.timestamp("ns"), [m * 1000 for m in micros]),
        ("ntz", pa.timestamp("us"), micros),
    ):
        d = str(tmp_path / name)
        import os

        os.makedirs(d, exist_ok=True)
        table = pa.table(
            {
                "event_id": pa.array(base["event_id"], pa.int64()),
                "ts": pa.array(vals, ts_type),
                "user_id": pa.array(base["user_id"], pa.int64()),
                "event_type": pa.array(base["event_type"]),
                "value": pa.array(base["value"], pa.float64()),
                "props": pa.array(base["props"]),
            }
        )
        pq.write_table(table, f"{d}/events.parquet", store_schema=False)
        sdf = read_events_stream(spark, d)
        assert dict(sdf.dtypes)["ts"] == "timestamp"
        q = (
            sdf.withWatermark("ts", "1 minute")
            .groupBy("event_type")
            .count()
            .writeStream.format("memory")
            .queryName(f"nanotest_{name}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["event_type"]: r["count"]
            for r in spark.table(f"nanotest_{name}").collect()
        }
        assert got == {"a": 1, "b": 1}


def test_stream_ewma_out_of_order_batches_match_batch(spark, tmp_path):
    """The streaming EWMA must equal the batch lag-chain EWMA at each
    key's latest event EVEN when the feed arrives scrambled across
    multiple micro-batches (maxFilesPerTrigger=1 over files written in
    value order, not time order) — the top-k state merge is
    batch-split-invariant by construction."""
    import uuid

    from pyspark.sql import Window as W

    from graphragpart1datapipeline_spark.operators.timeseries import ewma
    from graphragpart1datapipeline_spark.streaming.stateful import (
        stream_ewma_by_key,
    )

    rows = [
        (u, t, u * 100 + t, float((u * 7 + t * 13) % 50))
        for u in range(5)
        for t in range(20)
    ]
    batch = spark.createDataFrame(
        rows, "user_id long, tk long, event_id long, value double"
    ).withColumn("ts", F.timestamp_seconds(F.col("tk") * 60))
    src = str(tmp_path / "ev_src")
    # two files in VALUE order: each file holds a time-scrambled half
    batch.orderBy("value").limit(50).coalesce(1).write.parquet(src)
    batch.orderBy("value").offset(50).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_ewma_by_key(
        sdf, "user_id", "ts", "event_id", "value", alpha=0.5, k=4
    )
    name = f"ewma_sink_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    w = W.partitionBy("key").orderBy(F.col("n_events").desc())
    got = {
        r["key"]: (r["n_events"], r["ewma"])
        for r in spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .collect()
    }
    wb = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    expected = {
        str(r["user_id"]): (20, r["ewma"])
        for r in ewma(batch, "user_id", ["ts", "event_id"], "value", 0.5, 4)
        .withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .collect()
    }
    assert got == expected  # bit-exact, including the doubles
