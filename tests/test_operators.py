"""Operator unit tests with the reference's golden cases (FIXTURES.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphragpart1datapipeline_spark.functions import (
    format_list_natural,
    latin_script_filter,
    normalize_text,
    qid_from_uri,
    track_entry,
    year_from_date_string,
    year_from_wikidata_time,
)
from graphragpart1datapipeline_spark.operators import (
    best_per_group,
    dedupe_by_priority,
    positioned_rollup,
    top_n_frequency,
    top_n_per_group,
    union_relaxed,
)


def test_oxford_comma_goldens(spark):
    """Reference golden (tests/.../test_data_transformation_helpers.py:10-29):
    [] -> "", [a] -> a, [a,b] -> "a and b", [a,b,c] -> "a, b, and c",
    dedup preserves first-seen order."""
    rows = [
        ([], ""),
        (["techno"], "techno"),
        (["techno", "house"], "techno and house"),
        (["techno", "house", "ambient"], "techno, house, and ambient"),
        (["b", "a", "b", "c"], "b, a, and c"),
        (None, ""),
    ]
    df = spark.createDataFrame(
        [(r[0],) for r in rows], "items array<string>"
    ).withColumn("out", format_list_natural("items"))
    got = [r["out"] for r in df.collect()]
    assert got == [r[1] for r in rows]


def test_latin_script_goldens(spark):
    """Reference golden (tests/.../test_extract_artist.py:22-39): keep
    Björk/Dvořák/Mötley Crüe, drop Cyrillic/CJK/mixed/empty/null."""
    keep = ["The Beatles", "Björk", "Dvořák", "Mötley Crüe"]
    drop = ["Битлз", "BTS (방탄소년단)", "坂本龍一", "", None]
    df = spark.createDataFrame(
        [(n,) for n in keep + drop], "name string"
    ).filter(latin_script_filter("name"))
    assert sorted(r["name"] for r in df.collect()) == sorted(keep)


def test_tracklist_rollup_golden(spark):
    """Reference golden (tests/.../test_ingest_graph_db.py:57): tracks
    T1,T2 on album R1 -> ["1. Track1", "2. Track2"]."""
    tracks = spark.createDataFrame(
        [("t1", "Track1", "R1"), ("t2", "Track2", "R1"), ("t3", "Solo", "R2")],
        "id string, title string, album_id string",
    )
    out = positioned_rollup(
        tracks, "album_id", "id", F.col("title"), out_col="tracks"
    )
    got = {r["album_id"]: r["tracks"] for r in out.collect()}
    assert got == {"R1": ["1. Track1", "2. Track2"], "R2": ["1. Solo"]}


def test_union_relaxed_empty_sides(spark):
    """Reference golden (test_merge_wikipedia_articles.py:73-160)."""
    a = spark.createDataFrame([("x", 1)], "id string, n long")
    empty = spark.createDataFrame([], "id string, n long")
    extra = spark.createDataFrame([("y", "hi")], "id string, note string")
    assert union_relaxed(a, empty).count() == 1
    assert union_relaxed(empty, empty).count() == 0
    out = union_relaxed(a, extra)
    assert set(out.columns) == {"id", "n", "note"}
    got = {r["id"]: (r["n"], r["note"]) for r in out.collect()}
    assert got == {"x": (1, None), "y": (None, "hi")}


def test_priority_dedup_golden(spark):
    """Reference W2 (data_transformation_helpers.py:89-120): sort by
    start_date asc, keep first per artist_uri, then first per name."""
    df = spark.createDataFrame(
        [
            ("u1", "Kraftwerk", "1970-01-01"),
            ("u1", "Kraftwerk", "1975-01-01"),  # dup uri, later date
            ("u2", "Kraftwerk", "1968-01-01"),  # dup name, earlier date
            ("u3", "Neu!", "1971-01-01"),
        ],
        "artist_uri string, name string, start_date string",
    )
    out = dedupe_by_priority(
        df, keys=["artist_uri", "name"], order_by=["start_date"],
        tiebreak="artist_uri",
    )
    got = sorted((r["artist_uri"], r["start_date"]) for r in out.collect())
    # u1 keeps 1970 row; then name-dedup keeps u2 (1968) over u1 (1970)
    assert got == [("u2", "1968-01-01"), ("u3", "1971-01-01")]


def test_best_release_golden(spark):
    """Reference W4 (musicbrainz_helpers.py:280-308): Official beats
    non-Official; ties → oldest date; missing date = '9999-99-99'."""
    df = spark.createDataFrame(
        [
            ("rg1", "r1", "Bootleg", "1980-01-01"),
            ("rg1", "r2", "Official", "1990-01-01"),
            ("rg1", "r3", "Official", "1985-01-01"),
            ("rg2", "r4", "Promotion", "2000-01-01"),
            ("rg2", "r5", "Promotion", None),
        ],
        "group_id string, id string, status string, date string",
    )
    out = best_per_group(
        df,
        keys=["group_id"],
        order_by=[
            F.when(F.col("status") == "Official", 0).otherwise(1),
            F.coalesce("date", F.lit("9999-99-99")),
        ],
        tiebreak="id",
    )
    got = {r["group_id"]: r["id"] for r in out.collect()}
    assert got == {"rg1": "r3", "rg2": "r4"}


def test_top_n_frequency_ordering(spark):
    df = spark.createDataFrame(
        [("c1", t) for t in ["a", "b", "a", "c", "a", "b"]]
        + [("c2", t) for t in ["z", "z", "y"]],
        "comm string, tag string",
    )
    out = top_n_frequency(df, ["comm"], "tag", 2, out_col="top_tags")
    got = {r["comm"]: r["top_tags"] for r in out.collect()}
    assert got == {"c1": ["a", "b"], "c2": ["z", "y"]}


def test_top_n_per_group_rank(spark):
    df = spark.createDataFrame(
        [("g", 5), ("g", 9), ("g", 7), ("h", 1)], "k string, v long"
    )
    out = top_n_per_group(df, ["k"], [F.desc("v")], 2, rank_col="rk")
    got = sorted((r["k"], r["rk"], r["v"]) for r in out.collect())
    assert got == [("g", 1, 9), ("g", 2, 7), ("h", 1, 1)]


def test_scalar_functions(spark):
    df = spark.createDataFrame(
        [("http://www.wikidata.org/entity/Q111", "1988-06-01", "+1975-00-00T00:00:00Z")],
        "uri string, d string, wd string",
    ).select(
        qid_from_uri("uri").alias("qid"),
        year_from_date_string("d").alias("y1"),
        year_from_wikidata_time("wd").alias("y2"),
        track_entry(F.lit(3), F.lit("Autobahn")).alias("entry"),
        normalize_text(F.lit("  a\n\nb\r  c  ")).alias("norm"),
    )
    r = df.head()
    assert (r["qid"], r["y1"], r["y2"]) == ("Q111", 1988, 1975)
    assert r["entry"] == "3. Autobahn"
    assert r["norm"] == "a b c"


def test_normalize_text_deep_ftfy_fallback_warns(spark):
    import warnings

    import pytest

    from graphragpart1datapipeline_spark.functions import text as textmod

    try:
        import ftfy  # noqa: F401

        pytest.skip("ftfy present; fallback path not reachable")
    except ImportError:
        pass
    textmod._WARNED_FTFY_FALLBACK = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        col = textmod.normalize_text_deep(F.lit("café  x"))
    assert any("ftfy not installed" in str(w.message) for w in rec)
    # warn-once: second call is silent
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        textmod.normalize_text_deep(F.lit("y"))
    assert not any("ftfy" in str(w.message) for w in rec2)
    # NFKC + whitespace chain still applies without ftfy
    row = spark.range(1).select(col.alias("t")).head()
    assert row["t"] == "café x"
    with pytest.raises(ImportError, match="require_ftfy"):
        textmod.normalize_text_deep(F.lit("z"), require_ftfy=True)


def test_salted_join_matches_plain_join(spark):
    from graphragpart1datapipeline_spark.operators import salted_join

    left = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ("hot", f"k{i % 5}")],
        "k string, v long",
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3), ("absent", 9)], "k string, w long"
    )
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(left, right, "k", salt=8).collect()
    )
    assert salted == plain
    # left join keeps unmatched rows exactly once
    plain_l = sorted(
        (r["k"], r["v"], r["w"]) for r in left.join(right, "k", "left").collect()
    )
    salted_l = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(left, right, "k", how="left", salt=8).collect()
    )
    assert salted_l == plain_l


def test_salted_join_rejects_right_and_full_outer(spark):
    import pytest

    from graphragpart1datapipeline_spark.operators import salted_join

    left = spark.createDataFrame([("a", 1)], "k string, v long")
    right = spark.createDataFrame([("a", 2), ("b", 3)], "k string, w long")
    # replicated right side would null-extend once per missing shard
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(left, right, "k", how=how, salt=4)


def test_asof_join_backward(spark):
    from graphragpart1datapipeline_spark.operators import asof_join

    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("B", 5, 3), ("A", 4, 4)],
        "sym string, ts long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 50, 9.0)],
        "sym string, ts long, px double",
    )
    out = {
        (r["sym"], r["trade_id"]): (r["asof_ts"], r["asof_px"])
        for r in asof_join(
            trades, quotes, on="sym", right_select=["px"]
        ).collect()
    }
    assert out[("A", 1)] == (10, 101.0)   # equal ts matches (inclusive)
    assert out[("A", 2)] == (20, 102.0)   # latest <= 25
    assert out[("A", 4)] == (None, None)  # first quote (ts=5) is later
    assert out[("B", 3)] == (None, None)  # no quote yet -> nulls


def test_name_or_alias_join(spark):
    from graphragpart1datapipeline_spark.operators import name_or_alias_join

    left = spark.createDataFrame(
        [("a1", "Kraftwerk"), ("a2", "Orbital"), ("a3", "Unknown")],
        "id string, name string",
    )
    right = spark.createDataFrame(
        [("a1", "Kraftwerk", ["KW"]), ("b1", "Mantronix", ["Orbital", "MX"]),
         ("b2", "Orbital", None)],
        "id string, name string, aliases array<string>",
    )
    pairs = {
        (r["src"], r["dst"])
        for r in name_or_alias_join(
            left, right, "name", "name", "aliases"
        ).collect()
    }
    # a2 matches b2 by name and b1 by alias; a1<->a1 self-pair excluded
    assert pairs == {("a2", "b1"), ("a2", "b2")}


def test_asof_join_forward(spark):
    from graphragpart1datapipeline_spark.operators import asof_join

    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("B", 5, 3)],
        "sym string, ts long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 102.0), ("B", 2, 9.0)],
        "sym string, ts long, px double",
    )
    out = {
        (r["sym"], r["trade_id"]): (r["asof_ts"], r["asof_px"])
        for r in asof_join(
            trades, quotes, on="sym", right_select=["px"], direction="forward"
        ).collect()
    }
    assert out[("A", 1)] == (10, 100.0)   # equal ts matches (inclusive)
    assert out[("A", 2)] == (None, None)  # nothing at/after 25
    assert out[("B", 3)] == (None, None)  # only quote (ts=2) is earlier


def test_range_join_matches_theta_join(spark):
    from pyspark.sql import functions as F

    from graphragpart1datapipeline_spark.operators import range_join

    left = spark.createDataFrame(
        [(1, 1, 1000), (2, 1, 5000), (3, 2, 100)],
        "lid long, k long, epoch long",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch")
    right = spark.createDataFrame(
        [(10, 1, 400), (11, 1, 1000), (12, 1, 4500), (13, 2, 4000)],
        "rid long, k long, epoch long",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch")

    got = {
        (r["lid"], r["r_rid"])
        for r in range_join(
            left, right, on="k", lower=-3600, upper=0, right_select=["rid"]
        ).collect()
    }
    # brute-force theta join as the correctness oracle
    want = {
        (lf["lid"], rt["rid"])
        for lf in left.collect()
        for rt in right.collect()
        if lf["k"] == rt["k"]
        and lf["ts"].timestamp() - 3600 <= rt["ts"].timestamp() <= lf["ts"].timestamp()
    }
    assert got == want and len(want) == 3  # (1,10),(1,11),(2,12)


def test_hash_split_deterministic_and_disjoint(spark):
    from graphragpart1datapipeline_spark.operators import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = hash_split(df, "doc_id", seed=42).groupBy("split").count().collect()
    b = hash_split(df, "doc_id", seed=42).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert counts == {r["split"]: r["count"] for r in b}  # reproducible
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000                   # total partition
    assert counts["train"] > counts["val"]                # ~80/10/10
    # growing the corpus never reassigns existing rows
    small = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            spark.range(100).withColumnRenamed("id", "doc_id"), "doc_id", seed=42
        ).collect()
    }
    big = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", seed=42).collect()
    }
    assert all(big[k] == v for k, v in small.items())


def test_stratified_sample(spark):
    from graphragpart1datapipeline_spark.operators import stratified_sample

    df = spark.range(4000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS src"
    )
    out = stratified_sample(df, "src", {"a": 0.25}, id_col="doc_id", seed=7)
    counts = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    assert counts["b"] == 2000                 # default rate keeps everything
    assert 350 < counts["a"] < 650             # ~25% of 2000
    again = stratified_sample(df, "src", {"a": 0.25}, id_col="doc_id", seed=7)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )                                          # exact reproducibility


def test_snapshot_diff(spark):
    from graphragpart1datapipeline_spark.operators import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "id long, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, None), (5, "e")],
        "id long, v string",
    )
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, ["id"]).collect()}
    # 1 unchanged (absent), 4 unchanged via null-safe compare (absent)
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_key_only(spark):
    from graphragpart1datapipeline_spark.operators import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "id long")
    new = spark.createDataFrame([(2,), (3,)], "id long")
    # every column is a key: matched keys classify as unchanged (dropped)
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {1: "removed", 3: "added"}


def test_pack_sequences_golden(spark):
    from graphragpart1datapipeline_spark.operators import pack_sequences

    # single stream so the packing order is the full id order
    df = spark.createDataFrame(
        [(1, 4), (2, 5), (3, 3), (4, 10), (5, 2)], "doc_id long, tokens long"
    )
    out = {
        r["doc_id"]: (r["stream_id"], r["seq_id"], r["seq_offset"])
        for r in pack_sequences(
            df, "doc_id", "tokens", capacity=10, n_streams=1
        ).collect()
    }
    # starts: 0, 4, 9, 12, 22 -> seq floor(start/10), offset start%10
    assert out == {
        1: (0, 0, 0),
        2: (0, 0, 4),
        3: (0, 0, 9),
        4: (0, 1, 2),
        5: (0, 2, 2),
    }
    # deterministic across reruns and stream counts partition the corpus
    multi = pack_sequences(df, "doc_id", "tokens", capacity=10, n_streams=4)
    assert multi.count() == 5
    assert multi.select("stream_id").distinct().count() <= 4


def test_decontaminate_golden(spark):
    from graphragpart1datapipeline_spark.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "totally unrelated content about spark plans here"),
            (2, "he said the quick brown fox appeared"),  # shares one 4-gram
            (3, "quick brown fox jumps over the lazy dog indeed"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_matching_shingles"]
        for r in decontaminate(docs, bench, n=4).collect()
    }
    assert 1 not in out
    assert out[2] == 1  # "the quick brown fox"
    assert out[3] >= 4  # long shared span -> many 4-grams


def test_global_shuffle_shards(spark):
    from graphragpart1datapipeline_spark.operators import global_shuffle_shards

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = global_shuffle_shards(df, "doc_id", n_shards=8, seed=42)
    rows = out.collect()
    assert len(rows) == 1000
    assert {r["shard"] for r in rows} == set(range(8))
    # positions are dense 0..n_s-1 within every shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # the permutation is a pure function of (id, seed): identical after
    # an adversarial repartition, different under another seed
    again = global_shuffle_shards(
        df.repartition(13), "doc_id", n_shards=8, seed=42
    ).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in rows} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in again
    }
    other = global_shuffle_shards(df, "doc_id", n_shards=8, seed=7).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in rows} != {
        (r["doc_id"], r["shard"], r["pos"]) for r in other
    }
    # the shard ordering actually shuffles: within a shard, consecutive
    # positions are not consecutive ids
    s0 = sorted(
        ((r["pos"], r["doc_id"]) for r in rows if r["shard"] == 0)
    )
    ids_in_order = [i for _, i in s0]
    assert ids_in_order != sorted(ids_in_order)


def test_rebalance_to_weights(spark):
    from graphragpart1datapipeline_spark.operators import rebalance_to_weights

    df = spark.range(3000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 6 < 3 THEN 'en' WHEN id % 6 < 5 THEN 'de' "
        "ELSE 'fr' END AS lang",
    )  # en 1500, de 1000, fr 500
    out = rebalance_to_weights(
        df, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}, id_col="doc_id"
    )
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # fr binds: T = min(1500/.5, 1000/.25, 500/.25) = 2000
    assert counts["fr"] == 500                      # binding stratum kept 100%
    assert abs(counts["en"] - 1000) < 80            # ~.5 * 2000
    assert abs(counts["de"] - 500) < 60             # ~.25 * 2000
    # achieved mixture ~ targets
    total = sum(counts.values())
    assert abs(counts["en"] / total - 0.5) < 0.05
    # strata not in targets are dropped
    extra = df.unionByName(
        spark.range(3000, 3100).selectExpr("id AS doc_id", "'zh' AS lang")
    )
    out2 = rebalance_to_weights(
        extra, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}, id_col="doc_id"
    )
    assert out2.filter("lang = 'zh'").count() == 0
    # reproducible
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"]
        for r in rebalance_to_weights(
            df, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}, id_col="doc_id"
        ).collect()
    )


def test_kmv_distinct_exact_and_estimate(spark):
    from graphragpart1datapipeline_spark.operators import kmv_distinct

    # fewer distincts than k -> exact count
    small = spark.range(1000).selectExpr("id % 100 AS v", "'g' AS g")
    row = kmv_distinct(small, "v", ["g"], k=256).collect()[0]
    assert row["sketch_size"] == 100
    assert row["est_distinct"] == 100.0
    # more distincts than k -> estimate within ~3/sqrt(k) relative error
    big = spark.range(20_000).selectExpr("id AS v", "'g' AS g")
    row = kmv_distinct(big, "v", ["g"], k=256).collect()[0]
    assert row["sketch_size"] == 256
    assert abs(row["est_distinct"] - 20_000) / 20_000 < 3 / (256 ** 0.5)


def test_kmv_ungrouped_prereduce_matches_grouped(spark):
    """The ungrouped path pre-reduces per input partition before the
    single-task global window; the result must be identical to the
    naive single-group computation, and the plan must actually carry
    the local spark_partition_id stage."""
    from graphragpart1datapipeline_spark.operators import kmv_distinct

    df = spark.range(5000).selectExpr("CAST(id % 1200 AS STRING) AS v") \
        .repartition(8)
    ung = kmv_distinct(df, "v", k=64)
    grp = kmv_distinct(df.selectExpr("v", "1 AS g"), "v", ["g"], k=64)
    a = ung.collect()[0]
    b = grp.collect()[0]
    assert (a["sketch_size"], a["kth_hash"], a["est_distinct"]) == (
        b["sketch_size"], b["kth_hash"], b["est_distinct"]
    )
    plan = ung._jdf.queryExecution().optimizedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_kmv_merge_equals_sketch_of_union(spark):
    from graphragpart1datapipeline_spark.operators import (
        kmv_estimate_from_sketch,
        kmv_merge_sketches,
        kmv_sketch,
    )

    k = 64
    a = spark.range(0, 3000).selectExpr("id AS v")
    b = spark.range(2000, 6000).selectExpr("id AS v")  # overlaps a
    merged = kmv_merge_sketches(
        kmv_sketch(a, "v", k=k).unionByName(kmv_sketch(b, "v", k=k)), k=k
    )
    direct = kmv_sketch(a.unionByName(b), "v", k=k)
    assert merged.collect()[0]["kmv"] == direct.collect()[0]["kmv"]
    est = kmv_estimate_from_sketch(merged, k=k).collect()[0]
    assert abs(est["est_distinct"] - 6000) / 6000 < 3 / (k ** 0.5)


def test_interval_lookup_join(spark):
    import pytest

    from graphragpart1datapipeline_spark.operators import interval_lookup_join

    dim = spark.createDataFrame(
        [("low", 0, 10, "L"), ("mid", 10, 20, "M"), ("high", 20, 30, "H")],
        "name string, lo int, hi int, code string",
    )
    facts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 29), (4, 30), (5, -1)], "id int, v int"
    )
    out = {
        r["id"]: (r["name"], r["code"])
        for r in interval_lookup_join(facts, dim, value_col="v").collect()
    }
    assert out[1] == ("low", "L")
    assert out[2] == ("mid", "M")    # lo-inclusive
    assert out[3] == ("high", "H")
    assert out[4] == (None, None)    # hi-exclusive
    assert out[5] == (None, None)    # below all intervals
    with pytest.raises(ValueError):
        interval_lookup_join(facts, dim, value_col="v", max_dim_rows=2)


def test_interval_lookup_join_overlapping(spark):
    """mode='all' emits one row per matching interval; mode='first'
    picks the (lo, hi, payload)-sorted first match deterministically."""
    import pytest

    from graphragpart1datapipeline_spark.operators import interval_lookup_join

    dim = spark.createDataFrame(
        [("wide", 0, 30, "W"), ("low", 0, 10, "L"), ("mid", 5, 20, "M")],
        "name string, lo int, hi int, code string",
    )
    facts = spark.createDataFrame(
        [(1, 7), (2, 25), (3, 99)], "id int, v int"
    )
    rows = interval_lookup_join(
        facts, dim, value_col="v", mode="all"
    ).collect()
    got = sorted((r["id"], r["name"]) for r in rows)
    # v=7 ∈ wide+low+mid; v=25 ∈ wide only; v=99 ∈ nothing (row kept)
    assert got == [(1, "low"), (1, "mid"), (1, "wide"), (2, "wide"), (3, None)]
    first = {
        r["id"]: r["name"]
        for r in interval_lookup_join(facts, dim, value_col="v").collect()
    }
    # (lo, hi, payload) sort: (0,10,low) precedes (0,30,wide)
    assert first == {1: "low", 2: "wide", 3: None}
    with pytest.raises(ValueError, match="mode"):
        interval_lookup_join(facts, dim, value_col="v", mode="nope")


def test_negative_ring_sample(spark):
    import pytest

    from graphragpart1datapipeline_spark.operators import negative_ring_sample

    docs = spark.range(50).selectExpr("id AS doc_id")
    out = negative_ring_sample(docs, "doc_id", k=3, n_shards=8).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["doc_id"], []).append((r["j"], r["negative"]))
    assert set(by_anchor) == set(range(50))       # every row is an anchor
    for a, negs in by_anchor.items():
        assert len(negs) == 3
        vals = [n for _, n in negs]
        assert a not in vals                      # never self
        assert len(set(vals)) == 3                # without replacement
    # deterministic
    again = sorted(
        (r["doc_id"], r["j"], r["negative"])
        for r in negative_ring_sample(docs, "doc_id", k=3, n_shards=8).collect()
    )
    assert again == sorted((r["doc_id"], r["j"], r["negative"]) for r in out)
    # different seed -> different partners (overwhelmingly)
    other = {
        (r["doc_id"], r["j"]): r["negative"]
        for r in negative_ring_sample(
            docs, "doc_id", k=3, seed="other", n_shards=8
        ).collect()
    }
    base = {(r["doc_id"], r["j"]): r["negative"] for r in out}
    assert sum(other[k] != base[k] for k in base) > len(base) // 2
    with pytest.raises(ValueError):
        negative_ring_sample(spark.range(2).selectExpr("id AS doc_id"), "doc_id", k=3)


def test_funnel_counts(spark):
    from graphragpart1datapipeline_spark.operators import funnel_counts

    rows = [
        # u1 completes all three in order
        (1, 1, "signup"), (1, 2, "click"), (1, 3, "purchase"),
        # u2 clicks BEFORE signing up -> stops at stage 1
        (2, 5, "click"), (2, 6, "signup"),
        # u3 signup+click, purchase before click -> stops at stage 2
        (3, 1, "signup"), (3, 3, "click"), (3, 2, "purchase"),
        # u4 never signs up -> not even stage 1
        (4, 1, "click"), (4, 2, "purchase"),
        # u5: same-ts click as signup is NOT after it (strict >)
        (5, 1, "signup"), (5, 1, "click"),
    ]
    ev = spark.createDataFrame(
        [(u, float(t), ty) for u, t, ty in rows],
        "user_id long, ts double, event_type string",
    )
    out = {r["stage"]: (r["event_type"], r["n_users"]) for r in funnel_counts(
        ev, ["signup", "click", "purchase"]
    ).collect()}
    assert out[1] == ("signup", 4)   # u1 u2 u3 u5
    assert out[2] == ("click", 2)    # u1, u3
    assert out[3] == ("purchase", 1) # u1


def test_apply_scd2(spark):
    from graphragpart1datapipeline_spark.operators import apply_scd2

    cur = spark.createDataFrame(
        [(1, "a", 0, None), (2, None, 0, None), (3, "c", 0, 5), (3, "c2", 5, None)],
        "k int, attr string, valid_from long, valid_to long",
    )
    upd = spark.createDataFrame(
        [(1, "a2", 10), (2, None, 10), (4, "new", 10)],
        "k int, attr string, version long",
    )
    out = apply_scd2(cur, upd, key_cols=["k"], compare_cols=["attr"])
    rows = sorted(map(tuple, out.collect()))
    assert rows == sorted([
        (1, "a", 0, 10),      # changed: old row closed
        (1, "a2", 10, None),  # changed: new open row
        (2, None, 0, None),   # identical (null-safe) update -> untouched
        (3, "c", 0, 5),       # history passes through
        (3, "c2", 5, None),   # open row without update -> untouched
        (4, "new", 10, None), # brand-new key
    ])
    # idempotent: re-applying the same batch changes nothing
    again = apply_scd2(out, upd, key_cols=["k"], compare_cols=["attr"])
    assert sorted(map(tuple, again.collect())) == rows
    # a later batch closes the 10-version row
    upd2 = spark.createDataFrame([(1, "a3", 20)], "k int, attr string, version long")
    final = apply_scd2(again, upd2, key_cols=["k"], compare_cols=["attr"])
    hist1 = sorted(
        (r["valid_from"], r["valid_to"], r["attr"])
        for r in final.filter("k = 1").collect()
    )
    assert hist1 == [(0, 10, "a"), (10, 20, "a2"), (20, None, "a3")]


def test_apply_scd2_duplicate_update_keys(spark):
    """One batch with several rows for the same key must not fan out the
    full_outer join: 'latest' keeps the max-version row per key (one
    close + one open), 'error' raises eagerly."""
    import pytest

    from graphragpart1datapipeline_spark.operators import apply_scd2

    cur = spark.createDataFrame(
        [(1, "a", 0, None)], "k int, attr string, valid_from long, valid_to long"
    )
    upd = spark.createDataFrame(
        [(1, "mid", 10), (1, "late", 20), (2, "x", 10), (2, "y", 20)],
        "k int, attr string, version long",
    )
    out = sorted(map(tuple, apply_scd2(
        cur, upd, key_cols=["k"], compare_cols=["attr"]
    ).collect()))
    assert out == sorted([
        (1, "a", 0, 20),        # closed exactly once, at the winning version
        (1, "late", 20, None),  # single new open row: the latest update
        (2, "y", 20, None),     # new key: latest wins, one open row
    ])
    # one-open-row invariant holds per key
    opens = apply_scd2(cur, upd, key_cols=["k"], compare_cols=["attr"]).filter(
        "valid_to IS NULL"
    ).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in opens)
    with pytest.raises(ValueError, match="multiple rows"):
        apply_scd2(
            cur, upd, key_cols=["k"], compare_cols=["attr"], on_duplicate="error"
        )
    # error mode passes clean batches through
    clean = spark.createDataFrame(
        [(1, "z", 30)], "k int, attr string, version long"
    )
    assert apply_scd2(
        cur, clean, key_cols=["k"], compare_cols=["attr"], on_duplicate="error"
    ).count() == 2
