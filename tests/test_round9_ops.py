"""Round-9 fixes and operators.

Covers the round-8 ADVICE findings (retrieval-metrics NULL-rank guard,
audio fingerprint materialization) and the round-8 VERDICT tasks
(k-truss single-action fixpoint counting, adaptive_join's job-side
probe regime for huge thresholds).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# retrieval_metrics: NULL rank must raise, not silently drop (ADVICE low)
# ---------------------------------------------------------------------------


def test_retrieval_metrics_null_rank_raises(spark):
    from graphragpart1datapipeline_spark.vector.metrics import (
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, None)],
        "query_id string, vec_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 10, 1)], "query_id string, vec_id long, rel int"
    )
    with pytest.raises(Exception, match="1-based"):
        retrieval_metrics(run, qrels, k=10).collect()


def test_retrieval_metrics_valid_ranks_still_pass(spark):
    from graphragpart1datapipeline_spark.vector.metrics import (
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2)],
        "query_id string, vec_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 11, 1)], "query_id string, vec_id long, rel int"
    )
    row = retrieval_metrics(run, qrels, k=10).collect()[0]
    # first relevant at rank 2 -> rr = scale/2
    assert row["rr"] == 500_000


# ---------------------------------------------------------------------------
# k-truss: fixpoint mode uses ONE action per round (verdict task 5) and
# converges to the same edge set as a generous fixed-round unroll
# ---------------------------------------------------------------------------


def _truss_toy(spark):
    # K4 on {1,2,3,4} (every edge in 2 triangles) plus a pendant path
    # 4-5-6 that peels away for k=4
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6),
    ]
    return spark.createDataFrame(edges, "src long, dst long")


def test_ktruss_fixpoint_matches_fixed_round_unroll(spark):
    from graphragpart1datapipeline_spark.graph.truss import ktruss

    e = _truss_toy(spark)
    fix = {
        (r["a"], r["b"], r["support"])
        for r in ktruss(e, k=4).collect()
    }
    unrolled = {
        (r["a"], r["b"], r["support"])
        for r in ktruss(e, k=4, rounds=10).collect()
    }
    assert fix == unrolled
    # the K4 survives with every edge in exactly 2 triangles
    assert fix == {
        (1, 2, 2), (1, 3, 2), (1, 4, 2), (2, 3, 2), (2, 4, 2), (3, 4, 2)
    }


def test_ktruss_fixpoint_single_action_per_round(spark):
    """The peel loop must issue ONE job per round for its counts: both
    n_before and n_after come from a single aggregate over the
    checkpointed support frame."""
    from graphragpart1datapipeline_spark.graph.truss import ktruss

    e = _truss_toy(spark)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_of(tag, fn):
        sc.setJobGroup(tag, tag)
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(tracker.getJobIdsForGroup(tag) or [])

    # this graph fixes at 2 peel rounds; rounds=2 runs the identical
    # checkpoint materializations WITHOUT the convergence counting, so
    # the job-count difference isolates the counting cost: exactly one
    # aggregate ACTION per round, which AQE materializes as 2 jobs
    # (shuffle stage + result stage). The old two-count loop paid two
    # actions = 4 AQE jobs per round (diff 8 here) — lock under that.
    fixed = jobs_of("ktruss-fixed", lambda: ktruss(e, k=4, rounds=2))
    fixpoint = jobs_of("ktruss-fixpoint", lambda: ktruss(e, k=4))
    rounds = 2
    assert fixpoint - fixed <= 2 * rounds + 1, (
        f"fixpoint={fixpoint} fixed={fixed} jobs — more than one "
        "counting action per peel round"
    )


# ---------------------------------------------------------------------------
# adaptive_join: huge thresholds switch to the job-side count probe
# (driver holds one long), small thresholds keep the incremental take
# ---------------------------------------------------------------------------


def test_adaptive_join_huge_threshold_uses_count_probe(spark):
    from graphragpart1datapipeline_spark.operators import adaptive_join
    from graphragpart1datapipeline_spark.operators.joins import (
        _PROBE_COLLECT_CAP,
    )

    right = spark.range(500).select(
        F.col("id").alias("k"), F.lit("t").alias("tag")
    )
    left = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    )
    info: dict = {}
    out = adaptive_join(
        left, right, "k",
        broadcast_threshold_rows=_PROBE_COLLECT_CAP + 1,
        decision=info,
    )
    # 500 rows <= huge threshold: exact probe value, broadcast arm
    assert info["right_rows"] == 500
    assert info["strategy"] == "broadcast"
    assert out.count() == 10


# ---------------------------------------------------------------------------
# audio_near_dup_pairs materializes fingerprints once (ADVICE medium)
# ---------------------------------------------------------------------------


def test_audio_near_dup_decode_runs_once_per_clip(spark):
    """The Arrow decode seam is the 100 TB cost; audio_match_pairs
    consumes the fingerprint frame three times, so without the
    localCheckpoint the decoder would run 2-3x per clip."""
    from graphragpart1datapipeline_spark.multimodal.audio import (
        audio_near_dup_pairs,
    )

    calls = spark.sparkContext.accumulator(0)

    def counting_decoder(payload: bytes):
        calls.add(1)
        base = payload[0]
        return [
            [float((base + i) % 7), float((base + i) % 5)]
            for i in range(10)
        ]

    assets = spark.createDataFrame(
        [(f"a{i}", bytes([i * 3 % 251]) * 4, "audio") for i in range(6)],
        "asset_id string, payload binary, kind string",
    ).repartition(2)
    audio_near_dup_pairs(
        assets, decoder=counting_decoder, min_matches=2, max_df=16
    ).collect()
    # one decode per clip — the localCheckpoint happens right after
    # fingerprinting, so the accumulator sees exactly 6 calls
    assert calls.value == 6, (
        f"decoder ran {calls.value} times for 6 clips — the "
        "fingerprint frame is being recomputed per consumer"
    )


# ---------------------------------------------------------------------------
# HTML -> text extraction (verdict task 2)
# ---------------------------------------------------------------------------


HTML_GOLDENS = [
    (
        "<html><head><style>p{c:1}</style>"
        "<script>if (a<b && c>d) {}</script></head>"
        "<body><h1>Title</h1><p>Hello <b>world</b> &amp;amp; more</p>"
        "<div>a &lt; b</div></body></html>",
        "Title\nHello world &amp; more\na < b",
    ),
    ("plain text, a < b stays", "plain text, a < b stays"),
    (
        "<!-- c --><p>p1</p>\n<p>p2&nbsp;&nbsp;end</p><br><hr/>tail",
        "p1\np2 end\ntail",
    ),
    (
        "<ul><li>one</li><li>two</li></ul>",
        "one\ntwo",
    ),
    ("<SCRIPT>\nx\n</script >after<p>&#39;q&#34;</p>", "after\n'q\""),
    ("", ""),
    ("   \n\n  ", ""),
]


def test_html_to_text_goldens(spark):
    from graphragpart1datapipeline_spark.text.html import html_to_text

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HTML_GOLDENS)],
        "i long, h string",
    )
    got = [
        r["t"]
        for r in df.select("i", html_to_text("h").alias("t"))
        .orderBy("i")
        .collect()
    ]
    for (src, want), out in zip(HTML_GOLDENS, got):
        assert out == want, f"{src!r}: {out!r} != {want!r}"


def test_html_to_text_sql_twin_parity(spark):
    """The generated DuckDB chain must produce byte-identical output —
    the q247 oracle's whole premise."""
    import duckdb

    from graphragpart1datapipeline_spark.text.html import (
        html_to_text,
        html_to_text_sql,
    )

    fixtures = [h for h, _ in HTML_GOLDENS] + [
        "<div class='a'><span>nested <i>tags</i></span></div>",
        "<table><tr><td>c1</td><td>c2</td></tr></table>&copy; x",
    ]
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {html_to_text_sql('h')} FROM "
            "(SELECT unnest(?) AS h)",
            [fixtures],
        ).fetchall()
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(fixtures)], "i long, h string"
    )
    sp = [
        r["t"]
        for r in df.select("i", html_to_text("h").alias("t"))
        .orderBy("i")
        .collect()
    ]
    assert sp == duck


# ---------------------------------------------------------------------------
# video copy detection (verdict task 3)
# ---------------------------------------------------------------------------


def test_video_near_dup_detects_shifted_copy(spark):
    """Two clips sharing a run of keyframes at one alignment must pair
    at ONE dominant offset; an unrelated clip must not pair."""
    from graphragpart1datapipeline_spark.multimodal.video import (
        fake_decode_video,
        video_near_dup_pairs,
    )

    base = fake_decode_video(b"clip-a", n_frames=12)

    def decoder(raw: bytes):
        if raw == b"orig":
            return base
        if raw == b"shifted":
            return base[4:]  # frames 4..11 — offset +4, 8 shared
        return fake_decode_video(raw, n_frames=12)

    assets = spark.createDataFrame(
        [
            ("orig", b"orig", "video"),
            ("shift", b"shifted", "video"),
            ("other", b"unrelated", "video"),
        ],
        "asset_id string, payload binary, kind string",
    )
    rows = video_near_dup_pairs(
        assets, decoder=decoder, min_matches=5
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    pair = tuple(sorted([r["a"], r["b"]]))
    assert pair == ("orig", "shift")
    assert abs(r["offset"]) == 4 and r["n_matches"] == 8


def test_video_decode_runs_once_per_clip(spark):
    from graphragpart1datapipeline_spark.multimodal.video import (
        fake_decode_video,
        video_near_dup_pairs,
    )

    calls = spark.sparkContext.accumulator(0)

    def counting(raw: bytes):
        calls.add(1)
        return fake_decode_video(raw, n_frames=6)

    assets = spark.createDataFrame(
        [(f"v{i}", bytes([i]) * 3, "video") for i in range(5)],
        "asset_id string, payload binary, kind string",
    ).repartition(2)
    video_near_dup_pairs(assets, decoder=counting, min_matches=2).collect()
    assert calls.value == 5


def test_video_frame_hashes_shape_and_gate(spark):
    from graphragpart1datapipeline_spark.multimodal.video import (
        video_frame_hashes,
    )

    good = spark.createDataFrame(
        [("a", [[float(j) for j in range(64)]] * 3)],
        "asset_id string, frames array<array<double>>",
    )
    rows = video_frame_hashes(good).collect()
    assert [r["idx"] for r in rows] == [0, 1, 2]
    # ascending grid: every comparison true -> all 56 bits set
    assert all(r["fph"] == (1 << 56) - 1 for r in rows)
    bad = spark.createDataFrame(
        [("b", [[1.0, 2.0]])],
        "asset_id string, frames array<array<double>>",
    )
    with pytest.raises(Exception, match="grid"):
        video_frame_hashes(bad).collect()


# ---------------------------------------------------------------------------
# recall@k and AP@k next to MRR/nDCG (verdict task 8) — hand-computed
# ---------------------------------------------------------------------------


def test_retrieval_metrics_recall_and_ap_hand_computed(spark):
    from graphragpart1datapipeline_spark.vector.metrics import (
        mean_retrieval_metrics,
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        [("qA", 10, 1), ("qA", 11, 2), ("qA", 12, 3),
         ("qB", 20, 1), ("qB", 21, 2), ("qB", 22, 3),
         ("qC", 30, 1)],
        "query_id string, vec_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [("qA", 10, 2), ("qA", 11, 1), ("qB", 21, 1), ("qB", 99, 2)],
        "query_id string, vec_id long, rel long",
    )
    out = {
        r["query_id"]: r
        for r in retrieval_metrics(run, qrels, k=3).collect()
    }
    # qA: both relevant retrieved at ranks 1,2 -> recall 1.0;
    # P@1 = 1, P@2 = 1 -> ap_s = 2e6, ap = 2e6 / (2 * 1e6) = 1.0
    assert (out["qA"]["rel_ret"], out["qA"]["rel_tot"]) == (2, 2)
    assert out["qA"]["recall"] == 1.0
    assert out["qA"]["ap_s"] == 2_000_000 and out["qA"]["ap"] == 1.0
    # qB: one of two relevant retrieved, at rank 2 -> recall 0.5;
    # P@2 = 1/2 -> ap_s = 500_000, ap = 500_000 / 2e6 = 0.25 (the
    # trec_eval convention: the MISSED doc 99 stays in the
    # denominator)
    assert (out["qB"]["rel_ret"], out["qB"]["rel_tot"]) == (1, 2)
    assert out["qB"]["recall"] == 0.5
    assert out["qB"]["ap_s"] == 500_000 and out["qB"]["ap"] == 0.25
    # qC: no qrels at all -> everything 0
    assert (
        out["qC"]["rel_ret"], out["qC"]["rel_tot"],
        out["qC"]["recall"], out["qC"]["ap"],
    ) == (0, 0, 0.0, 0.0)
    roll = mean_retrieval_metrics(
        retrieval_metrics(run, qrels, k=3)
    ).collect()[0]
    assert abs(roll["mean_recall"] - (1.0 + 0.5 + 0.0) / 3) < 1e-12
    assert abs(roll["map"] - (1.0 + 0.25 + 0.0) / 3) < 1e-12


# ---------------------------------------------------------------------------
# NB fold (the versioned streaming-maintenance building block,
# verdict task 4): fold-of-increments == retrain-on-union, bit for bit
# ---------------------------------------------------------------------------


def test_nb_fold_increment_equals_retrain(spark):
    from graphragpart1datapipeline_spark.text.classify import (
        nb_fold_increment,
        nb_model_tables,
        nb_score,
        nb_tables,
        nb_train,
    )

    rows = [
        (i, f"alpha beta w{i % 5} gamma" * (1 + i % 3), f"L{i % 2}")
        for i in range(30)
    ]
    full = spark.createDataFrame(
        rows, "doc_id long, text string, label string"
    )
    day0 = full.filter(F.col("doc_id") % 3 == 0)
    inc1 = full.filter(F.col("doc_id") % 3 == 1)
    inc2 = full.filter(F.col("doc_id") % 3 == 2)
    tabs = nb_tables(day0, buckets=64)
    tabs = nb_fold_increment(tabs, inc1)
    tabs = nb_fold_increment(tabs, inc2)
    folded = nb_model_tables(tabs)
    retrained = nb_train(full, buckets=64)
    test = full.select("doc_id", "text")

    def scores(model):
        return sorted(
            (r["doc_id"], r["label"], r["iscore"])
            for r in nb_score(test, model, buckets=64).collect()
        )

    assert scores(folded) == scores(retrained)
    # gates: re-folding an already-registered increment raises
    with pytest.raises(ValueError, match="re-ingests registered"):
        nb_fold_increment(tabs, inc1)
    dup = inc1.unionByName(inc1)
    with pytest.raises(ValueError, match="duplicate ids"):
        nb_fold_increment(nb_tables(day0, buckets=64), dup)


# ---------------------------------------------------------------------------
# URL canonicalization + domain cap
# ---------------------------------------------------------------------------


URL_GOLDENS = [
    (
        "HTTP://WWW.Example.COM:80//Path/sub/?b=2&utm_source=x&a=1"
        "&fbclid=zz#frag",
        "http://example.com/Path/sub?a=1&b=2",
        "example.com",
    ),
    ("https://Site.org:443/", "https://site.org", "site.org"),
    ("site.org/page?ref=abc", "http://site.org/page", "site.org"),
    ("http://h.com", "http://h.com", "h.com"),
    # non-default port and non-http scheme keep their port
    ("ftp://Files.X.com:21/pub/", "ftp://files.x.com:21/pub", "files.x.com"),
    # 'www' inside the host name is NOT stripped, only the label prefix
    ("http://www.www-site.com/www/", "http://www-site.com/www",
     "www-site.com"),
]


def test_canonical_url_goldens(spark):
    from graphragpart1datapipeline_spark.text.urls import (
        canonical_url,
        url_domain,
    )

    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(URL_GOLDENS)],
        "i long, u string",
    )
    rows = (
        df.select(
            "i", canonical_url("u").alias("c"), url_domain("u").alias("d")
        )
        .orderBy("i")
        .collect()
    )
    for (src, want_c, want_d), r in zip(URL_GOLDENS, rows):
        assert r["c"] == want_c, f"{src!r}: {r['c']!r}"
        assert r["d"] == want_d, f"{src!r}: {r['d']!r}"


def test_canonical_url_sql_twin_parity(spark):
    import duckdb

    from graphragpart1datapipeline_spark.text.urls import (
        canonical_url,
        canonical_url_sql,
    )

    fixtures = [u for u, _, _ in URL_GOLDENS] + [
        "  http://a.b.com:8080/x//y/  ",
        "http://h.com?z=1&y=&x=2",
        "HtTpS://WWW.X.io/A/B?utm_medium=m&q=hi&Q=2&gclid=1&msclkid=2",
    ]
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('u')} FROM (SELECT unnest(?) AS u)",
            [fixtures],
        ).fetchall()
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(fixtures)], "i long, u string"
    )
    sp = [
        r["c"]
        for r in df.select("i", canonical_url("u").alias("c"))
        .orderBy("i")
        .collect()
    ]
    assert sp == duck


def test_pretrain_pipeline_html_input(spark, tmp_path):
    """The crawl-HTML entry point: a documents table whose text is raw
    HTML runs through the DAG with html_input=True — extraction happens
    BEFORE any quality/dedup pass, the extracted text matches
    html_to_text, and the schema is identical with the stage off."""
    from graphragpart1datapipeline_spark.plans.pretrain_demo import (
        build_pretrain_pipeline,
    )
    from graphragpart1datapipeline_spark.text.html import html_to_text

    langs = ["en", "zh", "es", "de", "fr"]
    rows = [
        (
            i,
            f"<html><body><h1>Doc {i}</h1><p>"
            + f"alpha w{i % 11} beta gamma delta " * 8
            + "</p><script>var x=1;</script></body></html>",
            langs[i % 5],
            "crawl",
            100,
        )
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    sf = str(tmp_path)
    docs.write.mode("overwrite").parquet(sf + "/documents.parquet")
    out = build_pretrain_pipeline(sf, n_shards=4, capacity=64,
                                  html_input=True).run(spark)
    ext = out["extracted"]
    # extraction matches the operator applied directly
    want = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", html_to_text("text").alias("t")
        ).collect()
    }
    got = {r["doc_id"]: r["text"] for r in ext.collect()}
    assert got == want
    assert all("<" not in t for t in got.values())
    # schema identical with the stage off, and the funnel completes
    off = build_pretrain_pipeline(sf, n_shards=4, capacity=64).run(spark)
    assert out["packed"].columns == off["packed"].columns
    assert "extracted" not in off
    assert out["packed"].count() > 0


def test_script_profile(spark):
    from graphragpart1datapipeline_spark.text.analysis import (
        dominant_script,
        script_fractions,
    )

    df = spark.createDataFrame(
        [
            (0, "hello world"),
            (1, "这是中文"),
            (2, "Это кириллица"),
            (3, "123 !!! ..."),
            (4, "abc 一二三四"),  # 3 latin vs 4 han
        ],
        "id long, t string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            dominant_script("t").alias("d"),
            script_fractions("t").alias("f"),
        ).collect()
    }
    assert rows[0]["d"] == "latin" and rows[0]["f"]["latin"] == 1.0
    assert rows[1]["d"] == "han" and rows[1]["f"]["han"] == 1.0
    assert rows[2]["d"] == "cyrillic"
    # Cyrillic text: all letters are Cyrillic
    assert rows[2]["f"]["cyrillic"] == 1.0
    assert rows[3]["d"] == "none"
    assert rows[4]["d"] == "han" and abs(rows[4]["f"]["latin"] - 3 / 7) < 1e-12


def test_warc_records_parse(spark):
    from graphragpart1datapipeline_spark.text.warc import (
        warc_record_text,
        warc_records,
    )

    crlf = "\r\n"
    blob = (
        "WARC/1.0" + crlf
        + "WARC-Type: response" + crlf
        + "WARC-Target-URI: http://a.com/1" + crlf
        + "Content-Type: text/html" + crlf + crlf
        + "<html><body><p>hello <b>world</b></p></body></html>"
        + crlf + crlf
        + "WARC/1.0" + crlf
        + "WARC-Type: metadata" + crlf
        + "WARC-Target-URI: http://a.com/2" + crlf
        + "Content-Type: application/json" + crlf + crlf
        + '{"k": 1}' + crlf + crlf
    )
    df = spark.createDataFrame([(7, blob)], "fid long, warc string")
    recs = warc_records(df, "warc", keep_cols=["fid"])
    rows = recs.select(
        "fid", "rec_idx", "warc_type", "target_uri", "content_type",
        warc_record_text(recs).alias("t"),
    ).orderBy("rec_idx").collect()
    assert len(rows) == 2
    r0, r1 = rows
    assert (r0["warc_type"], r0["target_uri"]) == (
        "response", "http://a.com/1",
    )
    # HTML body went through extraction; JSON body passed through
    assert r0["t"] == "hello world"
    assert (r1["warc_type"], r1["content_type"]) == (
        "metadata", "application/json",
    )
    assert r1["t"] == '{"k": 1}'
    assert [r["fid"] for r in rows] == [7, 7]


def test_url_frontier_gate_stream_equals_batch(spark):
    """The gate is row-local, so batch and stream survivors are
    identical; canonical matching catches re-spelled seen URLs."""
    from graphragpart1datapipeline_spark.text.urls import (
        url_frontier_gate,
        url_seen_bloom,
    )

    seen = spark.createDataFrame(
        [(1, "HTTP://WWW.A.com:80/x/?utm_source=s&q=1")],
        "id long, url string",
    )
    dense = url_seen_bloom(seen, "url")
    incoming = spark.createDataFrame(
        [
            (1, "http://a.com/x?q=1"),      # clean spelling of SEEN
            (2, "http://a.com/y?q=1"),      # new path
            (3, "https://a.com/x?q=1"),     # different scheme -> new
        ],
        "id long, url string",
    )
    out = url_frontier_gate(incoming, dense, "url").collect()
    assert sorted(r["id"] for r in out) == [2, 3]


def test_domain_cap(spark):
    from graphragpart1datapipeline_spark.text.urls import domain_cap

    rows = [
        (i, f"http://WWW.d{i % 2}.com/p{i}", float(100 - i))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, url string, quality double")
    out = domain_cap(
        df, "url", cap=2,
        order_by=[F.desc("quality"), F.asc("id")], keep_rank=True,
    ).collect()
    assert len(out) == 4  # 2 domains x cap 2
    kept = {(r["domain"], r["id"]) for r in out}
    # highest-quality (lowest id) two per domain survive
    assert kept == {("d0.com", 0), ("d0.com", 2), ("d1.com", 1), ("d1.com", 3)}
    with pytest.raises(ValueError, match="cap must be >= 1"):
        domain_cap(df, "url", cap=0)
