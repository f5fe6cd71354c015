"""Round-10 wave-2 operators: MIME sniffing + routed ingest (q261),
robots.txt compliance (q262)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- mime

PAYLOADS = [
    (b"%PDF-1.7 stream", "text/plain", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n....", "", "image/png"),
    (b"\xff\xd8\xff\xe0JFIF", None, "image/jpeg"),
    (b"GIF89a;;;", "image/gif", "image/gif"),
    (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "", "image/webp"),
    (b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/wav", "audio/wav"),
    (b"\x1f\x8b\x08streamzz", "", "application/gzip"),
    (b"BZh91AY", "", "application/x-bzip2"),
    (b"PK\x03\x04docx", "", "application/zip"),
    (b"<html><p>hi</p>", "text/HTML; charset=utf-8", "text/html"),
    (b"just words", "", "application/octet-stream"),
    (b"just words", None, "application/octet-stream"),
]


def test_route_mime_magic_wins_and_header_fallback(spark):
    """Sniffed magic overrides a lying header; headerless text falls
    to octet-stream; declared types are normalized (case + params)."""
    from graphragpart1datapipeline_spark.text.mime import route_mime

    df = spark.createDataFrame(
        [(i, bytearray(p), d) for i, (p, d, _) in enumerate(PAYLOADS)],
        "i long, payload binary, declared string",
    )
    got = {
        r["i"]: r["route"]
        for r in df.select(
            "i", route_mime("payload", "declared").alias("route")
        ).collect()
    }
    for i, (_, _, want) in enumerate(PAYLOADS):
        assert got[i] == want, (i, got[i], want)


def test_route_mime_sql_parity(spark):
    """The GENERATED DuckDB twin routes every fixture byte-identically
    to the Spark chain (hex-string input, same MAGIC_RULES order)."""
    from graphragpart1datapipeline_spark.text.mime import (
        route_mime,
        route_mime_sql,
    )

    df = spark.createDataFrame(
        [(i, bytearray(p), d) for i, (p, d, _) in enumerate(PAYLOADS)],
        "i long, payload binary, declared string",
    )
    spark_routes = [
        r["route"]
        for r in df.select(
            "i", route_mime("payload", "declared").alias("route")
        )
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    duck_routes = []
    for payload, declared, _ in PAYLOADS:
        decl = "NULL" if declared is None else f"'{declared}'"
        sql = route_mime_sql(f"'{payload.hex().upper()}'", decl)
        duck_routes.append(con.execute(f"SELECT {sql}").fetchone()[0])
    assert spark_routes == duck_routes


def test_sniff_mime_null_on_unknown(spark):
    from graphragpart1datapipeline_spark.text.mime import sniff_mime

    df = spark.createDataFrame(
        [(bytearray(b"plain old text"),)], "payload binary"
    )
    assert df.select(sniff_mime("payload").alias("m")).first()["m"] is None


# -------------------------------------------------------------- robots

ROBOTS = """# demo
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp*cache
Allow: /wild*card
Disallow:

User-agent: GraftBot
User-agent: other-bot
Disallow: /graft-only
Crawl-delay: 7
""".replace("\n", "\r\n")


def _rules(spark, agent):
    from graphragpart1datapipeline_spark.text.robots import robots_rules

    df = spark.createDataFrame(
        [("ex.com", ROBOTS)], "domain string, robots_txt string"
    )
    return {
        (r["rule"], r["path"])
        for r in robots_rules(df, agent=agent).collect()
    }


def test_robots_exact_group_overrides_star(spark):
    """The agent named in a group (case-insensitive, consecutive UA
    lines share the group) gets ONLY that group's rules."""
    assert _rules(spark, "graftbot") == {("disallow", "/graft-only")}
    assert _rules(spark, "OTHER-BOT") == {("disallow", "/graft-only")}


def test_robots_star_group_and_wildcard_conservatism(spark):
    """An unnamed agent gets the * group; a wildcard Disallow is
    truncated at the wildcard (over-blocks), a wildcard Allow is
    dropped, an empty Disallow is the allow-all no-op."""
    assert _rules(spark, "somebody-else") == {
        ("disallow", "/private"),
        ("allow", "/private/ok"),
        ("disallow", "/tmp"),
    }


def test_robots_rejects_star_agent(spark):
    from graphragpart1datapipeline_spark.text.robots import robots_rules

    df = spark.createDataFrame(
        [("ex.com", ROBOTS)], "domain string, robots_txt string"
    )
    with pytest.raises(ValueError, match="concrete product token"):
        robots_rules(df, agent="*")


def test_robots_frontier_longest_match_and_default_allow(spark):
    """Longest matching rule wins (tie → allow); URLs on domains with
    no robots rows are allowed; the non-audit view drops blocked."""
    from graphragpart1datapipeline_spark.text.robots import (
        robots_frontier_filter,
        robots_rules,
    )

    rdf = spark.createDataFrame(
        [("ex.com", ROBOTS)], "domain string, robots_txt string"
    )
    rules = robots_rules(rdf, agent="somebody-else")
    urls = spark.createDataFrame(
        [
            (1, "http://ex.com/private/doc"),
            (2, "http://ex.com/private/ok/doc"),
            (3, "http://ex.com/tmpXcache/f"),
            (4, "http://ex.com/other"),
            (5, "http://nowhere.com/private/doc"),
            (6, "http://ex.com"),
        ],
        "doc_id long, url string",
    )
    audit = {
        r["doc_id"]: (r["allowed"], r["matched_rule"], r["path"])
        for r in robots_frontier_filter(
            urls, rules, keep_blocked=True
        ).collect()
    }
    assert audit[1] == (False, "disallow", "/private/doc")
    assert audit[2] == (True, "allow", "/private/ok/doc")
    assert audit[3] == (False, "disallow", "/tmpXcache/f")
    assert audit[4] == (True, None, "/other")
    assert audit[5] == (True, None, "/private/doc")
    assert audit[6] == (True, None, "/")
    kept = {
        r["doc_id"]
        for r in robots_frontier_filter(urls, rules).collect()
    }
    assert kept == {2, 4, 5, 6}
