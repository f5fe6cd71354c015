"""End-to-end CRAWL-INGEST pipeline composed from the crawl-front
operators round 9/10 built — the acquisition DAG that runs BEFORE
pretrain_demo's curation DAG ever sees a byte:

    frontier (candidate URLs) → seen-URL gate (bloom, q252) →
    robots.txt compliance (RFC 9309, q262) → per-domain cap (q251) →
    politeness schedule (q259) → fetch (simulated: deterministic
    single-record WARC blobs) → WARC parse (q253) → declared-type
    normalization (text/mime.py, q261's text-mode rule) → HTML
    extraction (q247) → curation signals (lang-ID + script
    consistency, q269)

Every stage is individually oracle-verified (the q-numbers above);
this module verifies they COMPOSE — each stage a pure
DataFrame → DataFrame function of the previous one, every keep/drop
decision a deterministic function of the row, so re-running the whole
crawl plan reproduces the identical frontier, timetable, and curated
output (the crash-rerun property the politeness scheduler documents,
extended to the full DAG). The fetch stage is the one SIMULATED seam
(this container fetches nothing): it serializes each scheduled URL's
document text into a single-record text-mode WARC blob — exactly the
byte shape a real fetcher hands the parser — so swapping in a real
fetcher changes no stage signature.

Scale notes mirror the member operators': the gates are plan-literal
row-local filters fused into the scan; robots rules and the seen
bloom are broadcast-sized; the only windows are domain-keyed (cap +
schedule — and the cap runs FIRST, bounding the schedule window's
mega-domain skew); parse/extraction are row-local chains. Nothing
shuffles the corpus until the caller's downstream curation does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table
from ..text.analysis import lang_script_mismatch, language_id
from ..text.html import html_to_text
from ..text.mime import media_type
from ..text.robots import robots_frontier_filter, robots_rules
from ..text.urls import (
    domain_cap,
    politeness_schedule,
    url_frontier_gate,
    url_seen_bloom,
)
from ..text.warc import warc_records
from .pipeline import Pipeline

_CRLF = "\r\n"

DEFAULT_EXPECTED_SCRIPTS = {
    "en": "latin", "de": "latin", "es": "latin", "fr": "latin",
}


def build_crawl_pipeline(
    sf_dir: str,
    agent: str = "graftbot",
    domain_cap_n: int = 40,
    gap_slots: int = 16,
    slot_ms: int = 250,
    expected_scripts: dict[str, str] | None = None,
) -> Pipeline:
    """The composed crawl plan over the synthetic corpus: candidate
    URLs derive one-per-document (doc_id-keyed, domains doc_id%7),
    the seen snapshot is the even docs (messy spellings — canonical
    matching is load-bearing), robots bodies disallow one path family
    per domain for ``agent``. Returns the Pipeline; ``run(spark)``
    yields every intermediate stage for inspection/tests."""
    p = Pipeline()
    exp = (
        DEFAULT_EXPECTED_SCRIPTS
        if expected_scripts is None
        else expected_scripts
    )

    @p.stage("documents")
    def documents(spark: SparkSession) -> DataFrame:
        return read_table(spark, sf_dir, "documents")

    @p.stage("frontier", deps=["documents"])
    def frontier(spark: SparkSession, docs: DataFrame) -> DataFrame:
        did = F.col("doc_id")
        url = F.concat(
            F.lit("HTTP://WWW.Site"), (did % 7).cast("string"),
            F.lit(".COM:80//Path"), (did % 5).cast("string"),
            F.lit("/doc/"), did.cast("string"), F.lit("/?b=2&a=1#s"),
        )
        return docs.select("doc_id", "lang", url.alias("url"))

    @p.stage("unseen", deps=["frontier", "documents"])
    def unseen(
        spark: SparkSession, front: DataFrame, docs: DataFrame
    ) -> DataFrame:
        did = F.col("doc_id")
        seen = docs.filter(did % 2 == 0).select(
            F.concat(
                F.lit("http://site"), (did % 7).cast("string"),
                F.lit(".com/Path"), (did % 5).cast("string"),
                F.lit("/doc/"), did.cast("string"), F.lit("?a=1&b=2"),
            ).alias("url")
        )
        dense = url_seen_bloom(seen, "url")
        return url_frontier_gate(front, dense, "url")

    @p.stage("allowed", deps=["unseen", "documents"])
    def allowed(
        spark: SparkSession, front: DataFrame, docs: DataFrame
    ) -> DataFrame:
        d = F.col("d").cast("string")
        robots = (
            docs.select((F.col("doc_id") % 7).alias("d"))
            .distinct()
            .select(
                F.concat(F.lit("site"), d, F.lit(".com")).alias("domain"),
                F.concat(
                    F.lit("User-agent: *\nDisallow: /Path"),
                    (F.col("d") % 5).cast("string"),
                    F.lit("\nUser-agent: graftbot\nDisallow: /Path"),
                    ((F.col("d") + 1) % 5).cast("string"),
                    F.lit("/doc"),
                ).alias("robots_txt"),
            )
        )
        rules = robots_rules(robots, agent=agent)
        return robots_frontier_filter(
            front, rules, url_col="url", id_col="doc_id"
        ).select(*front.columns)

    @p.stage("capped", deps=["allowed"])
    def capped(spark: SparkSession, front: DataFrame) -> DataFrame:
        return domain_cap(
            front, "url", cap=domain_cap_n,
            order_by=[F.asc("doc_id")],
        ).select(*front.columns)

    @p.stage("scheduled", deps=["capped"])
    def scheduled(spark: SparkSession, front: DataFrame) -> DataFrame:
        return politeness_schedule(
            front, url_col="url", gap_slots=gap_slots, slot_ms=slot_ms,
        )

    @p.stage("fetched", deps=["scheduled", "documents"])
    def fetched(
        spark: SparkSession, sched: DataFrame, docs: DataFrame
    ) -> DataFrame:
        # the SIMULATED fetch seam: scheduled URL -> one text-mode
        # WARC blob carrying the doc's text as HTML — the exact byte
        # shape a real fetcher hands the parser
        did = F.col("doc_id")
        body = F.concat(
            F.lit("<html><body><p>"),
            F.replace(F.col("text"), F.lit(". "), F.lit(".</p><p>")),
            F.lit("</p></body></html>"),
        )
        blob = F.concat(
            F.lit("WARC/1.0" + _CRLF + "WARC-Type: response" + _CRLF),
            F.lit("WARC-Target-URI: "), F.col("url"), F.lit(_CRLF),
            F.lit("Content-Type: text/HTML; charset=utf-8" + _CRLF),
            F.lit(_CRLF), body, F.lit(_CRLF + _CRLF),
        )
        return sched.join(docs.select("doc_id", "text"), "doc_id").select(
            "doc_id", "lang", "fetch_at_ms", blob.alias("warc")
        )

    @p.stage("records", deps=["fetched"])
    def records(spark: SparkSession, fetched: DataFrame) -> DataFrame:
        return warc_records(
            fetched, "warc", keep_cols=["doc_id", "lang", "fetch_at_ms"]
        )

    @p.stage("extracted", deps=["records"])
    def extracted(spark: SparkSession, recs: DataFrame) -> DataFrame:
        route = media_type("content_type")
        text = F.when(
            route == "text/html", html_to_text(F.col("body"))
        ).otherwise(F.col("body"))
        return recs.select(
            "doc_id", "lang", "fetch_at_ms",
            route.alias("route"), text.alias("text"),
        )

    @p.stage("curated", deps=["extracted"])
    def curated(spark: SparkSession, ext: DataFrame) -> DataFrame:
        out = lang_script_mismatch(
            ext, exp, lang_col="lang", text_col="text"
        )
        return out.filter(
            ~F.col("mismatch") & language_id("text").isNotNull()
        ).select(
            "doc_id", "lang", "fetch_at_ms", "route", "text", "dominant"
        )

    return p
