"""Round-10 operators: the byte-exact binary WARC reader and its
image near-dup chain (q255)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CRLF = "\r\n"


def _rec(payload: bytes, ctype: str = "image/x-gray8",
         uri: str = "img://1", extra_hdr: str = "") -> bytes:
    hdr = (
        "WARC-Type: resource" + CRLF
        + f"WARC-Target-URI: {uri}" + CRLF
        + f"Content-Type: {ctype}" + CRLF
        + extra_hdr
        + f"Content-Length: {len(payload)}" + CRLF + CRLF
    ).encode()
    return b"WARC/1.0\r\n" + hdr + payload + b"\r\n\r\n"


def test_binary_reader_sentinel_payload_roundtrips(spark):
    """A payload containing the literal record sentinel bytes — the
    exact case the text-mode reader cannot represent — must come back
    byte-identical, and the NEXT record must still parse."""
    from graphragpart1datapipeline_spark.text.warc import (
        warc_records_binary,
    )

    evil = b"\x00\x01GIF89a" + b"\r\n\r\nWARC/1.0\r\n" + b"\xff" * 8
    blob = _rec(evil, uri="img://7") + _rec(b"after", ctype="text/plain",
                                            uri="txt://8")
    df = spark.createDataFrame([(3, bytearray(blob))], "fid long, warc binary")
    rows = (
        warc_records_binary(df, "warc", keep_cols=["fid"])
        .orderBy("rec_idx")
        .collect()
    )
    assert len(rows) == 2
    r0, r1 = rows
    assert r0["fid"] == 3 and r0["rec_idx"] == 0
    assert bytes(r0["payload"]) == evil
    assert r0["content_length"] == len(evil)
    assert (r0["target_uri"], r0["content_type"]) == (
        "img://7", "image/x-gray8"
    )
    assert r1["rec_idx"] == 1
    assert bytes(r1["payload"]) == b"after"
    assert r1["warc_type"] == "resource"


def test_binary_reader_missing_content_length_raises(spark):
    """No Content-Length = malformed per ISO 28500 — loud raise, never
    a guessed boundary."""
    from graphragpart1datapipeline_spark.text.warc import (
        warc_records_binary,
    )

    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"Content-Type: text/plain\r\n\r\n"
        b"body\r\n\r\n"
    )
    df = spark.createDataFrame([(1, bytearray(bad))], "fid long, warc binary")
    with pytest.raises(PythonException, match="Content-Length"):
        warc_records_binary(df, "warc").collect()


def test_binary_reader_truncated_blob_raises(spark):
    from graphragpart1datapipeline_spark.text.warc import (
        warc_records_binary,
    )

    blob = _rec(b"0123456789")[:-8]  # cut inside the counted payload
    df = spark.createDataFrame([(1, bytearray(blob))], "fid long, warc binary")
    with pytest.raises(PythonException, match="truncated"):
        warc_records_binary(df, "warc").collect()


def test_binary_reader_header_block_anchoring(spark):
    """The binary reader parses headers from the pre-blank-line block
    only — a 'Content-Type:' line inside the payload never bleeds."""
    from graphragpart1datapipeline_spark.text.warc import (
        warc_records_binary,
    )

    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhi"
    hdr = (
        "WARC-Type: response" + CRLF
        + f"Content-Length: {len(payload)}" + CRLF + CRLF
    ).encode()
    blob = b"WARC/1.0\r\n" + hdr + payload + b"\r\n\r\n"
    df = spark.createDataFrame([(1, bytearray(blob))], "fid long, warc binary")
    row = warc_records_binary(df, "warc").head()
    assert row["content_type"] == ""
    assert bytes(row["payload"]) == payload


def test_fake_decode_gray8x8():
    from graphragpart1datapipeline_spark.multimodal.assets import (
        fake_decode_gray8x8,
    )

    grid = bytes(range(64)) + b"\r\n\r\nWARC/1.0\r\ntail"
    feat = fake_decode_gray8x8(grid)
    assert len(feat) == 64
    assert feat[0] == 0.0 and feat[63] == 63 / 255.0
    with pytest.raises(ValueError, match="64 grid bytes"):
        fake_decode_gray8x8(b"short")


def test_warc_binary_chain_finds_planted_copy(spark):
    """End-to-end through blobs → byte reader → decode seam → dHash →
    banded pairs: a planted one-cell-perturbed copy pairs with its
    source at hamming <= 2; the text/plain record is filtered out."""
    import __spark_entry__ as entrymod
    from graphragpart1datapipeline_spark.text.warc import (
        warc_records_binary,
    )

    emb = spark.createDataFrame([(i,) for i in range(12)], "vec_id long")
    blobs = entrymod._binary_warc_blobs(emb)
    recs = warc_records_binary(blobs, "warc", keep_cols=["warc_file"])
    kinds = dict(
        recs.groupBy("content_type").count().collect()
    )
    # 12 base images + copies for v in {0, 9} + text records for
    # v in {0, 5, 10}
    assert kinds == {"image/x-gray8": 14, "text/plain": 3}
    from graphragpart1datapipeline_spark.dedup.simhash import (
        fingerprint_near_dup_pairs,
    )
    from graphragpart1datapipeline_spark.multimodal.assets import (
        FEATURE_SCHEMA,
        decode_payloads,
        dhash_expr,
        fake_decode_gray8x8,
    )

    imgs = recs.filter(F.col("content_type").startswith("image/")).select(
        F.col("target_uri").alias("asset_id"),
        F.lit("image").alias("kind"),
        "payload",
    )
    feats = decode_payloads(
        imgs, fake_decode_gray8x8, FEATURE_SCHEMA, "feature"
    )
    fp = feats.select(
        F.regexp_extract("asset_id", "img://(-?[0-9]+)", 1)
        .cast("long")
        .alias("vec_id"),
        dhash_expr("feature", 8, 8).alias("fp"),
    )
    got = {
        (r["a"], r["b"])
        for r in fingerprint_near_dup_pairs(
            fp, id_col="vec_id", fp_col="fp",
            max_hamming=3, bands=4, bits=56,
        ).collect()
    }
    assert (-10, 9) in got or (-1, 0) in got
    for a, b in got:
        # every surviving pair is a planted copy pair: copy id -(v+1)
        # against its source v (random md5 grids don't near-collide)
        assert a == -(b + 1), (a, b)


# ---------------------------------------------------------------------------
# PDF decode seam (q256's machinery)
# ---------------------------------------------------------------------------


def test_fake_decode_pdf_text_roundtrip_and_guard():
    from graphragpart1datapipeline_spark.text.pdf import (
        FAKE_PDF_MAGIC,
        fake_decode_pdf_text,
    )

    body = "Hello PDF\nwörld"
    assert fake_decode_pdf_text(
        (FAKE_PDF_MAGIC + body).encode()
    ) == body
    with pytest.raises(ValueError, match="not a fake-PDF"):
        fake_decode_pdf_text(b"GIF89a not a pdf")


def test_decode_pdf_text_stub_raises_without_decoder(spark):
    from graphragpart1datapipeline_spark.text.pdf import decode_pdf_text

    df = spark.createDataFrame(
        [("a", "pdf", bytearray(b"%PDF-FAKE\nx"))],
        "asset_id string, kind string, payload binary",
    )
    with pytest.raises(NotImplementedError, match="PDF text extractor"):
        decode_pdf_text(df)


def test_decode_pdf_text_seam_emits_hash_and_text(spark):
    import hashlib

    from graphragpart1datapipeline_spark.text.pdf import (
        FAKE_PDF_MAGIC,
        decode_pdf_text,
        fake_decode_pdf_text,
    )

    raw = (FAKE_PDF_MAGIC + "two words").encode()
    df = spark.createDataFrame(
        [("a", "pdf", bytearray(raw))],
        "asset_id string, kind string, payload binary",
    )
    row = decode_pdf_text(df, decoder=fake_decode_pdf_text).head()
    assert row["text"] == "two words"
    assert row["byte_len"] == len(raw)
    assert row["content_hash"] == hashlib.sha256(raw).hexdigest()


def test_pypdf_decoder_importgated():
    """Real adapter: clear ImportError without pypdf; real decode when
    present (this container ships neither, so the second half skips)."""
    try:
        import pypdf  # noqa: F401

        has = True
    except ImportError:
        has = False
    from graphragpart1datapipeline_spark.text.pdf import pypdf_decoder

    if not has:
        with pytest.raises(ImportError, match="pypdf"):
            pypdf_decoder()
    else:  # pragma: no cover - container has no pypdf
        assert callable(pypdf_decoder())


# ---------------------------------------------------------------------------
# Persisted fingerprint index: split-apply == rebuild equalities
# ---------------------------------------------------------------------------


def _fp_df(spark, rows):
    return spark.createDataFrame(rows, "asset_id long, fp long")


def _bands_set(index):
    return {
        (r["rid"], r["band"], r["chunk"], r["fp"])
        for r in index["bands"].collect()
    }


def test_fingerprint_upsert_equals_rebuild(spark):
    from graphragpart1datapipeline_spark.dedup.fingerprint_index import (
        fingerprint_index,
        fingerprint_upsert,
    )

    corpus = [(1, 0b1010101), (2, (1 << 56) - 1), (3, 0)]
    inc = [(4, 0b1010100), (5, 123456789)]
    ix = fingerprint_upsert(
        fingerprint_index(_fp_df(spark, corpus)), _fp_df(spark, inc)
    )
    rebuilt = fingerprint_index(_fp_df(spark, corpus + inc))
    assert _bands_set(ix) == _bands_set(rebuilt)


def test_fingerprint_upsert_replaces_existing_rid(spark):
    from graphragpart1datapipeline_spark.dedup.fingerprint_index import (
        fingerprint_index,
        fingerprint_upsert,
    )

    ix = fingerprint_upsert(
        fingerprint_index(_fp_df(spark, [(1, 7), (2, 9)])),
        _fp_df(spark, [(2, 999)]),
    )
    rebuilt = fingerprint_index(_fp_df(spark, [(1, 7), (2, 999)]))
    assert _bands_set(ix) == _bands_set(rebuilt)


def test_fingerprint_delete_equals_rebuild_without(spark):
    from graphragpart1datapipeline_spark.dedup.fingerprint_index import (
        fingerprint_delete,
        fingerprint_index,
    )

    ix = fingerprint_delete(
        fingerprint_index(_fp_df(spark, [(1, 7), (2, 9), (3, 11)])),
        spark.createDataFrame([(2,), (99,)], "asset_id long"),
    )
    rebuilt = fingerprint_index(_fp_df(spark, [(1, 7), (3, 11)]))
    assert _bands_set(ix) == _bands_set(rebuilt)


def test_fingerprint_incremental_probe_vs_batch(spark):
    """Increment probe == batch pairs of the union restricted to
    pairs touching a new id (hamming <= 3 < bands => exact)."""
    from graphragpart1datapipeline_spark.dedup.fingerprint_index import (
        fingerprint_index,
        fingerprint_near_dup_incremental,
    )
    from graphragpart1datapipeline_spark.dedup.simhash import (
        fingerprint_near_dup_pairs,
    )

    corpus = [(1, 0b111000), (2, 1 << 40), (3, 0b111001)]
    newer = [(10, 0b111010), (11, 0b111011), (12, (1 << 55) + 5)]
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in fingerprint_near_dup_incremental(
            _fp_df(spark, newer),
            fingerprint_index(_fp_df(spark, corpus)),
            max_hamming=3,
        ).collect()
    }
    full = {
        (r["a"], r["b"], r["hamming"])
        for r in fingerprint_near_dup_pairs(
            _fp_df(spark, corpus + newer), id_col="asset_id",
            max_hamming=3,
        ).collect()
        if r["a"] >= 10 or r["b"] >= 10
    }
    assert got == full
    assert (10, 11, 1) in got  # new x new found
    assert (1, 10, 2) in got or (3, 10, 2) in got  # new x corpus found


def test_fingerprint_index_param_guards(spark):
    from graphragpart1datapipeline_spark.dedup.fingerprint_index import (
        fingerprint_index,
        fingerprint_near_dup_incremental,
        fingerprint_upsert,
    )

    ix = fingerprint_index(_fp_df(spark, [(1, 7)]), bands=4, bits=56)
    with pytest.raises(ValueError, match="built with"):
        fingerprint_upsert(ix, _fp_df(spark, [(2, 9)]), bands=7, bits=56)
    with pytest.raises(ValueError, match="built with"):
        fingerprint_near_dup_incremental(
            _fp_df(spark, [(2, 9)]), ix, bands=4, bits=48
        )
    with pytest.raises(ValueError, match="equal chunks"):
        fingerprint_index(_fp_df(spark, [(1, 7)]), bands=5, bits=56)


# ---------------------------------------------------------------------------
# Kneser-Ney backoff trigram LM (q258's machinery)
# ---------------------------------------------------------------------------


def _kn_fixture(spark):
    return spark.createDataFrame(
        [(0, "a b c a b d")], "doc_id long, text string"
    )


def _ll(p: float) -> int:
    import math

    return math.floor(math.log(p) * 1_000_000.0 + 0.5)


def test_kn_trigram_seen_path(spark):
    """Hand-checked: train corpus 'a b c a b d' → c3(a,b,c)=1,
    c2ctx(a,b)=2 → p = (4·1−3)/(4·2) = 1/8."""
    from graphragpart1datapipeline_spark.text.lm import (
        kn_trigram_score,
        kn_trigram_train,
    )

    model = kn_trigram_train(_kn_fixture(spark))
    test = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    row = kn_trigram_score(test, model).head()
    assert row["n_trigrams"] == 1
    assert row["kn_ll_micro"] == _ll(1.0 / 8.0)


def test_kn_trigram_backoff_paths(spark):
    """Unseen trigram with seen contexts walks the full backoff chain
    with the exact discount-freed mass at each level; a fully-unseen
    trigram floors at 1/(types+1). n_types = 4 continuation bigrams."""
    from graphragpart1datapipeline_spark.text.lm import (
        kn_trigram_score,
        kn_trigram_train,
    )

    model = kn_trigram_train(_kn_fixture(spark))
    test = spark.createDataFrame(
        [(1, "a b x"), (2, "zz qq ww"), (3, "hi")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in kn_trigram_score(test, model).collect()
    }
    # doc 1: alpha(a,b) = 3·2/(4·2), alpha(b) = 3·2/(4·2), pu = 1/5
    alpha = (3.0 * 2) / (4.0 * 2)
    pu = 1.0 / 5.0
    assert rows[1]["kn_ll_micro"] == _ll(alpha * (alpha * pu))
    # doc 2: unseen contexts -> alpha = 1 at both levels, OOV unigram
    assert rows[2]["kn_ll_micro"] == _ll(1.0 * (1.0 * pu))
    # doc 3: < 3 tokens keeps a row with no evidence
    assert rows[3]["n_trigrams"] == 0
    assert rows[3]["kn_ll_micro"] == 0
    assert rows[3]["mean_ll_micro"] is None


def test_kn_trigram_discount_guard(spark):
    from graphragpart1datapipeline_spark.text.lm import kn_trigram_score

    with pytest.raises(ValueError, match="fraction"):
        kn_trigram_score(_kn_fixture(spark), discount=(5, 4))


# ---------------------------------------------------------------------------
# Politeness scheduling (q259's machinery)
# ---------------------------------------------------------------------------


def test_politeness_per_domain_gap_invariant(spark):
    """Within a domain, consecutive fetch slots differ EXACTLY by
    gap_slots; offsets stay inside [0, gap); schedule is deterministic
    across reruns."""
    from graphragpart1datapipeline_spark.text.urls import (
        politeness_schedule,
    )

    urls = [
        (i, f"http://site{i % 3}.com/p{i}") for i in range(30)
    ] + [(100, "http://WWW.Site0.com:80/z")]
    df = spark.createDataFrame(urls, "id long, url string")
    out = politeness_schedule(
        df, gap_slots=8, slot_ms=100,
        order_by=[F.asc("id")],
    ).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert set(by_dom) == {"site0.com", "site1.com", "site2.com"}
    for dom, rows in by_dom.items():
        rows.sort(key=lambda r: r["domain_seq"])
        offs = rows[0]["slot"] % 8
        for k, r in enumerate(rows):
            assert r["domain_seq"] == k
            assert r["slot"] == offs + k * 8, (dom, k)
            assert r["fetch_at_ms"] == r["slot"] * 100
    # deterministic rerun
    again = politeness_schedule(
        df, gap_slots=8, slot_ms=100, order_by=[F.asc("id")]
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_politeness_guards(spark):
    from graphragpart1datapipeline_spark.text.urls import (
        politeness_schedule,
    )

    df = spark.createDataFrame([(1, "http://a.com/")], "id long, url string")
    with pytest.raises(ValueError, match="gap_slots"):
        politeness_schedule(df, gap_slots=0)
    with pytest.raises(ValueError, match="slot_ms"):
        politeness_schedule(df, slot_ms=0)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer training (q260's machinery)
# ---------------------------------------------------------------------------


def test_unigram_learns_frequent_pieces(spark):
    """On a corpus built from 'ban'/'ana' material, training keeps
    'ana'/'ban' as high-count pieces and every char survives with
    cnt >= 1."""
    from graphragpart1datapipeline_spark.text.unigram import (
        unigram_train,
    )

    df = spark.createDataFrame(
        [(0, "banana bandana banana ana nab"), (1, "ban ana banana")],
        "doc_id long, text string",
    )
    out = {
        r["piece"]: (r["cnt"], r["ll"])
        for r in unigram_train(
            df, rounds=2, seed_multi=8, keep_multi=6, max_word_len=8
        ).collect()
    }
    assert out["ana"][0] >= 5 and out["ban"][0] >= 4
    for ch in "abdn":
        assert ch in out and out[ch][0] >= 1
    # log-probs are negative micro-nats and consistent with counts
    assert out["ana"][1] > out["a"][1]


def test_unigram_viterbi_prefers_longest_on_tie(spark):
    """Two pieces with EQUAL log-prob covering the same word: the
    backpointer rule (min predecessor) must pick the single longest
    piece over two shorter ones when scores tie exactly."""
    from graphragpart1datapipeline_spark.text.unigram import (
        unigram_viterbi_counts,
    )

    words = spark.createDataFrame([("abab", 1)], "w string, wc long")
    pieces = spark.createDataFrame(
        [("abab", -100), ("ab", -50), ("a", -1000), ("b", -1000)],
        "piece string, ll long",
    )
    # ab+ab scores -100, abab scores -100: exact tie; min-j at the
    # final position prefers j=0 -> the single 4-char piece
    got = {
        r["piece"]: r["cnt"]
        for r in unigram_viterbi_counts(words, pieces).collect()
    }
    assert got == {"abab": 1}


def test_unigram_long_word_raises(spark):
    from graphragpart1datapipeline_spark.text.unigram import (
        unigram_words,
    )

    df = spark.createDataFrame(
        [(0, "short superduperlongword")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="max_word_len"):
        unigram_words(df, max_word_len=8).collect()


def test_unigram_rounds_guard(spark):
    from graphragpart1datapipeline_spark.text.unigram import unigram_train

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="rounds"):
        unigram_train(df, rounds=0)
