"""Audio copy detection — the Shazam/audfprint shape (Wang 2003, "An
Industrial-Strength Audio Search Algorithm"): fingerprint short frame
windows, exact-match fingerprints across clips, and let a consistent
TIME-OFFSET histogram separate true copies (one dominant offset with
many matches) from chance collisions (scattered offsets). This is how
every production audio-dedup/copyright pipeline works: time-shifted,
re-encoded, or clipped copies share a run of frame fingerprints at one
alignment, which byte-level hashing (content_hash) can never see.

Spark shape:

- DECODE (the seam): ``decode_audio_frames`` — Arrow mapInPandas,
  ``decoder(bytes) -> list[frames]`` with each frame a fixed-width
  band-energy vector (a real deployment injects an ffmpeg/librosa
  mel-band decoder; the container ships none, so the stub raises and
  ``fake_decode_frames`` is the deterministic stand-in). Runs ONCE per
  clip, map-only — at 100 TB the decode is the cost and everything
  after is integers.
- FINGERPRINT: row-local — each window of ``shingle`` consecutive
  frames quantizes (half-up to ``quant`` cells, absorbing codec
  jitter) and hashes to a 60-bit long. Zero shuffle.
- MATCH: exact equi-join on the fingerprint (sub-quadratic pigeonhole
  — only clips sharing an identical quantized window ever pair), with
  the audfprint "too-common hash" suppression (a silence/standard-tone
  window appearing in > ``max_df`` clips is dropped BEFORE the
  self-join — the skew guard), then one (a, b, offset)-keyed count:
  the offset histogram. ``n_matches`` at one offset ≈ the length of
  the shared run.

Determinism / oracle parity (q242): quantization is the engine-wide
half-up integer rule, the hash is the md5→hex→long idiom, counts are
exact — every stage replays in SQL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fake_decode_frames",
    "decode_audio_frames",
    "frame_shingle_fingerprints",
    "audio_match_pairs",
    "audio_near_dup_pairs",
]

FRAMES_SCHEMA = (
    "asset_id string, kind string, byte_len long, content_hash string, "
    "frames array<array<double>>"
)


def fake_decode_frames(
    payload: bytes, n_frames: int = 16, bands: int = 4
) -> list[list[float]]:
    """Deterministic fake 'audio decoder': n_frames × bands band
    energies derived from the sha256 keystream of the payload —
    exercises the full Arrow path with stable goldens (the
    fake_decode_stats pattern)."""
    out = []
    raw = payload or b""
    stream = b""
    i = 0
    while len(stream) < n_frames * bands:
        stream += hashlib.sha256(raw + bytes([i])).digest()
        i += 1
    for f in range(n_frames):
        out.append(
            [stream[f * bands + b] / 255.0 for b in range(bands)]
        )
    return out


def decode_audio_frames(
    df: DataFrame,
    decoder: Callable[[bytes], list[list[float]]] | None = None,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Binary payloads → per-clip frame tables via Arrow-batched
    mapInPandas: (id, kind, byte_len, content_hash, frames) with
    ``frames`` an array of fixed-width band-energy vectors.

    STUB: raises NotImplementedError when no decoder is supplied (no
    audio libs in this container); inject an ffmpeg/librosa-backed
    decoder with the identical signature, or ``fake_decode_frames``
    in tests. The Arrow mechanics are :func:`..multimodal.assets
    .decode_payloads` — ONE seam shared with the image family."""
    from .assets import decode_payloads

    return decode_payloads(
        df, decoder, FRAMES_SCHEMA, "frames",
        id_col, payload_col, kind_col,
        "no audio codec available in this environment; inject a "
        "decoder (e.g. ffmpeg/librosa mel bands) or use "
        "fake_decode_frames",
    )


def _shingle_hash(frames: Column, start, shingle: int, quant: float) -> Column:
    """60-bit fingerprint of ``shingle`` consecutive frames starting at
    0-based ``start``: band energies half-up quantized to longs,
    space-joined, md5'd, first 15 hex chars as a long — the engine's
    portable-hash idiom, replayable in SQL."""
    window = F.flatten(F.slice(frames, start + 1, shingle))
    qs = F.concat_ws(
        " ",
        F.transform(
            window,
            lambda x: F.floor(x * quant + F.lit(0.5))
            .cast("long")
            .cast("string"),
        ),
    )
    return F.conv(F.substring(F.md5(qs), 1, 15), 16, 10).cast("long")


def frame_shingle_fingerprints(
    df: DataFrame,
    frames_col: str = "frames",
    id_col: str = "asset_id",
    shingle: int = 3,
    quant: float = 2.0,
) -> DataFrame:
    """(id, idx, fph) — one fingerprint per window of ``shingle``
    consecutive frames (idx = 0-based window start). Row-local until
    the explode; clips with fewer than ``shingle`` frames produce no
    rows (nothing to match on). ``quant`` is the quantization density:
    cells of width 1/quant absorb codec jitter; larger = stricter."""
    if shingle < 1:
        raise ValueError(
            f"frame_shingle_fingerprints: shingle must be >= 1, "
            f"got {shingle}"
        )
    if quant <= 0:
        raise ValueError(
            f"frame_shingle_fingerprints: quant must be > 0, got {quant}"
        )
    frames = F.col(frames_col)
    n = F.size(frames)
    empty = F.slice(F.sequence(F.lit(0), F.lit(0)), 1, 0)
    starts = F.when(n >= shingle, F.sequence(F.lit(0), n - shingle)).otherwise(
        empty
    )
    shingled = F.transform(
        starts,
        lambda s: F.struct(
            s.cast("long").alias("idx"),
            _shingle_hash(frames, s, shingle, quant).alias("fph"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(shingled).alias("__s"))
        .select(id_col, F.col("__s.idx").alias("idx"), F.col("__s.fph").alias("fph"))
    )


def audio_match_pairs(
    fps: DataFrame,
    id_col: str = "asset_id",
    min_matches: int = 5,
    max_df: int = 16,
) -> DataFrame:
    """The offset-histogram match: exact self-join on the fingerprint
    (only identical quantized windows ever pair — sub-quadratic by
    construction), one (a, b, offset)-keyed count, keep alignments
    with ≥ ``min_matches`` shared windows. Returns
    (a, b, offset, n_matches) — offset is b's window index minus a's
    (a time-shifted copy shows ONE dominant offset).

    ``max_df``: fingerprints present in more than this many distinct
    clips (silence, test tones) are dropped BEFORE the join — the
    audfprint common-hash suppression, and the skew guard that stops
    one hot hash from going quadratic."""
    if min_matches < 1 or max_df < 1:
        raise ValueError(
            f"audio_match_pairs: need min_matches >= 1, max_df >= 1; "
            f"got {min_matches}, {max_df}"
        )
    dfreq = fps.groupBy("fph").agg(
        F.countDistinct(id_col).alias("__nids")
    )
    kept = fps.join(
        dfreq.filter(F.col("__nids") <= max_df).select("fph"), "fph"
    )
    a = kept.select(
        F.col(id_col).alias("a"), F.col("idx").alias("__ai"), "fph"
    )
    b = kept.select(
        F.col(id_col).alias("b"), F.col("idx").alias("__bi"), "fph"
    )
    return (
        a.join(b, "fph")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", (F.col("__bi") - F.col("__ai")).alias("offset"))
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .filter(F.col("n_matches") >= min_matches)
    )


def audio_near_dup_pairs(
    assets: DataFrame,
    decoder: Callable[[bytes], list[list[float]]] | None = None,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    shingle: int = 3,
    quant: float = 2.0,
    min_matches: int = 5,
    max_df: int = 16,
) -> DataFrame:
    """Full composition: decode (the seam — runs once per clip) →
    shingle fingerprints (row-local) → offset-histogram match.
    Returns (a, b, offset, n_matches).

    The fingerprint frame is localCheckpoint'ed before matching:
    ``audio_match_pairs`` consumes it three times (the too-common-hash
    rollup plus both sides of the self-join), and without the
    materialization the Arrow decode — the dominant cost at 100 TB —
    would re-execute once per consumer."""
    frames = decode_audio_frames(
        assets, decoder=decoder, id_col=id_col,
        payload_col=payload_col, kind_col=kind_col,
    )
    fps = frame_shingle_fingerprints(
        frames, "frames", id_col, shingle, quant
    ).localCheckpoint(eager=True)
    return audio_match_pairs(fps, id_col, min_matches, max_df)
