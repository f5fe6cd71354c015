"""Video copy detection — the third modality's near-dup pass,
composed ENTIRELY from machinery the engine already trusts: the Arrow
decode seam (multimodal/assets.py::decode_payloads — one decode per
clip, the 100 TB cost), the perceptual per-frame dHash
(assets.py::dhash_expr — horizontal gradients survive re-encode /
resize / brightness shift), and the Shazam-style offset-histogram
matcher (audio.py::audio_match_pairs — frame-agnostic over any
(id, idx, fingerprint) table): a time-shifted or re-encoded copy
shares a RUN of frame hashes at ONE dominant offset, which byte-level
hashing can never see.

Spark shape:

- DECODE (the seam): ``decode_video_frames`` — Arrow mapInPandas,
  ``decoder(bytes) -> list[grids]`` with each keyframe a row-major
  rows×cols grayscale grid (a real deployment injects an
  ffmpeg/PyAV keyframe sampler + grayscale resize; the container
  ships none, so the stub raises and ``fake_decode_video`` is the
  deterministic stand-in). Runs ONCE per clip, map-only.
- FINGERPRINT: row-local — posexplode the frame list, dHash each
  grid to a 56-bit long inside whole-stage codegen. Zero shuffle.
- MATCH: the exact-hash pigeonhole self-join + (a, b, offset)-keyed
  count from the audio family, with the same too-common-hash
  suppression as the skew guard (a black/static frame appearing in
  > ``max_df`` clips is dropped BEFORE the join).

Determinism / oracle parity (q248): dHash is pure integer
comparisons, the offset count is exact — every stage replays in SQL
(the per-bit CASE chain is generated, never hand-copied).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .assets import decode_payloads, dhash_expr
from .audio import audio_match_pairs

__all__ = [
    "fake_decode_video",
    "decode_video_frames",
    "video_frame_hashes",
    "video_near_dup_pairs",
]

VIDEO_FRAMES_SCHEMA = (
    "asset_id string, kind string, byte_len long, content_hash string, "
    "frames array<array<double>>"
)


def fake_decode_video(
    payload: bytes, n_frames: int = 12, rows: int = 8, cols: int = 8
) -> list[list[float]]:
    """Deterministic fake 'video decoder': ``n_frames`` keyframe grids
    (row-major rows×cols, values in [0,1]) from the sha256 keystream
    of the payload — exercises the full Arrow path with stable goldens
    (the fake_decode_stats / fake_decode_frames pattern)."""
    out = []
    raw = payload or b""
    need = n_frames * rows * cols
    stream = b""
    i = 0
    while len(stream) < need:
        stream += hashlib.sha256(raw + bytes([i])).digest()
        i += 1
    for f in range(n_frames):
        base = f * rows * cols
        out.append([stream[base + j] / 255.0 for j in range(rows * cols)])
    return out


def decode_video_frames(
    df: DataFrame,
    decoder: Callable[[bytes], list[list[float]]] | None = None,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Binary payloads → per-clip keyframe tables via Arrow-batched
    mapInPandas: (id, kind, byte_len, content_hash, frames) with
    ``frames`` an array of row-major grayscale grids.

    STUB: raises NotImplementedError when no decoder is supplied (no
    video codecs in this container); inject an ffmpeg/PyAV-backed
    keyframe sampler with the identical signature, or
    ``fake_decode_video`` in tests. The Arrow mechanics are the ONE
    seam shared with the image and audio families."""
    return decode_payloads(
        df, decoder, VIDEO_FRAMES_SCHEMA, "frames",
        id_col, payload_col, kind_col,
        "no video codec available in this environment; inject a "
        "decoder (e.g. ffmpeg/PyAV keyframes + grayscale resize) or "
        "use fake_decode_video",
    )


def video_frame_hashes(
    df: DataFrame,
    frames_col: str = "frames",
    id_col: str = "asset_id",
    rows: int = 8,
    cols: int = 8,
) -> DataFrame:
    """(id, idx, fph) — one perceptual dHash per keyframe (idx = the
    0-based frame index; fph = the rows×(cols−1)-bit integer hash).
    One posexplode + a codegen'd comparison chain; a clip with no
    frames produces no rows. A grid of the wrong shape RAISES through
    dhash_expr's size gate (a silent near-zero hash would degenerate
    the match join to all-pairs)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(frames_col)).alias("idx", "__g"),
    ).select(
        id_col,
        F.col("idx").cast("long").alias("idx"),
        dhash_expr("__g", rows, cols).alias("fph"),
    )


def video_near_dup_pairs(
    assets: DataFrame,
    decoder: Callable[[bytes], list[list[float]]] | None = None,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    rows: int = 8,
    cols: int = 8,
    min_matches: int = 5,
    max_df: int = 16,
) -> DataFrame:
    """Full composition: decode (the seam — runs once per clip) →
    per-keyframe dHash (row-local) → offset-histogram match (the
    audio family's matcher, frame-agnostic). Returns
    (a, b, offset, n_matches) — a true copy shows ONE dominant offset
    with a long run of matching keyframes.

    The hash frame is localCheckpoint'ed before matching: the matcher
    consumes it three times (the too-common-hash rollup plus both
    sides of the self-join), and without the materialization the
    Arrow decode — the dominant cost at 100 TB — would re-execute
    once per consumer."""
    frames = decode_video_frames(
        assets, decoder=decoder, id_col=id_col,
        payload_col=payload_col, kind_col=kind_col,
    )
    fph = video_frame_hashes(
        frames, "frames", id_col, rows, cols
    ).localCheckpoint(eager=True)
    return audio_match_pairs(
        fph, id_col, min_matches=min_matches, max_df=max_df
    )
