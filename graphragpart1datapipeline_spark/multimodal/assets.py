"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (schemas.MEDIA_ASSETS).

The Spark-side mechanics — schema, Arrow batch shape, mapInPandas
signatures, partitioning by asset kind — are real and tested. The
actual codec calls are STUBBED (image/audio libraries are not in this
container): ``decode_image_features`` raises NotImplementedError unless
given a decoder, and ``fake_decode_stats`` is the deterministic stand-in
used by tests. A real deployment injects e.g. a PIL/ffmpeg-backed
decoder with the identical signature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "asset_id string, kind string, byte_len long, content_hash string, "
    "feature array<float>"
)


def fake_decode_stats(payload: bytes) -> list[float]:
    """Deterministic fake 'feature extractor': 8 floats derived from the
    sha256 of the payload. Exercises the full Arrow path with stable
    goldens."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def fake_decode_gray8x8(payload: bytes) -> list[float]:
    """Deterministic grid 'decoder' for the binary-WARC → image chain
    (q255): the first 64 payload bytes ARE the 8×8 grayscale thumbnail
    (one byte per cell) scaled to [0, 1] — exactly the shape
    :func:`pillow_decoder` emits, so the dhash/near-dup machinery
    downstream is identical. Raises on a short payload: a truncated
    image must fail loudly, not fingerprint as near-black (the
    dhash_expr raise-on-wrong-size rule, one stage earlier)."""
    if payload is None or len(payload) < 64:
        raise ValueError(
            "fake_decode_gray8x8: payload must carry >= 64 grid bytes, "
            f"got {0 if payload is None else len(payload)}"
        )
    return [b / 255.0 for b in payload[:64]]


def decode_payloads(
    df: DataFrame,
    decoder: Callable,
    schema: str,
    out_col: str,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    missing_msg: str = "no media codec available in this environment",
) -> DataFrame:
    """THE Arrow decode seam, shared by every media family (image
    features, audio frames): binary payloads → per-asset rows via
    Arrow-batched mapInPandas, each row carrying (id, kind, byte_len,
    sha256 content_hash, ``out_col`` = decoder(raw)). One
    implementation: a fix to the batch shaping / null-payload handling
    / hash choice must reach every modality at once."""
    if decoder is None:
        raise NotImplementedError(missing_msg)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(
                pdf[id_col], pdf[kind_col], pdf[payload_col]
            ):
                raw = bytes(payload) if payload is not None else b""
                rows.append(
                    (
                        aid,
                        kind,
                        len(raw),
                        hashlib.sha256(raw).hexdigest(),
                        decoder(raw),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, kind_col, "byte_len", "content_hash", out_col],
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(
        gen, schema=schema
    )


def decode_image_features(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Binary payloads → per-asset feature rows via Arrow-batched
    mapInPandas (:func:`decode_payloads`). ``decoder`` maps raw bytes
    to a feature vector; real image decode (resize / pixel stats)
    plugs in here.

    STUB: raises NotImplementedError when no decoder is supplied —
    the container has no image/audio libs; use ``fake_decode_stats``
    in tests.
    """
    return decode_payloads(
        df, decoder, FEATURE_SCHEMA, "feature",
        id_col, payload_col, kind_col,
        "no media codec available in this environment; "
        "inject a decoder (e.g. PIL-based) or use fake_decode_stats",
    )


def pillow_decoder(
    resize: tuple[int, int] = (8, 8)
) -> Callable[[bytes], list[float]]:
    """Pillow-backed real decoder for :func:`decode_image_features`,
    mirroring the HF adapters in text/adapters.py: importable only when
    Pillow is installed (clear ImportError otherwise — this container
    does not ship it, so the adapter test importorskips).

    Feature = the ``resize`` grayscale thumbnail, row-major, scaled to
    [0, 1] — the standard perceptual-hash precursor (64 floats at 8×8),
    enough for near-dup image bucketing via the same LSH/cosine ops the
    text embeddings use. The closure captures only ``resize``, so it is
    picklable and cheap to ship to executors; PIL imports lazily inside
    the task."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        raise ImportError(
            "pillow_decoder requires the 'Pillow' package; install it or "
            "inject another decoder / use fake_decode_stats"
        ) from None

    def decode(raw: bytes) -> list[float]:
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(raw)).convert("L").resize(resize)
        return [p / 255.0 for p in im.getdata()]

    return decode


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
    id_col: str = "asset_id",
) -> DataFrame:
    """Video frame-sampling plan: one row per (asset, frame_ts_ms) —
    pure sequence/explode, no codec needed. The decode of each sampled
    frame is then a decode_image_features pass."""
    from pyspark.sql import functions as F

    return df.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col(duration_col), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def dhash_expr(grid_col, rows: int = 8, cols: int = 8):
    """Difference-hash (dHash — the standard perceptual image hash) of
    a row-major ``rows``×``cols`` grayscale grid column: bit
    ``r·(cols−1)+c`` is set iff ``grid[r][c] < grid[r][c+1]`` —
    horizontal gradients survive resizing, re-encoding, and brightness
    shifts, which is exactly what byte-level hashing (content_hash)
    cannot. Pure integer/comparison column expression: whole-stage
    codegen, zero shuffle, bit-for-bit replayable in SQL. The grid is
    :func:`pillow_decoder`'s feature output (grayscale thumbnail) or
    any array column of the right length."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    nbits = rows * (cols - 1)
    if nbits < 1 or nbits > 63:
        raise ValueError(
            f"dhash_expr: rows*(cols-1) must be in [1, 63] to pack into "
            f"a signed long, got {nbits}"
        )
    g = (
        grid_col if isinstance(grid_col, Column) else F.col(grid_col)
    ).cast("array<double>")
    out = F.lit(0).cast("long")
    k = 0
    for r in range(rows):
        for c in range(cols - 1):
            i = r * cols + c
            out = out + F.when(
                F.element_at(g, i + 1) < F.element_at(g, i + 2),
                F.lit(1 << k).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            k += 1
    # a grid shorter than rows×cols must RAISE, not fingerprint:
    # element_at past the end is NULL, NULL<NULL is NULL, and the
    # silent result is a near-zero hash shared by every image — the
    # banded join then degenerates to ~all-pairs of false near-dups
    # (e.g. an 8-float stats decoder fed to the default 8×8 grid)
    return F.when(F.size(g) == rows * cols, out).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"dhash_expr: expected a {rows}x{cols} grid "
                    f"({rows * cols} elements), got "
                ),
                F.size(g).cast("string"),
                F.lit(" — the decoder's grid shape must match rows/cols"),
            )
        ).cast("long")
    )


def image_near_dup_pairs(
    assets: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    rows: int = 8,
    cols: int = 8,
) -> DataFrame:
    """LAION-style perceptual image dedup: decode every payload to a
    grayscale thumbnail grid (the Arrow mapInPandas seam — inject
    :func:`pillow_decoder` in a real deployment), dHash it, and find
    near-dup pairs with the banded hamming pigeonhole join
    (dedup/simhash.py machinery — only images sharing a full identical
    hash band ever pair, never all-pairs). Returns (a, b, hamming).

    At 100 TB the decode is the cost: it runs ONCE per image
    (map-only), everything after is 8-byte fingerprints. ``rows``/
    ``cols`` must match the decoder's grid shape."""
    from ..dedup.simhash import fingerprint_near_dup_pairs

    feats = decode_image_features(
        assets, decoder=decoder, id_col=id_col,
        payload_col=payload_col, kind_col=kind_col,
    )
    fp = feats.select(
        id_col, dhash_expr("feature", rows, cols).alias("fp")
    )
    return fingerprint_near_dup_pairs(
        fp, id_col=id_col, fp_col="fp",
        max_hamming=max_hamming, bands=bands, bits=rows * (cols - 1),
    )
