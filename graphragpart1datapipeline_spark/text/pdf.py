"""PDF text extraction — the #2 content type of any real crawl after
HTML (Common Crawl's non-HTML text bytes are mostly PDF). Follows the
established media decode-seam pattern (multimodal/assets.py): the
Spark-side plumbing — Arrow batch shape, schema, hashing, null
handling — is real and shared with every other codec via
``decode_payloads``; the actual PDF parser is INJECTED (this container
ships no PDF library), with

* :func:`pypdf_decoder` — the import-gated real adapter (clear
  ImportError when pypdf is absent, the text/adapters.py rule),
* :func:`fake_decode_pdf_text` — the deterministic stand-in tests and
  the q256 oracle replay use: payloads in the trivial fake container
  ``%PDF-FAKE\\n<utf-8 text>`` decode to their text; anything without
  the ``%PDF`` magic raises loudly (a non-PDF byte stream must never
  silently yield '').

At 100 TB the decode is the cost and it is map-only (one Arrow pass
per payload, zero shuffle); everything downstream is the ordinary
text-curation chain (quality, lang-id, dedup) the engine already
runs on HTML-extracted text.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..multimodal.assets import decode_payloads

__all__ = [
    "PDF_TEXT_SCHEMA",
    "FAKE_PDF_MAGIC",
    "decode_pdf_text",
    "fake_decode_pdf_text",
    "pypdf_decoder",
]

PDF_TEXT_SCHEMA = (
    "asset_id string, kind string, byte_len long, content_hash string, "
    "text string"
)

# the fake container's magic line — kept to the REAL PDF magic's first
# bytes so magic-sniffing code paths treat fixtures like real PDFs
FAKE_PDF_MAGIC = "%PDF-FAKE\n"


def fake_decode_pdf_text(raw: bytes) -> str:
    """Deterministic test/oracle stand-in for a PDF text extractor:
    the payload must be the fake container (``%PDF-FAKE\\n`` + utf-8
    text) and decodes to exactly that text. Raises on anything else —
    a corrupt or non-PDF payload must fail loudly, never become an
    empty document that silently passes curation."""
    magic = FAKE_PDF_MAGIC.encode()
    if raw is None or not raw.startswith(magic):
        raise ValueError(
            "fake_decode_pdf_text: payload does not start with "
            f"{FAKE_PDF_MAGIC!r} — not a fake-PDF fixture"
        )
    return raw[len(magic):].decode("utf-8")


def decode_pdf_text(
    df: DataFrame,
    decoder: Callable[[bytes], str] | None = None,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Binary PDF payloads → (asset_id, kind, byte_len, sha256
    content_hash, text) via the shared Arrow decode seam
    (:func:`~..multimodal.assets.decode_payloads` — one
    implementation of batch shaping / hashing for every codec).

    STUB: raises NotImplementedError when no decoder is supplied —
    the container has no PDF library; inject :func:`pypdf_decoder`
    in a real deployment or use :func:`fake_decode_pdf_text` in
    tests/oracle fixtures."""
    return decode_payloads(
        df, decoder, PDF_TEXT_SCHEMA, "text",
        id_col, payload_col, kind_col,
        "no PDF text extractor available in this environment; "
        "inject a decoder (e.g. pypdf_decoder()) or use "
        "fake_decode_pdf_text",
    )


def pypdf_decoder() -> Callable[[bytes], str]:
    """pypdf-backed real extractor for :func:`decode_pdf_text`,
    mirroring pillow_decoder: importable only when pypdf is installed
    (clear ImportError otherwise — this container does not ship it,
    so the adapter test importorskips). Pages are concatenated with
    a newline, the standard pdftotext-style layout-free extraction.
    The closure captures nothing, so it is picklable; pypdf imports
    lazily inside the task."""
    try:
        import pypdf  # noqa: F401
    except ImportError:
        raise ImportError(
            "pypdf_decoder requires the 'pypdf' package; install it or "
            "inject another decoder / use fake_decode_pdf_text"
        ) from None

    def decode(raw: bytes) -> str:
        import io

        from pypdf import PdfReader

        reader = PdfReader(io.BytesIO(raw))
        return "\n".join(page.extract_text() or "" for page in reader.pages)

    return decode
