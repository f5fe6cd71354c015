"""Optional adapters to the reference's real tokenizer and encoder.

The engine's seams are dependency-free by design: chunking takes any
``token_len: Callable[[str], int]`` (text/chunking.py) and embeddings
are plain ``array<float>`` columns any pandas_udf can fill
(vector/search.py hash_embed is the deterministic stand-in). The
reference binds those seams to HuggingFace tokenizers for chunk budgets
(data_transformation_helpers.py:161-183, model name in
settings.py:126-127) and sentence-transformers for encoding
(chroma_helpers.py:36-81). These adapters reproduce that binding when
the libraries are installed, and raise a clear ImportError when not —
the container this engine is developed in does not ship them, so the
adapter tests importorskip.

Executor-side loading: both adapters lazy-load the model INSIDE the
task (per-worker singleton), never on the driver — a 1000-executor
cluster must not serialize a tokenizer/model into every task closure.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_WORKER_SINGLETONS: dict = {}


def hf_token_len(model_name: str = "nomic-ai/nomic-embed-text-v1.5") -> Callable[[str], int]:
    """A ``token_len`` for :func:`~..text.chunking.recursive_split_chunks`
    counting REAL tokenizer tokens (reference chunk budgets,
    data_transformation_helpers.py:161-183). The tokenizer loads once
    per worker process on first call; the returned closure is picklable
    (it captures only the model name).
    """
    try:
        import transformers  # noqa: F401
    except ImportError:
        raise ImportError(
            "hf_token_len requires the 'transformers' package; install it "
            "or keep the default whitespace/BPE-ish approximation"
        ) from None

    def token_len(text: str) -> int:
        key = ("tokenizer", model_name)
        tok = _WORKER_SINGLETONS.get(key)
        if tok is None:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(model_name)
            _WORKER_SINGLETONS[key] = tok
        return len(tok.encode(text, add_special_tokens=False))

    return token_len


def sentence_transformer_encode(
    col: Column | str,
    model_name: str = "nomic-ai/nomic-embed-text-v1.5",
    batch_size: int = 64,
) -> Column:
    """Arrow-batched pandas_udf encoding a text column to
    ``array<float>`` with sentence-transformers (reference encoder,
    chroma_helpers.py:36-81) — drops into the same column type as
    ``hash_embed``, so every downstream vector operator (cosine_topk,
    ivf_*, knn_join*, embedding near-dup) works unchanged.

    The model loads once per worker (iterator-of-series UDF), encodes
    in ``batch_size`` chunks, and never leaves the executor.
    """
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        raise ImportError(
            "sentence_transformer_encode requires 'sentence-transformers'; "
            "install it or use hash_embed as the deterministic stand-in"
        ) from None

    @pandas_udf("array<float>")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from sentence_transformers import SentenceTransformer

        key = ("encoder", model_name)
        model = _WORKER_SINGLETONS.get(key)
        if model is None:
            model = SentenceTransformer(model_name, trust_remote_code=True)
            _WORKER_SINGLETONS[key] = model
        for s in batches:
            vecs = model.encode(
                s.fillna("").tolist(),
                batch_size=batch_size,
                show_progress_bar=False,
            )
            yield pd.Series([list(map(float, v)) for v in vecs])

    c = F.col(col) if isinstance(col, str) else col
    return encode(c)
