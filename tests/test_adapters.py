"""Real tokenizer/encoder adapters — skipped where the optional
dependencies are absent (this container ships neither; the adapters
must then raise a clear ImportError rather than degrade silently)."""

import pytest

from graphragpart1datapipeline_spark.text.adapters import (
    hf_token_len,
    sentence_transformer_encode,
)


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has("transformers"), reason="transformers installed")
def test_hf_token_len_raises_without_transformers():
    with pytest.raises(ImportError, match="transformers"):
        hf_token_len()


@pytest.mark.skipif(
    _has("sentence_transformers"), reason="sentence-transformers installed"
)
def test_encoder_raises_without_sentence_transformers():
    with pytest.raises(ImportError, match="sentence-transformers"):
        sentence_transformer_encode("text")


def test_hf_token_len_counts_real_tokens():
    pytest.importorskip("transformers")
    token_len = hf_token_len()
    assert token_len("hello world") >= 2
    assert token_len("") == 0


def test_encoder_fills_embedding_column(spark):
    pytest.importorskip("sentence_transformers")
    df = spark.createDataFrame([("hello world",)], "text string").select(
        sentence_transformer_encode("text").alias("embedding")
    )
    row = df.head()
    assert isinstance(row["embedding"], list)
    assert len(row["embedding"]) > 0


def test_chunking_accepts_injected_token_len(spark):
    # the seam itself, with a fake "real" tokenizer: chunk budgets are
    # enforced in injected-token units, not the default approximation
    from graphragpart1datapipeline_spark.text.chunking import (
        recursive_split_chunks,
    )

    docs = spark.createDataFrame(
        [("d1", "aaaa bbbb cccc dddd eeee ffff gggg hhhh")],
        "doc_id string, text string",
    )
    out = recursive_split_chunks(
        docs,
        id_col="doc_id",
        chunk_tokens=2,
        overlap_tokens=0,
        token_len=lambda t: len(t.split()),
    ).collect()
    assert len(out) >= 4
    for r in out:
        assert len(r["chunk"].split()) <= 2
