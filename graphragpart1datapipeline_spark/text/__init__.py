from .analysis import (  # noqa: F401
    PII_PATTERNS,
    STOPWORDS,
    document_fingerprint,
    fulltext_search,
    language_id,
    pii_counts,
    pii_redact,
    quality_score,
    remove_boilerplate_spans,
    repetition_signals,
    tfidf_top_terms,
    token_count,
    tokens,
    winnow_copy_spans,
    winnow_fingerprints,
)
from .bm25_index import (  # noqa: F401
    bm25_delete,
    bm25_index,
    bm25_query,
    bm25_upsert,
)
from .bpe import bpe_apply, bpe_train  # noqa: F401
from .chunking import (  # noqa: F401
    fixed_stride_chunks,
    recursive_split_chunks,
    stitch_context,
)
from .contamination import (  # noqa: F401
    contamination_report,
    decontaminate_by_fraction,
    ngram_hash_set,
)
from .classify import (  # noqa: F401
    nb_classify,
    nb_classify_expr,
    nb_score,
    nb_train,
    stream_quality_gate,
)
from .lm import bigram_lm_score, bigram_lm_train, ccnet_buckets  # noqa: F401
from .dsir import dsir_select, dsir_weights, hashed_ngram_features  # noqa: F401
from .sections import split_sections  # noqa: F401
from .summarize import sentence_table, textrank_summary  # noqa: F401
from .llm import (  # noqa: F401
    build_summary_prompt,
    echo_summarizer,
    extractive_generator,
    generate_with,
)
from .html import html_to_text, html_to_text_sql  # noqa: F401
from .urls import (  # noqa: F401
    canonical_url,
    canonical_url_sql,
    domain_cap,
    url_domain,
    url_domain_sql,
    url_frontier_gate,
    url_key,
    url_seen_bloom,
)
from .warc import warc_record_text, warc_records  # noqa: F401
