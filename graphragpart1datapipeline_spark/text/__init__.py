from .analysis import (  # noqa: F401
    STOPWORDS,
    document_fingerprint,
    fulltext_search,
    language_id,
    quality_score,
    token_count,
    tokens,
)
from .chunking import recursive_split_chunks  # noqa: F401
from .sections import split_sections  # noqa: F401
