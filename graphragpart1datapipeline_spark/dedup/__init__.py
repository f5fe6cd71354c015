from .exact import (  # noqa: F401
    dedup_keep_best,
    exact_dedup,
    exact_dup_groups,
)
from .minhash import (  # noqa: F401
    minhash_signatures,
    lsh_bucket_table,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_lsh_incremental,
    shingles,
)
from .simhash import (  # noqa: F401
    fingerprint_near_dup_pairs,
    simhash64,
    simhash_near_dup_pairs,
)
from .ngram import decontaminate, ngram_jaccard_pairs  # noqa: F401
from .embedding import embedding_near_dup_pairs  # noqa: F401
from .passages import (  # noqa: F401
    remove_repeated_passages,
    repeated_passage_spans,
)
from .splits import leakage_safe_split  # noqa: F401
from .entity import (  # noqa: F401
    containment_join,
    global_rank,
    set_similarity_join,
    sorted_neighborhood_pairs,
)
from .splits import weighted_poisson_sample  # noqa: F401
from .semantic import semdedup  # noqa: F401
from .editdist import levenshtein_self_join  # noqa: F401
from .incremental import (  # noqa: F401
    embedding_lsh_delete,
    embedding_lsh_index,
    embedding_lsh_upsert,
    embedding_near_dup_incremental,
    set_similarity_delete,
    containment_index,
    containment_join_incremental,
    levenshtein_index,
    levenshtein_join_incremental,
    set_similarity_index,
    set_similarity_join_incremental,
)
