from .search import (  # noqa: F401
    IvfDriftError,
    cosine_expr,
    cosine_topk,
    dot_expr,
    hash_embed,
    hyperplane_bucket,
    ivf_assignments,
    ivf_build_index,
    ivf_centroids,
    ivf_compact,
    ivf_rebuild_on_drift,
    ivf_topk,
    ivf_upsert,
    knn_join,
    knn_join_blocked,
    l2_norm_expr,
    lsh_topk,
)
from .kmeans import centroids_df, kmeans_fit  # noqa: F401
from .pq import (  # noqa: F401
    ivfpq_residual_topk,
    ivfpq_topk,
    l2sq_expr,
    pq_adc_topk,
    pq_build_index,
    pq_codebook,
    pq_delete,
    pq_encode,
    pq_query,
    pq_residuals,
    pq_train,
    pq_upsert,
)
from .metrics import mean_retrieval_metrics, retrieval_metrics  # noqa: F401
from .squant import sq8_dequant_expr, sq8_encode, sq8_stats, sq8_topk  # noqa: F401
