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
    ivfpq_topk,
    l2sq_expr,
    pq_adc_topk,
    pq_encode,
    pq_train,
)
