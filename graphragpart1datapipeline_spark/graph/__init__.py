from .build import build_graph_tables, validate_edges  # noqa: F401
from .pagerank import pagerank, personalized_pagerank  # noqa: F401
from .communities import (  # noqa: F401
    community_rollup,
    community_size_stats,
    connected_components,
    detect_communities,
    label_propagation_communities,
    leiden_communities,
    louvain_communities,
    modularity,
)
from .linkpred import link_prediction_scores  # noqa: F401
from .triangles import cooccurrence_edges, triangle_counts  # noqa: F401
from .truss import edge_support, ktruss  # noqa: F401
