from .relational import (  # noqa: F401
    apply_scd2,
    length_bucketed_batches,
    pit_join,
    scd2_as_of,
    equi_width_histogram,
    funnel_counts,
    global_shuffle_shards,
    negative_ring_sample,
    hash_split,
    rebalance_to_weights,
    pack_sequences,
    profile_table,
    snapshot_diff,
    stratified_sample,
    best_per_group,
    dedupe_by_priority,
    distinct_sorted,
    duplicate_row_count,
    null_counts,
    positioned_rollup,
    top_n_frequency,
    top_n_per_group,
    union_relaxed,
)
from .asof import asof_join  # noqa: F401
from .sketches import (  # noqa: F401
    kmv_distinct,
    kmv_estimate_from_sketch,
    kmv_hash,
    kmv_merge_sketches,
    kmv_sketch,
)
from .joins import (  # noqa: F401
    detect_hot_keys,
    hot_key_table,
    interval_lookup_join,
    multi_hop,
    name_or_alias_join,
    range_join,
    salted_join,
    adaptive_join,
    salted_join_auto,
)
from .reshape import cube_agg, pivot_agg, skyline2d, unpivot_long  # noqa: F401
from .sketches import heavy_hitters  # noqa: F401
from .timeseries import cumulative_distinct, ewma, resample_locf, rolling_time_agg  # noqa: F401
