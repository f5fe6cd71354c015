from .windows import (  # noqa: F401
    session_windows,
    sliding_window_agg,
    stream_interval_join,
    stream_tumbling_counts,
    tumbling_window_agg,
)
from .stateful import running_totals_by_key, stream_dedup_registry  # noqa: F401
from .maintenance import (  # noqa: F401
    init_maintenance_state,
    read_maintenance_state,
    stream_maintenance,
)
from .cdc import (  # noqa: F401
    init_cdc_state,
    prune_state_versions,
    read_cdc_state,
    stream_cdc_apply,
)
