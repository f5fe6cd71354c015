from .io import (  # noqa: F401
    compact_parquet,
    read_csv,
    read_orc,
    write_csv,
    write_orc,
    read_events_stream,
    read_jsonl,
    read_parquet,
    read_table,
    read_testdata,
    write_bucketed,
    write_jsonl_sparse,
    write_parquet,
)
from .cache import fetch_with_cache  # noqa: F401
from .paginated import paginated_source  # noqa: F401
from .retry import retry_call, with_retries  # noqa: F401
from .sinks import foreach_batched, stream_foreach_batched  # noqa: F401
