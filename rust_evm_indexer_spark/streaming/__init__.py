from .changefeed_stream import ChangefeedStream  # noqa: F401
from .dedup import stream_dedup_exact  # noqa: F401
from .ingest_stream import IngestStream  # noqa: F401
from .joins import (  # noqa: F401
    start_interval_join_stream,
    stream_interval_join,
)
from .windows import (  # noqa: F401
    session_windows_native,
    sessionize,
    sliding_window_stats,
    streaming_hourly_counts,
    tumbling_window_stats,
)
