from . import (  # noqa: F401
    dedup,
    evm_analytics,
    joins,
    lookups,
    multimodal,
    similarity,
    skew,
    temporal,
    textops,
)
from .logs import GetLogsFilter, LogsPage, get_logs, run_get_logs  # noqa: F401
