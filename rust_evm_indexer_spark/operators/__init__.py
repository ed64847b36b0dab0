from . import (  # noqa: F401
    dedup,
    evm_analytics,
    graph,
    joins,
    lookups,
    multimodal,
    similarity,
    sketch,
    skew,
    temporal,
    textops,
)
from .logs import (  # noqa: F401
    GetLogsFilter,
    LogsPage,
    get_logs,
    get_logs_from_store,
    run_get_logs,
    run_get_logs_from_store,
)
