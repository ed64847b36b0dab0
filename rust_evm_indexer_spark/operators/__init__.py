from .logs import GetLogsFilter, LogsPage, get_logs, run_get_logs  # noqa: F401
