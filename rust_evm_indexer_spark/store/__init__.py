from .table_store import TableStore  # noqa: F401
