from .table_store import MaintenancePolicy, TableStore  # noqa: F401
