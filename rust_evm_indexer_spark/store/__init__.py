from .manifest_io import (  # noqa: F401
    InMemoryObjectStoreIO,
    LocalManifestIO,
    ManifestIO,
)
from .table_store import MaintenancePolicy, TableStore  # noqa: F401
