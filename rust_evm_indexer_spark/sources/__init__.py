from .batch import load_driver_table, load_driver_tables, load_evm_tables, register_views  # noqa: F401
from .rpc_http import HttpRpcClient, RpcError  # noqa: F401
