from . import evm  # noqa: F401
