from . import evm  # noqa: F401
from . import timeutil  # noqa: F401
from .timeutil import ts_micros  # noqa: F401
