from .cache import enable_persistent_compile_cache  # noqa: F401
from .logging import Logging  # noqa: F401
