from .artifact import load_pytree, save_pytree  # noqa: F401
from .cache import enable_cache  # noqa: F401
from .engine import CompiledModel  # noqa: F401
