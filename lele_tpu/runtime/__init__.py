from .engine import CompiledModel  # noqa: F401
