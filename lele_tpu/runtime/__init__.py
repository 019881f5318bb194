from .artifact import load_pytree, save_pytree  # noqa: F401
from .cache import enable_cache  # noqa: F401
from .decode import StaticKVDecoder  # noqa: F401
from .engine import CompiledModel  # noqa: F401
from .seq2seq import Seq2SeqGenerator  # noqa: F401
