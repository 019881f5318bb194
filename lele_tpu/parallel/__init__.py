"""Multi-chip scaling: mesh construction + sharding rules.

No reference counterpart (SURVEY.md §2.6: lele's parallelism is SIMD within
one core). On TPU this layer IS the communication backend: shardings are
declared with `jax.sharding.NamedSharding` over a device Mesh and XLA
inserts the ICI collectives (all-gather / reduce-scatter / psum).
"""

from .mesh import make_mesh, mesh_axes  # noqa: F401
from .planner import (  # noqa: F401
    EncoderSpec,
    plan_encoder,
    plan_mesh,
    recommend_plan,
    recommend_serving_plan,
)
from .sharding import (  # noqa: F401
    batch_sharding,
    replicate,
    shard_params,
    sensevoice_param_rules,
)
