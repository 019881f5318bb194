"""Compose multiple compiled ONNX models into ONE device program.

The reference chains its multi-model pipelines (Supertonic: 4 generated
programs) through host copies every step (`.data.to_vec()`,
examples/supertonic/src/main.rs:240; SURVEY.md §3.4). Here the sub-models'
traced walk functions inline into a single jit — intermediate tensors never
leave HBM, and loops over sub-models (flow-matching steps) become
`lax.fori_loop` in the composed program.

Usage:
    pipe = compose_models(
        {"enc": cm_enc, "dec": cm_dec},
        lambda call, x: call("dec", h=call("enc", x=x)[0])[0],
    )
    out = pipe(x)                       # one dispatch
"""

from __future__ import annotations

from typing import Callable

from .engine import CompiledModel


def compose_models(models: dict[str, CompiledModel], pipeline: Callable):
    """pipeline(call, *args, **kwargs) -> pytree; `call(name, **inputs)`
    runs sub-model `name` and returns its output list. Returns a jitted
    function with all sub-model params baked as one bundle."""
    import jax

    params_bundle = {name: cm.params for name, cm in models.items()}

    def run(bundle, args, kwargs):
        def call(name: str, **inputs):
            cm = models[name]
            missing = [n for n in cm.input_order if n not in inputs]
            if missing:
                raise ValueError(f"sub-model {name!r} missing inputs {missing}")
            return cm._walk_fn(bundle[name], inputs)

        return pipeline(call, *args, **kwargs)

    jitted = jax.jit(lambda bundle, args, kwargs: run(bundle, args, kwargs))

    def fn(*args, **kwargs):
        return jitted(params_bundle, args, kwargs)

    fn.params_bundle = params_bundle
    return fn
