"""Training checkpoint/resume (orbax).

The reference's checkpoint analog is its weights-blob artifact (SURVEY §5 —
inference-only). Since this stack also fine-tunes, training state
(params + optimizer moments + step) checkpoints with orbax and resumes
exactly; inference artifacts still use compiler/weights.py blobs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any


def save_train_state(path: str | Path, params: Any, opt_state: Any, step: int) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path / f"step_{step}",
        {"params": params, "opt_state": opt_state, "step": step},
        force=True,
    )
    ckptr.wait_until_finished()


def latest_step(path: str | Path) -> int | None:
    path = Path(path)
    steps = [
        int(p.name.split("_", 1)[1])
        for p in path.glob("step_*")
        if p.name.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_train_state(
    path: str | Path, params_like: Any, opt_state_like: Any, step: int | None = None
):
    """Restore (params, opt_state, step); `*_like` provide structure/shapes
    (e.g. freshly initialized state)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckptr = ocp.StandardCheckpointer()
    target = {"params": params_like, "opt_state": opt_state_like, "step": step}
    restored = ckptr.restore(path / f"step_{step}", target)
    return restored["params"], restored["opt_state"], int(restored["step"])
