"""Model weight checkpoints (Orbax).

Reference parity note: the reference never wrote weights (static external
.caffemodel files; SURVEY.md §5.4); stage outputs (protos on disk) remain the
pipeline's checkpoint/resume mechanism. This module covers the added training
capability: params/TrainState persistence via orbax-checkpoint.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def save_train_state(path: str, state) -> None:
    """Persist a full TrainState (params + optimizer slots + step) for resume."""
    save_params(path, {"params": state.params, "opt_state": state.opt_state,
                       "step": state.step})


def load_train_state(path: str, template):
    """Restore a TrainState saved by save_train_state (template = fresh state)."""
    restored = load_params(
        path,
        template={
            "params": template.params,
            "opt_state": template.opt_state,
            "step": template.step,
        },
    )
    return type(template)(restored["params"], restored["opt_state"], restored["step"])


def load_params(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            target = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
            )
            return ckptr.restore(path, target)
        return ckptr.restore(path)
