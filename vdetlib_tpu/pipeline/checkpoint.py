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
