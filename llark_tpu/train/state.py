"""Train state: params + optimizer state + step, as a plain pytree."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class TrainState:
    """Immutable (params, opt_state, step) container."""

    def __init__(self, params: Dict[str, Any], opt_state: Any, step: jnp.ndarray):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    @classmethod
    def create(cls, params, optimizer, partition=None) -> "TrainState":
        """With a ParamPartition, optimizer state covers only the trainable
        leaves (QLoRA / adapter stages: no state for the frozen backbone)."""
        target = partition.trainable(params) if partition is not None else params
        return cls(params, optimizer.init(target), jnp.zeros((), jnp.int32))

    def replace(self, **kw) -> "TrainState":
        return TrainState(
            kw.get("params", self.params),
            kw.get("opt_state", self.opt_state),
            kw.get("step", self.step),
        )

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
