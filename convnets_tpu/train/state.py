"""TrainState — the single serializable pytree holding everything the
reference keeps in four mutable objects (model params / optimizer /
lr_scheduler / grad_scaler, reference basemodel.py:880-889), so resume is a
pure round-trip through one checkpoint.

The learning rate is a device scalar *inside* the state: the plateau
scheduler (host-side) writes a new value between epochs without triggering
recompilation of the jitted train step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from convnets_tpu.train import optim


class TrainState(NamedTuple):
    params: Any        # model parameters pytree
    model_state: Any   # BN running stats pytree
    opt_state: Any     # AdamState | SGDState
    lr: jax.Array      # f32 scalar, dynamic
    loss_scale: jax.Array  # f32 scalar (parity shim; 1.0 on TPU bf16)


def create_train_state(variables: dict, setting, optimizer: str = "adam") -> TrainState:
    params = variables["params"]
    if optimizer == "adam":
        opt_state = optim.adam_init(params)
    elif optimizer == "sgd":
        opt_state = optim.sgd_init(params)
    else:
        raise ValueError(f"unknown optimizer '{optimizer}'")
    return TrainState(
        params=params,
        model_state=variables["state"],
        opt_state=opt_state,
        lr=jnp.asarray(setting.learning_rate, jnp.float32),
        loss_scale=jnp.ones((), jnp.float32),
    )


def variables_of(state: TrainState) -> dict:
    return {"params": state.params, "state": state.model_state}


def merge_state(old: Any, updates: Any) -> Any:
    """Merge partial state updates (only layers that changed) into the full
    model-state tree. Containers only emit entries for stateful children, so
    the update tree is a sub-tree of `old`."""
    if not updates:
        return old
    if isinstance(old, dict):
        merged = dict(old)
        for k, v in updates.items():
            merged[k] = merge_state(old.get(k), v) if isinstance(v, dict) else v
        return merged
    return updates


def replicate_scalar(x) -> jax.Array:
    return jnp.asarray(x, jnp.float32)
