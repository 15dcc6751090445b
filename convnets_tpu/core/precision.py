"""Mixed-precision policy for TPU.

Replaces the reference's `amp.autocast()` + `GradScaler` pair
(/root/reference/src/basemodel.py:58-83, :250-270) with an explicit dtype
policy. On TPU the mixed-compute dtype is bfloat16, which has the same
exponent range as float32 and therefore needs **no loss scaling**; a loss-scale
shim is kept so the `Settings.mixed_precision` field round-trips through
checkpoints with the same observable semantics (scale==1.0 is a no-op).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through every layer.

    param_dtype:   dtype parameters are stored in (always fp32 here).
    compute_dtype: dtype activations/weights are cast to for compute.
    accum_dtype:   accumulation dtype for MXU contractions
                   (`preferred_element_type`).
    norm_dtype:    dtype batch-norm statistics are computed in.
    output_dtype:  dtype of the network output (logits) — fp32 so the loss
                   and softmax are always full precision.
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    accum_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, x):
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if isinstance(a, jax.Array) or hasattr(a, "astype")
            else a,
            x,
        )

    def cast_to_param(self, x):
        return jax.tree.map(lambda a: a.astype(self.param_dtype), x)

    def cast_to_output(self, x):
        return jax.tree.map(lambda a: a.astype(self.output_dtype), x)


DEFAULT_POLICY = Policy()
MIXED_POLICY = Policy(compute_dtype=jnp.bfloat16)


def policy_from_setting(setting) -> Policy:
    """Map the reference's `mixed_precision` flag onto a TPU dtype policy."""
    return MIXED_POLICY if getattr(setting, "mixed_precision", False) else DEFAULT_POLICY


@dataclasses.dataclass
class LossScale:
    """Loss-scale shim for API parity with the reference GradScaler.

    On TPU with bfloat16 compute no scaling is needed (scale stays 1.0), but
    the object is serialized into checkpoints so resumed runs keep identical
    state, mirroring /root/reference/src/basemodel.py:886-889.
    """

    scale: float = 1.0

    def scale_loss(self, loss):
        return loss * self.scale

    def unscale_grads(self, grads):
        if self.scale == 1.0:
            return grads
        inv = 1.0 / self.scale
        return jax.tree.map(lambda g: g * inv, grads)

    def to_state(self):
        return {"scale": self.scale}

    @classmethod
    def from_state(cls, state):
        return cls(scale=float(state["scale"]))
