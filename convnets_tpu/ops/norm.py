"""Batch normalization, NHWC, torch-parity semantics.

Matches torch.nn.BatchNorm2d (the reference's only norm, used in every model,
e.g. reference basemodel.py:999-1015): eps=1e-5, momentum=0.1 where
new_running = (1 - momentum) * running + momentum * batch_stat, with the
*unbiased* batch variance stored in running_var but the *biased* variance
used for normalization.

Statistics are always computed in float32 regardless of compute dtype.
Under pjit/GSPMD the mean/var reductions over the (globally sharded) batch
axis are lowered to ICI collectives automatically — i.e. sync batch norm
across the data-parallel mesh for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_norm_inference(x, running_mean, running_var, scale, bias, *, eps=1e-5):
    """Normalize with running statistics (eval mode)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
    w = inv if scale is None else scale.astype(jnp.float32) * inv
    out = (xf - running_mean.astype(jnp.float32)) * w
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def batch_norm_train(x, running_mean, running_var, scale, bias, *, eps=1e-5, momentum=0.1):
    """Normalize with batch statistics; return (y, new_running_mean, new_running_var).

    Reduction axes are (N, H, W) — per-channel stats.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    axes = tuple(range(xf.ndim - 1))
    n = 1
    for a in axes:
        n *= xf.shape[a]
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)  # biased
    var = jnp.maximum(var, 0.0)

    inv = jax.lax.rsqrt(var + eps)
    w = inv if scale is None else scale.astype(jnp.float32) * inv
    out = (xf - mean) * w
    if bias is not None:
        out = out + bias.astype(jnp.float32)

    # torch stores the unbiased variance in running_var
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1.0 - momentum) * running_mean.astype(jnp.float32) + momentum * mean
    new_var = (1.0 - momentum) * running_var.astype(jnp.float32) + momentum * unbiased
    return out.astype(dtype), new_mean, new_var
