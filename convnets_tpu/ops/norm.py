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

import functools

import jax
import jax.numpy as jnp


def _apply_norm(x, mean, inv, scale, bias):
    """y = (x - mean)·inv·scale + bias with dtype-aware arithmetic.

    fp32 inputs use the subtract-first form (torch's rounding).
    bf16 inputs fold the per-channel constants in fp32 and do ONE bf16
    multiply-add on the activation — the elementwise pass (and its
    backward) stays at bf16 HBM bandwidth instead of materializing fp32
    intermediates between conv fusions.
    """
    w = inv if scale is None else scale.astype(jnp.float32) * inv
    if x.dtype == jnp.float32:
        out = (x - mean) * w
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out
    shift = -mean * w
    if bias is not None:
        shift = shift + bias.astype(jnp.float32)
    return x * w.astype(x.dtype) + shift.astype(x.dtype)


def batch_norm_inference(x, running_mean, running_var, scale, bias, *, eps=1e-5):
    """Normalize with running statistics (eval mode)."""
    inv = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
    return _apply_norm(x, running_mean.astype(jnp.float32), inv, scale, bias).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_core(x, scale, bias, eps):
    """(y, mean, var) with batch statistics. Hand-written VJP: XLA's
    autodiff of the fp32-stats forward drags full-size fp32 intermediates
    through the backward; the textbook BN gradient
        dx = γ·inv · (dy − mean(dy) − x̂·mean(dy·x̂))
    needs only two per-channel fp32 reductions, all elementwise work
    staying in the compute dtype."""
    y, mean, var, _inv, _xhat = _bn_core_impl(x, scale, bias, eps)
    return y, mean, var


def _bn_core_impl(x, scale, bias, eps):
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = _apply_norm(x, mean, inv, scale, bias).astype(x.dtype)
    return y, mean, var, inv, None


def _bn_core_fwd(x, scale, bias, eps):
    y, mean, var, inv, _ = _bn_core_impl(x, scale, bias, eps)
    return (y, mean, var), (x, mean, inv, scale)


def _bn_core_bwd(eps, res, cts):
    x, mean, inv, scale = res
    dy, _dmean, _dvar = cts  # running-stat outputs carry zero cotangent
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]

    cd = x.dtype
    xhat = (x - mean.astype(cd)) * inv.astype(cd)          # recompute, bf16
    dyf = dy.astype(jnp.float32)
    sum_dy = jnp.sum(dyf, axis=axes)                       # fp32 reductions
    sum_dy_xhat = jnp.sum(dyf * xhat.astype(jnp.float32), axis=axes)

    g = scale.astype(jnp.float32) * inv
    dx = (g.astype(cd) * (dy
                          - (sum_dy / n).astype(cd)
                          - xhat * (sum_dy_xhat / n).astype(cd))).astype(cd)
    return dx, sum_dy_xhat.astype(scale.dtype), sum_dy.astype(scale.dtype)


_bn_core.defvjp(_bn_core_fwd, _bn_core_bwd)


def batch_stats(x):
    """Per-channel (mean, biased var) of x over (N, H, W) in float32.

    The shared-stats half of the fused DenseNet block (models/densenet.py
    DenseBlockFused): in a dense block every layer's BN re-reduces the SAME
    accumulated feature buffer, so per-(layer, block) statistics are
    per-block statistics computed L times — O(L²) full-buffer reductions
    that this factoring makes O(L)."""
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean), 0.0)
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bn_apply_stats(x, mean, var, scale, bias, eps=1e-5):
    """Train-mode batch norm with externally supplied BATCH statistics.

    `mean`/`var` MUST be the batch statistics of `x` itself (e.g. from
    batch_stats over the same content) — the hand-written VJP returns the
    textbook total-derivative BN gradient
        dx = γ·inv · (dy − mean(dy) − x̂·mean(dy·x̂))
    which already folds in the gradient path through the statistics, and
    therefore gives mean/var ZERO cotangent. With per-block stats shared
    across N consumer layers, each consumer contributes exactly the
    gradient its private BN would have produced in the standard (unshared)
    formulation — summed over consumers by the usual fanout — so the fused
    dense block is gradient-exact vs the reference composition
    (tests/test_densenet_fused.py)."""
    inv = jax.lax.rsqrt(var + eps)
    return _apply_norm(x, mean, inv, scale, bias).astype(x.dtype)


def _bn_apply_stats_fwd(x, mean, var, scale, bias, eps):
    inv = jax.lax.rsqrt(var + eps)
    y = _apply_norm(x, mean, inv, scale, bias).astype(x.dtype)
    return y, (x, mean, inv, scale)


def _bn_apply_stats_bwd(eps, res, dy):
    x, mean, inv, scale = res
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    cd = x.dtype
    xhat = (x - mean.astype(cd)) * inv.astype(cd)
    dyf = dy.astype(jnp.float32)
    sum_dy = jnp.sum(dyf, axis=axes)
    sum_dy_xhat = jnp.sum(dyf * xhat.astype(jnp.float32), axis=axes)
    g = scale.astype(jnp.float32) * inv
    dx = (g.astype(cd) * (dy
                          - (sum_dy / n).astype(cd)
                          - xhat * (sum_dy_xhat / n).astype(cd))).astype(cd)
    return (dx, jnp.zeros_like(mean), jnp.zeros_like(inv),
            sum_dy_xhat.astype(scale.dtype), sum_dy.astype(scale.dtype))


bn_apply_stats.defvjp(_bn_apply_stats_fwd, _bn_apply_stats_bwd)


def batch_norm_train(x, running_mean, running_var, scale, bias, *, eps=1e-5, momentum=0.1):
    """Normalize with batch statistics; return (y, new_running_mean, new_running_var).

    Reduction axes are (N, H, W) — per-channel stats.
    """
    n = 1
    for a in range(x.ndim - 1):
        n *= x.shape[a]
    # the custom VJP assumes affine params exist (every reference BN is
    # affine, basemodel.py:999-1015); substitute identity ones/zeros if not
    c = x.shape[-1]
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    out, mean, var = _bn_core(x, scale, bias, eps)

    # torch stores the unbiased variance in running_var
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1.0 - momentum) * running_mean.astype(jnp.float32) + momentum * mean
    new_var = (1.0 - momentum) * running_var.astype(jnp.float32) + momentum * unbiased
    return out, new_mean, new_var
