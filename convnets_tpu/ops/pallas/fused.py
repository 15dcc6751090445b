"""Fused train-mode conv + BatchNorm + ReLU (the cuDNN conv2d_block slot).

The reference's conv2d_block gets conv→BN→ReLU fusion from cuDNN
(reference basemodel.py:999-1015). Unfused on TPU, train-mode BN costs a
full extra HBM read of the conv output just to compute batch statistics
(measured ~24 ms of a 100 ms ResNet-50/ImageNet step). Here the statistics
ride the conv kernel's fp32 accumulator for free (ops/pallas/conv.py
conv2d_stats), and normalize+ReLU is one XLA-fused elementwise pass.

Backward is a hand-written VJP: ReLU mask and x̂ are recomputed from the
saved conv output (one resident tensor instead of conv-out + block-out),
the two per-channel reductions run in fp32, and the conv cotangents go
through XLA's transposed convolutions (MXU-optimal already).

Grouped convs (ResNeXt cardinality 32) take the same path via
block-diagonal weight expansion (ops/pallas/conv.py block_diag_weight);
their dw cotangent comes back through XLA's grouped transpose, so the
dense blocks never exist in the gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from convnets_tpu.ops.norm import _apply_norm
from convnets_tpu.ops.pallas.conv import (
    block_diag_weight, conv2d_stats,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def conv_bn_relu_train(x, w, scale, bias, stride=1, padding=0, groups=1,
                       eps=1e-5, relu=True, interpret=False):
    """Fused conv→BN(batch stats)→[ReLU] forward.

    x: (N,H,W,Cin); w: (kh,kw,Cin/groups,Cout) HWIO; scale/bias: (Cout,).
    Returns (out, mean, var): out in x.dtype, mean/biased-var fp32 (Cout,)
    for the caller's running-stat update (torch momentum semantics live in
    the BatchNorm2d layer, ops/norm.py batch_norm_train).
    """
    out, mean, var, _ = _fused_fwd_impl(x, w, scale, bias, stride, padding,
                                        groups, eps, relu, interpret)
    return out, mean, var


def _fused_fwd_impl(x, w, scale, bias, stride, padding, groups, eps, relu,
                    interpret):
    wd = w if groups == 1 else block_diag_weight(w, groups)
    y, s1, s2 = conv2d_stats(x, wd.astype(x.dtype), stride=stride,
                             padding=padding, interpret=interpret)
    n = y.shape[0] * y.shape[1] * y.shape[2]
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    z = _apply_norm(y, mean, inv, scale, bias).astype(y.dtype)
    out = jnp.maximum(z, 0.0) if relu else z
    return out, mean, var, (y, inv)


def _fused_fwd(x, w, scale, bias, stride, padding, groups, eps, relu,
               interpret):
    out, mean, var, (y, inv) = _fused_fwd_impl(
        x, w, scale, bias, stride, padding, groups, eps, relu, interpret)
    return (out, mean, var), (x, w, scale, bias, y, mean, inv)


def _fused_bwd(stride, padding, groups, eps, relu, interpret, res, cts):
    from convnets_tpu.ops.conv import conv2d as lax_conv2d

    x, w, scale, bias, y, mean, inv = res
    g, _dmean, _dvar = cts  # running-stat outputs carry zero cotangent
    cd = y.dtype
    n = y.shape[0] * y.shape[1] * y.shape[2]
    axes = (0, 1, 2)

    xhat = (y - mean.astype(cd)) * inv.astype(cd)
    if relu:
        # recompute z through the SAME _apply_norm path the forward used:
        # the bf16 fold has different last-ulp rounding than
        # xhat·scale+bias, and a mask flipped at z≈0 would route gradient
        # inconsistently with the forward activation
        z = _apply_norm(y, mean, inv, scale, bias).astype(cd)
        dz = jnp.where(z > 0, g, jnp.zeros_like(g)).astype(cd)
    else:
        dz = g.astype(cd)

    dzf = dz.astype(jnp.float32)
    sum_dz = jnp.sum(dzf, axis=axes)
    sum_dz_xhat = jnp.sum(dzf * xhat.astype(jnp.float32), axis=axes)

    gam = scale.astype(jnp.float32) * inv
    dy = (gam.astype(cd) * (dz
                            - (sum_dz / n).astype(cd)
                            - xhat * (sum_dz_xhat / n).astype(cd))).astype(cd)

    _, vjp = jax.vjp(
        lambda x_, w_: lax_conv2d(x_, w_, stride=stride, padding=padding,
                                  groups=groups), x, w)
    dx, dw = vjp(dy)
    return dx, dw, sum_dz_xhat.astype(scale.dtype), sum_dz.astype(bias.dtype)


conv_bn_relu_train.defvjp(_fused_fwd, _fused_bwd)
