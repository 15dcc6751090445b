"""Pallas TPU conv kernels — the framework's cuDNN-analogue layer
(SURVEY.md §2.2: the reference delegates conv/BN/pool to cuDNN binaries;
here the same architectural slot is a from-scratch Mosaic kernel library).

Design (TPU-first, not a CUDA translation):

* Implicit-GEMM convolution: for every kernel tap (kh, kw) the input
  window is a (batch·OH·OW, Cin) matrix and the tap's weights are a
  (Cin, Cout) matrix — K·K matmuls accumulated in an fp32 VMEM scratch,
  all riding the 128×128 MXU. No im2col materialization in HBM.
* Grid over batch tiles; each program keeps its full (padded) input tile
  in VMEM — sized for the 32×32-class imagery this framework targets
  (CINIC-10/CIFAR), where a batch tile of 8 images at C≤512 is ≤4 MB.
* Optional fused epilogue: per-channel scale/shift (inference BatchNorm
  folded in) + ReLU — the conv2d_block fusion the reference gets from
  cuDNN+pointwise kernels (basemodel.py:999-1015).
* Backward runs through a custom_vjp whose cotangents are computed with
  XLA's transposed convolutions (already MXU-optimal); the Pallas win is
  the fused forward epilogue.

Constraints: stride ∈ {1, 2}, dilation 1, groups 1 (grouped/depthwise
have their own kernels), NHWC/HWIO. Out-of-envelope calls should be
routed to ops.conv2d by the caller (see ops/pallas/__init__.py:dispatch).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnets_tpu.core.shapes import to_pair


def _conv_kernel(x_ref, w_ref, scale_ref, shift_ref, out_ref, acc_ref,
                 *, kh, kw, sh, sw, oh, ow, relu, epilogue):
    """One batch-tile: accumulate K·K taps of implicit GEMM into fp32.

    x_ref:     (BT, IHp, IWp, Cin)  padded input tile in VMEM
    w_ref:     (kh·kw, Cin, Cout)   taps flattened on the leading axis
    scale_ref: (1, Cout) fp32       epilogue scale (BN folded) or ones
    shift_ref: (1, Cout) fp32       epilogue shift or zeros
    out_ref:   (BT, OH, OW, Cout)
    acc_ref:   (BT·OH·OW, Cout) fp32 scratch
    """
    bt = x_ref.shape[0]
    cin = x_ref.shape[3]
    cout = out_ref.shape[3]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    xv = x_ref[:]  # load once; taps below are register/VMEM slices
    for i in range(kh):
        for j in range(kw):
            # gather the strided window for tap (i, j): rows i..i+OH·sh
            win = lax.slice(
                xv,
                (0, i, j, 0),
                (bt, i + (oh - 1) * sh + 1, j + (ow - 1) * sw + 1, cin),
                (1, sh, sw, 1),
            )
            patches = win.reshape(bt * oh * ow, cin)
            acc_ref[:] += jnp.dot(
                patches, w_ref[i * kw + j],
                preferred_element_type=jnp.float32,
            )

    y = acc_ref[:]
    if epilogue:
        y = y * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(bt, oh, ow, cout).astype(out_ref.dtype)


def _pick_batch_tile(n: int, ihp: int, iwp: int, cin: int, cout: int,
                     oh: int, ow: int, itemsize: int) -> int:
    """Largest divisor of n whose VMEM working set stays under budget."""
    budget = 8 * 1024 * 1024  # half of VMEM, leave room for pipelining
    for bt in range(min(n, 64), 0, -1):
        if n % bt:
            continue
        use = (bt * ihp * iwp * cin * itemsize          # x tile
               + bt * oh * ow * cout * (itemsize + 4))  # out + fp32 acc
        if use <= budget:
            return bt
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("stride", "padding", "relu", "interpret"),
)
def conv2d_fused(
    x: jax.Array,
    w: jax.Array,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    *,
    stride=1,
    padding=0,
    relu: bool = False,
    interpret: bool = False,
):
    """Fused conv (+ scale/shift epilogue) (+ ReLU), forward-only building
    block. x: (N,H,W,Cin), w: (kh,kw,Cin,Cout); scale/shift: (Cout,) fp32
    — pass the BN-folded multiplier/offset for a conv→BN(inference)→ReLU
    block, or None for a plain conv."""
    n, ih, iw, cin = x.shape
    kh, kw, wc, cout = w.shape
    assert wc == cin, f"grouped conv not supported here ({wc} != {cin})"
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)

    oh = (ih + 2 * ph - kh) // sh + 1
    ow = (iw + 2 * pw - kw) // sw + 1

    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    ihp, iwp = x.shape[1], x.shape[2]
    # clip to the exact extent the taps read, so the strided window
    # slicing inside the kernel stays in bounds
    need_h = (oh - 1) * sh + kh
    need_w = (ow - 1) * sw + kw
    x = x[:, :need_h, :need_w, :]
    ihp, iwp = need_h, need_w

    epilogue = scale is not None or shift is not None
    ones = jnp.ones((1, cout), jnp.float32) if scale is None else scale.reshape(1, cout).astype(jnp.float32)
    zeros = jnp.zeros((1, cout), jnp.float32) if shift is None else shift.reshape(1, cout).astype(jnp.float32)

    wt = w.reshape(kh * kw, cin, cout).astype(x.dtype)

    bt = _pick_batch_tile(n, ihp, iwp, cin, cout, oh, ow, x.dtype.itemsize)
    grid = (n // bt,)

    kernel = functools.partial(
        _conv_kernel, kh=kh, kw=kw, sh=sh, sw=sw, oh=oh, ow=ow,
        relu=relu, epilogue=epilogue,
    )
    flops = 2 * n * oh * ow * cin * cout * kh * kw
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, ihp, iwp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt * oh * ow, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize + wt.size * wt.dtype.itemsize
            + n * oh * ow * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wt, ones, zeros)


def _dw_kernel(x_ref, w_ref, out_ref, *, kh, kw, sh, sw, oh, ow):
    """Depthwise conv batch-tile: pure VPU multiply-accumulate.

    x_ref: (BT, IHp, IWp, C); w_ref: (kh·kw, 1, C); out_ref: (BT, OH, OW, C).
    """
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    xv = x_ref[:]
    bt, c = xv.shape[0], xv.shape[3]
    for i in range(kh):
        for j in range(kw):
            win = lax.slice(
                xv,
                (0, i, j, 0),
                (bt, i + (oh - 1) * sh + 1, j + (ow - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            acc = acc + win.astype(jnp.float32) * w_ref[i * kw + j, 0].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("stride", "padding", "interpret")
)
def depthwise_conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride=1,
    padding=0,
    interpret: bool = False,
):
    """Depthwise conv: one filter per channel, multiplier 1
    (reference conv2d_depthwise, basemodel.py:981-997). Memory-bound, so
    it runs entirely on the VPU — no MXU underutilization from C 1-wide
    matmuls. x: (N,H,W,C), w: (kh,kw,1,C)."""
    n, ih, iw, c = x.shape
    kh, kw, one, wc = w.shape
    assert one == 1 and wc == c, f"depthwise expects (kh,kw,1,C), got {w.shape}"
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)
    oh = (ih + 2 * ph - kh) // sh + 1
    ow = (iw + 2 * pw - kw) // sw + 1

    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    need_h = (oh - 1) * sh + kh
    need_w = (ow - 1) * sw + kw
    x = x[:, :need_h, :need_w, :]

    wt = w.reshape(kh * kw, 1, c).astype(x.dtype)
    bt = _pick_batch_tile(n, need_h, need_w, c, c, oh, ow, x.dtype.itemsize)
    kernel = functools.partial(_dw_kernel, kh=kh, kw=kw, sh=sh, sw=sw,
                               oh=oh, ow=ow)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, need_h, need_w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, 1, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=interpret,
    )(x, wt)
