"""Pallas pooling kernels (max / avg), NHWC, VPU-resident.

Same batch-tile scheme as the conv kernels: each program holds its padded
input tile in VMEM and reduces K·K shifted windows elementwise — for the
32×32-class imagery this framework targets the whole reduction happens in
one VMEM residency, vs reduce_window's generic lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnets_tpu.core.shapes import to_pair
from convnets_tpu.ops.pallas.conv import (
    _pad_to_extent, _pick_batch_tile, _strided_window,
)


def _pool_kernel(x_ref, out_ref, *, kh, kw, sh, sw, oh, ow, mode, inv_area):
    xv = x_ref[:]

    def window(i, j):
        return _strided_window(xv, i, j, oh, ow, sh, sw)

    acc = window(0, 0).astype(jnp.float32) if mode == "avg" else window(0, 0)
    for i in range(kh):
        for j in range(kw):
            if i == 0 and j == 0:
                continue
            win = window(i, j)
            if mode == "max":
                acc = jnp.maximum(acc, win)
            else:
                acc = acc + win.astype(jnp.float32)
    if mode == "avg":
        acc = (acc * inv_area).astype(out_ref.dtype)
    out_ref[:] = acc.astype(out_ref.dtype)


def _pool(x, kernel, stride, padding, mode, interpret):
    n, ih, iw, c = x.shape
    kh, kw = to_pair(kernel)
    sh, sw = to_pair(stride if stride is not None else kernel)
    ph, pw = to_pair(padding)
    oh = (ih + 2 * ph - kh) // sh + 1
    ow = (iw + 2 * pw - kw) // sw + 1

    need_h = oh * sh + kh - 1
    need_w = ow * sw + kw - 1

    bt = _pick_batch_tile(n, need_h, need_w, c, c, oh, ow, x.dtype.itemsize, fudge=9.0)
    per_sample = (need_h * need_w * c * x.dtype.itemsize
                  + oh * ow * c * (x.dtype.itemsize + 4))
    if bt == 1 and per_sample * 9.0 > 12 * 1024 * 1024:
        # ImageNet-scale spatial extents: even one sample's window
        # temporaries blow the 16 MB scoped-VMEM stack (measured: RN50
        # 114×114×64 maxpool wants ~50 MB) — reduce_window is strong
        # exactly there, so fall back
        from convnets_tpu.ops import pool as lax_pool

        fn = lax_pool.max_pool2d if mode == "max" else lax_pool.avg_pool2d
        return fn(x, (kh, kw), (sh, sw), (ph, pw))

    pad_val = x.dtype.type(-jnp.inf) if mode == "max" else x.dtype.type(0)
    x = _pad_to_extent(x, ph, pw, need_h, need_w, value=pad_val)
    body = functools.partial(_pool_kernel, kh=kh, kw=kw, sh=sh, sw=sw,
                             oh=oh, ow=ow, mode=mode,
                             inv_area=1.0 / (kh * kw))
    return pl.pallas_call(
        body,
        grid=(n // bt,),
        in_specs=[pl.BlockSpec((bt, need_h, need_w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, oh, ow, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "padding", "interpret"))
def max_pool2d(x, kernel, stride=None, padding=0, *, interpret=False):
    """Max pool (torch MaxPool2d semantics; -inf padding)."""
    return _pool(x, kernel, stride, padding, "max", interpret)


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "padding", "interpret"))
def avg_pool2d(x, kernel, stride=None, padding=0, *, interpret=False):
    """Avg pool (torch AvgPool2d count_include_pad=True semantics)."""
    return _pool(x, kernel, stride, padding, "avg", interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def pool2d_train(x, mode, kernel, stride=None, padding=0, interpret=False):
    """Trainable Pallas pool: forward through the VPU kernel, backward via
    XLA's reduce_window VJP (max-routing / uniform spread — both already
    optimal lowerings), same split as conv2d_train."""
    return _pool(x, kernel, stride, padding, mode, interpret)


def _pool_train_fwd(x, mode, kernel, stride, padding, interpret):
    return pool2d_train(x, mode, kernel, stride, padding, interpret), x


def _pool_train_bwd(mode, kernel, stride, padding, interpret, x, g):
    from convnets_tpu.ops import pool as lax_pool

    fn = lax_pool.max_pool2d if mode == "max" else lax_pool.avg_pool2d
    _, vjp = jax.vjp(lambda x_: fn(x_, kernel, stride, padding), x)
    return vjp(g.astype(x.dtype))


pool2d_train.defvjp(_pool_train_fwd, _pool_train_bwd)
