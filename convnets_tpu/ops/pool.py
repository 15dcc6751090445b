"""Pooling ops, NHWC.

Covers the reference's maxpool2d / avgpool2d / adapt_avgpool2d builders
(reference basemodel.py:1017-1042). Semantics match torch defaults:
MaxPool2d pads with -inf; AvgPool2d uses count_include_pad=True.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from convnets_tpu.core.shapes import to_pair


def max_pool2d(x: jax.Array, kernel, stride=None, padding=0):
    kh, kw = to_pair(kernel)
    if stride is None:
        stride = kernel
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)
    # init must be a Python scalar so JAX recognizes the max monoid and uses
    # the transposable reduce_window_max primitive (autodiff under jit).
    neg_inf = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        init_value=neg_inf,
        computation=lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def avg_pool2d(x: jax.Array, kernel, stride=None, padding=0):
    """Average pool with count_include_pad=True (torch AvgPool2d default)."""
    kh, kw = to_pair(kernel)
    if stride is None:
        stride = kernel
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        init_value=0.0,
        computation=lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    return (summed * np.float32(1.0 / (kh * kw))).astype(x.dtype)


def global_avg_pool2d(x: jax.Array, keepdims: bool = False):
    """Adaptive average pool to (1, 1) — reference adapt_avgpool2d
    (basemodel.py:1035-1042) is only ever used with output (1, 1)."""
    return jnp.mean(x.astype(jnp.float32), axis=(-3, -2), keepdims=keepdims).astype(x.dtype)


def adaptive_avg_pool2d(x: jax.Array, output_size):
    """General adaptive average pooling, torch semantics (for completeness)."""
    oh, ow = to_pair(output_size)
    n, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x
    if h % oh == 0 and w % ow == 0:
        return avg_pool2d(x, (h // oh, w // ow), stride=(h // oh, w // ow))
    # torch-style uneven bins: bin i covers [floor(i*H/oh), ceil((i+1)*H/oh))
    xf = x.astype(jnp.float32)
    rows = [
        jnp.mean(xf[:, (i * h) // oh : -(-(i + 1) * h // oh), :, :], axis=1, keepdims=True)
        for i in range(oh)
    ]
    xr = jnp.concatenate(rows, axis=1)
    cols = [
        jnp.mean(xr[:, :, (j * w) // ow : -(-(j + 1) * w // ow), :], axis=2, keepdims=True)
        for j in range(ow)
    ]
    return jnp.concatenate(cols, axis=2).astype(x.dtype)
