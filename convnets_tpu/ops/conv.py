"""2-D convolutions (standard / grouped / depthwise), NHWC, TPU-native.

Covers the reference's conv surface: arbitrary kernel/stride/padding/dilation
(reference basemodel.py:966-997), grouped conv with cardinality 32
(resnext.py:93) and groups 1..8 (shufflenet_v1.py:119-141), and depthwise conv
(basemodel.py:981-997, groups == in_channels).

Layout decisions (TPU-first):
  * activations NHWC — channels on the 128-lane minor dimension, the layout
    XLA:TPU tiles onto the MXU without transposes;
  * weights HWIO with I = in_channels // groups (feature_group_count);
  * dtype policy: fp32 inputs request fp32 accumulation explicitly
    (preferred_element_type + Precision.HIGHEST for torch parity);
    bf16 inputs (the hot path) run bf16-in/bf16-out — the MXU still
    accumulates fp32 internally, and matching operand/output dtypes keeps
    the conv transpose (backward) well-typed.

Semantics are cross-correlation, matching torch.nn.Conv2d.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from convnets_tpu.core.shapes import to_pair

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride=1,
    padding=0,
    dilation=1,
    groups: int = 1,
    accum_dtype=jnp.float32,
):
    """General 2-D convolution.

    x: (N, H, W, C) — any float dtype (bf16 on the TPU hot path).
    w: (kh, kw, C // groups, O).
    b: (O,) or None.
    padding: int or (ph, pw) — symmetric, matching torch's Conv2d padding.
    accum_dtype: honored when it matches x.dtype (fp32 path); for bf16
    inputs the op is bf16-in/bf16-out (see module docstring).
    Returns (N, H', W', O) in x.dtype.
    """
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)
    dh, dw = to_pair(dilation)
    # fp32 inputs take the full-precision MXU path (3-pass bf16 decomposition)
    # for torch parity; bf16 inputs (the hot path) use the native single pass.
    # preferred_element_type must equal the operand dtype for bf16: the conv
    # transpose rule re-binds conv on (operand, cotangent) and a widened
    # cotangent dtype would mismatch — the MXU accumulates fp32 internally
    # regardless, so bf16-in/bf16-out loses nothing.
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    pet = accum_dtype if x.dtype == accum_dtype else None
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=pet,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv2d_depthwise(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride=1,
    padding=0,
    dilation=1,
    accum_dtype=jnp.float32,
):
    """Depthwise conv: one filter per input channel (groups == C).

    w: (kh, kw, 1, C·multiplier). Equivalent to the reference's
    conv2d_depthwise (basemodel.py:981-997, groups=in_channels).
    """
    c = x.shape[-1]
    return conv2d(
        x, w, b, stride=stride, padding=padding, dilation=dilation,
        groups=c, accum_dtype=accum_dtype,
    )


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *, accum_dtype=jnp.float32):
    """Dense layer. x: (..., in), w: (in, out), b: (out,)."""
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    pet = accum_dtype if x.dtype == accum_dtype else None
    out = jnp.dot(x, w.astype(x.dtype), precision=precision, preferred_element_type=pet)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)
