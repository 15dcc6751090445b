"""Static shape math.

The reference tracks the "current" activation shape statefully while layers
are declared (/root/reference/src/basemodel.py:725-816). Here shape inference
is pure: every layer exposes `out_shape(in_shape)` built on these formulas,
so classifier fan-in and concat channel bookkeeping are computed analytically
with no dry-run forward pass. Shapes are NHWC throughout (TPU-native layout).
"""

from __future__ import annotations

from typing import Sequence, Tuple


def to_pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        if len(v) != 2:
            raise ValueError(f"expected pair, got {v}")
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def conv_out_size(size: int, kernel: int, stride: int, padding: int, dilation: int = 1) -> int:
    """floor((H + 2p - d(k-1) - 1)/s) + 1 — the standard conv output formula
    (matches reference basemodel.py:770-771). Raises on non-positive output:
    a spatial dim collapsing to zero (input too small for the architecture's
    downsampling depth, e.g. DenseNet-121 below 32×32) would otherwise NaN
    deep inside the first empty reduction."""
    out = (size + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1
    if out < 1:
        raise ValueError(
            f"conv/pool output size {out} < 1 (input {size}, kernel {kernel}, "
            f"stride {stride}, padding {padding}): input too small for this "
            f"network's downsampling depth"
        )
    return out


def conv2d_out_shape(
    in_shape: Sequence[int],
    out_channels: int,
    kernel,
    stride=1,
    padding=0,
    dilation=1,
) -> Tuple[int, ...]:
    """NHWC conv output shape. in_shape = (N, H, W, C) or (H, W, C)."""
    kh, kw = to_pair(kernel)
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)
    dh, dw = to_pair(dilation)
    *lead, h, w, _ = in_shape
    return (*lead, conv_out_size(h, kh, sh, ph, dh), conv_out_size(w, kw, sw, pw, dw), out_channels)


def pool2d_out_shape(in_shape, kernel, stride=None, padding=0) -> Tuple[int, ...]:
    kh, kw = to_pair(kernel)
    if stride is None:
        stride = kernel
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)
    *lead, h, w, c = in_shape
    return (*lead, conv_out_size(h, kh, sh, ph), conv_out_size(w, kw, sw, pw), c)


def num_flat_features(in_shape) -> int:
    """Fan-in of a classifier following flatten (reference basemodel.py:812)."""
    n = 1
    for d in in_shape[-3:]:
        n *= int(d)
    return n
