"""On-device fused augmentation + normalization.

The reference runs RandomCrop(32, pad=4) → RandomHorizontalFlip(0.5) →
RandomAffine(±15°, shear 15, scale 0.75-1.25) → ToTensor → Normalize in 16
CPU worker processes per batch element (reference mngrdata.py:139-165).
TPU-native redesign: all four geometric transforms compose into ONE affine
matrix per image, applied as a single vectorized bilinear resample of the
whole batch on device, fused by XLA with the normalize step — no host
preprocessing beyond decode, no per-image Python.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from convnets_tpu.data.datasets import CINIC_MEAN, CINIC_STD


def normalize(x, mean=CINIC_MEAN, std=CINIC_STD):
    """(x - mean) / std per channel; x in [0,1] NHWC."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def _affine_matrices(key, n, *, degrees, shear_deg, scale_range, crop_pad, hflip_p, h, w):
    """Per-image inverse 2x3 affine matrices (output→input coords)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    angle = jax.random.uniform(k1, (n,), minval=-degrees, maxval=degrees) * (math.pi / 180)
    shear = jax.random.uniform(k2, (n,), minval=-shear_deg, maxval=shear_deg) * (math.pi / 180)
    scale = jax.random.uniform(k3, (n,), minval=scale_range[0], maxval=scale_range[1])
    # crop translation: uniform integer in [-pad, pad]
    tx = jax.random.randint(k4, (n,), -crop_pad, crop_pad + 1).astype(jnp.float32)
    ty = jax.random.randint(k5, (n,), -crop_pad, crop_pad + 1).astype(jnp.float32)
    flip = jax.random.bernoulli(k6, hflip_p, (n,)).astype(jnp.float32) * -2.0 + 1.0

    cos, sin = jnp.cos(angle), jnp.sin(angle)
    tan = jnp.tan(shear)
    inv_s = 1.0 / scale
    # inverse of R(angle)·Shear(x)·S(scale), then flip on x, translation last
    a = inv_s * (cos + sin * tan) * flip
    b = inv_s * (sin * 0 + (-sin + cos * tan)) * 1.0
    c = inv_s * sin * flip
    d = inv_s * cos
    # matrices act about the image center
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    return a, b, c, d, tx, ty, cy, cx


@partial(jax.jit, static_argnames=("degrees", "shear_deg", "scale_range",
                                   "crop_pad", "hflip_p", "do_affine"))
def augment_batch(key, x, *, degrees=15.0, shear_deg=15.0, scale_range=(0.75, 1.25),
                  crop_pad=4, hflip_p=0.5, do_affine=True):
    """Fused random crop(pad) + hflip + affine via one bilinear resample.

    x: (N, H, W, C) float in [0,1]. Returns same shape/dtype.
    """
    n, h, w, c = x.shape
    if not do_affine:
        degrees = 0.0
        shear_deg = 0.0
        scale_range = (1.0, 1.0)
    a, b, cc, d, tx, ty, cy, cx = _affine_matrices(
        key, n, degrees=degrees, shear_deg=shear_deg, scale_range=scale_range,
        crop_pad=crop_pad, hflip_p=hflip_p, h=h, w=w,
    )

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yo = yy[None] - cy
    xo = xx[None] - cx
    # source coordinates (output→input map), crop translation applied in input space
    xs = a[:, None, None] * xo + b[:, None, None] * yo + cx + tx[:, None, None]
    ys = cc[:, None, None] * xo + d[:, None, None] * yo + cy + ty[:, None, None]

    # bilinear sample with zero fill outside
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        batch_idx = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 0)
        vals = x[batch_idx, yi_c, xi_c]  # (N,H,W,C)
        return vals * inside[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None].astype(x.dtype)
    fy = fy[..., None].astype(x.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
