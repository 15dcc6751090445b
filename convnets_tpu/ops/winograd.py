"""Winograd F(2,3)/F(4,3) convolution as pure-XLA batched einsums.

Transform-domain convolution for the 3x3 stride-1 dense convs — the one
algorithmic lever left after the r3/r4 Pallas studies (PERF.md §5): custom
calls lose to XLA's codegen, but Winograd changes the FLOP COUNT, not the
schedule. F(m,3) computes an m×m output tile from an (m+2)×(m+2) input
tile with (m+2)² multiplies instead of 9m²: 2.25× fewer MXU ops at m=2,
4× at m=4 (before tile-padding overhead). Composed entirely from
jnp.einsum so XLA keeps fusion and latency-hiding — the measured failure
mode of custom-call routing (PERF.md §5).

Stands in the cuDNN slot: cuDNN's own conv heuristics pick Winograd
kernels for exactly these shapes behind the reference's conv2d
(reference basemodel.py:966-979).

Matrices are the Lavin & Gray "Fast Algorithms for Convolutional Neural
Networks" correlation-form transforms (matching torch's cross-correlation
conv semantics). Numerics: transforms run in fp32; the (m+2)²-batched
GEMM runs in the compute dtype (bf16 on the hot path — the MXU still
accumulates fp32 internally). F(4,3)'s transform constants span 1/24..8,
so expect ~1e-4 relative error in fp32 vs direct conv (tested in
tests/test_winograd.py); F(2,3) is ~1e-6.

Gate (read at trace time by nn/layers.Conv2d):
  CONVNETS_TPU_WINOGRAD = "0"/unset → off (direct lax conv)
                          "2" / "4" → force F(2,3) / F(4,3) everywhere it fits
                          "auto"    → measured per-shape routing (see route())
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Lavin & Gray transforms, exact in float64 then cast.
_BT = {
    2: np.array(
        [[1, 0, -1, 0],
         [0, 1, 1, 0],
         [0, -1, 1, 0],
         [0, 1, 0, -1]], np.float64),
    4: np.array(
        [[4, 0, -5, 0, 1, 0],
         [0, -4, -4, 1, 1, 0],
         [0, 4, -4, -1, 1, 0],
         [0, -2, -1, 2, 1, 0],
         [0, 2, -1, -2, 1, 0],
         [0, 4, 0, -5, 0, 1]], np.float64),
}
_G = {
    2: np.array(
        [[1, 0, 0],
         [0.5, 0.5, 0.5],
         [0.5, -0.5, 0.5],
         [0, 0, 1]], np.float64),
    4: np.array(
        [[1 / 4, 0, 0],
         [-1 / 6, -1 / 6, -1 / 6],
         [-1 / 6, 1 / 6, -1 / 6],
         [1 / 24, 1 / 12, 1 / 6],
         [1 / 24, -1 / 12, 1 / 6],
         [0, 0, 1]], np.float64),
}
_AT = {
    2: np.array(
        [[1, 1, 1, 0],
         [0, 1, -1, -1]], np.float64),
    4: np.array(
        [[1, 1, 1, 1, 1, 0],
         [0, 1, -1, 2, -2, 0],
         [0, 1, 1, 4, 4, 0],
         [0, 1, -1, 8, -8, 1]], np.float64),
}


def fits(kernel, stride, dilation, groups) -> bool:
    """The envelope Winograd F(m,3) covers: dense 3x3 stride-1 conv."""
    return (tuple(kernel) == (3, 3) and tuple(stride) == (1, 1)
            and tuple(dilation) == (1, 1) and groups == 1)


def _extract_tiles(xp: jax.Array, m: int, th: int, tw: int) -> jax.Array:
    """(N, th*m+2, tw*m+2, C) → (a, a, N, th, tw, C), a = m+2.

    a² strided slices (stride m along H and W) — axis-aligned data
    movement XLA lowers without gathers, same reasoning as the separable
    MXU resample (data/augment.py).
    """
    a = m + 2
    n, _, _, c = xp.shape
    rows = []
    for i in range(a):
        cols = []
        for j in range(a):
            s = lax.slice(
                xp,
                (0, i, j, 0),
                (n, i + (th - 1) * m + 1, j + (tw - 1) * m + 1, c),
                (1, m, m, 1),
            )
            cols.append(s)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def transform_weight(w: jax.Array, m: int, compute_dtype) -> jax.Array:
    """(3, 3, C, O) → (a, a, C, O) in compute_dtype; transform in fp32."""
    g = jnp.asarray(_G[m], jnp.float32)
    u = jnp.einsum("ak,bl,klco->abco", g, g, w.astype(jnp.float32))
    return u.astype(compute_dtype)


def conv2d_winograd(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    padding=0,
    m: int = 4,
):
    """3x3 stride-1 dense conv via Winograd F(m,3). Semantics match
    ops.conv2d(x, w, b, stride=1, padding=padding) (cross-correlation).

    x: (N, H, W, C); w: (3, 3, C, O); padding int or (ph, pw).
    Transforms in fp32, the batched GEMM in x.dtype (bf16 hot path).
    """
    if isinstance(padding, int):
        ph = pw = padding
    else:
        ph, pw = padding
    n, h, wd, c = x.shape
    o = w.shape[-1]
    oh, ow = h + 2 * ph - 2, wd + 2 * pw - 2
    th, tw = -(-oh // m), -(-ow // m)
    # pad: conv padding on all sides + tile-rounding pad at bottom/right
    eh = th * m + 2 - (h + 2 * ph)
    ew = tw * m + 2 - (wd + 2 * pw)
    xp = jnp.pad(x, ((0, 0), (ph, ph + eh), (pw, pw + ew), (0, 0)))

    cd = x.dtype
    bt = jnp.asarray(_BT[m], jnp.float32)
    at = jnp.asarray(_AT[m], jnp.float32)

    tiles = _extract_tiles(xp, m, th, tw).astype(jnp.float32)
    v = jnp.einsum("ai,bj,ijnpqc->abnpqc", bt, bt, tiles).astype(cd)
    u = transform_weight(w, m, cd)

    # the Winograd GEMM: a² batched (N·th·tw, C)×(C, O) matmuls on the MXU.
    # fp32 accumulation requested explicitly — the MXU accumulates fp32
    # internally, and keeping the product fp32 into the output transform
    # measurably tightens bf16 numerics (m=4: 2.1%→1.7% mean rel err,
    # m=2: 0.56%→0.46% — tests/test_winograd.py characterization).
    precision = (lax.Precision.HIGHEST if cd == jnp.float32
                 else lax.Precision.DEFAULT)
    mm = jnp.einsum("abnpqc,abco->abnpqo", v, u, precision=precision,
                    preferred_element_type=jnp.float32)

    y = jnp.einsum("xa,yb,abnpqo->npxqyo", at, at, mm)
    y = y.reshape(n, th * m, tw * m, o)[:, :oh, :ow, :]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(cd)


# -- routing ------------------------------------------------------------

# measured per-shape table for mode "auto": (H, Cin, Cout) → m or None.
# Filled from the full-step A/B protocol (PERF.md §5); per-call wins do
# not transfer, so entries come only from step-level measurements.
_AUTO_TABLE: dict = {}
_AUTO_DEFAULT_M: int | None = None


def _env_table() -> dict | None:
    """Experiment hook: CONVNETS_TPU_WINOGRAD_TABLE='{"h,cin,cout": m}'
    overrides the built-in auto table (used by scripts/tpu_winograd_ab.py
    to measure shape subsets at full-step granularity)."""
    import json

    raw = os.environ.get("CONVNETS_TPU_WINOGRAD_TABLE")
    if not raw:
        return None
    table = {}
    for k, v in json.loads(raw).items():
        h, cin, cout = (int(t) for t in k.split(","))
        table[(h, cin, cout)] = int(v)
    return table


def route(h: int, cin: int, cout: int) -> int | None:
    """Tile size to use for this shape, or None for the direct conv."""
    mode = os.environ.get("CONVNETS_TPU_WINOGRAD", "0").strip().lower()
    if mode in ("", "0", "off"):
        return None
    if mode in ("2", "4"):
        return int(mode)
    if mode == "auto":
        table = _env_table()
        if table is not None:
            return table.get((h, cin, cout))
        return _AUTO_TABLE.get((h, cin, cout), _AUTO_DEFAULT_M)
    return None
