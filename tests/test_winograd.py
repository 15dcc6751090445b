"""Winograd F(2,3)/F(4,3) parity vs the direct lax conv oracle.

The Winograd path must be numerically interchangeable with ops.conv2d for
every dense 3x3 stride-1 call (the reference's conv2d slot,
basemodel.py:966-979). F(2,3) transforms are exact in binary fp
(coefficients ±1, ±0.5), so fp32 agreement is tight; F(4,3) constants
span 1/24..8 and round, so its tolerance is looser (~1e-4 relative).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnets_tpu import ops
from convnets_tpu.ops import winograd

SHAPES = [
    # (N, H, W, C, O, padding) — exact tiling, rounded tiling, rectangular
    (2, 8, 8, 8, 16, 1),
    (2, 14, 14, 16, 8, 1),   # RN50 14² shape class: pads 14→16 at m=4
    (1, 7, 9, 4, 4, 1),      # rectangular + odd, both axes round up
    (2, 6, 6, 3, 5, 0),      # no conv padding
    (1, 5, 5, 2, 3, 2),      # padding 2
]


def _ref(x, w, b, padding):
    return ops.conv2d(x, w, b, stride=1, padding=padding)


@pytest.mark.parametrize("m,rtol", [(2, 2e-5), (4, 3e-4)])
@pytest.mark.parametrize("shape", SHAPES)
def test_forward_parity_fp32(m, rtol, shape):
    n, h, wd, c, o, pad = shape
    key = jax.random.PRNGKey(hash((m, shape)) % (2**31))
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, h, wd, c), jnp.float32)
    w = jax.random.normal(kw, (3, 3, c, o), jnp.float32) * 0.1
    b = jax.random.normal(kb, (o,), jnp.float32)
    ref = _ref(x, w, b, pad)
    got = winograd.conv2d_winograd(x, w, b, padding=pad, m=m)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=rtol, atol=rtol)


@pytest.mark.parametrize("m", [2, 4])
def test_gradient_parity_fp32(m):
    key = jax.random.PRNGKey(7 + m)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (2, 10, 10, 6), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 6, 8), jnp.float32) * 0.1

    def loss_ref(x, w):
        return jnp.sum(_ref(x, w, None, 1) ** 2)

    def loss_win(x, w):
        return jnp.sum(winograd.conv2d_winograd(x, w, padding=1, m=m) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_w, gw_w = jax.grad(loss_win, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_r),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_r),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("m", [2, 4])
def test_bf16_close_to_direct_bf16(m):
    """bf16 hot path: Winograd-bf16 must sit inside the bf16 noise band of
    the direct bf16 conv (both compared against the fp32 oracle)."""
    key = jax.random.PRNGKey(11)
    kx, kw = jax.random.split(key)
    x32 = jax.random.normal(kx, (2, 14, 14, 32), jnp.float32)
    w32 = jax.random.normal(kw, (3, 3, 32, 32), jnp.float32) * 0.1
    oracle = np.asarray(_ref(x32, w32, None, 1))
    scale = np.abs(oracle).mean()
    direct = np.asarray(
        _ref(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16), None, 1)
    ).astype(np.float32)
    win = np.asarray(
        winograd.conv2d_winograd(
            x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
            padding=1, m=m)
    ).astype(np.float32)
    err_direct = np.abs(direct - oracle).mean() / scale
    err_win = np.abs(win - oracle).mean() / scale
    # measured characterization (fp32-accumulated GEMM): F(2,3) sits at
    # ~1.6x the direct-bf16 error (0.46% vs 0.28%); F(4,3)'s transform-
    # domain cancellation costs ~6x (1.7%) — intrinsic to 8 mantissa bits,
    # documented in ops/winograd.py. Bands assert those ceilings.
    band = {2: 2.5, 4: 8.0}[m]
    assert err_win < band * max(err_direct, 1e-3), (err_win, err_direct)
    assert err_win < 0.025, err_win


def test_fits_envelope():
    assert winograd.fits((3, 3), (1, 1), (1, 1), 1)
    assert not winograd.fits((3, 3), (2, 2), (1, 1), 1)
    assert not winograd.fits((1, 1), (1, 1), (1, 1), 1)
    assert not winograd.fits((3, 3), (1, 1), (2, 2), 1)
    assert not winograd.fits((3, 3), (1, 1), (1, 1), 32)


def test_layer_gate_routes_and_matches(monkeypatch):
    """Conv2d.apply with CONVNETS_TPU_WINOGRAD=4 must produce the same
    output as the default path (fp32, loose-tol) on a fitting conv."""
    from convnets_tpu.nn.layers import Conv2d

    layer = Conv2d(8, 3, stride=1, padding=1, bias=True)
    key = jax.random.PRNGKey(3)
    variables = layer.init(key, (2, 14, 14, 4))
    x = jax.random.normal(key, (2, 14, 14, 4), jnp.float32)

    monkeypatch.delenv("CONVNETS_TPU_WINOGRAD", raising=False)
    y_direct, _ = layer.apply(variables, x)
    monkeypatch.setenv("CONVNETS_TPU_WINOGRAD", "4")
    y_win, _ = layer.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_win), np.asarray(y_direct),
                               rtol=3e-4, atol=3e-4)
