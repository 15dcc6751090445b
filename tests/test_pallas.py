"""Pallas kernel parity vs the lax-backed ops oracle (interpret mode on
CPU — the same kernels lower through Mosaic on a real TPU). SURVEY.md §4
test pyramid layer (a)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convnets_tpu import ops
from convnets_tpu.ops.pallas import (
    avg_pool2d, conv2d_fused, depthwise_conv2d, max_pool2d,
)

RTOL = 1e-5
ATOL = 1e-5


def rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1), (2, 3, 7)])
def test_conv2d_fused_matches_lax(stride, padding, k):
    x = rand(0, (4, 16, 16, 8))
    w = rand(1, (k, k, 8, 32)) * 0.1
    got = conv2d_fused(x, w, stride=stride, padding=padding, interpret=True)
    want = ops.conv2d(x, w, stride=stride, padding=padding)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv2d_fused_epilogue_matches_bn_relu():
    """conv → BN(inference) → ReLU == conv2d_fused with folded scale/shift."""
    x = rand(0, (2, 8, 8, 4))
    w = rand(1, (3, 3, 4, 16)) * 0.1
    mean = rand(2, (16,)) * 0.1
    var = jnp.abs(rand(3, (16,))) + 0.5
    gamma = rand(4, (16,)) * 0.5 + 1.0
    beta = rand(5, (16,)) * 0.1
    eps = 1e-5

    y = ops.conv2d(x, w, stride=1, padding=1)
    want = ops.relu(ops.batch_norm_inference(y, mean, var, gamma, beta, eps=eps))

    scale = gamma / jnp.sqrt(var + eps)
    shift = beta - mean * scale
    got = conv2d_fused(x, w, scale, shift, stride=1, padding=1, relu=True,
                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1)])
def test_depthwise_matches_lax(stride, padding):
    x = rand(0, (4, 16, 16, 16))
    w = rand(1, (3, 3, 1, 16)) * 0.2
    got = depthwise_conv2d(x, w, stride=stride, padding=padding, interpret=True)
    want = ops.conv2d_depthwise(x, w, stride=stride, padding=padding)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride,padding", [(2, 2, 0), (3, 2, 1), (3, 1, 1)])
def test_max_pool_matches_lax(k, stride, padding):
    x = rand(0, (4, 16, 16, 8))
    got = max_pool2d(x, k, stride, padding, interpret=True)
    want = ops.max_pool2d(x, k, stride, padding)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride,padding", [(2, 2, 0), (3, 2, 1)])
def test_avg_pool_matches_lax(k, stride, padding):
    x = rand(0, (4, 16, 16, 8))
    got = avg_pool2d(x, k, stride, padding, interpret=True)
    want = ops.avg_pool2d(x, k, stride, padding)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv2d_fused_bf16():
    x = rand(0, (2, 8, 8, 8)).astype(jnp.bfloat16)
    w = (rand(1, (3, 3, 8, 16)) * 0.1).astype(jnp.bfloat16)
    got = conv2d_fused(x, w, stride=1, padding=1, interpret=True)
    want = ops.conv2d(x, w, stride=1, padding=1)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=0.1, atol=0.1)


def test_layer_dispatch_interpret(monkeypatch):
    """Conv2d/pool layers route through the Pallas kernels when enabled
    (forced interpret mode on CPU) and still match the lax path."""
    from jax.experimental.pallas import tpu as pltpu
    from convnets_tpu.ops import pallas as P
    from convnets_tpu import nn
    from convnets_tpu.nn.module import Module  # noqa: F401

    conv = nn.Conv2d(16, 3, stride=1, padding=1, bias=True)
    pool = nn.MaxPool2d(2, stride=2)
    x = rand(0, (4, 8, 8, 8))
    v = conv.init(jax.random.key(0), x.shape)

    y_lax, _ = conv.apply(v, x)
    p_lax, _ = pool.apply(None, y_lax)

    monkeypatch.setattr(P, "enabled", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        y_pal, _ = conv.apply(v, x)
        p_pal, _ = pool.apply(None, y_pal)
        # gradient flows through the custom VJP
        g = jax.grad(lambda w: jnp.sum(
            conv.apply({"params": {"w": w, "b": v["params"]["b"]}, "state": {}}, x)[0] ** 2
        ))(v["params"]["w"])
    np.testing.assert_allclose(y_pal, y_lax, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p_pal, p_lax, rtol=1e-5, atol=1e-5)
    assert g.shape == v["params"]["w"].shape
