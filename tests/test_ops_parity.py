"""Per-op fp32 numerical parity vs torch (CPU) — the north-star requirement
that per-layer outputs match the PyTorch reference within fp32 tolerance.

Weight layout conversions at the test boundary only:
  torch conv weight (O, I/g, kh, kw)  ←→  ours (kh, kw, I/g, O)
  torch activations NCHW              ←→  ours NHWC
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from convnets_tpu import ops

RTOL, ATOL = 1e-5, 1e-5


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def w_to_hwio(w_oihw: np.ndarray) -> np.ndarray:
    return np.transpose(w_oihw, (2, 3, 1, 0))


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dilation,groups",
    [
        (3, 8, 3, 1, 1, 1, 1),
        (8, 16, 3, 2, 1, 1, 1),
        (8, 16, 1, 1, 0, 1, 1),
        (8, 8, 5, 1, 2, 1, 1),
        (16, 32, 3, 1, 1, 1, 4),     # grouped
        (32, 32, 3, 1, 2, 2, 32),    # depthwise dilated (SKConv path)
        (64, 64, 3, 2, 1, 1, 32),    # cardinality-32 strided (ResNeXt)
    ],
)
def test_conv2d_matches_torch(cin, cout, k, stride, pad, dilation, groups):
    rng = np.random.RandomState(0)
    x = rng.randn(2, cin, 9, 9).astype(np.float32)
    w = rng.randn(cout, cin // groups, k, k).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)

    ref = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, dilation=dilation, groups=groups,
    ).numpy()

    got = ops.conv2d(
        jnp.asarray(to_nhwc(x)), jnp.asarray(w_to_hwio(w)), jnp.asarray(b),
        stride=stride, padding=pad, dilation=dilation, groups=groups,
    )
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=RTOL, atol=ATOL)


def test_depthwise_conv_matches_torch():
    rng = np.random.RandomState(1)
    c = 16
    x = rng.randn(2, c, 8, 8).astype(np.float32)
    w = rng.randn(c, 1, 3, 3).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), None, padding=1, groups=c).numpy()
    got = ops.conv2d_depthwise(jnp.asarray(to_nhwc(x)), jnp.asarray(w_to_hwio(w)), padding=1)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=RTOL, atol=ATOL)


def test_linear_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 32).astype(np.float32)
    w = rng.randn(10, 32).astype(np.float32)  # torch (out, in)
    b = rng.randn(10).astype(np.float32)
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    got = ops.linear(jnp.asarray(x), jnp.asarray(w.T), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=RTOL, atol=1e-4)


@pytest.mark.parametrize("k,stride,pad", [(2, 2, 0), (3, 2, 1), (3, 1, 1)])
def test_max_pool_matches_torch(k, stride, pad):
    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 9, 9).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), k, stride, pad).numpy()
    got = ops.max_pool2d(jnp.asarray(to_nhwc(x)), k, stride, pad)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride,pad", [(2, 2, 0), (3, 2, 1)])
def test_avg_pool_matches_torch(k, stride, pad):
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 9, 9).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), k, stride, pad).numpy()
    got = ops.avg_pool2d(jnp.asarray(to_nhwc(x)), k, stride, pad)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=RTOL, atol=ATOL)


def test_global_avg_pool_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 8, 7, 7).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), 1).numpy()
    got = ops.global_avg_pool2d(jnp.asarray(to_nhwc(x)), keepdims=True)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=RTOL, atol=ATOL)


def test_adaptive_avg_pool_uneven_matches_torch():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 4, 7, 7).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), (3, 5)).numpy()
    got = ops.adaptive_avg_pool2d(jnp.asarray(to_nhwc(x)), (3, 5))
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=RTOL, atol=ATOL)


def test_batch_norm_train_matches_torch():
    rng = np.random.RandomState(7)
    c = 6
    x = rng.randn(4, c, 5, 5).astype(np.float32)
    weight = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32)
    rmean = rng.randn(c).astype(np.float32)
    rvar = rng.rand(c).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(weight))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(rmean))
        bn.running_var.copy_(torch.from_numpy(rvar))
    bn.train()
    ref = bn(torch.from_numpy(x)).detach().numpy()

    got, new_mean, new_var = ops.batch_norm_train(
        jnp.asarray(to_nhwc(x)), jnp.asarray(rmean), jnp.asarray(rvar),
        jnp.asarray(weight), jnp.asarray(bias),
    )
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_mean), bn.running_mean.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_var), bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_inference_matches_torch():
    rng = np.random.RandomState(8)
    c = 6
    x = rng.randn(4, c, 5, 5).astype(np.float32)
    weight = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32)
    rmean = rng.randn(c).astype(np.float32)
    rvar = rng.rand(c).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(weight))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(rmean))
        bn.running_var.copy_(torch.from_numpy(rvar))
    bn.eval()
    ref = bn(torch.from_numpy(x)).detach().numpy()

    got = ops.batch_norm_inference(
        jnp.asarray(to_nhwc(x)), jnp.asarray(rmean), jnp.asarray(rvar),
        jnp.asarray(weight), jnp.asarray(bias),
    )
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=1e-5, atol=1e-5)


def test_channel_shuffle_matches_torch_reference_impl():
    """Torch-side oracle: the reference's view/transpose/flatten shuffle
    (shufflenet_v1.py:173-190) on NCHW."""
    rng = np.random.RandomState(9)
    n, c, h, w, g = 2, 12, 4, 4, 3
    x = rng.randn(n, c, h, w).astype(np.float32)
    t = torch.from_numpy(x)
    ref = t.view(n, g, c // g, h, w).transpose(1, 2).contiguous().view(n, c, h, w).numpy()
    got = ops.channel_shuffle(jnp.asarray(to_nhwc(x)), g)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, rtol=0, atol=0)


def test_cross_entropy_sum_matches_torch():
    rng = np.random.RandomState(10)
    logits = rng.randn(16, 10).astype(np.float32)
    labels = rng.randint(0, 10, size=16)
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels), reduction="sum").item()
    got = float(ops.cross_entropy_sum(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-3


def test_cross_entropy_label_smoothing_matches_torch():
    rng = np.random.RandomState(11)
    logits = rng.randn(16, 10).astype(np.float32)
    labels = rng.randint(0, 10, size=16)
    for eps in (0.05, 0.1, 0.3):
        ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels),
                              reduction="sum", label_smoothing=eps).item()
        got = float(ops.cross_entropy_sum(jnp.asarray(logits), jnp.asarray(labels),
                                          label_smoothing=eps))
        assert abs(got - ref) < 1e-3, (eps, got, ref)


def test_correct_count():
    logits = jnp.asarray([[1.0, 2.0], [3.0, 0.0], [0.0, 1.0]])
    labels = jnp.asarray([1, 0, 0])
    assert float(ops.correct_count(logits, labels)) == 2.0


def test_dropout_scaling_and_determinism():
    import jax

    x = jnp.ones((1000, 100), jnp.float32)
    key = jax.random.key(0)
    y = ops.dropout(x, 0.5, key, train=True)
    # inverted dropout: surviving values scaled by 2, mean preserved ~1
    vals = np.unique(np.asarray(y))
    assert set(np.round(vals, 5)).issubset({0.0, 2.0})
    assert abs(float(jnp.mean(y)) - 1.0) < 0.02
    y2 = ops.dropout(x, 0.5, key, train=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    # eval mode = identity
    np.testing.assert_array_equal(np.asarray(ops.dropout(x, 0.5, key, train=False)), np.asarray(x))


def test_batch_norm_train_custom_vjp_grads():
    """BN backward (custom VJP) vs torch.nn.BatchNorm2d autograd, fp32."""
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(4, 6, 5, 8).astype(np.float32)  # NHWC
    gamma = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.randn(8).astype(np.float32) * 0.1
    g_out = rng.randn(4, 6, 5, 8).astype(np.float32)

    def f(x_, gamma_, beta_):
        y, _, _ = ops.batch_norm_train(
            x_, jnp.zeros(8), jnp.ones(8), gamma_, beta_, eps=1e-5, momentum=0.1)
        return jnp.sum(y * g_out)

    dx, dgamma, dbeta = jax.grad(f, (0, 1, 2))(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta))

    tbn = torch.nn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(gamma))
        tbn.bias.copy_(torch.from_numpy(beta))
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    ty = tbn(tx)
    ty.backward(torch.from_numpy(np.transpose(g_out, (0, 3, 1, 2))))

    np.testing.assert_allclose(
        np.asarray(dx), np.transpose(tx.grad.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dgamma), tbn.weight.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dbeta), tbn.bias.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
