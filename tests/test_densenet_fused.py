"""DenseBlockFused (shared-stats dense block) parity vs the standard
composition — values, gradients, and running statistics must match the
reference formulation (reference densenet.py:105-169) up to float
reassociation. r5 DN121 conv-floor probe (r4 VERDICT #8)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnets_tpu import nn
from convnets_tpu.models import densenet
from convnets_tpu.models.base import Builder
from convnets_tpu.settings import Settings

SIZE, GROWTH, C0 = 3, 8, 16
SHAPE = (4, 8, 8, C0)


def _std_block():
    setting = Settings(kind="121", input_size=(3, 8, 8), num_classes=10,
                       dropout_rate=0.0)
    b = Builder(setting)
    b.in_channels = C0
    layers = []
    for _ in range(SIZE):
        cin = b.in_channels
        layers.append(densenet._dense_layer(b, GROWTH, bottleneck_factor=4))
        b.in_channels = cin + GROWTH
    return nn.Sequential(layers)


def _fused_block():
    return densenet.DenseBlockFused(SIZE, GROWTH, C0, drop_rate=0.0)


def _map_params(std_params):
    """standard Sequential/Concat tree -> fused flat tree."""
    out = {}
    for i in range(SIZE):
        body = std_params[str(i)]["1"]
        out[f"bn1_{i}"] = body["0"]
        out[f"conv1_{i}"] = body["3"]
        out[f"bn2_{i}"] = body["4"]
        out[f"conv2_{i}"] = body["7"]
    return out


@pytest.fixture(scope="module")
def pair():
    std = _std_block()
    fused = _fused_block()
    key = jax.random.key(0)
    std_vars = std.init(key, SHAPE)
    fused_vars = fused.init(key, SHAPE)
    fused_vars = {"params": _map_params(std_vars["params"]),
                  "state": fused_vars["state"]}
    x = jax.random.normal(jax.random.key(1), SHAPE, jnp.float32)
    return std, fused, std_vars, fused_vars, x


def test_forward_train_parity(pair):
    std, fused, sv, fv, x = pair
    y_std, _ = std.apply(sv, x, train=True, rng=jax.random.key(2))
    y_fused, _ = fused.apply(fv, x, train=True, rng=jax.random.key(2))
    assert y_std.shape == y_fused.shape == (4, 8, 8, C0 + SIZE * GROWTH)
    np.testing.assert_allclose(np.asarray(y_std), np.asarray(y_fused),
                               rtol=2e-5, atol=2e-5)


def test_running_stats_parity(pair):
    std, fused, sv, fv, x = pair
    _, ns_std = std.apply(sv, x, train=True, rng=jax.random.key(2))
    _, ns_fused = fused.apply(fv, x, train=True, rng=jax.random.key(2))
    # fused bank_j must equal the matching channel slice of EVERY standard
    # layer's bn1 running stats (they are duplicates in the standard form)
    for i in range(SIZE):
        bn1 = ns_std[str(i)]["1"]["0"]
        lo = 0
        for j in range(i + 1):
            w = C0 if j == 0 else GROWTH
            bank = ns_fused[f"bank_{j}"]
            np.testing.assert_allclose(np.asarray(bn1["mean"][lo:lo + w]),
                                       np.asarray(bank["mean"]),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(bn1["var"][lo:lo + w]),
                                       np.asarray(bank["var"]),
                                       rtol=1e-5, atol=1e-6)
            lo += w
        # per-layer second BN matches exactly
        np.testing.assert_allclose(np.asarray(ns_std[str(i)]["1"]["4"]["mean"]),
                                   np.asarray(ns_fused[f"bn2_{i}"]["mean"]),
                                   rtol=1e-5, atol=1e-6)


def test_gradient_parity(pair):
    std, fused, sv, fv, x = pair

    def loss(mod, vars_, x):
        y, _ = mod.apply(vars_, x, train=True, rng=jax.random.key(2))
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    gs_std = jax.grad(lambda p, x: loss(std, {"params": p,
                                              "state": sv["state"]}, x),
                      argnums=(0, 1))(sv["params"], x)
    gs_fused = jax.grad(lambda p, x: loss(fused, {"params": p,
                                                  "state": fv["state"]}, x),
                        argnums=(0, 1))(fv["params"], x)
    # input gradient
    np.testing.assert_allclose(np.asarray(gs_std[1]), np.asarray(gs_fused[1]),
                               rtol=5e-5, atol=5e-6)
    # parameter gradients through the mapping
    mapped = _map_params(gs_std[0])
    for k, g_f in gs_fused[0].items():
        flat_f = jax.tree.leaves(g_f)
        flat_s = jax.tree.leaves(mapped[k])
        for a, b in zip(flat_s, flat_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=5e-6, err_msg=k)


def test_eval_parity_after_update(pair):
    std, fused, sv, fv, x = pair
    _, ns_std = std.apply(sv, x, train=True, rng=jax.random.key(2))
    _, ns_fused = fused.apply(fv, x, train=True, rng=jax.random.key(2))

    def merge(old, new):
        out = dict(old)
        for k, v in new.items():
            out[k] = merge(old[k], v) if isinstance(v, dict) and k in old else v
        return out

    sv2 = {"params": sv["params"], "state": merge(sv["state"], ns_std)}
    fv2 = {"params": fv["params"], "state": merge(fv["state"], ns_fused)}
    y_std, _ = std.apply(sv2, x, train=False)
    y_fused, _ = fused.apply(fv2, x, train=False)
    np.testing.assert_allclose(np.asarray(y_std), np.asarray(y_fused),
                               rtol=2e-5, atol=2e-5)


def test_full_model_gate(monkeypatch):
    monkeypatch.setenv("CONVNETS_TPU_DENSENET_FUSED", "1")
    from convnets_tpu.models import build_model

    setting = Settings(kind="121", input_size=(3, 32, 32), num_classes=10,
                       batch_size=4, dropout_rate=0.0)
    model = build_model("densenet", setting)

    def has_fused(m):
        return (isinstance(m, densenet.DenseBlockFused)
                or any(has_fused(c) for c in m.children().values()))

    assert has_fused(model.module)
    key = jax.random.key(0)
    vars_ = model.module.init(key, (4, 32, 32, 3))
    x = jnp.ones((4, 32, 32, 3), jnp.float32)
    y, ns = model.module.apply(vars_, x, train=True, rng=jax.random.key(1))
    assert y.shape == (4, 10)
    assert np.all(np.isfinite(np.asarray(y)))
