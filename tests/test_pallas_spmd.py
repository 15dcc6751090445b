"""Pallas × SPMD (r3 VERDICT #3): the Mosaic kernel layer riding inside
shard_map over the data mesh, interpret-mode on the 8-device CPU mesh.

The r3 design gated Pallas to device_count()==1 because pallas_call has
no GSPMD partitioning rule. The r4 envelope (ops/pallas spmd_call) wraps
each batch-parallel kernel in shard_map over the Trainer's registered
mesh, so a sharded train step with CONVNETS_TPU_PALLAS=1 compiles and
matches the lax path. Sync-BN caveat: ConvBNReLU's fused train kernel is
NOT routed under SPMD (per-shard batch stats); its unfused fallback keeps
BN reductions global (tested below via loss parity with the lax path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convnets_tpu import ops
from convnets_tpu.parallel.mesh import (
    active_mesh, data_sharding, make_mesh, set_active_mesh,
)

RTOL, ATOL = 1e-4, 1e-4


@pytest.fixture
def spmd_pallas(monkeypatch):
    """PALLAS=1 + interpret emulation + an active 8-device mesh."""
    monkeypatch.setenv("CONVNETS_TPU_PALLAS", "1")
    monkeypatch.setenv("CONVNETS_TPU_PALLAS_INTERPRET", "1")
    prev = active_mesh()
    mesh = make_mesh()
    set_active_mesh(mesh)
    yield mesh
    set_active_mesh(prev)


def test_enabled_requires_mesh_when_multidevice(monkeypatch):
    from convnets_tpu.ops import pallas

    monkeypatch.setenv("CONVNETS_TPU_PALLAS", "1")
    monkeypatch.setenv("CONVNETS_TPU_PALLAS_INTERPRET", "1")
    prev = active_mesh()
    try:
        set_active_mesh(None)
        assert jax.device_count() > 1
        assert not pallas.enabled()
        set_active_mesh(make_mesh())
        assert pallas.enabled()
        assert pallas.spmd_active()
    finally:
        set_active_mesh(prev)


def test_conv2d_train_sharded_matches_lax(spmd_pallas):
    from convnets_tpu.ops import pallas

    mesh = spmd_pallas
    n = 2 * mesh.size
    x = jax.random.normal(jax.random.key(0), (n, 8, 8, 8), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, 8, 16), jnp.float32) * 0.1
    xs = jax.device_put(x, data_sharding(mesh))

    got = jax.jit(lambda a, b: pallas.conv2d_train(a, b, 1, 1))(xs, w)
    want = ops.conv2d(x, w, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=RTOL, atol=ATOL)

    # gradients: replicated weight's cotangent is psum'd over the shards
    def f_pal(a, b):
        return jnp.sum(pallas.conv2d_train(a, b, 1, 1) ** 2)

    def f_lax(a, b):
        return jnp.sum(ops.conv2d(a, b, stride=1, padding=1) ** 2)

    gx_p, gw_p = jax.jit(jax.grad(f_pal, argnums=(0, 1)))(xs, w)
    gx_l, gw_l = jax.grad(f_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_l),
                               rtol=1e-3, atol=1e-3)


def test_pool_sharded_matches_lax(spmd_pallas):
    from convnets_tpu.ops import pallas

    mesh = spmd_pallas
    n = mesh.size
    x = jax.random.normal(jax.random.key(0), (n, 16, 16, 8), jnp.float32)
    xs = jax.device_put(x, data_sharding(mesh))
    got = jax.jit(lambda a: pallas.max_pool2d(a, 3, 2, 1))(xs)
    want = ops.max_pool2d(x, 3, 2, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=RTOL, atol=ATOL)


def _one_step_loss(setting_kw, mesh, pallas_on, monkeypatch):
    """One sharded RN-18 train step; returns (loss, new param leaf)."""
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    monkeypatch.setenv("CONVNETS_TPU_PALLAS", "1" if pallas_on else "0")
    monkeypatch.setenv("CONVNETS_TPU_PALLAS_INTERPRET", "1")
    setting = Settings(kind="18", input_size=(3, 32, 32), num_classes=10,
                       mixed_precision=False, data_augment=False,
                       data_norm=False, dropout_rate=0.0, **setting_kw)
    model = build_model("resnet", setting)
    trainer = Trainer(model, optimizer="sgd", mesh=mesh)
    trainer.init_state()
    step_fn = trainer._get_train_step(augment=False, norm=False)
    ds = data_sharding(mesh)
    n = setting.batch_size
    x = jax.device_put(
        jax.random.normal(jax.random.key(0), (n, 32, 32, 3), jnp.float32), ds)
    y = jax.device_put((jnp.arange(n) % 10).astype(jnp.int32), ds)
    w = jax.device_put(jnp.ones((n,), jnp.float32), ds)
    state, loss, correct = step_fn(trainer.state, x, y, w, jax.random.key(1))
    leaf = jax.tree.leaves(state.params)[0]
    return float(loss), np.asarray(leaf)


def test_sharded_train_step_pallas_matches_lax(spmd_pallas, monkeypatch):
    """Full fwd+bwd+SGD train step over the 8-device mesh: Pallas-routed
    (interpret) == pure lax/GSPMD, loss and updated params alike. This is
    the dryrun_multichip-with-CONVNETS_TPU_PALLAS=1 contract."""
    mesh = spmd_pallas
    kw = dict(batch_size=2 * mesh.size, learning_rate=1e-2)
    loss_p, leaf_p = _one_step_loss(kw, mesh, True, monkeypatch)
    loss_l, leaf_l = _one_step_loss(kw, mesh, False, monkeypatch)
    assert np.isfinite(loss_p)
    np.testing.assert_allclose(loss_p, loss_l, rtol=1e-4)
    np.testing.assert_allclose(leaf_p, leaf_l, rtol=1e-3, atol=1e-4)
