"""Mixup (Settings.mixup — Beta(α,α) batch interpolation inside the
jitted train step, VERDICT r4 #4's new recipe family for MobileNet)."""

import jax
import jax.numpy as jnp
import numpy as np

from convnets_tpu.models import build_model
from convnets_tpu.settings import Settings
from convnets_tpu.train.engine import Trainer


def _step(mixup, seed=0):
    s = Settings(kind="lenet5", input_size=(1, 28, 28), num_classes=10,
                 batch_size=8, mixup=mixup, epochs=1,
                 data_augment=True, data_norm=False, seed=seed)
    m = build_model("convnet", s)
    tr = Trainer(m, use_mesh=False)
    tr.init_state()
    fn = tr._get_train_step(augment=True, norm=False)
    x = jax.random.uniform(jax.random.key(0), (8, 28, 28, 1), jnp.float32)
    y = jax.random.randint(jax.random.key(1), (8,), 0, 10, jnp.int32)
    w = jnp.ones((8,), jnp.float32)
    state, loss, c = fn(tr.state, x, y, w, jax.random.key(2))
    return state, float(loss)


def test_mixup_zero_is_bit_identical_to_default():
    """mixup=0 must not touch the RNG stream or numerics of published
    recipes (the cutout=0 guarantee, engine.py)."""
    s0, l0 = _step(0.0)
    sd, ld = _step(None)  # field default
    assert l0 == ld
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(sd.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mixup_changes_loss_and_trains():
    _, l0 = _step(0.0)
    _, lm = _step(0.2)
    assert lm != l0
    assert np.isfinite(lm)
