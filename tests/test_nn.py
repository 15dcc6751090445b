"""Module-system tests: init/apply/state threading, shape inference, parity
of a composed conv+BN+ReLU block against torch in train mode."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from convnets_tpu import nn
from convnets_tpu.core.precision import MIXED_POLICY


def test_sequential_shapes_and_state_threading():
    model = nn.Sequential([
        nn.conv_block(8, 3, stride=1, padding=1),
        nn.MaxPool2d(2),
        nn.conv_block(16, 3, padding=1),
        nn.GlobalAvgPool2d(),
        nn.Linear(10),
    ])
    in_shape = (4, 16, 16, 3)
    assert model.out_shape(in_shape) == (4, 10)

    variables = model.init(jax.random.key(0), in_shape)
    x = jnp.ones(in_shape, jnp.float32)
    y, new_state = model.apply(variables, x, train=True)
    assert y.shape == (4, 10)
    # both BN layers produced updated running stats
    flat = jax.tree.leaves(new_state)
    assert len(flat) == 4  # 2 BN × (mean, var)
    # eval mode: no state updates
    y2, ns2 = model.apply(variables, x, train=False)
    assert ns2 == {}


def test_conv_bn_relu_block_matches_torch_train_mode():
    rng = np.random.RandomState(0)
    cin, cout = 3, 8
    x = rng.randn(4, cin, 10, 10).astype(np.float32)

    block = nn.conv_block(cout, 3, stride=2, padding=1)
    variables = block.init(jax.random.key(0), (4, 10, 10, cin))

    # copy our params into torch
    w = np.asarray(variables["params"]["0"]["w"])  # (kh,kw,I,O)
    tconv = torch.nn.Conv2d(cin, cout, 3, stride=2, padding=1, bias=False)
    tbn = torch.nn.BatchNorm2d(cout)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(np.transpose(w, (3, 2, 0, 1))))
        tbn.weight.fill_(1.0)
        tbn.bias.fill_(0.0)
    tmodel = torch.nn.Sequential(tconv, tbn, torch.nn.ReLU())
    tmodel.train()
    ref = tmodel(torch.from_numpy(x)).detach().numpy()

    got, new_state = block.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=True)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_state["1"]["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )


def test_concat_and_add_combinators():
    branch = lambda c: nn.conv_block(c, 1)
    cat = nn.Concat([branch(4), branch(6)])
    in_shape = (2, 8, 8, 3)
    assert cat.out_shape(in_shape) == (2, 8, 8, 10)
    v = cat.init(jax.random.key(1), in_shape)
    y, _ = cat.apply(v, jnp.ones(in_shape), train=False)
    assert y.shape == (2, 8, 8, 10)

    res = nn.Add([nn.conv_block(3, 3, padding=1, act=False), nn.Identity()], post_relu=True)
    v = res.init(jax.random.key(2), in_shape)
    y, _ = res.apply(v, jnp.ones(in_shape), train=False)
    assert y.shape == in_shape
    assert float(jnp.min(y)) >= 0.0  # post-ReLU


def test_mixed_policy_compute_dtype():
    with nn.use_policy(MIXED_POLICY):
        model = nn.Sequential([nn.conv_block(8, 3, padding=1), nn.GlobalAvgPool2d(), nn.Linear(10)])
    v = model.init(jax.random.key(0), (2, 8, 8, 3))
    # params stored fp32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(v["params"]))
    y, _ = model.apply(v, jnp.ones((2, 8, 8, 3), jnp.float32), train=False)
    assert y.dtype == jnp.bfloat16


def test_dropout_requires_rng_in_train():
    d = nn.Dropout(0.5)
    import pytest

    with pytest.raises(ValueError):
        d.apply({"params": {}, "state": {}}, jnp.ones((2, 2)), train=True)
    y, _ = d.apply({"params": {}, "state": {}}, jnp.ones((2, 2)), train=True, rng=jax.random.key(0))
    assert y.shape == (2, 2)


def test_summarize_runs():
    model = nn.Sequential([nn.conv_block(8, 3, padding=1), nn.Flatten(), nn.Linear(10)])
    s = nn.summarize(model, (1, 8, 8, 3))
    assert "total params" in s
    assert "Linear(10)" in s


def test_conv_s2d_stem_matches_direct(monkeypatch):
    """Stride-2 small-Cin convs rewritten via space-to-depth (the stem
    MXU trick) match the direct strided conv, fwd and dw-grad."""
    conv = nn.Conv2d(16, 7, stride=2, padding=3, bias=False)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3), jnp.float32)
    v = conv.init(jax.random.key(1), x.shape)

    monkeypatch.setenv("CONVNETS_TPU_S2D", "0")
    y_direct, _ = conv.apply(v, x)
    g_direct = jax.grad(lambda w: jnp.sum(
        conv.apply({"params": {"w": w}, "state": {}}, x)[0] ** 2))(v["params"]["w"])

    monkeypatch.setenv("CONVNETS_TPU_S2D", "1")
    y_s2d, _ = conv.apply(v, x)
    g_s2d = jax.grad(lambda w: jnp.sum(
        conv.apply({"params": {"w": w}, "state": {}}, x)[0] ** 2))(v["params"]["w"])

    assert y_s2d.shape == y_direct.shape == (2, 8, 8, 16)
    np.testing.assert_allclose(y_s2d, y_direct, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(g_s2d, g_direct, rtol=1e-3, atol=1e-3)


def test_hw_dropout_key_deterministic_and_valid():
    # hw_dropout_key rewraps a threefry key as unsafe_rbg (TPU hardware RNG);
    # must be deterministic per input key, produce distinct streams after
    # split, and keep dropout's keep-probability semantics.
    import numpy as np

    from convnets_tpu.core.rng import hw_dropout_key
    from convnets_tpu.ops.activations import dropout

    @jax.jit
    def f(key, x):
        k = hw_dropout_key(key)
        k1, k2 = jax.random.split(k)
        return dropout(x, 0.5, k1, train=True), dropout(x, 0.5, k2, train=True)

    x = jnp.ones((64, 64), jnp.float32)
    a, b = f(jax.random.key(0), x)
    a2, _ = f(jax.random.key(0), x)
    assert np.array_equal(np.asarray(a), np.asarray(a2))  # same seed, same mask
    assert not np.array_equal(np.asarray(a), np.asarray(b))  # split keys differ
    zero_frac = float((np.asarray(a) == 0).mean())
    assert 0.4 < zero_frac < 0.6  # rate=0.5 mask statistics
    assert float(np.asarray(a).max()) == 2.0  # inverted-dropout 1/(1-p) scale


def test_train_step_hw_rng_gate(monkeypatch):
    # The engine's dropout stream honors CONVNETS_TPU_HW_RNG: gate off must
    # reproduce the historical threefry masks (published-run reproducibility),
    # gate on switches only the dropout stream (loss still finite/valid).
    import numpy as np

    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    def losses(hw):
        monkeypatch.setenv("CONVNETS_TPU_HW_RNG", "1" if hw else "0")
        setting = Settings(kind="11", input_size=(3, 32, 32), num_classes=10,
                           batch_size=8, dropout_rate=0.5, data_augment=False,
                           data_norm=False, seed=7)
        model = build_model("vggnet", setting)
        trainer = Trainer(model)
        trainer.init_state()
        step = trainer._get_train_step(False, False)
        x = jnp.ones((8, 32, 32, 3), jnp.float32) * 0.1
        y = jnp.arange(8) % 10
        w = jnp.ones((8,), jnp.float32)
        out = []
        for i in range(2):
            trainer.state, loss, _ = step(
                trainer.state, x, y, w, jax.random.fold_in(jax.random.key(7), i))
            out.append(float(loss))
        return out

    l_off = losses(False)
    l_off2 = losses(False)
    assert l_off == l_off2  # threefry path is deterministic
    l_on = losses(True)
    assert all(np.isfinite(v) for v in l_on)
    assert l_on != l_off  # different mask stream (statistically equivalent)
